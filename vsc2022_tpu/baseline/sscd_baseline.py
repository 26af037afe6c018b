#!/usr/bin/env python3
"""SSCD/DINO matching baseline driver.

Full matching pipeline — retrieval → candidates.csv → TN localization →
matches.csv → optional metric report — with the reference's CLI
contract, output files and stage budgets (reference:
vsc/baseline/sscd_baseline.py; budgets: 1200 retrievals and 25
candidates per query, 5 pairs localized per query, β=1.2 score-norm).
DINO features run through the same script
(reference: docs/baseline_dino.md:69-86).
"""

import argparse
import logging
import os
from typing import List, Tuple

from vsc2022_tpu.baseline import pipeline
from vsc2022_tpu.localization import (
    TNLocalizationCandidateScore,
    TNLocalizationMaxSim,
)
from vsc2022_tpu.metrics import CandidatePair, Dataset, Match
from vsc2022_tpu.retrieval.score_norm import (
    l2_normalize_rows,
    score_normalize,
    transform_features,
)
from vsc2022_tpu.storage import load_features, store_features
from vsc2022_tpu.types import VideoFeature
from vsc2022_tpu.utils.jaxcache import enable_compilation_cache
from vsc2022_tpu.utils.profiling import maybe_profile

enable_compilation_cache()

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("sscd_baseline.py")
logger.setLevel(logging.INFO)


parser = argparse.ArgumentParser()
parser.add_argument(
    "--query_features", type=str, required=True,
    help="query descriptor npz",
)
parser.add_argument(
    "--ref_features", type=str, required=True,
    help="reference descriptor npz",
)
parser.add_argument(
    "--score_norm_features", type=str,
    help="noise-corpus descriptor npz; enables score normalization",
)
parser.add_argument(
    "--output_path", type=str, required=True,
    help="directory receiving candidates.csv / matches.csv and plots",
)
parser.add_argument(
    "--ground_truth", type=str,
    help="ground-truth matches csv; enables the metric report",
)
parser.add_argument(
    "--overwrite", action="store_true",
    help="replace the output directory if it already exists",
)
parser.add_argument(
    "--profile_dir", help="Write a JAX profiler trace of the matching run.",
    type=str, default=None,
)
_dtype_group = parser.add_mutually_exclusive_group()
_dtype_group.add_argument(
    "--bf16", action="store_true",
    help="Retrieval in bfloat16 (half HBM/transfer, MXU-native; scores "
    "at bf16 resolution).",
)
_dtype_group.add_argument(
    "--int8", action="store_true",
    help="Stage the retrieval corpora (refs + SN noise) as SQ8-style "
    "per-row int8 — quarter the HBM/transfer of f32; search exact "
    "over the dequantized corpus. Localization stays f32.",
)
parser.add_argument(
    "--score_normalized_inputs", action="store_true",
    help="The query/ref npz are ALREADY score-normalized (e.g. the "
    "sn_queries/sn_refs a previous run wrote): use the "
    "score-normalization alignment mode without re-normalizing. "
    "Mutually exclusive with --score_norm_features.",
)
parser.add_argument(
    "--reuse_candidates", type=str, default=None,
    help="Skip retrieval and localize the candidate pairs from this "
    "CSV (a previous run's candidates.csv over the SAME features) — "
    "re-run localization/TN variants without re-paying the search.",
)
parser.add_argument(
    "--vcsl_faithful_tn", action="store_true",
    help="Align with the published VCSL TN configuration (absolute "
    "min_sim gate, top-K=5, path-cell masking, max_iou dedup) instead "
    "of the tuned adaptive gate.",
)


# Thin wrappers preserving the reference's module-level API
# (search / localize_and_verify / match are imported by downstream code).

def search(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    retrieve_per_query: float = pipeline.RETRIEVE_PER_QUERY,
    candidates_per_query: float = pipeline.CANDIDATES_PER_QUERY,
    dtype: str = "float32",
) -> List[CandidatePair]:
    return pipeline.retrieve_candidates(
        queries, refs, retrieve_per_query, candidates_per_query,
        dtype=dtype,
    )


def build_alignment(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    score_normalization: bool,
    vcsl_faithful: bool = False,
):
    """Alignment strategy selection (reference: sscd_baseline.py:117-135):
    score-normalized features use MaxSim scoring over positively biased
    similarity; raw features are L2-normalized and inherit the
    candidate's retrieval score."""
    if score_normalization:
        return TNLocalizationMaxSim(
            queries, refs, model_type="TN",
            tn_max_step=5, min_length=4, similarity_bias=0.5,
            vcsl_faithful=vcsl_faithful,
        )
    return TNLocalizationCandidateScore(
        transform_features(queries, l2_normalize_rows),
        transform_features(refs, l2_normalize_rows),
        model_type="TN", tn_max_step=5, min_length=4,
        vcsl_faithful=vcsl_faithful,
    )


def localize_and_verify(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    candidates: List[CandidatePair],
    localize_per_query: float = pipeline.LOCALIZE_PER_QUERY,
    score_normalization: bool = False,
    vcsl_faithful: bool = False,
) -> List[Match]:
    to_localize = candidates[: int(len(queries) * localize_per_query)]
    alignment = build_alignment(
        queries, refs, score_normalization, vcsl_faithful
    )
    return pipeline.align_candidates(alignment, to_localize)


def match(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    output_path: str,
    score_normalization: bool = False,
    vcsl_faithful: bool = False,
    dtype: str = "float32",
    reuse_candidates: str = None,
) -> Tuple[str, str]:
    if reuse_candidates:
        logger.info("Reusing candidate pairs from %s", reuse_candidates)
        candidates = CandidatePair.read_csv(reuse_candidates)
    else:
        candidates = search(queries, refs, dtype=dtype)
    candidate_file, _ = pipeline.write_stage_artifacts(output_path, candidates)
    matches = localize_and_verify(
        queries, refs, candidates, score_normalization=score_normalization,
        vcsl_faithful=vcsl_faithful,
    )
    _, match_file = pipeline.write_stage_artifacts(
        output_path, candidates, matches
    )
    return candidate_file, match_file


create_pr_plot = pipeline.create_pr_plot


def main(args):
    if os.path.exists(args.output_path) and not args.overwrite:
        raise Exception(
            f"Refusing to clobber {args.output_path} (pass --overwrite)."
        )
    queries = load_features(args.query_features, Dataset.QUERIES)
    refs = load_features(args.ref_features, Dataset.REFS)

    if args.score_norm_features and getattr(
        args, "score_normalized_inputs", False
    ):
        raise Exception(
            "--score_normalized_inputs means the inputs already carry "
            "the CSLS bias dimension; --score_norm_features would "
            "normalize them twice."
        )
    score_normalization = bool(args.score_norm_features) or getattr(
        args, "score_normalized_inputs", False
    )
    dtype = (
        "bfloat16" if getattr(args, "bf16", False)
        else "int8" if getattr(args, "int8", False) else "float32"
    )
    if args.score_norm_features:
        noise = load_features(args.score_norm_features, Dataset.REFS)
        queries, refs = score_normalize(
            queries, refs, noise, beta=1.2, dtype=dtype,
        )
        os.makedirs(args.output_path, exist_ok=True)
        store_features(os.path.join(args.output_path, "sn_queries.npz"), queries)
        store_features(os.path.join(args.output_path, "sn_refs.npz"), refs)

    with maybe_profile(args.profile_dir):
        candidate_file, match_file = match(
            queries, refs, args.output_path,
            score_normalization=score_normalization,
            vcsl_faithful=getattr(args, "vcsl_faithful_tn", False),
            dtype=dtype,
            reuse_candidates=getattr(args, "reuse_candidates", None),
        )

    if args.ground_truth:
        pipeline.report_metrics(
            args.ground_truth, candidate_file, match_file, args.output_path,
            logger,
        )


if __name__ == "__main__":
    main(parser.parse_args())
