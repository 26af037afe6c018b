#!/usr/bin/env python3
"""DnS matching baseline: retrieval on coarse descriptors, localization
on fine-grained chamfer similarity fused with the coarse similarity.

Reference contract (reference: vsc/baseline/dns_baseline.py): search on
1024-d coarse (score-normed) descriptors; per-candidate similarity is
the fine-grained student similarity — optionally symmetrized
((sim + sim(r,q)ᵀ)/2), rescaled to [0,1] — geometric-mean fused with
the coarse similarity (√(clip(fg)·clip(cg))), then TN-aligned with the
same parameters as the SSCD path.

TPU design: the reference computes fine similarity one pair at a time
through TorchScript (dns_baseline.py:138-163 — a device round-trip per
pair). Here the region-chamfer, symmetrization, rescale and fusion are
one fused jit over a whole padded candidate batch.
"""

import argparse
import functools
import logging
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc2022_tpu.localization.localize import TNLocalizationMaxSim
from vsc2022_tpu.metrics import (
    AveragePrecision,
    CandidatePair,
    Dataset,
    Match,
    average_precision,
    evaluate_matching_track,
)
from vsc2022_tpu.models.dns import NUM_REGIONS
from vsc2022_tpu.retrieval import CandidateGeneration, MaxScoreAggregation
from vsc2022_tpu.storage import convert_to_dict, load_features
from vsc2022_tpu.types import VideoFeature

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("dns_baseline.py")
logger.setLevel(logging.INFO)


parser = argparse.ArgumentParser()
parser.add_argument(
    "--query_coarse_features", type=str, required=True,
    help="Path to query coarse descriptors",
)
parser.add_argument(
    "--ref_coarse_features", type=str, required=True,
    help="Path to reference coarse descriptors",
)
parser.add_argument(
    "--query_fine_features", type=str, required=True,
    help="Path to query fine descriptors",
)
parser.add_argument(
    "--ref_fine_features", type=str, required=True,
    help="Path to reference fine descriptors",
)
parser.add_argument(
    "--fg_type", choices=["att", "bin"], default="att",
    help="Fine-grained feature variant (bin features are rescaled to ±1).",
)
parser.add_argument(
    "--output_path", type=str, required=True,
    help="The path to write match predictions.",
)
parser.add_argument(
    "--ground_truth", type=str, help="Path to the ground truth (labels) CSV file."
)
parser.add_argument(
    "--overwrite", help="Overwrite prediction files, if found.", action="store_true"
)


@functools.partial(jax.jit, static_argnames=("symmetric", "precision"))
def _fused_fine_coarse_sims(
    qf: jax.Array,  # [B, NQ, R, D] fine
    rf: jax.Array,  # [B, NR, R, D]
    qc: jax.Array,  # [B, NQ, DC] coarse
    rc: jax.Array,  # [B, NR, DC]
    bias: jax.Array,
    symmetric: bool = True,
    precision: str = "highest",
) -> jax.Array:
    """Batched chamfer similarity, symmetrized, rescaled, geo-fused.

    Chamfer both ways from the same 81 region products: fg = mean over
    query regions of max over ref regions; the symmetrized term swaps
    the roles (== sim(ref, query)ᵀ)."""
    prec = jax.lax.Precision(precision)
    r = qf.shape[2]
    m2 = [None] * r  # per-ref-region running max over query regions
    fg_sum = 0.0
    for a in range(r):
        m1 = None
        for c in range(r):
            p = jnp.einsum(
                "bqd,bnd->bqn", qf[:, :, a], rf[:, :, c],
                precision=prec, preferred_element_type=jnp.float32,
            )
            m1 = p if m1 is None else jnp.maximum(m1, p)
            m2[c] = p if m2[c] is None else jnp.maximum(m2[c], p)
        fg_sum = fg_sum + m1
    fg = fg_sum / r
    if symmetric:
        fg_t = sum(m2) / r  # mean over ref regions of max over query regions
        fg = (fg + fg_t) / 2.0
    fg = fg / 2.0 + 0.5  # rescale [-1,1] → [0,1]

    cg = (
        jnp.einsum("bqd,bnd->bqn", qc, rc, precision=prec,
                   preferred_element_type=jnp.float32)
        + bias
    )
    return jnp.sqrt(jnp.clip(fg, 1e-7) * jnp.clip(cg, 1e-7))


class DnSLocalization(TNLocalizationMaxSim):
    """Fine+coarse fused similarity feeding the TN aligner
    (the reference's VCSLLocalizationDnS; dns_baseline.py:108-163)."""

    sim_element_budget = 4 * 1024 * 1024  # ~11 live [B,NQ,NR] f32 tensors

    def __init__(
        self,
        queries_fine: Dict[str, VideoFeature],
        refs_fine: Dict[str, VideoFeature],
        queries_coarse: List[VideoFeature],
        refs_coarse: List[VideoFeature],
        model_type: str = "TN",
        fg_type: str = "att",
        symmetric: bool = True,
        geometric_mean: bool = True,
        **kwargs,
    ):
        super().__init__(queries_coarse, refs_coarse, model_type, **kwargs)
        self.queries_fine = queries_fine
        self.refs_fine = refs_fine
        self.fg_type = fg_type
        self.symmetric = symmetric
        self.geometric_mean = geometric_mean

    def _fine(self, vf: VideoFeature) -> np.ndarray:
        f = np.asarray(vf.feature, dtype=np.float32)
        if "bin" in self.fg_type:
            f = 2.0 * f - 1.0  # {0,1} → {-1,+1} (dns_baseline.py:133-136)
        return f.reshape(f.shape[0], NUM_REGIONS, -1)

    def _batch_sims(
        self, candidates: Sequence[CandidatePair], nq: int, nr: int
    ):
        b = len(candidates)
        fine_pairs = [
            (
                self._fine(self.queries_fine[c.query_id]),
                self._fine(self.refs_fine[c.ref_id]),
            )
            for c in candidates
        ]
        d_fine = fine_pairs[0][0].shape[-1]
        d_coarse = self.queries[candidates[0].query_id].feature.shape[1]
        qf = np.zeros((b, nq, NUM_REGIONS, d_fine), dtype=np.float32)
        rf = np.zeros((b, nr, NUM_REGIONS, d_fine), dtype=np.float32)
        qc = np.zeros((b, nq, d_coarse), dtype=np.float32)
        rc = np.zeros((b, nr, d_coarse), dtype=np.float32)
        q_len = np.empty(b, dtype=np.int32)
        r_len = np.empty(b, dtype=np.int32)
        for i, (c, (f_q, f_r)) in enumerate(zip(candidates, fine_pairs)):
            cq = self.queries[c.query_id].feature
            cr = self.refs[c.ref_id].feature
            n_q = min(f_q.shape[0], cq.shape[0])
            n_r = min(f_r.shape[0], cr.shape[0])
            qf[i, :n_q] = f_q[:n_q]
            rf[i, :n_r] = f_r[:n_r]
            qc[i, :n_q] = cq[:n_q]
            rc[i, :n_r] = cr[:n_r]
            q_len[i] = n_q
            r_len[i] = n_r
        sims = _fused_fine_coarse_sims(
            jnp.asarray(qf), jnp.asarray(rf), jnp.asarray(qc), jnp.asarray(rc),
            jnp.float32(self.similarity_bias), symmetric=self.symmetric,
        )
        return sims, jnp.asarray(q_len), jnp.asarray(r_len)


def search(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    retrieve_per_query: float = 1200.0,
    candidates_per_query: float = 25.0,
) -> List[CandidatePair]:
    aggregation = MaxScoreAggregation()
    logger.info("Searching")
    cg = CandidateGeneration(refs, aggregation)
    num_to_retrieve = int(retrieve_per_query * len(queries))
    candidates = cg.query(queries, global_k=num_to_retrieve)
    num_candidates = int(candidates_per_query * len(queries))
    candidates = candidates[:num_candidates]
    logger.info("Got %d candidates", len(candidates))
    return candidates


def localize_and_verify(
    queries_fine: Dict[str, VideoFeature],
    refs_fine: Dict[str, VideoFeature],
    queries_coarse: List[VideoFeature],
    refs_coarse: List[VideoFeature],
    candidates: List[CandidatePair],
    localize_per_query: float = 5.0,
    fg_type: str = "att",
) -> List[Match]:
    num_to_localize = int(len(queries_fine) * localize_per_query)
    candidates = candidates[:num_to_localize]

    alignment = DnSLocalization(
        queries_fine,
        refs_fine,
        queries_coarse,
        refs_coarse,
        model_type="TN",
        fg_type=fg_type,
        tn_max_step=5,
        min_length=4,
        similarity_bias=0.5,
    )

    matches = []
    logger.info("Aligning %s candidate pairs", len(candidates))
    BATCH_SIZE = 512
    i = 0
    while i < len(candidates):
        batch = candidates[i : i + BATCH_SIZE]
        matches.extend(alignment.localize_all(batch))
        i += len(batch)
        logger.info(
            "Aligned %d pairs of %d; %d predictions so far",
            i, len(candidates), len(matches),
        )
    return matches


def match(
    queries_fine: Dict[str, VideoFeature],
    refs_fine: Dict[str, VideoFeature],
    queries_coarse: List[VideoFeature],
    refs_coarse: List[VideoFeature],
    output_path: str,
    fg_type: str = "att",
) -> Tuple[str, str]:
    candidates = search(queries_coarse, refs_coarse)
    os.makedirs(output_path, exist_ok=True)
    candidate_file = os.path.join(output_path, "candidates.csv")
    CandidatePair.write_csv(candidates, candidate_file)

    matches = localize_and_verify(
        queries_fine, refs_fine, queries_coarse, refs_coarse, candidates,
        fg_type=fg_type,
    )
    matches_file = os.path.join(output_path, "matches.csv")
    Match.write_csv(matches, matches_file)
    return candidate_file, matches_file


def create_pr_plot(ap: AveragePrecision, filename: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ap.pr_curve.plot(linewidth=1)
    plt.savefig(filename)


def main(args):
    if os.path.exists(args.output_path) and not args.overwrite:
        raise Exception(
            f"Output path already exists: {args.output_path}. "
            "Do you want to --overwrite?"
        )

    queries_fine = convert_to_dict(
        load_features(args.query_fine_features, Dataset.QUERIES)
    )
    refs_fine = convert_to_dict(load_features(args.ref_fine_features, Dataset.REFS))
    queries_coarse = load_features(args.query_coarse_features, Dataset.QUERIES)
    refs_coarse = load_features(args.ref_coarse_features, Dataset.REFS)

    candidate_file, match_file = match(
        queries_fine, refs_fine, queries_coarse, refs_coarse, args.output_path,
        fg_type=args.fg_type,
    )

    if not args.ground_truth:
        return

    gt_matches = Match.read_csv(args.ground_truth, is_gt=True)
    gt_pairs = CandidatePair.from_matches(gt_matches)
    candidate_pairs = CandidatePair.read_csv(candidate_file)
    candidate_uap = average_precision(gt_pairs, candidate_pairs)
    logger.info(f"Candidate uAP: {candidate_uap.ap:.4f}")
    candidate_pr_file = os.path.join(args.output_path, "candidate_precision_recall.pdf")
    create_pr_plot(candidate_uap, candidate_pr_file)

    match_metrics = evaluate_matching_track(args.ground_truth, match_file)
    logger.info(f"Matching track metric: {match_metrics.segment_ap.ap:.4f}")
    matching_pr_file = os.path.join(args.output_path, "precision_recall.pdf")
    create_pr_plot(match_metrics.segment_ap, matching_pr_file)
    logger.info(f"Candidates: {candidate_file}")
    logger.info(f"Matches: {match_file}")
    logger.info(f"Candidate PR plot: {candidate_pr_file}")
    logger.info(f"Match PR plot: {matching_pr_file}")


if __name__ == "__main__":
    main(parser.parse_args())
