"""Shared matching-pipeline stages for the baseline drivers.

The reference duplicates search / alignment-batching / metric-report
code between sscd_baseline.py and dns_baseline.py; here those stages
live once and both drivers compose them. Stage budgets are the
challenge protocol defaults (reference: vsc/baseline/sscd_baseline.py:
90-152).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

from vsc2022_tpu.localization.localize import Localization
from vsc2022_tpu.metrics import (
    AveragePrecision,
    CandidatePair,
    Match,
    average_precision,
    evaluate_matching_track,
)
from vsc2022_tpu.retrieval import CandidateGeneration, MaxScoreAggregation
from vsc2022_tpu.types import VideoFeature

logger = logging.getLogger(__name__)

RETRIEVE_PER_QUERY = 1200.0
CANDIDATES_PER_QUERY = 25.0
LOCALIZE_PER_QUERY = 5.0
ALIGN_BATCH_SIZE = 512


def retrieve_candidates(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    retrieve_per_query: float = RETRIEVE_PER_QUERY,
    candidates_per_query: float = CANDIDATES_PER_QUERY,
    mesh=None,
    dtype: str = "float32",
) -> List[CandidatePair]:
    """Global-k frame search + per-pair aggregation, truncated to the
    candidate budget."""
    logger.info("Retrieval: global top-k frame search")
    generator = CandidateGeneration(
        refs, MaxScoreAggregation(), mesh=mesh, dtype=dtype
    )
    candidates = generator.query(
        queries, global_k=int(retrieve_per_query * len(queries))
    )
    candidates = candidates[: int(candidates_per_query * len(queries))]
    logger.info("Candidate budget kept %d pairs", len(candidates))
    return candidates


def align_candidates(
    alignment: Localization,
    candidates: List[CandidatePair],
    batch_size: "int | None" = None,
) -> List[Match]:
    """Run temporal alignment with progress.

    By default the WHOLE candidate list goes to ``localize_all`` in
    one call: the localizer buckets by padded shape, chunks to its HBM
    element budget, logs per-chunk progress, and lag-1-pipelines the
    chunks (each chunk's packed D2H pull overlaps the next chunk's
    device compute) — host-side slicing here would cap every call at
    one chunk and defeat the overlap. ``batch_size`` slices host-side
    anyway (legacy behavior, e.g. to bound host memory for the Match
    lists of enormous runs)."""
    logger.info("Temporal alignment over %d candidate pairs", len(candidates))
    if batch_size is None:
        return alignment.localize_all(candidates)
    matches: List[Match] = []
    done = 0
    while done < len(candidates):
        batch = candidates[done : done + batch_size]
        matches.extend(alignment.localize_all(batch))
        done += len(batch)
        logger.info(
            "%d/%d pairs aligned (%d predictions)",
            done, len(candidates), len(matches),
        )
    return matches


def write_stage_artifacts(
    output_path: str,
    candidates: List[CandidatePair],
    matches: Optional[List[Match]] = None,
) -> Tuple[str, Optional[str]]:
    """Persist the stage outputs (the resume points of the pipeline)."""
    os.makedirs(output_path, exist_ok=True)
    candidate_file = os.path.join(output_path, "candidates.csv")
    CandidatePair.write_csv(candidates, candidate_file)
    match_file = None
    if matches is not None:
        match_file = os.path.join(output_path, "matches.csv")
        Match.write_csv(matches, match_file)
    return candidate_file, match_file


def create_pr_plot(ap: AveragePrecision, filename: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ap.pr_curve.plot(linewidth=1)
    plt.savefig(filename)


def report_metrics(
    ground_truth: str,
    candidate_file: str,
    match_file: str,
    output_path: str,
    log: logging.Logger,
) -> None:
    """Score both stages against GT — candidate-level micro-AP and the
    matching-track segment AP — and render their PR curves. Artifact
    names (candidate_precision_recall.pdf / precision_recall.pdf) are
    kept from the reference driver so downstream tooling finds them
    (reference: vsc/baseline/sscd_baseline.py:211-231)."""
    gt = CandidatePair.from_matches(Match.read_csv(ground_truth, is_gt=True))
    cand_ap = average_precision(gt, CandidatePair.read_csv(candidate_file))
    log.info(f"Candidate micro-AP: {cand_ap.ap:.4f}")
    cand_pr = os.path.join(output_path, "candidate_precision_recall.pdf")
    create_pr_plot(cand_ap, cand_pr)

    matching = evaluate_matching_track(ground_truth, match_file)
    log.info(f"Matching-track segment AP: {matching.segment_ap.ap:.4f}")
    match_pr = os.path.join(output_path, "precision_recall.pdf")
    create_pr_plot(matching.segment_ap, match_pr)
    for label, path in (
        ("Candidates", candidate_file),
        ("Matches", match_file),
        ("Candidate PR plot", cand_pr),
        ("Match PR plot", match_pr),
    ):
        log.info(f"{label}: {path}")
