#!/usr/bin/env python3
"""Matching-track evaluation CLI.

Scores a predicted-matches CSV against a ground-truth CSV with the
matching-track metric (segment AP over the rank-induced sequence of
matched-segment unions) and emits exactly one result line on stdout::

    Matching track segment AP: <ap>

The flag surface and that printed line are frozen to the reference CLI
(/root/reference/matching_eval.py) so downstream tooling can switch
frameworks without edits. The metric core lives in
vsc2022_tpu.metrics.evaluate_matching_track and is fuzz-pinned
1e-12-identical to the reference oracle, PR curves included
(tests/test_reference_parity.py).
"""
import argparse
import logging

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from vsc2022_tpu.metrics import evaluate_matching_track

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("matching_eval.py")
logger.setLevel(logging.INFO)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Matching-track evaluation")
    p.add_argument(
        "--predictions",
        type=str,
        required=True,
        help="predicted matches CSV (PairMatches row schema)",
    )
    p.add_argument(
        "--ground_truth",
        type=str,
        required=True,
        help="ground-truth matches CSV",
    )
    return p


def main(args: argparse.Namespace) -> None:
    track = evaluate_matching_track(args.ground_truth, args.predictions)
    line = f"Matching track segment AP: {track.segment_ap.ap:.4f}"
    logger.info(line)
    print(line)


if __name__ == "__main__":
    main(build_parser().parse_args())
