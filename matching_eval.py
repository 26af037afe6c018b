#!/usr/bin/env python3
"""Matching-track evaluation CLI (same flags and output line as the
reference matching_eval.py)."""

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

parser = argparse.ArgumentParser()
parser.add_argument(
    "--predictions", help="Path to predictions CSV file.", type=str, required=True
)
parser.add_argument(
    "--ground_truth", help="Path to ground truth CSV file.", type=str, required=True
)


def main(args):
    metrics = evaluate_matching_track(args.ground_truth, args.predictions)
    logger.info(f"Matching track segment AP: {metrics.segment_ap.ap:.4f}")
    print(f"Matching track segment AP: {metrics.segment_ap.ap:.4f}")


if __name__ == "__main__":
    main(parser.parse_args())
