#!/usr/bin/env python3
"""Descriptor-track evaluation CLI (same flags as the reference
descriptor_eval.py)."""

import argparse
import logging

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from vsc2022_tpu.descriptor_eval_lib import evaluate_descriptor_track
from vsc2022_tpu.metrics import CandidatePair

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("descriptor_eval.py")
logger.setLevel(logging.INFO)

parser = argparse.ArgumentParser()
parser.add_argument(
    "--query_features", help="Path to query descriptors", type=str, required=True
)
parser.add_argument(
    "--ref_features", help="Path to reference descriptors", type=str, required=True
)
parser.add_argument(
    "--ground_truth", help="Path to the ground truth (labels) CSV file.", type=str
)
parser.add_argument(
    "--candidates_output", help="Path to write the candidates CSV file.", type=str
)
parser.add_argument(
    "--sharded", action="store_true",
    help="Shard the reference corpus across all local devices.",
)
_dtype_group = parser.add_mutually_exclusive_group()
_dtype_group.add_argument(
    "--bf16", action="store_true",
    help="Search in bfloat16 (half the HBM/transfer, MXU-native "
    "matmuls; scores at bf16 resolution — benchmarked ~2x retrieval "
    "throughput, result-set agreement 1.0 on the bench workload).",
)
_dtype_group.add_argument(
    "--int8", action="store_true",
    help="Stage the reference corpus as SQ8-style per-row int8 "
    "(quarter the HBM/transfer of f32; search exact over the "
    "dequantized corpus, incl. tie-breaks).",
)


def main(args):
    protocol = None
    if args.sharded or args.bf16 or args.int8:
        from vsc2022_tpu.descriptor_eval_lib import DescriptorEvalProtocol
        from vsc2022_tpu.parallel import corpus_mesh

        protocol = DescriptorEvalProtocol(
            mesh=corpus_mesh() if args.sharded else None,
            dtype="bfloat16" if args.bf16
            else "int8" if args.int8 else "float32",
        )
    ap, candidates = evaluate_descriptor_track(
        args.query_features, args.ref_features, args.ground_truth,
        protocol=protocol,
    )
    if ap is not None:
        logger.info(f"Descriptor track micro-AP (uAP): {ap.ap:.4f}")
    if args.candidates_output:
        CandidatePair.write_csv(candidates, args.candidates_output)
        logger.info(f"Wrote candidates to {args.candidates_output}")


if __name__ == "__main__":
    main(parser.parse_args())
