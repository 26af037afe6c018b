#!/usr/bin/env python3
"""DnS video indexing: re-encode raw L3-iMAC frame features through a
DnS student model.

Reference contract (reference: vsc/baseline/dns_index.py): per video,
``model.index_video(feature)`` re-encodes features; fine-grained
binarization students are stored as booleans (``> 0``), fine attention
students as fp16; coarse features optionally get β=1.2 score
normalization (without dim replacement). Output files are
``{queries,refs}_{network_name}[_sn].npz``.

Model loading differs from the reference (TorchScript) — students are
native Flax modules with weights from an npz checkpoint
(``--checkpoint_path``), selected by ``--student`` + ``--fg_type``.
"""

import argparse
import dataclasses
import logging
import os
from typing import List

import numpy as np

from vsc2022_tpu.metrics import Dataset
from vsc2022_tpu.models.dns import DnSStudent
from vsc2022_tpu.retrieval.score_norm import score_normalize
from vsc2022_tpu.storage import load_features, store_features
from vsc2022_tpu.types import VideoFeature

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

logging.basicConfig(
    format="%(asctime)s %(levelname)-8s %(message)s",
    level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("dns_index.py")
logger.setLevel(logging.INFO)


parser = argparse.ArgumentParser()
parser.add_argument(
    "--query_features", help="Path to query descriptors", type=str, required=True
)
parser.add_argument(
    "--ref_features", help="Path to reference descriptors", type=str, required=True
)
parser.add_argument(
    "--score_norm_features", help="Path to score normalization descriptors", type=str
)
parser.add_argument(
    "--output_path", help="The path to write indexed features.", type=str,
    required=True,
)
parser.add_argument(
    "--student", choices=["cg", "fg"], required=True,
    help="Student type used for indexing.",
)
parser.add_argument(
    "--fg_type", choices=["att", "bin"], default="att",
    help="Fine-grained student variant.",
)
parser.add_argument(
    "--checkpoint_path", type=str, default=None,
    help="npz variable tree for the student (random init if omitted).",
)


def index_videos(
    model: DnSStudent,
    features: List[VideoFeature],
) -> List[VideoFeature]:
    """(reference: vsc/baseline/dns_index.py:100-116)"""
    import tqdm

    indexed = []
    for video in tqdm.tqdm(features):
        feature = model.index_video(video.feature)
        if model.student_type == "fg":
            feature = feature > 0 if model.fg_type == "bin" else feature.astype(
                np.float16
            )
        indexed.append(dataclasses.replace(video, feature=feature))
    return indexed


def main(args):
    if args.student == "fg" and args.score_norm_features:
        raise Exception(
            f"Student type {args.student} can not be combined with score "
            "normalization."
        )
    params = None
    if args.checkpoint_path:
        from vsc2022_tpu.utils.checkpoint import load_variables

        params = load_variables(args.checkpoint_path)
    model = DnSStudent(
        args.student, args.fg_type if args.student == "fg" else None,
        params=params,
    )
    extension = model.get_network_name()

    logger.info(f"Loading query features from {args.query_features}")
    queries = load_features(args.query_features, Dataset.QUERIES)
    logger.info(f"{len(queries)} queries loaded")
    logger.info(f"Index query features based on {extension}")
    indexed_queries = index_videos(model, queries)

    logger.info(f"Loading ref features from {args.ref_features}")
    refs = load_features(args.ref_features, Dataset.REFS)
    logger.info(f"{len(refs)} refs loaded")
    logger.info(f"Index ref features based on {extension}")
    indexed_refs = index_videos(model, refs)

    if args.score_norm_features:
        logger.info(
            f"Loading features for score normalization from "
            f"{args.score_norm_features}"
        )
        sn_refs = load_features(args.score_norm_features, Dataset.REFS)
        logger.info(f"{len(sn_refs)} features loaded")
        logger.info(f"Index score normalization features based on {extension}")
        sn_refs = index_videos(model, sn_refs)
        indexed_queries, indexed_refs = score_normalize(
            indexed_queries,
            indexed_refs,
            sn_refs,
            replace_dim=False,
            beta=1.2,
        )
        extension += "_sn"

    os.makedirs(args.output_path, exist_ok=True)
    store_features(
        os.path.join(args.output_path, f"queries_{extension}.npz"), indexed_queries
    )
    store_features(
        os.path.join(args.output_path, f"refs_{extension}.npz"), indexed_refs
    )


if __name__ == "__main__":
    main(parser.parse_args())
