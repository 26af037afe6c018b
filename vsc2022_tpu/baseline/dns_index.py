#!/usr/bin/env python3
"""DnS video indexing: re-encode raw L3-iMAC frame features through a
DnS student model.

Reference contract (reference: vsc/baseline/dns_index.py): per video,
``model.index_video(feature)`` re-encodes features; fine-grained
binarization students are stored as booleans (``> 0``), fine attention
students as fp16; coarse features optionally get β=1.2 score
normalization (without dim replacement). Output files are
``{queries,refs}_{network_name}[_sn].npz``.

Students are native Flax modules. Weights come from an npz checkpoint
(``--checkpoint_path``, selected by ``--student`` + ``--fg_type``) or —
the reference's invocation style — directly from a published student
TorchScript (``--torchscript_path``; converted on the fly, with
student_type/fg_type read from the module's metadata).
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
    "--student", choices=["cg", "fg"], default=None,
    help="Student type used for indexing (inferred from "
    "--torchscript_path metadata when omitted).",
)
parser.add_argument(
    "--fg_type", choices=["att", "bin"], default="att",
    help="Fine-grained student variant.",
)
parser.add_argument(
    "--checkpoint_path", type=str, default=None,
    help="npz variable tree for the student (random init if omitted).",
)
parser.add_argument(
    "--torchscript_path", type=str, default=None,
    help="Published DnS student TorchScript; converted on the fly "
    "(requires torch; the reference's invocation style — "
    "vsc/baseline/dns_index.py). student_type/fg_type are read from "
    "the module's metadata when present.",
)
parser.add_argument(
    "--accelerator", choices=["cpu", "tpu"], default="tpu",
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


def _build_student(args) -> DnSStudent:
    params = None
    if getattr(args, "torchscript_path", None):
        import torch

        from vsc2022_tpu.models.convert import dns_student_from_torch

        module = torch.jit.load(args.torchscript_path, map_location="cpu")
        # The published artifacts carry their own type metadata (the
        # reference reads it: vsc/baseline/dns_index.py:121-127); CLI
        # flags fill in when absent.
        args.student = getattr(module, "student_type", args.student)
        args.fg_type = getattr(module, "fg_type", args.fg_type)
        if args.student is None:
            raise Exception(
                "--student is required when the TorchScript module "
                "carries no student_type attribute"
            )
        from vsc2022_tpu.models.convert import normalize_state_keys

        state = normalize_state_keys({
            k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()
        })
        params = dns_student_from_torch(state, args.student, args.fg_type)
    elif args.student is None:
        raise Exception("Provide --student (or --torchscript_path)")
    elif args.checkpoint_path:
        from vsc2022_tpu.utils.checkpoint import load_variables

        params = load_variables(args.checkpoint_path)
    fg_type = args.fg_type if args.student == "fg" else None
    return DnSStudent(args.student, fg_type, params=params)


def _load_and_reencode(
    model: DnSStudent, path: str, dataset: Dataset, role: str
) -> List[VideoFeature]:
    logger.info(f"Re-encoding {role} ({path}) through {model.get_network_name()}")
    videos = load_features(path, dataset)
    logger.info(f"  {len(videos)} {role} videos")
    return index_videos(model, videos)


def main(args):
    if getattr(args, "accelerator", "tpu") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    model = _build_student(args)
    if model.student_type == "fg" and args.score_norm_features:
        raise Exception(
            "Fine-grained student output feeds the localizer directly; "
            "score normalization only applies to the coarse (cg) student."
        )

    out_queries = _load_and_reencode(
        model, args.query_features, Dataset.QUERIES, "queries"
    )
    out_refs = _load_and_reencode(model, args.ref_features, Dataset.REFS, "refs")

    suffix = model.get_network_name()
    if args.score_norm_features:
        noise = _load_and_reencode(
            model, args.score_norm_features, Dataset.REFS, "score-norm refs"
        )
        out_queries, out_refs = score_normalize(
            out_queries, out_refs, noise, replace_dim=False, beta=1.2
        )
        suffix += "_sn"

    os.makedirs(args.output_path, exist_ok=True)
    for name, videos in (("queries", out_queries), ("refs", out_refs)):
        target = os.path.join(args.output_path, f"{name}_{suffix}.npz")
        store_features(target, videos)
        logger.info(f"Wrote {target}")


if __name__ == "__main__":
    main(parser.parse_args())
