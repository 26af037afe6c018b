#!/usr/bin/env python3
"""Synthetic quality evaluation of the full matching pipeline.

The VSC2022 dataset is not distributable with this repo, so this tool
builds a controlled synthetic benchmark in descriptor space — planted
copies with realistic corruptions (additive noise, speed changes,
partial overlaps, multi-segment copies) — and runs the complete
pipeline (score normalization → global-k retrieval → TN localization →
metrics). It reports candidate µAP and matching segment AP, serving as
a quality regression harness for the retrieval + localization stack
(model quality is evaluated separately once real checkpoints/data are
available).

Usage:
  python tools/synthetic_eval.py [--queries 40] [--refs 120] [--dim 128]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsc2022_tpu.baseline.sscd_baseline import (  # noqa: E402
    localize_and_verify,
    search,
)
from vsc2022_tpu.metrics import (  # noqa: E402
    CandidatePair,
    Match,
    average_precision,
    match_metric,
)
from vsc2022_tpu.retrieval.score_norm import score_normalize  # noqa: E402
from vsc2022_tpu.types import VideoFeature  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--queries", type=int, default=40)
parser.add_argument("--refs", type=int, default=120)
parser.add_argument("--noise_videos", type=int, default=30)
parser.add_argument("--dim", type=int, default=128)
parser.add_argument("--positive_fraction", type=float, default=0.5)
parser.add_argument("--feature_noise", type=float, default=0.2)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument(
    "--dns", action="store_true",
    help="Also evaluate the DnS-style pipeline: region features, fused "
    "fine+coarse chamfer localization.",
)


def l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def build_benchmark(args):
    """Queries copy ref segments under per-query corruptions."""
    rng = np.random.RandomState(args.seed)
    d = args.dim

    def interval_ts(n):
        # Production-style per-frame [start, end] spans (1 fps), like
        # the inference pipeline emits.
        t = np.arange(n, dtype=np.float64)
        return np.stack([t, t + 1.0], axis=1)

    def video(vid, n):
        return VideoFeature(
            video_id=vid,  # pre-formatted challenge-style id string
            timestamps=interval_ts(n),
            feature=l2n(rng.normal(size=(n, d))).astype(np.float32),
        )

    refs = [video(f"R{i:06d}", int(rng.randint(40, 120))) for i in range(args.refs)]
    noise = [
        video(f"R{10_000 + i:06d}", int(rng.randint(30, 80)))
        for i in range(args.noise_videos)
    ]

    queries, gt = [], []
    n_pos = int(args.positive_fraction * args.queries)
    for qi in range(args.queries):
        n = int(rng.randint(40, 100))
        feat = l2n(rng.normal(size=(n, d))).astype(np.float32)
        if qi < n_pos:
            ref = refs[qi % len(refs)]
            speed = rng.choice([0.5, 1.0, 1.0, 1.5, 2.0])
            copy_len = int(rng.randint(8, min(24, n - 4)))
            q_start = int(rng.randint(0, n - copy_len))
            max_r_start = len(ref) - int(copy_len * speed) - 1
            if max_r_start <= 0:
                speed, max_r_start = 1.0, len(ref) - copy_len - 1
            r_start = int(rng.randint(0, max(max_r_start, 1)))
            for t in range(copy_len):
                src = r_start + int(round(speed * t))
                noisy = ref.feature[src] + args.feature_noise * rng.normal(
                    size=d
                ).astype(np.float32)
                feat[q_start + t] = noisy / np.linalg.norm(noisy)
            gt.append(
                Match(
                    query_id=f"Q{qi:06d}",
                    ref_id=ref.video_id,
                    score=1.0,
                    query_start=float(q_start),
                    query_end=float(q_start + copy_len),
                    ref_start=float(r_start),
                    ref_end=float(r_start + int(round(speed * copy_len))),
                )
            )
        queries.append(
            VideoFeature(
                video_id=f"Q{qi:06d}",
                timestamps=interval_ts(n),
                feature=feat,
            )
        )
    return queries, refs, noise, gt


def main(args):
    queries, refs, noise, gt = build_benchmark(args)
    gt_pairs = CandidatePair.from_matches(gt)

    sn_q, sn_r = score_normalize(queries, refs, noise, beta=1.2)
    candidates = search(sn_q, sn_r)
    uap = average_precision(gt_pairs, candidates)

    matches = localize_and_verify(sn_q, sn_r, candidates, score_normalization=True)
    seg = match_metric(gt, matches)

    report = {
        "candidate_uap": round(uap.ap, 4),
        "segment_ap": round(seg.ap, 4),
        "num_gt": len(gt),
        "num_candidates": len(candidates),
        "num_matches": len(matches),
    }

    if args.dns:
        report["dns_segment_ap"] = round(run_dns_variant(args), 4)

    print(json.dumps(report))


def run_dns_variant(args):
    """DnS-style pipeline on synthetic region features: coarse retrieval
    (score-normed mean-pooled regions) + fused fine+coarse chamfer
    localization (baseline/dns_baseline.DnSLocalization)."""
    import dataclasses

    from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
    from vsc2022_tpu.models.dns import NUM_REGIONS

    queries, refs, noise, gt = build_benchmark(args)
    rng = np.random.RandomState(args.seed + 99)
    d_region = 64

    def to_regions(vf):
        # Derive per-region features: the frame descriptor (truncated)
        # plus per-region jitter, unit-normalized — copies stay copies.
        base = vf.feature[:, :d_region][:, None, :]
        jitter = 0.05 * rng.normal(
            size=(vf.feature.shape[0], NUM_REGIONS, d_region)
        ).astype(np.float32)
        regions = base + jitter
        regions /= np.linalg.norm(regions, axis=-1, keepdims=True)
        return regions

    def coarse_of(regions):
        pooled = regions.mean(axis=1)
        return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    q_regions = {q.video_id: to_regions(q) for q in queries}
    r_regions = {r.video_id: to_regions(r) for r in refs}
    queries_fine = {
        vid: dataclasses.replace(
            next(q for q in queries if q.video_id == vid),
            feature=reg.reshape(reg.shape[0], -1),
        )
        for vid, reg in q_regions.items()
    }
    refs_fine = {
        vid: dataclasses.replace(
            next(r for r in refs if r.video_id == vid),
            feature=reg.reshape(reg.shape[0], -1),
        )
        for vid, reg in r_regions.items()
    }
    queries_coarse = [
        dataclasses.replace(q, feature=coarse_of(q_regions[q.video_id]))
        for q in queries
    ]
    refs_coarse = [
        dataclasses.replace(r, feature=coarse_of(r_regions[r.video_id]))
        for r in refs
    ]
    noise_coarse = [
        dataclasses.replace(n, feature=coarse_of(to_regions(n))) for n in noise
    ]

    sn_q, sn_r = score_normalize(
        queries_coarse, refs_coarse, noise_coarse, replace_dim=False, beta=1.2
    )
    candidates = search(sn_q, sn_r)[: len(queries) * 5]
    loc = DnSLocalization(
        queries_fine, refs_fine, sn_q, sn_r,
        model_type="TN", fg_type="att", tn_max_step=5, min_length=4,
        similarity_bias=0.5,
    )
    matches = loc.localize_all(candidates)
    return match_metric(gt, matches).ap


if __name__ == "__main__":
    main(parser.parse_args())
