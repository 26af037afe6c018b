#!/usr/bin/env python3
"""Synthetic quality evaluation of the full matching pipeline.

The VSC2022 dataset is not distributable with this repo, so this tool
builds a controlled synthetic benchmark in descriptor space — planted
copies with realistic corruptions — and runs the complete pipeline
(score normalization → global-k retrieval → TN localization → metrics).
It reports candidate µAP and matching segment AP, serving as a quality
regression harness for the retrieval + localization stack (model
quality is evaluated separately once real checkpoints/data are
available).

Corruption levels:
  * default: additive noise, speed changes (0.5–2×), partial overlaps,
    per-query random placement.
  * --hard additionally plants: segments truncated at video edges,
    repeated segments (one ref segment copied twice into one query),
    and near-duplicate reference videos (hard retrieval negatives).

Pipelines:
  * SSCD-style: --dim (default 128) descriptors, score-normalized.
  * --dino: 768-d descriptors evaluated on BOTH the raw path
    (L2-normalize + candidate-score localization, the reference's
    no-score-norm mode) and the score-normalized path.
  * --dns: region features, fused fine+coarse chamfer localization.

TN modes: --tn_mode tuned|vcsl|both — the tuned adaptive-sigma gate
(this framework's extension) vs the VCSL-faithful parity configuration
(TNParams.vcsl_faithful).

--sweep runs the {default,hard} × {tuned,vcsl} × {sscd,dino} grid and
prints a markdown table (the committed regression baseline lives at
docs/synthetic_results.md).

Usage:
  python tools/synthetic_eval.py [--queries 40] [--refs 120] [--sweep]
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
    "--tn_mode", choices=["tuned", "vcsl", "both"], default="tuned",
    help="TN gate: tuned adaptive-sigma (extension) or VCSL-faithful "
    "parity configuration.",
)
parser.add_argument(
    "--hard", action="store_true",
    help="Harsher corruptions: edge-truncated segments, repeated "
    "segments, near-duplicate refs.",
)
parser.add_argument(
    "--calibrated", action="store_true",
    help="Trained-embedding similarity statistics: a shared low-rank "
    "subspace in every descriptor makes the noise-NN bias realistic, "
    "so score normalization pushes the background below VCSL's "
    "absolute TN gate (the regime the faithful config was tuned for).",
)
parser.add_argument(
    "--dino", action="store_true",
    help="Also evaluate a DINO-style 768-d descriptor run (raw and "
    "score-normalized paths).",
)
parser.add_argument(
    "--dns", action="store_true",
    help="Also evaluate the DnS-style pipeline: region features, fused "
    "fine+coarse chamfer localization.",
)
parser.add_argument(
    "--sweep", action="store_true",
    help="Run the corruption × TN-mode × descriptor grid and print a "
    "markdown table.",
)
parser.add_argument(
    "--dtype", choices=["float32", "bfloat16", "int8"], default="float32",
    help="Retrieval staging dtype: bfloat16 stages corpus, queries and "
    "SN noise in bf16 through the real search pipeline (localization "
    "stays f32, as in the serving index).",
)
parser.add_argument(
    "--collection", choices=["auto", "stream", "pooled"], default="auto",
    help="Force the candidate-collection design (normally picked by "
    "corpus size at POOL_MIN_CORPUS).",
)
parser.add_argument(
    "--bf16_sweep", action="store_true",
    help="Quality validation grid for the bf16 staging decision: "
    "{default, hard, calibrated, hard+calibrated} corruptions × "
    "{float32, bfloat16} staging × {stream, pooled} collection × "
    "seeds, printing per-arm candidate µAP / segment AP and the "
    "bf16−f32 deltas against seed noise.",
)
parser.add_argument(
    "--bf16_sweep_seeds", type=int, default=3,
    help="Seeds per arm in --bf16_sweep.",
)
parser.add_argument(
    "--sweep_dtype", choices=["bfloat16", "int8"], default="bfloat16",
    help="The reduced staging dtype --bf16_sweep compares against "
    "float32 (int8 reruns the same decision grid for the SQ8 tier).",
)


def l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def build_benchmark(args, dim=None, hard=None, calibrated=None):
    """Queries copy ref segments under per-query corruptions.

    ``calibrated`` mixes a shared low-rank subspace into EVERY
    descriptor (queries, refs, noise), emulating trained-embedding
    statistics: unrelated frames correlate through the shared semantic
    subspace, so the noise-NN bias is large and score normalization
    pushes the background similarity well below zero — the regime
    VCSL's absolute min_sim=0.2 gate (over sims + 0.5 bias) was tuned
    for. Pure-random unit descriptors (the default) have a tiny
    noise-NN bias, leaving the post-norm background ABOVE the absolute
    gate — an unrepresentative regime for the faithful TN config (see
    docs/synthetic_results.md)."""
    rng = np.random.RandomState(args.seed)
    d = dim or args.dim
    hard = args.hard if hard is None else hard
    calibrated = (
        getattr(args, "calibrated", False) if calibrated is None
        else calibrated
    )
    if calibrated:
        shared_rank, shared_frac = 8, 0.5
        basis = np.linalg.qr(rng.normal(size=(d, shared_rank)))[0].T

    def draw(n):
        x = l2n(rng.normal(size=(n, d)))
        if calibrated:
            coords = l2n(rng.normal(size=(n, shared_rank)))
            x = (
                np.sqrt(shared_frac) * coords @ basis
                + np.sqrt(1.0 - shared_frac) * x
            )
            x = l2n(x)
        return x.astype(np.float32)

    def interval_ts(n):
        # Production-style per-frame [start, end] spans (1 fps), like
        # the inference pipeline emits.
        t = np.arange(n, dtype=np.float64)
        return np.stack([t, t + 1.0], axis=1)

    def video(vid, n):
        return VideoFeature(
            video_id=vid,  # pre-formatted challenge-style id string
            timestamps=interval_ts(n),
            feature=draw(n),
        )

    refs = [video(f"R{i:06d}", int(rng.randint(40, 120))) for i in range(args.refs)]
    if hard:
        # Near-duplicate refs: the last quarter are noisy copies of the
        # first quarter — hard negatives the retrieval stage must rank
        # below the true (GT) source.
        quarter = len(refs) // 4
        for i in range(quarter):
            src = refs[i]
            dup = src.feature + 0.25 * rng.normal(
                size=src.feature.shape
            ).astype(np.float32)
            j = len(refs) - quarter + i
            refs[j] = VideoFeature(
                video_id=refs[j].video_id,
                timestamps=src.timestamps,
                feature=l2n(dup).astype(np.float32),
            )
    noise = [
        video(f"R{10_000 + i:06d}", int(rng.randint(30, 80)))
        for i in range(args.noise_videos)
    ]

    queries, gt = [], []
    n_pos = int(args.positive_fraction * args.queries)

    def plant(feat, qi, ref, q_start, copy_len, speed):
        n = feat.shape[0]
        copy_len = min(copy_len, n - q_start)
        r_span = int(round(speed * copy_len))
        max_r_start = len(ref) - r_span - 1
        if max_r_start <= 0:
            speed, r_span = 1.0, copy_len
            max_r_start = len(ref) - copy_len - 1
        r_start = int(rng.randint(0, max(max_r_start, 1)))
        for t in range(copy_len):
            src = r_start + int(round(speed * t))
            noisy = ref.feature[src] + args.feature_noise * rng.normal(
                size=d
            ).astype(np.float32)
            feat[q_start + t] = noisy / np.linalg.norm(noisy)
        return Match(
            query_id=f"Q{qi:06d}",
            ref_id=ref.video_id,
            score=1.0,
            query_start=float(q_start),
            query_end=float(q_start + copy_len),
            ref_start=float(r_start),
            ref_end=float(r_start + r_span),
        )

    for qi in range(args.queries):
        n = int(rng.randint(40, 100))
        feat = draw(n)
        if qi < n_pos:
            ref = refs[qi % len(refs)]
            speed = float(rng.choice([0.5, 1.0, 1.0, 1.5, 2.0]))
            copy_len = int(rng.randint(8, min(24, n - 4)))
            if hard and qi % 3 == 0:
                # Segment truncated at a video edge.
                q_start = 0 if qi % 6 == 0 else n - copy_len
            else:
                q_start = int(rng.randint(0, n - copy_len))
            gt.append(plant(feat, qi, ref, q_start, copy_len, speed))
            if hard and qi % 4 == 0 and n - copy_len > 2 * copy_len + 8:
                # The same ref copied a second time into this query, in
                # a span disjoint from the first (an overlap would
                # overwrite the first plant's frames and invalidate its
                # GT row).
                for _ in range(20):
                    second_start = int(rng.randint(0, n - copy_len))
                    disjoint = (
                        second_start + copy_len <= q_start
                        or second_start >= q_start + copy_len
                    )
                    if disjoint:
                        gt.append(
                            plant(feat, qi, ref, second_start, copy_len, 1.0)
                        )
                        break
        queries.append(
            VideoFeature(
                video_id=f"Q{qi:06d}",
                timestamps=interval_ts(n),
                feature=feat,
            )
        )
    return queries, refs, noise, gt


def run_pipeline(
    queries, refs, noise, gt, score_norm=True, vcsl=False,
    dtype="float32", collection="auto",
):
    """Full matching pipeline → (candidate µAP, segment AP, counts).

    ``dtype`` is the retrieval STAGING dtype (corpus + queries + SN
    noise); localization similarity stays f32 either way, matching the
    serving index. ``collection`` forces the candidate-collection
    design (stream / pooled) via the same env hook the tests pin."""
    gt_pairs = CandidatePair.from_matches(gt)
    if score_norm:
        q, r = score_normalize(queries, refs, noise, beta=1.2, dtype=dtype)
    else:
        q, r = queries, refs
    prev = os.environ.get("VSC2022_TPU_COLLECTION")
    if collection != "auto":
        os.environ["VSC2022_TPU_COLLECTION"] = collection
    try:
        candidates = search(q, r, dtype=dtype)
    finally:
        if collection != "auto":
            if prev is None:
                os.environ.pop("VSC2022_TPU_COLLECTION", None)
            else:
                os.environ["VSC2022_TPU_COLLECTION"] = prev
    uap = average_precision(gt_pairs, candidates).ap
    matches = localize_and_verify(
        q, r, candidates, score_normalization=score_norm, vcsl_faithful=vcsl
    )
    seg = match_metric(gt, matches).ap
    return uap, seg, len(candidates), len(matches)


def main(args):
    if args.sweep:
        return run_sweep(args)
    if args.bf16_sweep:
        return run_bf16_sweep(args)

    queries, refs, noise, gt = build_benchmark(args)
    report = {"num_gt": len(gt)}
    modes = (
        ["tuned", "vcsl"] if args.tn_mode == "both" else [args.tn_mode]
    )
    for mode in modes:
        uap, seg, n_cand, n_match = run_pipeline(
            queries, refs, noise, gt, vcsl=(mode == "vcsl"),
            dtype=args.dtype, collection=args.collection,
        )
        tag = "" if len(modes) == 1 else f"_{mode}"
        report[f"candidate_uap{tag}"] = round(uap, 4)
        report[f"segment_ap{tag}"] = round(seg, 4)
        report[f"num_candidates{tag}"] = n_cand
        report[f"num_matches{tag}"] = n_match

    if args.dino:
        q768, r768, n768, gt768 = build_benchmark(args, dim=768)
        for sn in (False, True):
            uap, seg, _, _ = run_pipeline(
                q768, r768, n768, gt768, score_norm=sn,
                vcsl=(args.tn_mode == "vcsl"),
            )
            key = "dino_sn" if sn else "dino_raw"
            report[f"{key}_uap"] = round(uap, 4)
            report[f"{key}_segment_ap"] = round(seg, 4)

    if args.dns:
        report["dns_segment_ap"] = round(run_dns_variant(args)[0], 4)

    print(json.dumps(report))


def run_bf16_sweep(args):
    """The staging-dtype quality decision grid (see CLAUDE.md roadmap):
    does staging corpus/queries/SN-noise in the reduced dtype move
    candidate µAP or segment AP outside seed noise? Runs the real
    pipeline end to end per arm; collection design is forced both ways
    so the decision covers streaming AND pooled candidate collection.
    ``--sweep_dtype`` picks the arm (bfloat16 default — the round-4
    decision grid; int8 reruns the same grid for the SQ8 tier)."""
    import copy

    sd = args.sweep_dtype
    tag = {"bfloat16": "bf16", "int8": "int8"}[sd]
    regimes = [
        ("default", dict(hard=False, calibrated=False)),
        ("hard", dict(hard=True, calibrated=False)),
        ("calibrated", dict(hard=False, calibrated=True)),
        ("hard+calibrated", dict(hard=True, calibrated=True)),
    ]
    seeds = list(range(args.bf16_sweep_seeds))
    rows, deltas = [], {"uap": [], "seg": []}
    for regime, kw in regimes:
        for collection in ("stream", "pooled"):
            for seed in seeds:
                a = copy.copy(args)
                a.seed = seed
                queries, refs, noise, gt = build_benchmark(a, **kw)
                per_dtype = {}
                for dtype in ("float32", sd):
                    uap, seg, _, _ = run_pipeline(
                        queries, refs, noise, gt,
                        vcsl=(args.tn_mode == "vcsl"),
                        dtype=dtype, collection=collection,
                    )
                    per_dtype[dtype] = (uap, seg)
                    rows.append((
                        regime, collection, seed, dtype,
                        len(gt), round(uap, 4), round(seg, 4),
                    ))
                deltas["uap"].append(
                    per_dtype[sd][0] - per_dtype["float32"][0]
                )
                deltas["seg"].append(
                    per_dtype[sd][1] - per_dtype["float32"][1]
                )
    print("| corruptions | collection | seed | staging dtype | gt "
          "| candidate µAP | segment AP |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    # Seed-noise yardstick: spread of the f32 arms across seeds within
    # each (regime, collection) cell, vs the bf16−f32 paired deltas.
    f32_by_cell = {}
    for regime, collection, seed, dtype, _, uap, seg in rows:
        if dtype == "float32":
            f32_by_cell.setdefault((regime, collection), []).append(
                (uap, seg)
            )
    spreads_uap = [
        max(v[0] for v in vals) - min(v[0] for v in vals)
        for vals in f32_by_cell.values()
    ]
    spreads_seg = [
        max(v[1] for v in vals) - min(v[1] for v in vals)
        for vals in f32_by_cell.values()
    ]
    summary = {
        f"{tag}_minus_f32_uap_mean": round(
            float(np.mean(deltas["uap"])), 4
        ),
        f"{tag}_minus_f32_uap_max_abs": round(
            float(np.max(np.abs(deltas["uap"]))), 4
        ),
        f"{tag}_minus_f32_seg_mean": round(
            float(np.mean(deltas["seg"])), 4
        ),
        f"{tag}_minus_f32_seg_max_abs": round(
            float(np.max(np.abs(deltas["seg"]))), 4
        ),
        "f32_seed_spread_uap_mean": round(float(np.mean(spreads_uap)), 4),
        "f32_seed_spread_seg_mean": round(float(np.mean(spreads_seg)), 4),
    }
    summary[f"{tag}_within_seed_noise"] = bool(
        summary[f"{tag}_minus_f32_uap_max_abs"]
        <= max(summary["f32_seed_spread_uap_mean"], 0.01)
        and summary[f"{tag}_minus_f32_seg_max_abs"]
        <= max(summary["f32_seed_spread_seg_mean"], 0.01)
    )
    print(json.dumps(summary))
    return rows, summary


def run_sweep(args):
    """Corruption × TN-mode × descriptor grid, as a markdown table."""
    rows = []
    for hard in (False, True):
        for dim, label in ((args.dim, "sscd-like"), (768, "dino-like")):
            queries, refs, noise, gt = build_benchmark(
                args, dim=dim, hard=hard
            )
            for mode in ("tuned", "vcsl"):
                uap, seg, _, _ = run_pipeline(
                    queries, refs, noise, gt, vcsl=(mode == "vcsl")
                )
                rows.append((
                    "hard" if hard else "default", f"{label} ({dim}d)",
                    mode, len(gt), round(uap, 4), round(seg, 4),
                ))
    # Calibrated (trained-embedding-statistics) rows: the regime the
    # VCSL-faithful absolute gate was published for.
    for hard in (False, True):
        queries, refs, noise, gt = build_benchmark(
            args, hard=hard, calibrated=True
        )
        for mode in ("tuned", "vcsl"):
            uap, seg, _, _ = run_pipeline(
                queries, refs, noise, gt, vcsl=(mode == "vcsl")
            )
            rows.append((
                ("hard" if hard else "default") + "+calibrated",
                f"sscd-like ({args.dim}d)", mode, len(gt),
                round(uap, 4), round(seg, 4),
            ))
    for hard in (False, True):
        seg, n_gt = run_dns_variant(args, hard=hard)
        rows.append((
            "hard" if hard else "default", "dns regions (9×64d)",
            "tuned", n_gt, "—", round(seg, 4),
        ))
    print("| corruptions | descriptors | tn mode | gt | candidate µAP "
          "| segment AP |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    return rows


def run_dns_variant(args, hard=False):
    """DnS-style pipeline on synthetic region features: coarse retrieval
    (score-normed mean-pooled regions) + fused fine+coarse chamfer
    localization (baseline/dns_baseline.DnSLocalization). Returns
    (segment AP, num GT rows)."""
    import dataclasses

    from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
    from vsc2022_tpu.models.dns import NUM_REGIONS

    queries, refs, noise, gt = build_benchmark(args, hard=hard)
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
    return match_metric(gt, matches).ap, len(gt)


if __name__ == "__main__":
    main(parser.parse_args())
