#!/usr/bin/env python3
"""IVF pruned-tier A/B at corpus scale: production vs block-pruned.

Times, in ONE process on the chip (relay timings vary ~2x across
processes; see CLAUDE.md), the production full-scan searcher against
the IVF pruned tier (ops/ivf.py) on a synthetic corpus with REAL
cluster structure (unit-norm rows around unit-norm centers — the shape
of SSCD-style embedding corpora; --isotropic for the adversarial
no-structure control), plus the IVF build cost (k-means + restage):

    python tools/profile_ivf.py --corpus 1000000

Workloads:
  batch    the descriptor-eval shape (9216 query rows over ~150
           videos): the probe UNION over a diverse batch can cover
           most blocks, in which case the tier falls back to the
           production path by design — measured, not assumed.
  focused  a serving-request shape (one ~64-frame query video): the
           union stays small and pruning pays.

Every IVF arm is checked for exact equality (ids AND scores,
tie-breaks included) against the production arm's results.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--corpus", type=int, default=1_000_000)
parser.add_argument("--dim", type=int, default=512)
parser.add_argument("--true_clusters", type=int, default=200)
parser.add_argument("--spread", type=float, default=0.35,
                    help="within-cluster noise scale (unit centers)")
parser.add_argument("--isotropic", action="store_true",
                    help="no cluster structure (adversarial control)")
parser.add_argument("--batch_queries", type=int, default=9216)
parser.add_argument("--batch_videos", type=int, default=150)
parser.add_argument("--focused_frames", type=int, default=64)
parser.add_argument("--k_per_video", type=int, default=1200)
parser.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"])
parser.add_argument("--col_block", type=int, default=8192)
parser.add_argument("--nlist", type=int, default=0, help="0 = default")
parser.add_argument("--nprobe", type=int, default=0, help="0 = default")
parser.add_argument("--repeats", type=int, default=3)
parser.add_argument("--skip_exact_check", action="store_true")
args = parser.parse_args()

enable_compilation_cache()

from vsc2022_tpu.ops.ivf import IVFSimilaritySearcher  # noqa: E402
from vsc2022_tpu.ops.similarity import SimilaritySearcher  # noqa: E402


def log(stage, **kv):
    print(json.dumps({"stage": stage, **kv}), flush=True)


def l2n(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)


rng = np.random.RandomState(7)
t0 = time.time()
if args.isotropic:
    corpus = l2n(rng.randn(args.corpus, args.dim).astype(np.float32))
    centers = None
else:
    centers = l2n(rng.randn(args.true_clusters, args.dim).astype(np.float32))
    assign = rng.randint(0, args.true_clusters, size=args.corpus)
    corpus = l2n(
        centers[assign]
        + args.spread * rng.randn(args.corpus, args.dim).astype(np.float32)
    )


def make_queries(n_rows, n_videos):
    """Query rows near corpus clusters (matched distribution)."""
    if centers is None:
        return l2n(rng.randn(n_rows, args.dim).astype(np.float32))
    vids = rng.randint(0, args.true_clusters, size=n_videos)
    per = np.repeat(vids, -(-n_rows // n_videos))[:n_rows]
    return l2n(
        centers[per]
        + args.spread * rng.randn(n_rows, args.dim).astype(np.float32)
    )


workloads = {
    "batch": (
        make_queries(args.batch_queries, args.batch_videos),
        args.k_per_video * args.batch_videos,
    ),
    "focused": (
        make_queries(args.focused_frames, 1),
        args.k_per_video,
    ),
}
log("data", corpus=args.corpus, dim=args.dim, gen_s=round(time.time() - t0, 1),
    isotropic=args.isotropic)


def timed_search(searcher, q, k, label):
    t = time.time()
    qi, ri, sc = searcher.global_topk(q, k)
    warm = time.time() - t
    times = []
    for _ in range(args.repeats):
        t = time.time()
        searcher.global_topk(q, k)
        times.append(time.time() - t)
    log(label, first_s=round(warm, 3), best_s=round(min(times), 3),
        mean_s=round(float(np.mean(times)), 3),
        stats=getattr(searcher, "last_search_stats", None))
    return qi, ri, sc


# ---- production arm ------------------------------------------------------
t = time.time()
prod = SimilaritySearcher(corpus, col_block=args.col_block, dtype=args.dtype)
prod.global_topk(workloads["focused"][0][:8], 4)  # stage + tiny warm
log("prod_stage", s=round(time.time() - t, 1))
prod_results = {}
for name, (q, k) in workloads.items():
    prod_results[name] = timed_search(prod, q, k, f"prod_{name}")
del prod  # free HBM before the IVF corpus stages

# ---- IVF arm --------------------------------------------------------------
t = time.time()
ivf = IVFSimilaritySearcher(
    corpus,
    nlist=args.nlist or None,
    nprobe=args.nprobe or None,
    col_block=args.col_block,
    dtype=args.dtype,
)
build_s = time.time() - t
t = time.time()
ivf.global_topk(workloads["focused"][0][:8], 4)
log("ivf_build", kmeans_and_perm_s=round(build_s, 1),
    stage_and_warm_s=round(time.time() - t, 1), nlist=ivf.nlist)
for name, (q, k) in workloads.items():
    qi, ri, sc = timed_search(ivf, q, k, f"ivf_{name}")
    if not args.skip_exact_check:
        pqi, pri, psc = prod_results[name]
        ok = (
            np.array_equal(qi, pqi)
            and np.array_equal(ri, pri)
            and np.array_equal(sc, psc)
        )
        log(f"exact_{name}", equal=bool(ok))
        if not ok:
            sys.exit(f"IVF != production on {name}: EXACTNESS BROKEN")
