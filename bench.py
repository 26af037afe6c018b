#!/usr/bin/env python3
"""End-to-end retrieval benchmark: query videos/sec on the TPU search
core versus a CPU numpy brute-force baseline (the reference's CPU FAISS
role; BASELINE.md north star is >10× query-videos/sec).

Workload (synthetic, fixed seed): score-normalized retrieval exactly as
the SSCD pipeline runs it — noise-NN score normalization (k=1 over the
noise corpus) + global top-k frame search (k = 1200·|Q|) + per-pair
max aggregation. The timed TPU pass excludes compilation (one warmup);
the CPU baseline runs the same exact computation with numpy.

Prints ONE JSON line:
  {"metric": "query_videos_per_sec", "value": ..., "unit": "videos/s",
   "vs_baseline": <TPU qps / CPU qps>}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Workload scale: ~60-frame videos, SSCD-like 512-d descriptors.
# (Fixed across rounds — the driver tracks this number over time.)
N_QUERY_VIDEOS = 150
N_REF_VIDEOS = 1000
N_NOISE_FRAMES = 30_000
FRAMES = 60
DIM = 512
GLOBAL_K = 1200 * N_QUERY_VIDEOS


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_data(rng):
    q = l2n(rng.standard_normal((N_QUERY_VIDEOS * FRAMES, DIM), dtype=np.float32))
    r = l2n(rng.standard_normal((N_REF_VIDEOS * FRAMES, DIM), dtype=np.float32))
    noise = l2n(rng.standard_normal((N_NOISE_FRAMES, DIM), dtype=np.float32))
    # Plant copies so the score distribution has realistic structure.
    for i in range(0, N_QUERY_VIDEOS, 4):
        q[i * FRAMES + 10 : i * FRAMES + 30] = r[i * FRAMES + 5 : i * FRAMES + 25]
    return q, r, noise


def tpu_build(r, noise):
    """One-time index staging (the FAISS index-build analog)."""
    from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

    return ScoreNormalizedSearcher(r, noise, beta=1.2, precision="default")


def tpu_pipeline(q, searcher):
    """Query-side work: fused device-resident score-norm + global top-k."""
    return searcher.global_topk(q, GLOBAL_K)


def cpu_pipeline(q, r, noise):
    """Identical computation, numpy on host CPU."""
    bias = np.empty(q.shape[0], dtype=np.float32)
    for start in range(0, q.shape[0], 1024):
        block = q[start : start + 1024]
        bias[start : start + 1024] = -1.2 * (block @ noise.T).max(axis=1)
    q_sn = np.concatenate([q, bias[:, None]], axis=1)
    r_sn = np.concatenate([r, np.ones((r.shape[0], 1), np.float32)], axis=1)

    k = GLOBAL_K
    # Row-blocked scoring with a global running top-k.
    top_s = np.empty(0, dtype=np.float32)
    top_q = np.empty(0, dtype=np.int64)
    top_r = np.empty(0, dtype=np.int64)
    for start in range(0, q_sn.shape[0], 1024):
        scores = q_sn[start : start + 1024] @ r_sn.T
        flat = scores.ravel()
        take = min(k, flat.size)
        part = np.argpartition(flat, flat.size - take)[-take:]
        qi, ri = np.unravel_index(part, scores.shape)
        top_s = np.concatenate([top_s, flat[part]])
        top_q = np.concatenate([top_q, qi + start])
        top_r = np.concatenate([top_r, ri])
        if top_s.size > k:
            sel = np.argpartition(top_s, top_s.size - k)[-k:]
            top_s, top_q, top_r = top_s[sel], top_q[sel], top_r[sel]
    order = np.lexsort((top_r, top_q, -top_s))
    return top_q[order], top_r[order], top_s[order]


def run_measurement():
    from vsc2022_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    q, r, noise = make_data(rng)

    # TPU: stage index once, warmup (compile), then best-of-5 timed
    # query runs (the host link adds run-to-run jitter).
    searcher = tpu_build(r, noise)
    tpu_pipeline(q, searcher)
    tpu_time = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        qi, ri, scores = tpu_pipeline(q, searcher)
        tpu_time = min(tpu_time, time.perf_counter() - t0)
    tpu_qps = N_QUERY_VIDEOS / tpu_time

    cpu_time = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        cqi, cri, cscores = cpu_pipeline(q, r, noise)
        cpu_time = min(cpu_time, time.perf_counter() - t0)
    cpu_qps = N_QUERY_VIDEOS / cpu_time

    # Sanity: both paths must retrieve (near-)identical result sets.
    agreement = len(
        set(zip(qi[:1000].tolist(), ri[:1000].tolist()))
        & set(zip(cqi[:1000].tolist(), cri[:1000].tolist()))
    ) / 1000.0
    assert agreement > 0.99, f"TPU/CPU search disagree: {agreement:.3f}"

    print(
        json.dumps(
            {
                "metric": "query_videos_per_sec",
                "value": round(tpu_qps, 2),
                "unit": "videos/s",
                "vs_baseline": round(tpu_qps / cpu_qps, 2),
            }
        )
    )


def main():
    """Run the measurement in a child process with a timeout + one
    retry: the TPU relay on this rig occasionally stalls a process
    outright, and a hung benchmark would leave no recorded result."""
    if "--_child" in sys.argv:
        run_measurement()
        return
    for attempt in range(2):
        try:
            result = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_child"],
                capture_output=True, text=True, timeout=480,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench attempt {attempt + 1} timed out; retrying",
                file=sys.stderr,
            )
            continue
        lines = [
            ln for ln in result.stdout.strip().splitlines()
            if ln.startswith("{")
        ]
        if result.returncode == 0 and lines:
            print(lines[-1])
            return
        print(result.stderr[-2000:], file=sys.stderr)
    raise SystemExit("bench failed after 2 attempts")


if __name__ == "__main__":
    main()
