#!/usr/bin/env python3
"""Isolate the bf16-vs-f32 end-to-end retrieval gap (BENCH_r02 recorded
bf16 e2e SLOWER than f32, contradicting docs/performance.md): time each
stage — host cast, H2D staging, fused device dispatch, result pull —
for both dtypes at the bench workload shape, within ONE process."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402


def main():
    enable_compilation_cache()
    import jax

    from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

    def timeit(label, fn, n=5):
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:28s} {best * 1e3:9.1f} ms", flush=True)
        return best

    rng = np.random.default_rng(0)
    nq, nr, nn, d = 9000, 60000, 30000, 512
    l2n = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)  # noqa: E731
    q = l2n(rng.standard_normal((nq, d), dtype=np.float32))
    r = l2n(rng.standard_normal((nr, d), dtype=np.float32))
    noise = l2n(rng.standard_normal((nn, d), dtype=np.float32))
    k = 1200 * 150

    import ml_dtypes

    timeit("host cast f32->bf16", lambda: np.ascontiguousarray(
        q, dtype=ml_dtypes.bfloat16))
    q_bf16 = np.ascontiguousarray(q, dtype=ml_dtypes.bfloat16)
    timeit("device_put f32 (18MB)", lambda: np.asarray(
        jax.device_put(q).ravel()[:1]))
    timeit("device_put bf16 (9MB)", lambda: np.asarray(
        jax.device_put(q_bf16).ravel()[:1]))

    for dtype in ("float32", "bfloat16"):
        print(f"-- {dtype}")
        searcher = ScoreNormalizedSearcher(
            r, noise, beta=1.2, precision="default", dtype=dtype
        )
        searcher.global_topk(q, k)  # warm
        timeit(f"e2e host-in {dtype}", lambda: searcher.global_topk(q, k))
        q_dev = jax.device_put(q)
        np.asarray(q_dev.ravel()[:1])
        searcher.global_topk(q_dev, k)
        timeit(f"device-resident {dtype}",
               lambda: searcher.global_topk(q_dev, k))


if __name__ == "__main__":
    main()
