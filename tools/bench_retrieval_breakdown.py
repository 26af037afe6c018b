#!/usr/bin/env python3
"""Stage-level timing of ScoreNormalizedSearcher.global_topk on the
EXACT bench.py retrieval workload (planted copies included) — run
in ONE process on the chip to see where the wall time goes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from vsc2022_tpu.ops import similarity as S
    from vsc2022_tpu.ops.similarity import _unpack_candidates
    from vsc2022_tpu.retrieval.sn_search import _fused_sn_candidates_packed

    rng = np.random.default_rng(0)
    q, r, noise = bench.make_data(rng)
    searcher = bench.tpu_build(r, noise)
    k = bench.GLOBAL_K

    searcher.global_topk(q, k)  # compile + warm
    q_dev = jax.device_put(q)
    jax.block_until_ready(q_dev)

    def t(label, fn, n=3):
        fn()
        best = float("inf")
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:28s} {best * 1e3:9.1f} ms", flush=True)
        return out

    t("global_topk e2e(dev q)", lambda: searcher.global_topk(q_dev, k))

    s = searcher.searcher
    ns = searcher.noise_searcher
    nq = q.shape[0]
    kappa_eff, k_eff = s._plan(nq, k, None)
    rb = s._plan_row_block(nq)
    qd = ns._stage_queries(q_dev, rb)
    mode = s._collection_mode(qd.shape[0], kappa_eff, True)
    print(f"  mode={mode} kappa={kappa_eff} rb={rb}", flush=True)

    def dispatch():
        packed, q_sn, pv, pi = _fused_sn_candidates_packed(
            qd, ns._refs, ns._n_valid, ns._ref_sq,
            s._refs, s._n_valid, s._ref_sq,
            jnp.asarray(nq, jnp.int32), jnp.asarray(k_eff, jnp.int32),
            beta=1.2, kappa=kappa_eff, noise_col_block=ns.col_block,
            col_block=s.col_block, precision=s.precision, approx=mode,
            row_block=rb,
        )
        return packed, q_sn, pv, pi

    packed, q_sn, pv, pi = dispatch()
    t("fused dispatch (sync scalar)", lambda: np.asarray(
        dispatch()[0][:1]))
    t("packed pull full", lambda: np.asarray(dispatch()[0]))

    buf = np.asarray(packed)
    all_s, all_i, counts, tau, amb = _unpack_candidates(
        buf, nq, kappa_eff, with_counts=True, with_amb=mode == "pooled")
    kept = ((all_s >= tau) & np.isfinite(all_s)).sum(axis=1)
    flagged = s._flag_deficient_rows(all_s, all_i, counts, tau,
                                     kappa_eff, mode, amb)
    print(f"  tau={tau:.4f} flagged={flagged.size} "
          f"count_minus_kept_max={int((counts - kept).max())} "
          f"deficit_rows={(counts != kept).sum()}", flush=True)
    if flagged.size:
        kept_fl = kept[flagged]
        exact = counts[flagged] if mode != "pooled" else None

        def repair():
            if mode == "pooled" and pv is not None:
                return s._collect_repairs_pooled(
                    (pv, pi), q_sn, flagged, tau, kept_fl,
                    counts[flagged], amb[flagged])
            return s._collect_repairs(q_sn, q_sn, flagged, tau, kept_fl,
                                      exact)

        out = t("repair", repair)
        print(f"  repaired_rows={out[3].size} entries={out[0].size}",
              flush=True)

    t("host finalize (full)", lambda: s._finalize_global_topk(
        all_s.copy(), all_i.copy(), None if counts is None else
        counts.copy(), tau, q_sn, q_sn, nq, kappa_eff, k_eff, mode, rb,
        amb=amb, pool=None if pv is None else (pv, pi)))


if __name__ == "__main__":
    main()
