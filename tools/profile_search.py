#!/usr/bin/env python3
"""Phase-level breakdown of the global-top-k search at corpus scale.

Times, in ONE process on the chip (relay timings vary ~2x across
processes; see CLAUDE.md), the individual device phases that make up
`global_topk` plus experimental collection variants, so collection
redesigns can be compared against the matmul floor:

    python tools/profile_search.py --corpus 1000000

Phases:
  matmul_floor   streamed matmul + scalar consume (the reachable XLA
                 floor: dot output is written to HBM and read once)
  collect_cur    the library's best-2-per-128 segment collection
  collect_vred   one-pass variadic-reduce best-2-per-128 (experimental)
  collect_b164   joint max/argmax best-1-per-64 (experimental)
  count_pass     the exact >=tau count pass (what count-verify costs)
  fused_now      the library's full fused candidate dispatch
  pull_s         D2H of the packed candidate buffer
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
parser.add_argument("--queries", type=int, default=9000)
parser.add_argument("--dim", type=int, default=512)
parser.add_argument("--kappa", type=int, default=64)
parser.add_argument("--col_block", type=int, default=8192)
parser.add_argument("--k_per_query", type=int, default=1200)
parser.add_argument("--query_videos", type=int, default=150)
parser.add_argument("--repeats", type=int, default=3)
parser.add_argument("--precision", default="default")
parser.add_argument("--skip", default="", help="comma list of phases to skip")
parser.add_argument(
    "--pool_tiles", default="",
    help="comma list of rowxcolxband Pallas pool-writer tilings to "
    "sweep, e.g. 512x1024x8,512x2048x4,1024x2048x4; prefix b for the "
    "banded writer with rowxcolxinner, e.g. b512x1024x4,b256x1024x8",
)
parser.add_argument("--cpu", action="store_true",
                    help="run on host CPU (logic shakeout only)")

NEG_INF = float("-inf")


def main(args):
    import functools

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        enable_compilation_cache()
    import jax.numpy as jnp

    from vsc2022_tpu.ops import similarity as S

    skip = set(args.skip.split(",")) if args.skip else set()

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return np.asarray(leaf.ravel()[:1])

    def timeit(label, fn, n=args.repeats):
        if label in skip:
            return None
        try:
            fn()  # warm (compile via persistent cache)
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — a failing arm (e.g.
            # a Pallas tile spec that OOMs scoped VMEM on real
            # hardware, or a relay stall surfacing mid-repeat) must not
            # abort the rest of the sweep.
            msg = str(exc).replace("\n", " ")[:180]
            print(f"  {label:14s}    FAILED: {msg}", flush=True)
            return None
        print(f"  {label:14s} {best * 1e3:9.1f} ms", flush=True)
        return best

    cb = args.col_block
    n_pad = -(-args.corpus // cb) * cb
    print(f"generating corpus [{n_pad}x{args.dim}] on device ...", flush=True)
    t0 = time.perf_counter()

    @functools.partial(jax.jit, static_argnames=("rows", "plant"))
    def gen(rows: int, plant: int = 0):
        x = jax.random.normal(
            jax.random.PRNGKey(rows), (rows, args.dim), jnp.float32
        )
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        if plant:
            # Mirror scale_bench: leading query rows copy corpus rows.
            return x
        row_ids = jnp.arange(rows)[:, None]
        return jnp.where(row_ids < args.corpus, x, 0.0)

    refs = gen(n_pad)
    q = gen(args.queries, plant=1)
    n_plant = min(args.queries // 15, args.corpus - 5000)
    if n_plant > 0:
        q = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(refs, 5000, n_plant), q[n_plant:]
        ])
    sync(refs)
    sync(q)
    print(f"  generated in {time.perf_counter() - t0:.1f} s", flush=True)

    n_valid = jnp.asarray(args.corpus, jnp.int32)
    ref_sq = jnp.zeros((n_pad,), jnp.float32)
    m = args.queries
    n_blocks = n_pad // cb
    prec = jax.lax.Precision(args.precision)
    kappa = args.kappa
    k_eff = args.k_per_query * args.query_videos

    # ---- matmul floor ---------------------------------------------------
    @jax.jit
    def matmul_floor(q, refs):
        def body(carry, bi):
            r_blk = jax.lax.dynamic_slice_in_dim(refs, bi * cb, cb, axis=0)
            s = jnp.dot(q, r_blk.T, precision=prec,
                        preferred_element_type=jnp.float32)
            return carry + jnp.max(s), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_blocks))
        return out

    timeit("matmul_floor", lambda: sync(matmul_floor(q, refs)))

    # ---- shared pool-merge machinery (mirrors the library) --------------
    def make_collect(seg_best_fn, pool_per_block):
        """seg_best_fn(s, start) -> (vals [m, p], ids [m, p])."""
        chunk_blocks = max(1, min(n_blocks, 4096 // pool_per_block))
        n_chunks = -(-n_blocks // chunk_blocks)
        block_ids = jnp.arange(n_chunks * chunk_blocks).reshape(
            n_chunks, chunk_blocks)

        @jax.jit
        def run(q, refs):
            def block_scores(bi):
                start = bi * cb
                r_blk = jax.lax.dynamic_slice_in_dim(refs, start, cb, axis=0)
                s = jnp.dot(q, r_blk.T, precision=prec,
                            preferred_element_type=jnp.float32)
                in_range = jax.lax.broadcasted_iota(
                    jnp.int32, (m, cb), 1) < (n_valid - start)
                return jnp.where(in_range, s, NEG_INF), start

            def collect_pool(chunkv):
                def inner(c, bi):
                    s, start = block_scores(bi)
                    return c, seg_best_fn(s, start)

                _, (ps, pi) = jax.lax.scan(inner, jnp.int32(0), chunkv)
                return (jnp.moveaxis(ps, 0, 1).reshape(m, -1),
                        jnp.moveaxis(pi, 0, 1).reshape(m, -1))

            if n_chunks == 1:
                ps, pi = collect_pool(block_ids[0])
                ts, sel = jax.lax.top_k(ps, kappa)
                return ts, jnp.take_along_axis(pi, sel, axis=1)

            def step(carry, chunkv):
                ts, ti = carry
                ps, pi = collect_pool(chunkv)
                ms = jnp.concatenate([ts, ps], axis=1)
                mi = jnp.concatenate([ti, pi], axis=1)
                ns, sel = jax.lax.top_k(ms, kappa)
                return (ns, jnp.take_along_axis(mi, sel, axis=1)), None

            init = (jnp.full((m, kappa), NEG_INF, jnp.float32),
                    jnp.zeros((m, kappa), jnp.int32))
            (ts, ti), _ = jax.lax.scan(step, init, block_ids)
            return ts, ti

        return run

    # ---- current library collection (best-2-per-128, 5 VPU passes) ------
    def seg_best2_cur(s, start):
        seg_lanes = 128
        seg = cb // seg_lanes
        s3 = s.reshape(m, seg, seg_lanes)
        m1 = jnp.max(s3, axis=2)
        a1 = jnp.argmax(s3, axis=2).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        s3b = jnp.where(lane == a1[:, :, None], NEG_INF, s3)
        m2 = jnp.max(s3b, axis=2)
        a2 = jnp.argmax(s3b, axis=2).astype(jnp.int32)
        seg_base = start + jnp.arange(seg, dtype=jnp.int32)[None, :] * seg_lanes
        return (jnp.concatenate([m1, m2], axis=1),
                jnp.concatenate([seg_base + a1, seg_base + a2], axis=1))

    collect_cur = make_collect(seg_best2_cur, 2 * (cb // 128))
    timeit("collect_cur", lambda: sync(collect_cur(q, refs)))

    # ---- variadic-reduce one-pass best-2-per-128 -------------------------
    def seg_best2_vred(s, start):
        seg_lanes = 128
        seg = cb // seg_lanes
        s3 = s.reshape(m, seg, seg_lanes)
        lane = start + jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2) + (
            jnp.arange(seg, dtype=jnp.int32)[None, :, None] * seg_lanes
        )

        def comb(acc, x):
            am1, aa1, am2, aa2 = acc
            bm1, ba1, bm2, ba2 = x
            a_first = am1 >= bm1
            m1 = jnp.where(a_first, am1, bm1)
            a1 = jnp.where(a_first, aa1, ba1)
            lo = jnp.where(a_first, bm1, am1)
            lo_i = jnp.where(a_first, ba1, aa1)
            asec = jnp.where(a_first, am2, bm2)
            asec_i = jnp.where(a_first, aa2, ba2)
            sec_hi = lo >= asec
            m2 = jnp.where(sec_hi, lo, asec)
            a2 = jnp.where(sec_hi, lo_i, asec_i)
            return m1, a1, m2, a2

        neg = jnp.full_like(s3, NEG_INF)
        zero = jnp.zeros_like(lane)
        m1, a1, m2, a2 = jax.lax.reduce(
            (s3, lane, neg, zero),
            (jnp.float32(NEG_INF), jnp.int32(0),
             jnp.float32(NEG_INF), jnp.int32(0)),
            comb, (2,),
        )
        return (jnp.concatenate([m1, m2], axis=1),
                jnp.concatenate([a1, a2], axis=1))

    collect_vred = make_collect(seg_best2_vred, 2 * (cb // 128))
    timeit("collect_vred", lambda: sync(collect_vred(q, refs)))

    # ---- joint max/argmax best-1-per-64 ----------------------------------
    def seg_best1_64(s, start):
        seg_lanes = 64
        seg = cb // seg_lanes
        s3 = s.reshape(m, seg, seg_lanes)
        v = jnp.max(s3, axis=2)
        a = jnp.argmax(s3, axis=2).astype(jnp.int32)
        seg_base = start + jnp.arange(seg, dtype=jnp.int32)[None, :] * seg_lanes
        return v, seg_base + a

    collect_b164 = make_collect(seg_best1_64, cb // 64)
    timeit("collect_b164", lambda: sync(collect_b164(q, refs)))

    # ---- count pass -------------------------------------------------------
    tau = jnp.float32(0.9)
    count_fn = jax.jit(functools.partial(
        S.streaming_count_above, col_block=cb, metric="IP",
        precision=args.precision))
    timeit("count_pass",
           lambda: sync(count_fn(q, refs, n_valid, ref_sq, tau)))

    # ---- library fused dispatch + D2H ------------------------------------
    def fused():
        return S._fused_candidates_packed(
            q, refs, n_valid, ref_sq,
            jnp.asarray(m, jnp.int32), jnp.asarray(k_eff, jnp.int32),
            kappa=kappa, col_block=cb,
            metric="IP", precision=args.precision, approx=True,
            row_block=m)

    timeit("fused_stream", lambda: sync(fused()[0]))

    def fused_pooled():
        return S._fused_candidates_packed(
            q, refs, n_valid, ref_sq,
            jnp.asarray(m, jnp.int32), jnp.asarray(k_eff, jnp.int32),
            kappa=kappa, col_block=cb,
            metric="IP", precision=args.precision, approx="pooled",
            row_block=m)

    timeit("fused_pooled", lambda: sync(fused_pooled()[0]))

    @functools.partial(jax.jit, static_argnames=("stage",))
    def pooled_stage(q, refs, stage):
        return S.pooled_candidates(
            q, refs, n_valid, ref_sq,
            jnp.asarray(m, jnp.int32), jnp.asarray(k_eff, jnp.int32),
            kappa=kappa, col_block=cb, metric="IP",
            precision=args.precision, row_block=m, debug_stage=stage)

    timeit("pooled:pool", lambda: sync(pooled_stage(q, refs, "pool")))
    timeit("pooled:tau", lambda: sync(pooled_stage(q, refs, "tau")))

    # Selection-contract sweep: coarser pool segments halve/quarter the
    # pool (cheaper k-th search + extraction; the per-element build
    # reduce is invariant) at the cost of more ambiguous rows (BOTH
    # slots >= tau in a segment -> a corpus count dispatch at repair).
    # Reports the full pooled phase time AND the repair pressure.
    for lanes in (128, 256, 512):
        if f"pooled_s{lanes}:full" in skip:
            continue  # the raw dispatch below is real device work

        @functools.partial(jax.jit, static_argnames=("stage", "lanes"))
        def pooled_lanes(q, refs, stage, lanes):
            return S.pooled_candidates(
                q, refs, n_valid, ref_sq,
                jnp.asarray(m, jnp.int32), jnp.asarray(k_eff, jnp.int32),
                kappa=kappa, col_block=cb, metric="IP",
                precision=args.precision, row_block=m,
                seg_lanes=lanes, debug_stage=stage)

        timeit(f"pooled_s{lanes}:pool",
               lambda f=pooled_lanes, L=lanes: sync(f(q, refs, "pool", L)))
        out = pooled_lanes(q, refs, "", lanes)
        timeit(f"pooled_s{lanes}:full",
               lambda f=pooled_lanes, L=lanes: sync(f(q, refs, "", L)))
        top_s, top_i, counts, tau_v, amb = (
            np.asarray(out[0]), np.asarray(out[1]), np.asarray(out[2]),
            float(out[3]), np.asarray(out[4]),
        )
        kept = ((top_s >= tau_v) & np.isfinite(top_s)).sum(axis=1)
        print(f"    s{lanes}: amb_rows={(amb > 0).sum()} "
              f"deficit_rows={(kept != counts).sum()} "
              f"pool_per_row={2 * (n_pad // lanes)}")

    # Same-process kernel-vs-XLA pool build (routing reads the env at
    # trace time; a distinct static tag forces a fresh trace).
    # Current routing is OPT-IN: "1" selects the v1 Pallas pool writer
    # on TPU, "band" the banded rewrite ("" and "0" both run the XLA
    # carry-scan).
    for flag, seg_flag, tag in (
        ("0", "vred", "xla"),
        ("0", "nat", "nat"),  # native max/argmax seg-top2, local ids
        ("1", "vred", "krn"),
        ("band", "vred", "bnd"),
    ):
        os.environ["VSC2022_TPU_POOL_PALLAS"] = flag
        os.environ["VSC2022_TPU_POOL_SEG"] = seg_flag

        @functools.partial(jax.jit, static_argnames=("stage", "tag"))
        def pooled_tagged(q, refs, stage, tag):
            return S.pooled_candidates(
                q, refs, n_valid, ref_sq,
                jnp.asarray(m, jnp.int32), jnp.asarray(k_eff, jnp.int32),
                kappa=kappa, col_block=cb, metric="IP",
                precision=args.precision, row_block=m, debug_stage=stage)

        timeit(f"pool_build[{tag}]",
               lambda f=pooled_tagged: sync(f(q, refs, "pool", tag)))
        timeit(f"pool_full[{tag}]",
               lambda f=pooled_tagged: sync(f(q, refs, "", tag)))
    os.environ.pop("VSC2022_TPU_POOL_PALLAS", None)
    os.environ.pop("VSC2022_TPU_POOL_SEG", None)

    # Pool-build variants: scan-carry dynamic_update_slice (library)
    # vs stacked-ys + transpose vs reduction-only (no pool write).
    seg = cb // 128
    ppb = 2 * seg

    def vred_block(s3, gid3):
        def comb(acc, x):
            am1, aa1, am2, aa2 = acc
            bm1, ba1, bm2, ba2 = x
            a_first = am1 >= bm1
            m1 = jnp.where(a_first, am1, bm1)
            a1 = jnp.where(a_first, aa1, ba1)
            lo = jnp.where(a_first, bm1, am1)
            lo_i = jnp.where(a_first, ba1, aa1)
            sec = jnp.where(a_first, am2, bm2)
            sec_i = jnp.where(a_first, aa2, ba2)
            t = lo >= sec
            return m1, a1, jnp.where(t, lo, sec), jnp.where(t, lo_i, sec_i)

        return jax.lax.reduce(
            (s3, gid3, jnp.full_like(s3, NEG_INF), jnp.zeros_like(gid3)),
            (jnp.float32(NEG_INF), jnp.int32(0),
             jnp.float32(NEG_INF), jnp.int32(0)),
            comb, (2,))

    def block_pool_parts(q, refs, bi):
        start = bi * cb
        r_blk = jax.lax.dynamic_slice_in_dim(refs, start, cb, axis=0)
        s = jnp.dot(q, r_blk.T, precision=prec,
                    preferred_element_type=jnp.float32)
        in_range = jax.lax.broadcasted_iota(
            jnp.int32, (m, cb), 1) < (n_valid - start)
        s = jnp.where(in_range, s, NEG_INF)
        s3 = s.reshape(m, seg, 128)
        gid3 = start + (
            jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1) * 128
            + jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2))
        m1, a1, m2, a2 = vred_block(s3, gid3)
        return (jnp.concatenate([m1, m2], axis=1),
                jnp.concatenate([a1, a2], axis=1))

    @jax.jit
    def pool_ys(q, refs):
        def body(c, bi):
            return c, block_pool_parts(q, refs, bi)

        _, (pv4, pi4) = jax.lax.scan(body, jnp.int32(0),
                                     jnp.arange(n_blocks))
        pv = jnp.moveaxis(pv4, 0, 1).reshape(m, -1)
        pi = jnp.moveaxis(pi4, 0, 1).reshape(m, -1)
        return jnp.sum(pv) + jnp.sum(pi).astype(jnp.float32)

    # Pallas pool-writer tiling sweep (per-grid-step overhead vs VMEM
    # pressure): builds the pool with each requested tiling.
    if args.pool_tiles:
        from vsc2022_tpu.ops import pallas_kernels as PK

        for spec in args.pool_tiles.split(","):
            # rowxcolxband sweeps pool_writer (v1); a leading "b"
            # (brtxctxinner, e.g. b512x1024x4) sweeps pool_writer_band
            # with that inner count (outer derives from 128 lanes).
            banded = spec.startswith("b")
            rt_, ct_, k3 = (int(x) for x in spec.lstrip("b").split("x"))
            ppt_ = 2 * (ct_ // 128)
            pad_unit = (
                max(1, 128 // (k3 * ppt_)) * k3 * ct_ if banded
                else k3 * ct_
            )
            m_pad = -(-m // rt_) * rt_
            n_kpad = -(-n_pad // pad_unit) * pad_unit
            qk = q if m_pad == m else jnp.pad(q, ((0, m_pad - m), (0, 0)))
            rk = refs if n_kpad == n_pad else jnp.pad(
                refs, ((0, n_kpad - n_pad), (0, 0)))

            @jax.jit
            def run_kernel(qk, rk, rt_=rt_, ct_=ct_, k3=k3, banded=banded):
                if banded:
                    pv, pi = PK.pool_writer_band(
                        qk, rk, n_valid, precision=args.precision,
                        row_tile=rt_, col_tile=ct_, inner=k3,
                    )
                else:
                    pv, pi = PK.pool_writer(
                        qk, rk, n_valid, precision=args.precision,
                        row_tile=rt_, col_tile=ct_, tiles_per_band=k3,
                    )
                return jnp.sum(pv) + jnp.sum(pi).astype(jnp.float32)

            # timeit itself catches warm/repeat failures (VMEM
            # overflow etc.) and reports through one FAILED path.
            timeit(f"pool_krn[{spec}]",
                   lambda f=run_kernel, a=qk, b=rk: sync(f(a, b)))

    timeit("pool_ys_transpose", lambda: sync(pool_ys(q, refs)))

    @jax.jit
    def pool_reduce_only(q, refs):
        def body(c, bi):
            pvb, pib = block_pool_parts(q, refs, bi)
            return c + jnp.sum(pvb) + jnp.sum(pib).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_blocks))
        return out

    timeit("pool_reduce_only", lambda: sync(pool_reduce_only(q, refs)))
    buf, pool_v, pool_i = fused_pooled()
    sync(buf)
    timeit("pull_packed", lambda: np.asarray(buf))

    # Repair-path probe on realistic flags from the pooled output,
    # using the library's structural flag rule.
    searcher = S.SimilaritySearcher.__new__(S.SimilaritySearcher)
    searcher.metric = "IP"
    searcher.col_block = cb
    searcher._refs = refs
    top_s, top_i, counts_p, tau_v, amb_p = S._unpack_candidates(
        np.asarray(buf), m, kappa, with_counts=True, with_amb=True)
    saturated = searcher._flag_deficient_rows(
        top_s, top_i, counts_p, tau_v, kappa, "pooled", amb_p)
    print(f"  tau={tau_v:.4f} flagged={saturated.size}", flush=True)
    if saturated.size and "repair" not in skip:
        searcher.n_refs = args.corpus
        searcher.precision = args.precision
        searcher.row_block = m
        searcher._n_valid = n_valid
        searcher._ref_sq = ref_sq

        kept_above = (
            (top_s[saturated] >= tau_v) & np.isfinite(top_s[saturated])
        ).sum(axis=1)

        def repair():
            return searcher._collect_repairs_pooled(
                (pool_v, pool_i), q, saturated, tau_v, kept_above,
                counts_p[saturated], amb_p[saturated])

        s_rep, _, _, repaired = repair()  # warm both dispatch shapes
        timeit("repair_pairs", repair)
        # Serial-pull arm: same dispatches with the async host copies
        # disabled — isolates the overlapped-drain win in-process.
        real_start = S._start_host_copy
        S._start_host_copy = lambda buf: None
        try:
            timeit("repair_pairs_serial_pull", repair)
        finally:
            S._start_host_copy = real_start
        print(f"  repair entries={s_rep.size} "
              f"truly_deficient={repaired.size}", flush=True)

    print(json.dumps({"corpus": args.corpus, "queries": m, "kappa": kappa}))


if __name__ == "__main__":
    main(parser.parse_args())
