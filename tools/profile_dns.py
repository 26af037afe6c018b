#!/usr/bin/env python3
"""DnS fused-localization decomposition on the bench workload.

Where does the 512-pair DnS alignment batch spend its time? Arms (all
device-compute figures use in-dispatch repetition differencing — the
body runs N times inside ONE executable with a data dependence, minus
the 1-repetition executable — so per-dispatch relay RPC and D2H cancel
and the numbers cannot swing on relay jitter; technique:
tools/profile_inference.py):

  wall_localize_all   full localize_all wall (sims + TN DP + host glue)
  sims_dispatch       the fused gather+chamfer+coarse dispatch
  chamfer_full        _chamfer_fuse on pre-gathered operands
  chamfer_matmul      the region-pair einsum alone (no reductions)
  …(each at --precision highest and default)

The decomposition tests the round-4 hypothesis: the [B, NQ, R, R, NR]
region-pair product (B=512 → 7.8 GB f32) is materialized to HBM and
re-read by the chamfer max/mean reduction passes, making the phase
HBM-bound rather than MXU-bound. (Reference hot loop being replaced:
vsc/baseline/dns_baseline.py:138-163 — TorchScript per pair.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_dns.py
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--videos", type=int, default=96)
parser.add_argument("--frames", type=int, default=60)
parser.add_argument("--pairs", type=int, default=512)
parser.add_argument("--d_fine", type=int, default=512)
parser.add_argument("--d_coarse", type=int, default=1024)
parser.add_argument("--reps", type=int, default=4)
parser.add_argument("--samples", type=int, default=3)
parser.add_argument("--cpu", action="store_true")


def l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def main(args):
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vsc2022_tpu.baseline.dns_baseline import (
        NUM_REGIONS,
        DnSLocalization,
        _chamfer_fuse,
    )
    from vsc2022_tpu.metrics import CandidatePair
    from vsc2022_tpu.types import VideoFeature

    rng = np.random.default_rng(3)
    R = NUM_REGIONS

    def make(prefix, n):
        fine, coarse = {}, []
        ts = np.stack(
            [np.arange(args.frames, dtype=np.float64),
             np.arange(1, args.frames + 1, dtype=np.float64)], axis=1
        )
        for i in range(n):
            f = l2n(rng.standard_normal(
                (args.frames * R, args.d_fine), dtype=np.float32
            )).reshape(args.frames, R * args.d_fine)
            c = l2n(rng.standard_normal(
                (args.frames, args.d_coarse), dtype=np.float32
            ))
            vid = f"{prefix}{i:06d}"
            fine[vid] = VideoFeature(video_id=vid, timestamps=ts, feature=f)
            coarse.append(
                VideoFeature(video_id=vid, timestamps=ts, feature=c)
            )
        return fine, coarse

    q_fine, q_coarse = make("Q", args.videos)
    r_fine, r_coarse = make("R", args.videos)
    loc = DnSLocalization(
        q_fine, r_fine, q_coarse, r_coarse,
        model_type="TN", fg_type="att", tn_max_step=5, min_length=4,
        similarity_bias=0.5,
    )
    pairs = [
        CandidatePair(
            query_id=f"Q{rng.integers(args.videos):06d}",
            ref_id=f"R{rng.integers(args.videos):06d}",
            score=1.0,
        )
        for _ in range(args.pairs)
    ]

    def report(name, seconds):
        per_pair = seconds / args.pairs
        print(f"  {name:28s} {seconds * 1e3:9.1f} ms"
              f"   ({args.pairs / max(seconds, 1e-9):8.1f} pairs/s)")
        return per_pair

    # ---- wall: the production call --------------------------------------
    loc.localize_all(pairs[:64])  # warm/compile + stage tables
    best = float("inf")
    for _ in range(args.samples):
        t0 = time.perf_counter()
        loc.localize_all(pairs)
        best = min(best, time.perf_counter() - t0)
    report("wall_localize_all", best)
    # (An early copy_to_host_async at dispatch time was A/B'd here
    # round 4: 114 vs 104 ms — no win. With async dispatch the host
    # reaches the blocking pull immediately, so a single pending
    # buffer has nothing to overlap; the overlapped drain only pays
    # off when MANY buffers pend, as in the search repair pass.)

    # ---- variance-cancelled dispatch decompositions ----------------------
    nq = nr = -(-args.frames // 64) * 64  # the bucket pad localize uses
    sims, q_len, r_len = loc._batch_sims(pairs, nq, nr)
    jax.block_until_ready(sims)

    qc_tab, qc_offs, rc_tab, rc_offs = loc._pair_tables()
    qf_tab, qf_offs, rf_tab, rf_offs = loc._fine_pair_tables()
    q_ids = [c.query_id for c in pairs]
    r_ids = [c.ref_id for c in pairs]
    qc_idx, _ = loc._indices_from(qc_offs, q_ids, nq)
    rc_idx, _ = loc._indices_from(rc_offs, r_ids, nr)
    qf_idx, _ = loc._indices_from(qf_offs, q_ids, nq)
    rf_idx, _ = loc._indices_from(rf_offs, r_ids, nr)
    dev = {
        "qc_idx": jnp.asarray(qc_idx), "rc_idx": jnp.asarray(rc_idx),
        "qf_idx": jnp.asarray(qf_idx), "rf_idx": jnp.asarray(rf_idx),
    }

    def timed_scan(fn, *operands, tag=""):
        """best-of in-dispatch differencing: scan fn n_rep times with a
        denormal-scale carry dependence; (t(reps) − t(1)) / (reps−1)."""

        @functools.partial(jax.jit, static_argnames=("n_rep",))
        def run(ops, n_rep):
            def body(carry, _):
                out = fn(carry, *ops)
                nxt = (out.ravel()[0].astype(jnp.float32) % 2.0) * 1e-38
                return nxt, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_rep)
            return c

        def t(n_rep):
            np.asarray(run(operands, n_rep))  # warm/compile
            best = float("inf")
            for _ in range(args.samples):
                t0 = time.perf_counter()
                np.asarray(run(operands, n_rep))
                best = min(best, time.perf_counter() - t0)
            return best

        return max((t(args.reps) - t(1)) / (args.reps - 1), 0.0)

    for precision in ("highest", "default"):
        prec = jax.lax.Precision(precision)

        def sims_body(carry, qc_t, rc_t, qf_t, rf_t, qci, rci, qfi, rfi):
            qc = jnp.take(qc_t, qci, axis=0)
            rc = jnp.take(rc_t, rci, axis=0).astype(jnp.float32)
            qf = jnp.take(qf_t.at[0, 0].add(carry), qfi, axis=0)
            rf = jnp.take(rf_t, rfi, axis=0).astype(jnp.float32)
            qf = qf.reshape(*qf.shape[:2], R, -1)
            rf = rf.reshape(*rf.shape[:2], R, -1)
            return _chamfer_fuse(
                qf, rf, qc, rc, jnp.float32(0.5), True, prec
            )

        s = timed_scan(
            sims_body, qc_tab, rc_tab, qf_tab, rf_tab,
            dev["qc_idx"], dev["rc_idx"], dev["qf_idx"], dev["rf_idx"],
        )
        report(f"sims_dispatch[{precision}]", s)

        # Pre-gathered operands: chamfer itself (gather cost excluded).
        qf_g = jnp.take(qf_tab, dev["qf_idx"], axis=0).reshape(
            args.pairs, nq, R, -1
        )
        rf_g = jnp.take(rf_tab, dev["rf_idx"], axis=0).reshape(
            args.pairs, nr, R, -1
        )
        qc_g = jnp.take(qc_tab, dev["qc_idx"], axis=0)
        rc_g = jnp.take(rc_tab, dev["rc_idx"], axis=0)
        jax.block_until_ready((qf_g, rf_g, qc_g, rc_g))

        def chamfer_body(carry, qf, rf, qc, rc):
            return _chamfer_fuse(
                qf.at[0, 0, 0, 0].add(carry), rf, qc, rc,
                jnp.float32(0.5), True, prec
            )

        s = timed_scan(chamfer_body, qf_g, rf_g, qc_g, rc_g)
        report(f"chamfer_full[{precision}]", s)

        def matmul_body(carry, qf, rf):
            b, nq_, r, d = qf.shape
            nr_ = rf.shape[1]
            p = jnp.einsum(
                "bmd,bnd->bmn",
                qf.at[0, 0, 0, 0].add(carry).reshape(b, nq_ * r, d),
                jnp.moveaxis(rf, 2, 1).reshape(b, r * nr_, d),
                precision=prec, preferred_element_type=jnp.float32,
            )
            # Cheap scalar consumer so the full product must compute
            # but no chamfer reduction structure follows.
            return jnp.sum(p, axis=(1, 2))

        s = timed_scan(matmul_body, qf_g, rf_g)
        report(f"chamfer_matmul[{precision}]", s)

        # Fused Pallas chamfer: the region-pair product never leaves
        # VMEM (ops/pallas_kernels.chamfer_fine_sims).
        from vsc2022_tpu.ops.pallas_kernels import chamfer_fine_sims

        def kernel_body(carry, qf, rf):
            return chamfer_fine_sims(
                qf.at[0, 0, 0, 0].add(carry), rf,
                symmetric=True, precision=precision,
                interpret=args.cpu,
            )

        try:
            s = timed_scan(kernel_body, qf_g, rf_g)
            report(f"chamfer_kernel[{precision}]", s)
        except Exception as exc:  # noqa: BLE001
            print(f"  chamfer_kernel[{precision}]    FAILED: "
                  f"{str(exc)[:160]}")

    flops = (
        args.pairs * (nq * R) * (nr * R) * args.d_fine * 2
        + args.pairs * nq * nr * args.d_coarse * 2
    )
    print(f"  pair-batch einsum FLOPs: {flops / 1e12:.3f} TFLOP "
          f"(pad {nq}; product tensor "
          f"{args.pairs * nq * nr * R * R * 4 / 1e9:.1f} GB f32)")


if __name__ == "__main__":
    main(parser.parse_args())
