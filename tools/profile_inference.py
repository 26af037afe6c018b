#!/usr/bin/env python3
"""SSCD inference MFU probe: where do the non-MXU cycles go?

Times, in ONE process on the chip: the full forward at several
batch/dtype configs, the forward with BatchNorm removed (upper bound on
BN cost — at inference BN is an elementwise affine XLA should fuse),
and the preprocess alone. Prints fps + achieved TFLOP/s per config.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsc2022_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--hw", type=int, default=320)
parser.add_argument("--repeats", type=int, default=4)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batches", default="256,512")


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        enable_compilation_cache()
    import flax.linen as nn
    import jax.numpy as jnp

    from vsc2022_tpu.inference.transforms import (
        InferenceTransforms,
        preprocess,
    )
    from vsc2022_tpu.models import SSCDModel

    hw = args.hw
    model = SSCDModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32)
    )
    vars_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables,
    )

    def timeit(label, fn, frames):
        fn()
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        fps = frames / best
        print(f"  {label:34s} {best * 1e3:8.1f} ms  {fps:8.0f} fps",
              flush=True)
        return best

    rng = np.random.default_rng(1)
    for batch in [int(b) for b in args.batches.split(",")]:
        frames = jax.device_put(rng.integers(
            0, 256, size=(batch, hw, hw, 3), dtype=np.uint8))
        np.asarray(frames.ravel()[:1])
        print(f"-- batch {batch}")

        @jax.jit
        def embed_bf16(vars_, frames_u8):
            images = preprocess(
                frames_u8, InferenceTransforms.RESIZE_320_CENTER
            )
            return model.apply(vars_, images.astype(jnp.bfloat16)).astype(
                jnp.float32)

        timeit("full bf16", lambda: np.asarray(
            embed_bf16(vars_bf16, frames)), batch)

        @jax.jit
        def prep_only(frames_u8):
            images = preprocess(
                frames_u8, InferenceTransforms.RESIZE_320_CENTER
            )
            return jnp.sum(images.astype(jnp.bfloat16))

        timeit("preprocess only", lambda: np.asarray(
            prep_only(frames)), batch)

        # Forward from preheld bf16 images (no preprocess in the timed
        # graph): exposes whether preprocess serializes with the convs.
        # Separately-staged image buffers can exceed HBM at large
        # batches where the fused u8 path still fits (observed at
        # b1024/320²) — skip the decomposition arms there rather than
        # abort the sweep.
        try:
            images_bf16 = jax.jit(lambda f: preprocess(
                f, InferenceTransforms.RESIZE_320_CENTER
            ).astype(jnp.bfloat16))(frames)
            np.asarray(images_bf16.ravel()[:1].astype(jnp.float32))
        except Exception as exc:  # noqa: BLE001
            print(f"  (forward-only arms skipped: {str(exc)[:120]})")
            continue

        @jax.jit
        def fwd_only(vars_, images):
            return model.apply(vars_, images).astype(jnp.float32)

        timeit("forward only bf16", lambda: np.asarray(
            fwd_only(vars_bf16, images_bf16)), batch)

        # Space-to-depth stem (exact reparameterization — the MLPerf
        # ResNet TPU transform; models/fold.py s2d_stem): the 7×7/2
        # 3-channel stem conv becomes a VALID 4×4/1 12-channel conv
        # with 4× the contraction packing.
        from vsc2022_tpu.models.fold import s2d_stem

        s2d_model = SSCDModel(stem_s2d=True)
        s2d_vars = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            s2d_stem(variables),
        )

        @jax.jit
        def fwd_s2d(vars_, images):
            return s2d_model.apply(vars_, images).astype(jnp.float32)

        timeit("forward only bf16, s2d stem", lambda: np.asarray(
            fwd_s2d(s2d_vars, images_bf16)), batch)

        # BatchNorm stripped: same convs, GroupNorm-free affine-free
        # trunk (params reused where shapes allow is NOT the point —
        # this measures the op-level cost of the BN affines + stats).
        nobn = SSCDModel()
        import vsc2022_tpu.models.resnet as R

        class _Id(nn.Module):
            use_running_average: bool = True
            momentum: float = 0.9
            epsilon: float = 1e-5

            @nn.compact
            def __call__(self, x):
                return x

        orig = nn.BatchNorm
        R.nn.BatchNorm = _Id
        try:
            nobn_vars = nobn.init(
                jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
            nobn_bf16 = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, nobn_vars)

            @jax.jit
            def fwd_nobn(vars_, images):
                return nobn.apply(vars_, images).astype(jnp.float32)

            timeit("forward only bf16, no BN", lambda: np.asarray(
                fwd_nobn(nobn_bf16, images_bf16)), batch)
        finally:
            R.nn.BatchNorm = orig

        try:
            cost = fwd_only.lower(vars_bf16, images_bf16).compile(
            ).cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            gflop = cost["flops"] / batch / 1e9
            print(f"  flops/frame: {gflop:.2f} GF")
        except Exception as exc:  # noqa: BLE001
            print(f"  (no cost analysis: {exc})")


if __name__ == "__main__":
    main(parser.parse_args())
