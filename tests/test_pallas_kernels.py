"""Pallas kernel tests (interpreter mode on CPU) against dense oracles."""

import numpy as np

import jax.numpy as jnp

from vsc2022_tpu.ops.pallas_kernels import (
    COL_TILE,
    ROW_TILE,
    fused_count_above,
    fused_row_max,
)


class TestFusedRowMax:
    def test_matches_dense(self):
        rng = np.random.RandomState(0)
        q = rng.randn(ROW_TILE, 32).astype(np.float32)
        r = rng.randn(2 * COL_TILE, 32).astype(np.float32)
        got = np.asarray(
            fused_row_max(
                jnp.asarray(q), jnp.asarray(r),
                jnp.int32(r.shape[0] - 50), interpret=True,
            )
        )
        expect = (q @ r[:-50].T).max(axis=1)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


class TestFusedCountAbove:
    def test_matches_dense(self):
        rng = np.random.RandomState(1)
        q = rng.randint(-3, 4, size=(ROW_TILE, 16)).astype(np.float32)
        n_valid = 2 * COL_TILE - 100
        r = rng.randint(-3, 4, size=(2 * COL_TILE, 16)).astype(np.float32)
        tau = 5.0
        got = np.asarray(
            fused_count_above(
                jnp.asarray(q),
                jnp.asarray(r),
                jnp.float32(tau),
                jnp.int32(n_valid),
                interpret=True,
            )
        )
        expect = ((q @ r[:n_valid].T) >= tau).sum(axis=1)
        np.testing.assert_array_equal(got, expect)
