"""Pallas kernel tests (interpreter mode on CPU) against dense oracles."""

import numpy as np
import pytest

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


class TestFusedTopK:
    def test_candidate_properties(self):
        from vsc2022_tpu.ops.pallas_kernels import fused_topk

        rng = np.random.RandomState(2)
        m, n, d, k = 24, 8192, 32, 16
        q = rng.randn(m, d).astype(np.float32)
        r = rng.randn(n, d).astype(np.float32)
        n_valid = n - 100
        dense = q @ r[:n_valid].T

        s, i = fused_topk(
            jnp.asarray(q), jnp.asarray(r), jnp.int32(n_valid), k,
            interpret=True,
        )
        s, i = np.asarray(s), np.asarray(i)

        finite = s > -np.inf
        # Every candidate is a real (row, col) entry with its true score,
        # never a padding column.
        assert (i[finite] < n_valid).all()
        for row in range(m):
            np.testing.assert_allclose(
                dense[row, i[row][finite[row]]], s[row][finite[row]],
                rtol=1e-4,
            )
        # The row maximum is exact, rows are sorted best-first, and
        # recall vs the exact top-k is high on random data (best-2 per
        # 128-lane segment per tile).
        np.testing.assert_allclose(s[:, 0], dense.max(axis=1), rtol=1e-5)
        for row in range(m):
            vals = s[row][finite[row]]
            assert (np.diff(vals) <= 1e-6).all()
        exact = np.argsort(-dense, axis=1)[:, :k]
        recall = np.mean(
            [len(set(i[r][finite[r]]) & set(exact[r])) / k for r in range(m)]
        )
        assert recall > 0.9

    def test_spikes_in_distinct_segments_are_exact(self):
        from vsc2022_tpu.ops.pallas_kernels import SEG_LANES, fused_topk

        rng = np.random.RandomState(3)
        m, n, d, k = 8, 2048, 16, 8
        q = np.zeros((m, d), np.float32)
        r = 0.01 * rng.randn(n, d).astype(np.float32)
        # Plant k spikes per query, each in its own 128-lane segment →
        # the collector must recover the exact top-k.
        expect_i = np.empty((m, k), dtype=np.int64)
        for row in range(m):
            q[row, row] = 1.0
            for spike in range(k):
                col = spike * 2 * SEG_LANES + row
                r[col] = 0.0
                r[col, row] = 1.0 + (k - spike)
                expect_i[row, spike] = col
        s, i = fused_topk(
            jnp.asarray(q), jnp.asarray(r), jnp.int32(n), k, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(i), expect_i)


class TestPallasRoutedGlobalTopK:
    def test_global_topk_stays_exact_via_count_verify(self, monkeypatch):
        from vsc2022_tpu.ops.similarity import SimilaritySearcher

        monkeypatch.setenv("VSC2022_TPU_USE_PALLAS", "interpret")
        rng = np.random.RandomState(4)
        # Distinct shapes from other tests: jit caches bake the routing
        # decision per shape at trace time.
        nq, n, d, k = 37, 3011, 24, 500
        q = rng.randn(nq, d).astype(np.float32)
        r = rng.randn(n, d).astype(np.float32)

        searcher = SimilaritySearcher(r, precision="highest")
        qi, ri, scores = searcher.global_topk(q, k)

        dense = q @ r.T
        flat = dense.ravel()
        order = np.lexsort(
            (np.arange(flat.size) % n, np.arange(flat.size) // n, -flat)
        )[:k]
        np.testing.assert_array_equal(qi, order // n)
        np.testing.assert_array_equal(ri, order % n)
        np.testing.assert_allclose(scores, flat[order], rtol=1e-6)


class TestPoolWriter:
    @pytest.mark.parametrize("variant", ["v1", "band"])
    def test_best2_per_segment_matches_oracle(self, variant):
        from vsc2022_tpu.ops.pallas_kernels import (
            POOL_COL_TILE,
            POOL_ROW_TILE,
            POOL_TILES_PER_BAND,
            SEG_LANES,
            pool_writer,
            pool_writer_band,
        )

        rng = np.random.RandomState(9)
        m, d = POOL_ROW_TILE, 16
        n = POOL_TILES_PER_BAND * POOL_COL_TILE  # one full output band
        n_valid = n - 137  # padding columns must never win
        q = rng.randn(m, d).astype(np.float32)
        r = rng.randn(n, d).astype(np.float32)
        # Exact ties inside one segment (planted copies do this):
        # best-2 must keep both tied copies.
        r[5] = r[7]
        q[3] = r[5] * 3.0
        writer = pool_writer if variant == "v1" else pool_writer_band
        pv, pi = writer(
            jnp.asarray(q), jnp.asarray(r), jnp.int32(n_valid),
            interpret=True,
        )
        pv, pi = np.asarray(pv), np.asarray(pi)
        scores = q @ r.T
        scores[:, n_valid:] = -np.inf
        n_seg = n // SEG_LANES
        ppt = 2 * (POOL_COL_TILE // SEG_LANES)
        for row in range(0, m, 97):
            for s in range(n_seg):
                seg_scores = scores[row, s * SEG_LANES : (s + 1) * SEG_LANES]
                top2 = np.sort(seg_scores)[::-1][:2]
                tile, seg_in_tile = divmod(s, POOL_COL_TILE // SEG_LANES)
                base = tile * ppt
                got = sorted(
                    [pv[row, base + seg_in_tile],
                     pv[row, base + ppt // 2 + seg_in_tile]],
                    reverse=True,
                )
                np.testing.assert_allclose(got, top2, rtol=1e-5, atol=1e-5)
        # Ids point at cells holding the reported values.
        mask = np.isfinite(pv)
        np.testing.assert_allclose(
            scores[np.arange(m)[:, None], np.where(mask, pi, 0)][mask],
            pv[mask], rtol=1e-5, atol=1e-5,
        )

    def test_band_writer_matches_v1_and_bf16(self):
        # The banded writer must reproduce v1's pool bit-for-bit
        # (same layout, same best-2 contract), in f32 and bf16, and
        # with an explicit inner override.
        from vsc2022_tpu.ops.pallas_kernels import (
            POOL_COL_TILE,
            POOL_ROW_TILE,
            POOL_TILES_PER_BAND,
            pool_writer,
            pool_writer_band,
        )

        rng = np.random.RandomState(10)
        m, d = POOL_ROW_TILE, 16
        n = POOL_TILES_PER_BAND * POOL_COL_TILE
        q = rng.randint(-3, 4, size=(m, d)).astype(np.float32)
        r = rng.randint(-3, 4, size=(n, d)).astype(np.float32)
        nv = jnp.int32(n - 519)
        v1 = pool_writer(jnp.asarray(q), jnp.asarray(r), nv, interpret=True)
        for kw in ({}, {"inner": 4}, {"precision": "default"}):
            band = pool_writer_band(
                jnp.asarray(q), jnp.asarray(r), nv, interpret=True, **kw
            )
            # bf16 ("default") matmuls of small ints are exact, so
            # values AND min-lane tie-break ids must agree everywhere.
            np.testing.assert_array_equal(
                np.asarray(v1[0]), np.asarray(band[0])
            )
            np.testing.assert_array_equal(
                np.asarray(v1[1]), np.asarray(band[1])
            )

    def test_band_writer_multi_band_matches_v1(self):
        # Two full output bands: the banded writer's j//outer block
        # map and in-band slot arithmetic must land every tile at the
        # same flat position v1 uses.
        from vsc2022_tpu.ops.pallas_kernels import (
            POOL_COL_TILE,
            POOL_ROW_TILE,
            POOL_TILES_PER_BAND,
            pool_writer,
            pool_writer_band,
        )

        rng = np.random.RandomState(12)
        m, d = POOL_ROW_TILE, 8
        n = 2 * POOL_TILES_PER_BAND * POOL_COL_TILE
        q = rng.randint(-2, 3, size=(m, d)).astype(np.float32)
        r = rng.randint(-2, 3, size=(n, d)).astype(np.float32)
        nv = jnp.int32(n - 999)
        v1 = pool_writer(jnp.asarray(q), jnp.asarray(r), nv, interpret=True)
        band = pool_writer_band(
            jnp.asarray(q), jnp.asarray(r), nv, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(v1[0]), np.asarray(band[0]))
        np.testing.assert_array_equal(np.asarray(v1[1]), np.asarray(band[1]))

    @pytest.mark.parametrize(
        "flag", ["interpret", "interpret_band"]
    )
    def test_pooled_route_global_topk_exact(self, monkeypatch, flag):
        from vsc2022_tpu.ops.similarity import SimilaritySearcher

        monkeypatch.setenv("VSC2022_TPU_POOL_PALLAS", flag)
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        rng = np.random.RandomState(6)
        # κ=32 over 8192 rows sits exactly at the 4κ ≤ p_total pool
        # feasibility bound — smaller corpora (or the default κ=64 at
        # this k) silently fall back to streaming and stop covering
        # the kernel-built pool end-to-end.
        nq, n, d, k = 23, 8192, 24, 700
        q = rng.randint(-3, 4, size=(nq, d)).astype(np.float32)
        r = rng.randint(-3, 4, size=(n, d)).astype(np.float32)
        searcher = SimilaritySearcher(r, precision="highest")
        assert searcher._collection_mode(24, 32, True) == "pooled"
        qi, ri, s = searcher.global_topk(q, k, kappa=32)
        dense = q.astype(np.float64) @ r.astype(np.float64).T
        order = np.lexsort((
            np.tile(np.arange(n), nq), np.repeat(np.arange(nq), n),
            -dense.ravel(),
        ))[:k]
        oqi, ori = np.unravel_index(order, dense.shape)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)


class TestChamferKernel:
    """The fused DnS chamfer (chamfer_fine_sims) must reproduce the
    XLA einsum formulation exactly — pre-rescale values, zero-pad
    frames included — across bucket shapes and symmetry modes."""

    @staticmethod
    def _xla_fg(qf, rf, symmetric):
        b, nq, r, d = qf.shape
        nr = rf.shape[1]
        p = np.einsum(
            "bqad,bncd->bqacn", qf, rf, dtype=np.float32
        )  # [B, NQ, a, c, NR]
        fg = p.max(axis=3).mean(axis=2)
        if symmetric:
            fg = (fg + p.max(axis=2).mean(axis=2)) / 2.0
        return fg

    @pytest.mark.parametrize(
        "nq,nr,symmetric",
        [(64, 64, True), (32, 128, True), (128, 32, False), (32, 32, True)],
    )
    def test_matches_xla_formulation(self, nq, nr, symmetric):
        from vsc2022_tpu.ops.pallas_kernels import chamfer_fine_sims

        rng = np.random.RandomState(17)
        b, r, d = 3, 9, 32
        qf = rng.randn(b, nq, r, d).astype(np.float32)
        rf = rng.randn(b, nr, r, d).astype(np.float32)
        # Zero-pad frames, as the table gather produces for rows
        # beyond a video's length.
        qf[:, nq - 5:] = 0.0
        rf[:, nr - 3:] = 0.0
        got = np.asarray(chamfer_fine_sims(
            jnp.asarray(qf), jnp.asarray(rf),
            symmetric=symmetric, precision="highest", interpret=True,
        ))
        np.testing.assert_allclose(
            got, self._xla_fg(qf, rf, symmetric), rtol=1e-5, atol=1e-5
        )

    def test_routed_fuse_equals_einsum(self, monkeypatch):
        # The env-routed _chamfer_fuse (kernel) must equal the einsum
        # path through the full fuse (rescale + coarse + sqrt).
        import jax

        from vsc2022_tpu.baseline.dns_baseline import _chamfer_fuse

        rng = np.random.RandomState(23)
        b, nq, nr, r, d, dc = 2, 32, 64, 9, 16, 24
        qf = jnp.asarray(rng.randn(b, nq, r, d).astype(np.float32))
        rf = jnp.asarray(rng.randn(b, nr, r, d).astype(np.float32))
        qc = jnp.asarray(rng.randn(b, nq, dc).astype(np.float32))
        rc = jnp.asarray(rng.randn(b, nr, dc).astype(np.float32))
        bias = jnp.float32(0.5)
        prec = jax.lax.Precision("highest")
        expect = np.asarray(
            _chamfer_fuse(qf, rf, qc, rc, bias, True, prec)
        )
        monkeypatch.setenv("VSC2022_TPU_CHAMFER_PALLAS", "interpret")
        got = np.asarray(_chamfer_fuse(qf, rf, qc, rc, bias, True, prec))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
