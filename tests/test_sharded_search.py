"""Sharded search must agree exactly with the single-device searcher
(8 virtual CPU devices; SURVEY.md §4 multi-device test strategy)."""

import numpy as np
import pytest

import jax

from vsc2022_tpu.ops.similarity import SimilaritySearcher
from vsc2022_tpu.parallel import ShardedSimilaritySearcher, corpus_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return corpus_mesh(8)


class TestShardedSearch:
    @pytest.mark.parametrize("metric", ["IP", "L2"])
    def test_matches_single_device(self, mesh, metric):
        rng = np.random.RandomState(0)
        q = rng.randint(-3, 4, size=(23, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(533, 16)).astype(np.float32)
        single = SimilaritySearcher(r, metric=metric)
        sharded = ShardedSimilaritySearcher(r, mesh, metric=metric)
        for k in [1, 50, 700]:
            sq, sr, ss = single.global_topk(q, k)
            hq, hr, hs = sharded.global_topk(q, k)
            np.testing.assert_array_equal(hq, sq)
            np.testing.assert_array_equal(hr, sr)
            np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_row_topk_matches(self, mesh):
        rng = np.random.RandomState(1)
        q = rng.randint(-3, 4, size=(11, 8)).astype(np.float32)
        r = rng.randint(-3, 4, size=(301, 8)).astype(np.float32)
        single = SimilaritySearcher(r)
        sharded = ShardedSimilaritySearcher(r, mesh)
        ss, si = single.row_topk(q, 7)
        hs, hi = sharded.row_topk(q, 7)
        np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_saturation_fallback_sharded(self, mesh):
        rng = np.random.RandomState(2)
        q = rng.randint(-2, 3, size=(8, 16)).astype(np.float32)
        r = rng.randint(-2, 3, size=(1024, 16)).astype(np.float32)
        hot = rng.randint(-2, 3, size=16).astype(np.float32)
        q[3] = hot * 10
        r[:512] += hot
        single = SimilaritySearcher(r)
        sharded = ShardedSimilaritySearcher(r, mesh)
        k = 600
        sq, sr, ss = single.global_topk(q, k, kappa=64)
        hq, hr, hs = sharded.global_topk(q, k, kappa=64)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)

    def test_corpus_smaller_than_mesh(self, mesh):
        # Fewer corpus rows than devices: empty shards must be inert.
        rng = np.random.RandomState(3)
        q = rng.randint(-3, 4, size=(4, 8)).astype(np.float32)
        r = rng.randint(-3, 4, size=(5, 8)).astype(np.float32)
        single = SimilaritySearcher(r)
        sharded = ShardedSimilaritySearcher(r, mesh)
        sq, sr, ss = single.global_topk(q, 10)
        hq, hr, hs = sharded.global_topk(q, 10)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)


class TestShardedScoreNormSearch:
    def test_sharded_sn_matches_single(self, mesh):
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(6)
        q = rng.randint(-3, 4, size=(13, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(200, 12)).astype(np.float32)
        noise = rng.randint(-3, 4, size=(90, 12)).astype(np.float32)
        single = ScoreNormalizedSearcher(r, noise)
        sharded = ScoreNormalizedSearcher(r, noise, mesh=mesh)
        sq, sr, ss = single.global_topk(q, 40)
        hq, hr, hs = sharded.global_topk(q, 40)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)
        np.testing.assert_allclose(hs, ss, rtol=1e-6)


class TestShardedScoreNormFused:
    def test_fused_path_used_and_matches(self, mesh, monkeypatch):
        # The sharded SN searcher must run its ONE-dispatch pipeline
        # (bias + append + candidates fused over the mesh), not the
        # two-dispatch normalize-then-search fallback.
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(41)
        q = rng.randint(-3, 4, size=(13, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(200, 12)).astype(np.float32)
        noise = rng.randint(-3, 4, size=(90, 12)).astype(np.float32)
        single = ScoreNormalizedSearcher(r, noise)
        sq, sr, ss = single.global_topk(q, 40)
        sharded = ScoreNormalizedSearcher(r, noise, mesh=mesh)
        monkeypatch.setattr(
            ScoreNormalizedSearcher, "normalize_queries",
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError("fallback path used")
            ),
        )
        hq, hr, hs = sharded.global_topk(q, 40)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)
        np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_sharded_sn_pooled_matches_single(self, mesh, monkeypatch):
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(43)
        q = rng.randint(-3, 4, size=(17, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(16384, 16)).astype(np.float32)
        noise = rng.randint(-3, 4, size=(512, 16)).astype(np.float32)
        # k=700 plans κ=64, inside the 4κ ≤ p_shard·n_dev feasibility
        # bound (κ=128 would silently fall back to streaming and this
        # test would stop covering the pooled SN mesh branch).
        single = ScoreNormalizedSearcher(r, noise)
        sq, sr, ss = single.global_topk(q, 700)
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        sharded = ScoreNormalizedSearcher(r, noise, mesh=mesh)
        kappa_eff, _ = sharded.searcher._plan(17, 700)
        assert sharded.searcher._collection_mode(
            24, kappa_eff, True
        ) == "pooled"
        hq, hr, hs = sharded.global_topk(q, 700)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)
        np.testing.assert_allclose(hs, ss, rtol=1e-6)


class TestShardedFuzz:
    def test_random_float_workloads_match_single(self, mesh):
        rng = np.random.RandomState(21)
        for _ in range(4):
            nq = int(rng.randint(4, 40))
            nr = int(rng.randint(30, 500))
            d = int(rng.choice([8, 48]))
            q = rng.randn(nq, d).astype(np.float32)
            r = rng.randn(nr, d).astype(np.float32)
            k = int(rng.randint(1, nq * nr + 1))
            single = SimilaritySearcher(r)
            sharded = ShardedSimilaritySearcher(r, mesh)
            sq, sr, ss = single.global_topk(q, k)
            hq, hr, hs = sharded.global_topk(q, k)
            # Same pair sets (ordering can differ only on exact float
            # ties, which random floats don't produce).
            np.testing.assert_array_equal(hq, sq)
            np.testing.assert_array_equal(hr, sr)
            np.testing.assert_allclose(hs, ss, rtol=1e-5, atol=1e-5)


class TestMeshShardedInference:
    """Batch-sharded descriptor forward: a mesh's first axis splits the
    frame batch across devices (parameters replicated, XLA SPMD)."""

    def test_sharded_forward_matches_unsharded(self):
        import jax.numpy as jnp

        from vsc2022_tpu.inference.pipeline import DescriptorExtractor
        from vsc2022_tpu.inference.transforms import InferenceTransforms
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        def model(variables, images):
            return jnp.mean(images, axis=(1, 2))

        rng = np.random.RandomState(11)
        frames = (rng.rand(8, 13, 32, 48, 3) * 255).astype(np.uint8)

        class DS:
            def iter_decoded(self):
                ts = np.stack(
                    [np.arange(13.0), np.arange(13.0) + 1], axis=1
                )
                for i in range(frames.shape[0]):
                    yield f"v{i:03d}", frames[i], ts

            def num_videos(self):
                return frames.shape[0]

        base = DescriptorExtractor(
            model, {}, InferenceTransforms.RESIZE_224_SQUARE, batch_size=8
        )
        sharded = DescriptorExtractor(
            model, {}, InferenceTransforms.RESIZE_224_SQUARE, batch_size=8,
            mesh=corpus_mesh(8),
        )
        ref = {vf.video_id: vf.feature for vf in base.extract(DS())}
        got = {vf.video_id: vf.feature for vf in sharded.extract(DS())}
        for vid in ref:
            np.testing.assert_allclose(got[vid], ref[vid], rtol=1e-5,
                                       atol=1e-6)


class TestMeshShardedLocalization:
    """Candidate-batch-sharded TN alignment over a mesh."""

    def test_sharded_alignment_matches_unsharded(self):
        from vsc2022_tpu.localization import TNLocalizationMaxSim
        from vsc2022_tpu.metrics import CandidatePair
        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.types import VideoFeature

        rng = np.random.RandomState(12)
        d = 32

        def l2n(x):
            return x / np.linalg.norm(x, axis=1, keepdims=True)

        refs = []
        queries = []
        candidates = []
        for i in range(5):  # odd count: exercises batch padding
            r = l2n(rng.normal(size=(40, d))).astype(np.float32)
            q = l2n(rng.normal(size=(30, d))).astype(np.float32)
            q[10:20] = r[5:15]  # plant
            refs.append(VideoFeature(
                video_id=100 + i, timestamps=np.arange(40.0), feature=r
            ))
            queries.append(VideoFeature(
                video_id=i, timestamps=np.arange(30.0), feature=q
            ))
            candidates.append(CandidatePair(i, 100 + i, 1.0))

        base = TNLocalizationMaxSim(queries, refs, "TN")
        sharded = TNLocalizationMaxSim(
            queries, refs, "TN", mesh=corpus_mesh(8)
        )
        expect = sorted(base.localize_all(candidates))
        got = sorted(sharded.localize_all(candidates))
        assert got == expect
        assert len(got) >= 5  # every planted pair localized


class TestShardedPooledCollection:
    """The pooled collection over the mesh (per-shard winner pools,
    psum'd selection counts, all-gather extraction merge) must be
    exact against the single-device searcher, including both repair
    paths — and must never touch the base class's single-device
    repair kernels (the refs live sharded). Runs under BOTH
    segment-top-2 builders (the per-shard pool build shares
    pool_build_xla with the single-device path)."""

    @pytest.fixture(autouse=True, params=["vred", "nat"])
    def seg_impl(self, request, monkeypatch):
        monkeypatch.setenv("VSC2022_TPU_POOL_SEG", request.param)
        # The env is read at TRACE time inside the jitted mesh
        # dispatch; clear so the second param re-traces with its own
        # builder instead of hitting the first's cached executable.
        jax.clear_caches()

    def _guard_single_device_kernels(self, monkeypatch):
        import vsc2022_tpu.ops.similarity as S

        def boom(*a, **k):
            raise AssertionError(
                "single-device corpus kernel called on sharded refs"
            )

        monkeypatch.setattr(S, "_repair_rows_topk_packed", boom)
        monkeypatch.setattr(S, "_repair_block_counts_packed", boom)

    def test_pooled_matches_single_device(self, mesh, monkeypatch):
        rng = np.random.RandomState(17)
        q = rng.randint(-3, 4, size=(23, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(16384, 16)).astype(np.float32)
        ks = [1, 50, 700, 5000]
        single = SimilaritySearcher(r)
        expect = {k: single.global_topk(q, k) for k in ks}
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        self._guard_single_device_kernels(monkeypatch)
        sharded = ShardedSimilaritySearcher(r, mesh)
        assert sharded._collection_mode(24, 32, True) == "pooled"
        for k in ks:
            sq, sr, ss = expect[k]
            hq, hr, hs = sharded.global_topk(q, k)
            np.testing.assert_array_equal(hq, sq)
            np.testing.assert_array_equal(hr, sr)
            np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_clustered_hits_cross_shard(self, mesh, monkeypatch):
        # >POOL_SEG_KEEP entries ≥ τ inside single 128-lane segments,
        # planted on two different shards: amb > 0 rows must resolve
        # through the mesh count kernel and the sharded corpus
        # re-search, and exactness must hold.
        rng = np.random.RandomState(19)
        q = rng.randint(-2, 3, size=(9, 16)).astype(np.float32)
        r = rng.randint(-2, 3, size=(16384, 16)).astype(np.float32)
        hot = rng.randint(-2, 3, size=16).astype(np.float32)
        q[4] = hot * 8
        r[300:360] += hot       # shard 0 (shard_rows = 2048)
        r[4096 + 128 : 4096 + 180] += hot  # shard 2
        ks = [40, 300]
        single = SimilaritySearcher(r)
        expect = {k: single.global_topk(q, k, kappa=32) for k in ks}
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        self._guard_single_device_kernels(monkeypatch)
        sharded = ShardedSimilaritySearcher(r, mesh)
        for k in ks:
            sq, sr, ss = expect[k]
            hq, hr, hs = sharded.global_topk(q, k, kappa=32)
            np.testing.assert_array_equal(hq, sq)
            np.testing.assert_array_equal(hr, sr)
            np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_pooled_l2_matches(self, mesh, monkeypatch):
        rng = np.random.RandomState(23)
        q = rng.randint(-3, 4, size=(11, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(16384, 12)).astype(np.float32)
        # k=400 plans κ=64 — feasible for the pool (κ=128 would fall
        # back to streaming, leaving the L2 mesh pool build untested).
        single = SimilaritySearcher(r, metric="L2")
        sq, sr, ss = single.global_topk(q, 400)
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        self._guard_single_device_kernels(monkeypatch)
        sharded = ShardedSimilaritySearcher(r, mesh, metric="L2")
        kappa_eff, _ = sharded._plan(11, 400)
        assert sharded._collection_mode(16, kappa_eff, True) == "pooled"
        hq, hr, hs = sharded.global_topk(q, 400)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)
        np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_cross_shard_duplicate_ties(self, mesh, monkeypatch):
        # Exact duplicate corpus rows planted on DIFFERENT shards
        # produce equal scores whose global order is broken by
        # (q, r) — r being a GLOBAL id built from per-shard base
        # offsets. Any off-by-one in those offsets, or a dropped
        # duplicate at the extraction merge, breaks bit-equality.
        rng = np.random.RandomState(31)
        q = rng.randint(-2, 3, size=(8, 16)).astype(np.float32)
        r = rng.randint(-2, 3, size=(16384, 16)).astype(np.float32)
        dup = rng.randint(-2, 3, size=(16, 16)).astype(np.float32)
        for s in range(8):  # same 16 rows at the head of every shard
            r[s * 2048 : s * 2048 + 16] = dup
        ks = [10, 120, 2000]
        single = SimilaritySearcher(r)
        expect = {k: single.global_topk(q, k) for k in ks}
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        self._guard_single_device_kernels(monkeypatch)
        sharded = ShardedSimilaritySearcher(r, mesh)
        for k in ks:
            sq, sr, ss = expect[k]
            hq, hr, hs = sharded.global_topk(q, k)
            np.testing.assert_array_equal(hq, sq)
            np.testing.assert_array_equal(hr, sr)
            np.testing.assert_allclose(hs, ss, rtol=1e-6)

    def test_infeasible_pool_falls_back_to_stream(self, mesh, monkeypatch):
        # Tiny shards (p_shard too narrow for κ): the forced pooled
        # mode must degrade to the streaming collection, still exact.
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        rng = np.random.RandomState(29)
        q = rng.randint(-3, 4, size=(8, 8)).astype(np.float32)
        r = rng.randint(-3, 4, size=(600, 8)).astype(np.float32)
        single = SimilaritySearcher(r)
        sharded = ShardedSimilaritySearcher(r, mesh)
        assert sharded._collection_mode(8, 32, True) is True
        sq, sr, ss = single.global_topk(q, 200)
        hq, hr, hs = sharded.global_topk(q, 200)
        np.testing.assert_array_equal(hq, sq)
        np.testing.assert_array_equal(hr, sr)


class TestShardedMultiRowBlock:
    def test_row_blocked_fused_matches_single(self, mesh):
        """Sharded query sets beyond one row block stream through the
        in-dispatch row scan; results must stay bit-identical to the
        single-device searcher."""
        rng = np.random.RandomState(31)
        q = rng.randint(-3, 4, size=(50, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(300, 16)).astype(np.float32)
        single = SimilaritySearcher(r)
        sharded = ShardedSimilaritySearcher(r, mesh, row_block=16)
        for k in [9, 400]:
            sq, sr, ss = single.global_topk(q, k)
            hq, hr, hs = sharded.global_topk(q, k)
            np.testing.assert_array_equal(hq, sq)
            np.testing.assert_array_equal(hr, sr)
            np.testing.assert_allclose(hs, ss, rtol=1e-6)


class TestShardedInt8:
    """int8 (SQ8) storage over the corpus mesh: per-row dequant scales
    shard, append, and compact in lockstep with their rows — every
    result bit-identical to the unsharded int8 searcher."""

    def test_matches_single_device(self, mesh):
        rng = np.random.RandomState(9)
        q = rng.randint(-3, 4, size=(23, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(517, 16)).astype(np.float32)
        single = SimilaritySearcher(r, dtype="int8")
        sharded = ShardedSimilaritySearcher(r, mesh, dtype="int8")
        for k in [5, 300]:
            for a, b in zip(sharded.global_topk(q, k),
                            single.global_topk(q, k)):
                np.testing.assert_array_equal(a, b)

    def test_mutations_match_single_device(self, mesh):
        rng = np.random.RandomState(10)
        q = rng.randint(-3, 4, size=(23, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(517, 16)).astype(np.float32)
        r2 = rng.randint(-3, 4, size=(130, 16)).astype(np.float32)
        single = SimilaritySearcher(r, dtype="int8")
        sharded = ShardedSimilaritySearcher(r, mesh, dtype="int8")
        sharded.append_rows(r2)
        single.append_rows(r2)
        for a, b in zip(sharded.global_topk(q, 400),
                        single.global_topk(q, 400)):
            np.testing.assert_array_equal(a, b)
        keep = np.sort(rng.choice(647, 300, replace=False))
        sharded.keep_rows(keep)
        single.keep_rows(keep)
        for a, b in zip(sharded.global_topk(q, 400),
                        single.global_topk(q, 400)):
            np.testing.assert_array_equal(a, b)

    def test_sn_fused_matches_single_device(self, mesh):
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(11)
        l2n = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)
        q = l2n(rng.randn(24, 16).astype(np.float32))
        r = l2n(rng.randn(400, 16).astype(np.float32))
        noise = l2n(rng.randn(96, 16).astype(np.float32))
        sn_sh = ScoreNormalizedSearcher(
            r, noise, beta=1.2, mesh=mesh, dtype="int8"
        )
        sn_un = ScoreNormalizedSearcher(r, noise, beta=1.2, dtype="int8")
        for a, b in zip(sn_sh.global_topk(q, 150),
                        sn_un.global_topk(q, 150)):
            np.testing.assert_array_equal(a, b)

    def test_pooled_collection_matches(self, mesh, monkeypatch):
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        rng = np.random.RandomState(12)
        q = rng.randint(-3, 4, size=(16, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(4096, 12)).astype(np.float32)
        single = SimilaritySearcher(r, dtype="int8", col_block=256)
        sharded = ShardedSimilaritySearcher(
            r, mesh, dtype="int8", col_block=256
        )
        for a, b in zip(sharded.global_topk(q, 900),
                        single.global_topk(q, 900)):
            np.testing.assert_array_equal(a, b)
