"""Search-core tests: the TPU global-top-k must agree exactly with a
dense numpy brute-force oracle (modeled on reference tests/test_index.py
and tests/test_candidates.py, plus randomized exactness checks)."""

import numpy as np
import pytest

from vsc2022_tpu.metrics import CandidatePair
from vsc2022_tpu.ops.similarity import SimilaritySearcher
from vsc2022_tpu.retrieval import CandidateGeneration, MaxScoreAggregation, VideoIndex
from vsc2022_tpu.types import VideoFeature


def brute_force_global_topk(q, r, k, metric="IP"):
    if metric == "IP":
        scores = q @ r.T
    else:
        scores = -(
            (q * q).sum(1)[:, None] - 2 * q @ r.T + (r * r).sum(1)[None, :]
        )
    flat = scores.ravel()
    k = min(k, flat.size)
    order = np.lexsort(
        (
            np.tile(np.arange(r.shape[0]), q.shape[0]),
            np.repeat(np.arange(q.shape[0]), r.shape[0]),
            -flat,
        )
    )[:k]
    qi, ri = np.unravel_index(order, scores.shape)
    s = scores[qi, ri]
    if metric == "L2":
        s = -s
    return qi, ri, s


class TestSimilaritySearcher:
    @pytest.mark.parametrize("metric", ["IP", "L2"])
    def test_global_topk_matches_oracle(self, metric):
        # Integer-valued features: scores are exact in f32, so ordering
        # (incl. tie-breaks) is fully deterministic in both paths.
        rng = np.random.RandomState(3)
        q = rng.randint(-3, 4, size=(37, 24)).astype(np.float32)
        r = rng.randint(-3, 4, size=(211, 24)).astype(np.float32)
        searcher = SimilaritySearcher(r, metric=metric)
        for k in [1, 10, 100, 500, 37 * 211]:
            qi, ri, s = searcher.global_topk(q, k)
            oqi, ori, os_ = brute_force_global_topk(q, r, k, metric)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-5)

    def test_global_topk_saturation_fallback(self):
        # Concentrate nearly all of the global top-k in a single row so the
        # per-row κ budget saturates and the exact fallback pass must fire.
        rng = np.random.RandomState(0)
        q = rng.randint(-2, 3, size=(8, 16)).astype(np.float32)
        r = rng.randint(-2, 3, size=(4096, 16)).astype(np.float32)
        hot = rng.randint(-2, 3, size=16).astype(np.float32)
        q[3] = hot * 10
        r[:2048] += hot  # half the corpus highly similar to q[3]
        searcher = SimilaritySearcher(r)
        k = 1500
        qi, ri, s = searcher.global_topk(q, k, kappa=64)
        oqi, ori, os_ = brute_force_global_topk(q, r, k)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)
        np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-4)

    def test_row_topk_matches_oracle(self):
        rng = np.random.RandomState(1)
        q = rng.randn(19, 8).astype(np.float32)
        r = rng.randn(301, 8).astype(np.float32)
        searcher = SimilaritySearcher(r)
        s, i = searcher.row_topk(q, 5)
        dense = q @ r.T
        expect_i = np.argsort(-dense, axis=1, kind="stable")[:, :5]
        np.testing.assert_allclose(
            s, np.take_along_axis(dense, expect_i, 1), rtol=1e-5, atol=1e-5
        )
        # Indices may differ under exact score ties; compare scores only.

    def test_row_nn(self):
        rng = np.random.RandomState(2)
        q = rng.randn(11, 4).astype(np.float32)
        r = rng.randn(77, 4).astype(np.float32)
        searcher = SimilaritySearcher(r)
        np.testing.assert_allclose(
            searcher.row_nn(q), (q @ r.T).max(axis=1), rtol=1e-5, atol=1e-5
        )


class TestAppendRows:
    """Device-side corpus growth must be indistinguishable from a
    fresh searcher over the combined corpus — exactly, including
    tie-breaks (serving `add`)."""

    @pytest.mark.parametrize("metric", ["IP", "L2"])
    def test_append_matches_fresh(self, metric):
        rng = np.random.RandomState(7)
        q = rng.randint(-3, 4, size=(19, 16)).astype(np.float32)
        r1 = rng.randint(-3, 4, size=(97, 16)).astype(np.float32)
        r2 = rng.randint(-3, 4, size=(61, 16)).astype(np.float32)

        grown = SimilaritySearcher(r1, metric=metric)
        grown.global_topk(q, 10)  # stage + search before growing
        grown.append_rows(r2)

        fresh = SimilaritySearcher(
            np.concatenate([r1, r2]), metric=metric
        )
        for k in [1, 25, 300]:
            gq, gr, gs = grown.global_topk(q, k)
            fq, fr, fs = fresh.global_topk(q, k)
            np.testing.assert_array_equal(gq, fq)
            np.testing.assert_array_equal(gr, fr)
            np.testing.assert_allclose(gs, fs, rtol=1e-6)

    def test_append_across_block_clamp(self):
        # Growth that raises the tiny-corpus col_block clamp (97 →
        # 97+160 crosses the 128-row padding) must re-pad correctly.
        rng = np.random.RandomState(11)
        q = rng.randint(-3, 4, size=(9, 12)).astype(np.float32)
        r1 = rng.randint(-3, 4, size=(97, 12)).astype(np.float32)
        r2 = rng.randint(-3, 4, size=(160, 12)).astype(np.float32)
        grown = SimilaritySearcher(r1)
        assert grown.col_block == 128
        grown.append_rows(r2)
        assert grown._refs.shape[0] % grown.col_block == 0
        fresh = SimilaritySearcher(np.concatenate([r1, r2]))
        gq, gr, gs = grown.global_topk(q, 50)
        fq, fr, fs = fresh.global_topk(q, 50)
        np.testing.assert_array_equal(gq, fq)
        np.testing.assert_array_equal(gr, fr)

    def test_append_repeatedly_bf16(self):
        rng = np.random.RandomState(13)
        q = rng.randint(-2, 3, size=(7, 16)).astype(np.float32)
        parts = [
            rng.randint(-2, 3, size=(n, 16)).astype(np.float32)
            for n in (50, 30, 200)
        ]
        grown = SimilaritySearcher(parts[0], dtype="bfloat16")
        for p in parts[1:]:
            grown.append_rows(p)
        fresh = SimilaritySearcher(
            np.concatenate(parts), dtype="bfloat16"
        )
        gq, gr, gs = grown.global_topk(q, 40)
        fq, fr, fs = fresh.global_topk(q, 40)
        np.testing.assert_array_equal(gq, fq)
        np.testing.assert_array_equal(gr, fr)
        np.testing.assert_allclose(gs, fs, rtol=1e-6)

    def test_index_add_after_search_appends_device_side(self):
        # VideoIndex.add after a search must keep the SAME searcher
        # (device-side append), and return the same matches a fresh
        # index over all refs would.
        rng = np.random.RandomState(17)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        refs1 = [
            vf(i, rng.randn(20, 16).astype(np.float32)) for i in range(4)
        ]
        refs2 = [
            vf(10 + i, rng.randn(25, 16).astype(np.float32))
            for i in range(2)
        ]
        queries = [vf(0, rng.randn(12, 16).astype(np.float32))]

        index = VideoIndex(16)
        index.add(refs1)
        index.search(queries, global_k=30)
        staged = index._searcher
        index.add(refs2)
        assert index._searcher is staged  # grown, not restaged
        got = index.search(queries, global_k=30)

        fresh = VideoIndex(16)
        fresh.add(refs1 + refs2)
        expect = fresh.search(queries, global_k=30)
        key = lambda pm: (pm.query_id, pm.ref_id)  # noqa: E731
        got_map = {key(pm): pm.matches for pm in got}
        exp_map = {key(pm): pm.matches for pm in expect}
        assert set(got_map) == set(exp_map)
        for k in exp_map:
            assert [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in got_map[k]
            ] == [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in exp_map[k]
            ]

    def test_add_with_wrong_dim_rejected_atomically(self):
        # A bad add (wrong descriptor dim) must be rejected BEFORE any
        # state mutates: host bookkeeping growing while the staged
        # searcher rejects the rows would map searcher offsets to
        # phantom frames, silently corrupting every later add's ids.
        rng = np.random.RandomState(23)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        index = VideoIndex(16)
        index.add([vf(0, rng.randn(20, 16).astype(np.float32))])
        queries = [vf(0, rng.randn(8, 16).astype(np.float32))]
        index.search(queries, global_k=10)  # stage

        with pytest.raises(ValueError, match="dimension"):
            index.add([vf(1, rng.randn(9, 12).astype(np.float32))])
        assert len(index.video_clip_to_video_ids) == 20  # untouched
        assert 1 not in index.video_metadata

        # A valid add afterwards maps ids correctly.
        good = rng.randn(15, 16).astype(np.float32)
        index.add([vf(2, good)])
        q2 = [vf(1, good[:4].copy())]
        got = index.search(q2, global_k=4)  # = the 4 planted copies
        assert {pm.ref_id for pm in got} == {2}

    @pytest.mark.parametrize("metric", ["IP", "L2"])
    def test_sharded_append_matches_fresh(self, metric):
        # Device-side growth of a SHARDED corpus: same exactness
        # contract as single-device, across a geometry change (the
        # per-shard padding grows, redistributing resident rows over
        # the mesh) and within spare padding (no geometry change).
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.parallel.sharded_search import (
            ShardedSimilaritySearcher,
        )

        assert len(jax.devices()) >= 8
        mesh = corpus_mesh(8)
        rng = np.random.RandomState(29)
        q = rng.randint(-3, 4, size=(17, 16)).astype(np.float32)
        r1 = rng.randint(-3, 4, size=(900, 16)).astype(np.float32)
        r2 = rng.randint(-3, 4, size=(100, 16)).astype(np.float32)  # fits padding
        r3 = rng.randint(-3, 4, size=(2000, 16)).astype(np.float32)  # grows shards

        grown = ShardedSimilaritySearcher(r1, mesh, metric=metric)
        grown.global_topk(q, 10)  # stage + compile before growing
        geom0 = (grown.shard_rows, grown.col_block)
        grown.append_rows(r2)
        assert (grown.shard_rows, grown.col_block) == geom0
        grown.append_rows(r3)
        assert grown.shard_rows > geom0[0]

        fresh = ShardedSimilaritySearcher(
            np.concatenate([r1, r2, r3]), mesh, metric=metric
        )
        assert (grown.shard_rows, grown.col_block) == (
            fresh.shard_rows, fresh.col_block,
        )
        for k in [1, 40, 500]:
            gq, gr, gs = grown.global_topk(q, k)
            fq, fr, fs = fresh.global_topk(q, k)
            np.testing.assert_array_equal(gq, fq)
            np.testing.assert_array_equal(gr, fr)
            np.testing.assert_allclose(gs, fs, rtol=1e-6)

    def test_sharded_index_add_appends_device_side(self):
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh

        assert len(jax.devices()) >= 8
        rng = np.random.RandomState(19)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        refs1 = [vf(i, rng.randn(30, 8).astype(np.float32)) for i in range(3)]
        refs2 = [vf(5, rng.randn(30, 8).astype(np.float32))]
        queries = [vf(0, rng.randn(10, 8).astype(np.float32))]
        index = VideoIndex(8, mesh=corpus_mesh(8))
        index.add(refs1)
        index.search(queries, global_k=20)
        staged = index._searcher
        index.add(refs2)
        assert index._searcher is staged  # grown in place, not restaged
        got = index.search(queries, global_k=20)
        fresh = VideoIndex(8, mesh=corpus_mesh(8))
        fresh.add(refs1 + refs2)
        expect = fresh.search(queries, global_k=20)
        assert {(pm.query_id, pm.ref_id) for pm in got} == {
            (pm.query_id, pm.ref_id) for pm in expect
        }


class TestRemoveRows:
    """Device-side corpus shrink (serving `remove`) must be
    indistinguishable from a fresh searcher over the survivors —
    exactly, including tie-breaks — and must land on the fresh-stage
    geometry so later appends still work."""

    @pytest.mark.parametrize("metric", ["IP", "L2"])
    def test_remove_matches_fresh(self, metric):
        rng = np.random.RandomState(31)
        q = rng.randint(-3, 4, size=(19, 16)).astype(np.float32)
        r1 = rng.randint(-3, 4, size=(97, 16)).astype(np.float32)
        r2 = rng.randint(-3, 4, size=(61, 16)).astype(np.float32)
        r3 = rng.randint(-3, 4, size=(44, 16)).astype(np.float32)

        shrunk = SimilaritySearcher(
            np.concatenate([r1, r2, r3]), metric=metric
        )
        shrunk.global_topk(q, 10)  # stage + search before shrinking
        # Remove the MIDDLE block: survivors must re-index contiguously.
        keep = np.concatenate([
            np.arange(97), 97 + 61 + np.arange(44)
        ]).astype(np.int32)
        shrunk.keep_rows(keep)
        assert shrunk.n_refs == 97 + 44

        fresh = SimilaritySearcher(np.concatenate([r1, r3]), metric=metric)
        for k in [1, 25, 300]:
            gq, gr, gs = shrunk.global_topk(q, k)
            fq, fr, fs = fresh.global_topk(q, k)
            np.testing.assert_array_equal(gq, fq)
            np.testing.assert_array_equal(gr, fr)
            np.testing.assert_allclose(gs, fs, rtol=1e-6)

    def test_remove_then_append_bf16(self):
        # Compaction must leave the tail zeroed (append_rows relies on
        # rows past n_valid being zero) and the geometry fresh, so a
        # later device-side append still matches a fresh build.
        rng = np.random.RandomState(37)
        q = rng.randint(-2, 3, size=(7, 16)).astype(np.float32)
        r1 = rng.randint(-2, 3, size=(200, 16)).astype(np.float32)
        r2 = rng.randint(-2, 3, size=(90, 16)).astype(np.float32)

        s = SimilaritySearcher(r1, dtype="bfloat16")
        s.global_topk(q, 10)
        keep = np.arange(0, 200, 2, dtype=np.int32)  # drop every other
        s.keep_rows(keep)
        s.append_rows(r2)

        fresh = SimilaritySearcher(
            np.concatenate([r1[::2], r2]), dtype="bfloat16"
        )
        assert s._refs.shape == fresh._refs.shape
        gq, gr, gs = s.global_topk(q, 40)
        fq, fr, fs = fresh.global_topk(q, 40)
        np.testing.assert_array_equal(gq, fq)
        np.testing.assert_array_equal(gr, fr)
        np.testing.assert_allclose(gs, fs, rtol=1e-6)

    def test_index_remove_device_side(self):
        # VideoIndex.remove after a search keeps the SAME searcher
        # (device-side compaction) and returns exactly what a fresh
        # index over the survivors would.
        rng = np.random.RandomState(41)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        refs = [
            vf(i, rng.randn(20 + i, 16).astype(np.float32))
            for i in range(5)
        ]
        queries = [vf(0, rng.randn(12, 16).astype(np.float32))]

        index = VideoIndex(16)
        index.add(refs)
        index.search(queries, global_k=40)
        staged = index._searcher
        n_rows = index.remove([1, 3])
        assert n_rows == (20 + 1) + (20 + 3)
        assert index._searcher is staged  # compacted, not restaged
        got = index.search(queries, global_k=40)

        fresh = VideoIndex(16)
        fresh.add([refs[0], refs[2], refs[4]])
        expect = fresh.search(queries, global_k=40)
        key = lambda pm: (pm.query_id, pm.ref_id)  # noqa: E731
        got_map = {key(pm): pm.matches for pm in got}
        exp_map = {key(pm): pm.matches for pm in expect}
        assert set(got_map) == set(exp_map)
        assert not any(rid in (1, 3) for _, rid in got_map)
        for k in exp_map:
            assert [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in got_map[k]
            ] == [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in exp_map[k]
            ]

    def test_index_remove_unknown_id_atomic(self):
        rng = np.random.RandomState(43)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        index = VideoIndex(16)
        index.add([vf(0, rng.randn(20, 16).astype(np.float32))])
        with pytest.raises(KeyError, match="not indexed"):
            index.remove([0, 99])
        assert 0 in index.video_metadata  # nothing mutated
        assert len(index.video_clip_to_video_ids) == 20

    def test_score_normalized_index_remove(self):
        # The SN searcher's bias-augmented corpus compacts the same
        # way (the constant-1 CSLS column rides along per row).
        from vsc2022_tpu.retrieval.index import ScoreNormalizedVideoIndex

        rng = np.random.RandomState(47)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        noise = [
            vf(100 + i, rng.randn(25, 16).astype(np.float32))
            for i in range(3)
        ]
        refs = [
            vf(i, rng.randn(30, 16).astype(np.float32)) for i in range(4)
        ]
        queries = [vf(0, rng.randn(10, 16).astype(np.float32))]

        index = ScoreNormalizedVideoIndex(16, noise_features=noise)
        index.add(refs)
        index.search(queries, global_k=30)
        staged = index._searcher
        index.remove([2])
        assert index._searcher is staged
        got = index.search(queries, global_k=30)

        fresh = ScoreNormalizedVideoIndex(16, noise_features=noise)
        fresh.add([refs[0], refs[1], refs[3]])
        expect = fresh.search(queries, global_k=30)
        got_set = [
            (pm.query_id, pm.ref_id, m.score)
            for pm in got for m in pm.matches
        ]
        exp_set = [
            (pm.query_id, pm.ref_id, m.score)
            for pm in expect for m in pm.matches
        ]
        assert got_set == exp_set

    @pytest.mark.parametrize("metric", ["IP", "L2"])
    def test_sharded_remove_matches_fresh(self, metric):
        # Shrinking a SHARDED corpus: survivors redistribute across
        # shards (GSPMD gather over ICI) onto the fresh-stage geometry.
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.parallel.sharded_search import (
            ShardedSimilaritySearcher,
        )

        assert len(jax.devices()) >= 8
        mesh = corpus_mesh(8)
        rng = np.random.RandomState(53)
        q = rng.randint(-3, 4, size=(17, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(3000, 16)).astype(np.float32)

        shrunk = ShardedSimilaritySearcher(r, mesh, metric=metric)
        shrunk.global_topk(q, 10)  # stage + compile before shrinking
        geom0 = (shrunk.shard_rows, shrunk.col_block)
        keep = np.flatnonzero(
            rng.rand(3000) < 0.3
        ).astype(np.int32)  # ~900 survivors: per-shard padding shrinks
        shrunk.keep_rows(keep)

        fresh = ShardedSimilaritySearcher(r[keep], mesh, metric=metric)
        assert (shrunk.shard_rows, shrunk.col_block) == (
            fresh.shard_rows, fresh.col_block,
        )
        assert shrunk.shard_rows <= geom0[0]
        for k in [1, 40, 500]:
            gq, gr, gs = shrunk.global_topk(q, k)
            fq, fr, fs = fresh.global_topk(q, k)
            np.testing.assert_array_equal(gq, fq)
            np.testing.assert_array_equal(gr, fr)
            np.testing.assert_allclose(gs, fs, rtol=1e-6)


class TestMutationFuzz:
    """Randomized add/remove interleaves against a fresh-build oracle:
    any sequence of serving-time mutations must leave the index
    answering exactly like one freshly built over the surviving videos
    (the shrunk/grown ≡ rebuilt invariant, compounded)."""

    def test_interleaved_add_remove_matches_fresh(self):
        rng = np.random.RandomState(59)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        def new_video(vid):
            n = int(rng.randint(10, 30))
            return vf(vid, rng.randint(-3, 4, (n, 16)).astype(np.float32))

        queries = [vf(0, rng.randint(-3, 4, (15, 16)).astype(np.float32))]
        live = {}  # vid -> VideoFeature, insertion order = corpus order
        next_vid = 0

        index = VideoIndex(16)
        for i in range(4):
            live[next_vid] = new_video(next_vid)
            index.add([live[next_vid]])
            next_vid += 1
        index.search(queries, global_k=30)  # stage before mutating

        for step in range(12):
            if live and rng.rand() < 0.4:
                victim = list(live)[int(rng.randint(len(live)))]
                index.remove([victim])
                del live[victim]
            else:
                batch = [
                    new_video(next_vid + j)
                    for j in range(int(rng.randint(1, 3)))
                ]
                for b in batch:
                    live[b.video_id] = b
                next_vid += len(batch)
                index.add(batch)
            if rng.rand() < 0.5 or step == 11:
                got = index.search(queries, global_k=30)
                fresh = VideoIndex(16)
                fresh.add(list(live.values()))
                expect = fresh.search(queries, global_k=30)
                got_flat = [
                    (pm.query_id, pm.ref_id,
                     m.query_timestamps, m.ref_timestamps, m.score)
                    for pm in got for m in pm.matches
                ]
                exp_flat = [
                    (pm.query_id, pm.ref_id,
                     m.query_timestamps, m.ref_timestamps, m.score)
                    for pm in expect for m in pm.matches
                ]
                assert got_flat == exp_flat, f"diverged at step {step}"
        assert index._searcher is not None  # never fell back to restage

    def test_features_after_repeated_id_add(self):
        # add() is repeatable like FAISS add, including a repeated
        # video id; features() must give each block its OWN
        # timestamps (video_metadata only remembers the last add).
        rng = np.random.RandomState(67)
        index = VideoIndex(8)
        f1 = rng.randn(5, 8).astype(np.float32)
        f2 = rng.randn(7, 8).astype(np.float32)
        index.add([VideoFeature(
            video_id=1, timestamps=np.arange(5.0), feature=f1
        )])
        index.add([VideoFeature(
            video_id=1, timestamps=10.0 + np.arange(7.0), feature=f2
        )])
        feats = index.features()
        assert [vf.video_id for vf in feats] == [1, 1]
        np.testing.assert_array_equal(feats[0].timestamps, np.arange(5.0))
        np.testing.assert_array_equal(
            feats[1].timestamps, 10.0 + np.arange(7.0)
        )
        np.testing.assert_array_equal(feats[0].feature, f1)
        np.testing.assert_array_equal(feats[1].feature, f2)
        # remove drops BOTH blocks of the repeated id.
        index.remove([1])
        assert index.features() == [] and index.video_metadata == {}

    def test_sharded_interleaved_mutations_match_fresh(self):
        # Compound add/remove over a corpus mesh: repeated GSPMD
        # redistributions (growth re-pads, compaction shrinks) must
        # still land every intermediate state on the fresh-stage
        # layout exactly.
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.parallel.sharded_search import (
            ShardedSimilaritySearcher,
        )

        assert len(jax.devices()) >= 8
        mesh = corpus_mesh(8)
        rng = np.random.RandomState(73)
        q = rng.randint(-3, 4, size=(9, 16)).astype(np.float32)
        live = rng.randint(-3, 4, size=(1500, 16)).astype(np.float32)
        s = ShardedSimilaritySearcher(live, mesh)
        s.global_topk(q, 20)  # stage before mutating

        for step in range(6):
            if step % 2 == 0:
                grow = rng.randint(
                    -3, 4, size=(int(rng.randint(200, 1200)), 16)
                ).astype(np.float32)
                s.append_rows(grow)
                live = np.concatenate([live, grow])
            else:
                keep = np.flatnonzero(
                    rng.rand(live.shape[0]) < 0.6
                ).astype(np.int32)
                s.keep_rows(keep)
                live = live[keep]
            fresh = ShardedSimilaritySearcher(live, mesh)
            assert (s.shard_rows, s.col_block) == (
                fresh.shard_rows, fresh.col_block,
            ), f"geometry diverged at step {step}"
            gq, gr, gs = s.global_topk(q, 50)
            fq, fr, fs = fresh.global_topk(q, 50)
            np.testing.assert_array_equal(gq, fq, err_msg=f"step {step}")
            np.testing.assert_array_equal(gr, fr, err_msg=f"step {step}")
            np.testing.assert_allclose(gs, fs, rtol=1e-6)

    def test_remove_to_empty_then_add(self):
        rng = np.random.RandomState(61)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        index = VideoIndex(16)
        index.add([vf(0, rng.randn(20, 16).astype(np.float32))])
        queries = [vf(0, rng.randn(8, 16).astype(np.float32))]
        index.search(queries, global_k=10)
        index.remove([0])
        assert index.search(queries, global_k=10) == []
        new = rng.randn(12, 16).astype(np.float32)
        index.add([vf(5, new)])
        got = index.search(queries, global_k=10)
        fresh = VideoIndex(16)
        fresh.add([vf(5, new)])
        expect = fresh.search(queries, global_k=10)
        assert [
            (pm.ref_id, m.score) for pm in got for m in pm.matches
        ] == [
            (pm.ref_id, m.score) for pm in expect for m in pm.matches
        ]


class TestVideoIndex:
    def make_features(self, prefix):
        test_feature = np.array(
            [
                [[1, 2, 3], [4, 5, 6], [7, 8, 9]],
                [[11, 12, 13], [14, 15, 16], [17, 18, 19]],
                [[111, 112, 113], [114, 115, 116], [117, 118, 119]],
            ],
            dtype=np.float32,
        )
        return [
            VideoFeature(
                video_id=f"{prefix}{idx:06d}",
                feature=feature,
                timestamps=np.arange(3, dtype=np.float32),
            )
            for idx, feature in enumerate(test_feature)
        ]

    @pytest.mark.parametrize("global_k", [1, -1])
    def test_l2_nearest_video(self, global_k):
        query = self.make_features("Q")
        db = self.make_features("R")
        index = VideoIndex(3, metric="L2")
        index.add(db)
        results = index.search(query, global_k)
        assert results
        for result in results:
            assert result.query_id[1:] == result.ref_id[1:]


class TestCandidateGeneration:
    def test_candidate_generation(self):
        queries = [
            VideoFeature(
                video_id=1,
                feature=np.array(
                    [[1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
                ),
                timestamps=np.array([0.0, 1.0, 2.0]),
            ),
        ]
        refs = [
            VideoFeature(
                video_id=5,
                feature=np.array(
                    [[0, 0, 0], [0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 0, 0]],
                    dtype=np.float32,
                ),
                timestamps=np.array([2.0, 4.0, 6.0, 8.0, 10.0]),
            ),
            VideoFeature(
                video_id=8,
                feature=np.array(
                    [[0, 0, 0], [1, 0, 0], [1, 0, 0]], dtype=np.float32
                ),
                timestamps=np.array([[0.0, 5.0], [5.0, 10.0], [10.0, 15.0]]),
            ),
            VideoFeature(
                video_id=10,
                feature=np.array(
                    [[0, 0, 0], [0, 0, 0.25], [0, 0, 0]], dtype=np.float32
                ),
                timestamps=np.array([0.0, 0.1, 0.2]),
            ),
        ]
        cg = CandidateGeneration(refs, MaxScoreAggregation())
        candidates = cg.query(queries, 2 * 3)
        assert len(candidates) == 3
        assert candidates == [
            CandidatePair(query_id=1, ref_id=5, score=2.0),
            CandidatePair(query_id=1, ref_id=8, score=1.0),
            CandidatePair(query_id=1, ref_id=10, score=0.25),
        ]


class TestScoreNormalizedSearcher:
    @pytest.mark.parametrize("collection", ["stream", "pooled"])
    def test_fused_matches_unfused(self, monkeypatch, collection):
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        monkeypatch.setenv("VSC2022_TPU_COLLECTION", collection)
        rng = np.random.RandomState(9)
        q = rng.randint(-3, 4, size=(17, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(120, 12)).astype(np.float32)
        noise = rng.randint(-3, 4, size=(64, 12)).astype(np.float32)

        fused = ScoreNormalizedSearcher(r, noise, beta=1.2)
        fqi, fri, fs = fused.global_topk(q, 50)

        bias = -1.2 * SimilaritySearcher(noise).row_nn(q)
        q_sn = np.concatenate([q, bias[:, None]], axis=1)
        r_sn = np.concatenate([r, np.ones((120, 1), np.float32)], axis=1)
        uqi, uri, us = SimilaritySearcher(r_sn).global_topk(q_sn, 50)

        np.testing.assert_array_equal(fqi, uqi)
        np.testing.assert_array_equal(fri, uri)
        np.testing.assert_allclose(fs, us, rtol=1e-6)

    @pytest.mark.parametrize("collection", ["stream", "pooled"])
    def test_fused_saturation_recompute(self, monkeypatch, collection):
        """Duplicate reference rows force more ≥τ entries than κ can
        hold; the single-dispatch path's count-verify must recompute
        those rows exactly — including the device-side row gather (the
        bias-augmented queries only exist on device)."""
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        monkeypatch.setenv("VSC2022_TPU_COLLECTION", collection)
        rng = np.random.RandomState(11)
        q = rng.randint(-3, 4, size=(10, 12)).astype(np.float32)
        base = rng.randint(-3, 4, size=(20, 12)).astype(np.float32)
        r = np.concatenate([base] * 10, axis=0)  # massive tie groups
        noise = rng.randint(-3, 4, size=(48, 12)).astype(np.float32)

        fused = ScoreNormalizedSearcher(r, noise, beta=1.2)
        fqi, fri, fs = fused.global_topk(q, 600, kappa=8)

        bias = -1.2 * SimilaritySearcher(noise).row_nn(q)
        q_sn = np.concatenate([q, bias[:, None]], axis=1)
        r_sn = np.concatenate([r, np.ones((200, 1), np.float32)], axis=1)
        uqi, uri, us = SimilaritySearcher(r_sn).global_topk(
            q_sn, 600, kappa=8
        )
        np.testing.assert_array_equal(fqi, uqi)
        np.testing.assert_array_equal(fri, uri)
        np.testing.assert_allclose(fs, us, rtol=1e-6)

    def test_fused_bf16_exact_on_small_ints(self):
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(13)
        q = rng.randint(-2, 3, size=(9, 8)).astype(np.float32)
        r = rng.randint(-2, 3, size=(70, 8)).astype(np.float32)
        noise = rng.randint(-2, 3, size=(32, 8)).astype(np.float32)
        # β=1.25 keeps the bias dimension exactly representable in bf16
        # (small-int NN sims × 1.25 need only 2 extra mantissa bits).
        f32 = ScoreNormalizedSearcher(r, noise, beta=1.25)
        bf16 = ScoreNormalizedSearcher(r, noise, beta=1.25, dtype="bfloat16")
        fqi, fri, fs = f32.global_topk(q, 40)
        bqi, bri, bs = bf16.global_topk(q, 40)
        np.testing.assert_array_equal(bqi, fqi)
        np.testing.assert_array_equal(bri, fri)
        np.testing.assert_allclose(bs, fs, rtol=1e-6)


    def test_fused_multi_row_block(self):
        """Query sets larger than one row block stream through the
        in-dispatch row scan — results must match the single-block
        unfused reference exactly."""
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(21)
        q = rng.randint(-3, 4, size=(53, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(150, 12)).astype(np.float32)
        noise = rng.randint(-3, 4, size=(64, 12)).astype(np.float32)

        fused = ScoreNormalizedSearcher(r, noise, beta=1.2)
        fused.searcher.row_block = 16  # force ~4 row blocks
        fused.noise_searcher.row_block = 16
        fqi, fri, fs = fused.global_topk(q, 300)

        bias = -1.2 * SimilaritySearcher(noise).row_nn(q)
        q_sn = np.concatenate([q, bias[:, None]], axis=1)
        r_sn = np.concatenate([r, np.ones((150, 1), np.float32)], axis=1)
        uqi, uri, us = SimilaritySearcher(r_sn).global_topk(q_sn, 300)
        np.testing.assert_array_equal(fqi, uqi)
        np.testing.assert_array_equal(fri, uri)
        np.testing.assert_allclose(fs, us, rtol=1e-6)


class TestBf16Mode:
    def test_bf16_search_plausible(self):
        rng = np.random.RandomState(4)
        # Small-integer features are exactly representable in bf16, so
        # bf16 mode must match f32 exactly here.
        q = rng.randint(-3, 4, size=(21, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(150, 16)).astype(np.float32)
        f32 = SimilaritySearcher(r)
        bf16 = SimilaritySearcher(r, dtype="bfloat16")
        for k in [5, 60]:
            fqi, fri, fs = f32.global_topk(q, k)
            bqi, bri, bs = bf16.global_topk(q, k)
            np.testing.assert_array_equal(bqi, fqi)
            np.testing.assert_array_equal(bri, fri)
            np.testing.assert_allclose(bs, fs, rtol=1e-6)

    def test_bf16_l2(self):
        rng = np.random.RandomState(5)
        q = rng.randint(-2, 3, size=(9, 8)).astype(np.float32)
        r = rng.randint(-2, 3, size=(40, 8)).astype(np.float32)
        f32 = SimilaritySearcher(r, metric="L2")
        bf16 = SimilaritySearcher(r, metric="L2", dtype="bfloat16")
        fqi, fri, fs = f32.global_topk(q, 20)
        bqi, bri, bs = bf16.global_topk(q, 20)
        np.testing.assert_array_equal(bqi, fqi)
        np.testing.assert_allclose(bs, fs, rtol=1e-5)


class TestMultiBlockPath:
    def test_loop_path_matches_oracle(self):
        # Tiny row_block forces the in-dispatch row scan (used for
        # query sets larger than one row block).
        rng = np.random.RandomState(8)
        q = rng.randint(-3, 4, size=(37, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(180, 16)).astype(np.float32)
        searcher = SimilaritySearcher(r, row_block=16)
        for k in [7, 200]:
            qi, ri, s = searcher.global_topk(q, k)
            oqi, ori, os_ = brute_force_global_topk(q, r, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(s, os_, rtol=1e-6)

    def test_row_topk_multi_block_matches_oracle(self):
        rng = np.random.RandomState(18)
        q = rng.randint(-3, 4, size=(37, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(180, 16)).astype(np.float32)
        searcher = SimilaritySearcher(r, row_block=16)
        s, i = searcher.row_topk(q, 5)
        dense = q.astype(np.float64) @ r.astype(np.float64).T
        for row in range(q.shape[0]):
            expect = np.sort(dense[row])[::-1][:5]
            np.testing.assert_allclose(s[row], expect, rtol=1e-6)
            np.testing.assert_allclose(dense[row, i[row]], expect, rtol=1e-6)


class TestGlobalTopKFuzz:
    @pytest.mark.parametrize("collection", ["stream", "pooled"])
    def test_random_float_workloads(self, monkeypatch, collection):
        """Float fuzz: returned pairs must be (tolerance-tie aware)
        exactly the top-k set under the dense oracle — through BOTH
        collection designs (the corpus-size default would pick
        streaming at these sizes; the env override pins each)."""
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", collection)
        rng = np.random.RandomState(12)
        for trial in range(6):
            nq = int(rng.randint(5, 60))
            nr = int(rng.randint(20, 400))
            d = int(rng.choice([8, 32, 96]))
            q = rng.randn(nq, d).astype(np.float32)
            r = rng.randn(nr, d).astype(np.float32)
            k = int(rng.randint(1, nq * nr + 1))
            kappa = int(rng.choice([8, 32, 128]))
            searcher = SimilaritySearcher(r)
            qi, ri, s = searcher.global_topk(q, k, kappa=kappa)
            dense = (q.astype(np.float64) @ r.astype(np.float64).T)
            flat = np.sort(dense.ravel())[::-1]
            tau = flat[min(k, flat.size) - 1]
            assert len(qi) == min(k, nq * nr)
            # Every returned pair is at/above the oracle threshold.
            assert (dense[qi, ri] >= tau - 1e-4).all()
            # Returned scores match the oracle's at those cells.
            np.testing.assert_allclose(s, dense[qi, ri], rtol=1e-4, atol=1e-4)
            # Scores are sorted descending.
            assert (np.diff(s) <= 1e-6).all()


class TestPooledCollection:
    """The pool-resident candidate phase (ops/similarity.py
    pooled_candidates): exactness under its specific failure modes —
    clustered hits hiding rank-(keep+1) entries inside one lane
    segment, extraction misses caught by the pool counts, and the
    budget fallback to the streaming collection. Every case runs under
    BOTH segment-top-2 builders (variadic monoid reduce vs native
    max/argmax with local ids): their internal tie choices may differ,
    so the oracle equality here is what pins e2e exactness for each."""

    @pytest.fixture(autouse=True, params=["vred", "nat"])
    def seg_impl(self, request, monkeypatch):
        monkeypatch.setenv("VSC2022_TPU_POOL_SEG", request.param)
        # The env is read at TRACE time inside module-level-jitted
        # search graphs; without this, the second param would reuse
        # the first's cached executable and never exercise its builder.
        import jax

        jax.clear_caches()

    def test_seg_builders_match_reference_pools(self):
        # Direct (jit-cache-unambiguous) pin of BOTH segment-top-2
        # builders against a numpy per-segment top-2 oracle, on tied
        # integer data: pool VALUES must match the oracle exactly for
        # each impl, and every pool id must point at an entry of that
        # value inside its own segment (tie WINNERS may differ between
        # impls; values cannot).
        import functools

        import jax
        import jax.numpy as jnp

        from vsc2022_tpu.ops.similarity import (
            POOL_SEG_KEEP,
            POOL_SEG_LANES,
            pool_build_xla,
        )

        rng = np.random.RandomState(3)
        m, n, d, cb = 9, 1024, 16, 256
        n_valid = 1000  # masked tail crosses a segment boundary
        q = rng.randint(-2, 3, size=(m, d)).astype(np.float32)
        r = rng.randint(-2, 3, size=(n, d)).astype(np.float32)
        scores = q @ r.T
        scores[:, n_valid:] = -np.inf
        seg = scores.reshape(m, n // POOL_SEG_LANES, POOL_SEG_LANES)
        top2 = -np.sort(-seg, axis=2)[:, :, :POOL_SEG_KEEP]

        segs_per_block = cb // POOL_SEG_LANES
        expect = np.concatenate(
            [
                np.concatenate(
                    [top2[:, b * segs_per_block:(b + 1) * segs_per_block, s]
                     for s in range(POOL_SEG_KEEP)],
                    axis=1,
                )
                for b in range(n // cb)
            ],
            axis=1,
        )
        for impl in ("vred", "nat"):
            pv, pi = jax.jit(functools.partial(
                pool_build_xla, col_block=cb, metric="IP",
                precision="highest", seg_impl=impl,
            ))(
                jnp.asarray(q), jnp.asarray(r),
                jnp.asarray(n_valid, jnp.int32),
                jnp.zeros((n,), jnp.float32),
            )
            pv, pi = np.asarray(pv), np.asarray(pi)
            np.testing.assert_array_equal(pv, expect, err_msg=impl)
            # Ids: in-segment and consistent with the stored value.
            finite = np.isfinite(pv)
            rows, cols = np.nonzero(finite)
            np.testing.assert_array_equal(
                scores[rows, pi[rows, cols]], pv[rows, cols],
                err_msg=impl,
            )
            blk = pi[rows, cols] // cb
            seg_in_blk = (pi[rows, cols] % cb) // POOL_SEG_LANES
            pool_per_block = POOL_SEG_KEEP * segs_per_block
            exp_blk = cols // pool_per_block
            exp_seg = (cols % pool_per_block) % segs_per_block
            np.testing.assert_array_equal(blk, exp_blk, err_msg=impl)
            np.testing.assert_array_equal(seg_in_blk, exp_seg, err_msg=impl)

    def test_clustered_hits_in_one_segment(self, monkeypatch):
        # Put nearly the whole top-k into a consecutive corpus run so
        # >POOL_SEG_KEEP entries ≥ τ share lane segments: the pool
        # cannot hold them, the multiplicity/count rules must flag the
        # row, and repair must restore exactness.
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        rng = np.random.RandomState(7)
        q = rng.randint(-2, 3, size=(9, 16)).astype(np.float32)
        r = rng.randint(-2, 3, size=(2048, 16)).astype(np.float32)
        hot = rng.randint(-2, 3, size=16).astype(np.float32)
        q[4] = hot * 8
        r[300:360] += hot  # 60 consecutive strong matches: ~2 segments
        searcher = SimilaritySearcher(r)
        for k in [40, 200]:
            qi, ri, s = searcher.global_topk(q, k, kappa=32)
            oqi, ori, os_ = brute_force_global_topk(q, r, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-4)

    def test_extraction_miss_repairs_from_pool(self, monkeypatch):
        # Rows whose deficit is pure under-budget collection (more
        # entries ≥ τ than κ, every one in its own lane segment, so
        # amb == 0) must repair from the device-resident pool: no
        # corpus count dispatch, no corpus re-search.
        import vsc2022_tpu.ops.similarity as S

        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        calls = {"corpus_topk": 0, "corpus_counts": 0, "pool_topk": 0}
        orig_topk = S._repair_rows_topk_packed
        orig_counts = S.SimilaritySearcher._corpus_counts
        orig_pool = S._pool_rows_topk_packed
        monkeypatch.setattr(
            S, "_repair_rows_topk_packed",
            lambda *a, **k: (calls.__setitem__(
                "corpus_topk", calls["corpus_topk"] + 1
            ), orig_topk(*a, **k))[1],
        )
        monkeypatch.setattr(
            S.SimilaritySearcher, "_corpus_counts",
            lambda self, *a, **k: (calls.__setitem__(
                "corpus_counts", calls["corpus_counts"] + 1
            ), orig_counts(self, *a, **k))[1],
        )
        monkeypatch.setattr(
            S, "_pool_rows_topk_packed",
            lambda *a, **k: (calls.__setitem__(
                "pool_topk", calls["pool_topk"] + 1
            ), orig_pool(*a, **k))[1],
        )
        rng = np.random.RandomState(13)
        dim = 16
        hot = rng.randint(-2, 3, size=dim).astype(np.float32)
        q = np.tile(hot * 8, (8, 1)).astype(np.float32)
        q += rng.randint(-1, 2, size=q.shape)
        r = rng.randint(-2, 3, size=(8192, dim)).astype(np.float32)
        # 50 strong matches, one per 128-lane segment → amb stays 0
        # while every row needs > κ=32 entries above τ.
        plant = 128 * np.arange(50) + (np.arange(50) % 128)
        r[plant] = hot * 4 + rng.randint(-1, 2, size=(50, dim))
        searcher = SimilaritySearcher(r)
        k = 8 * 45
        qi, ri, s = searcher.global_topk(q, k, kappa=32)
        oqi, ori, os_ = brute_force_global_topk(q, r, k)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)
        np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-4)
        assert calls["pool_topk"] > 0, "deficits must repair from pool"
        assert calls["corpus_topk"] == 0, "no corpus re-search expected"
        assert calls["corpus_counts"] == 0, (
            "amb == 0 rows must not pay a corpus count dispatch"
        )

    def test_budget_fallback_streams(self, monkeypatch):
        # A zero pool budget forces the chunked streaming collection;
        # results must stay oracle-exact through the legacy path.
        import vsc2022_tpu.ops.similarity as S

        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        monkeypatch.setattr(S, "POOL_BYTES_BUDGET", 0)
        rng = np.random.RandomState(11)
        q = rng.randint(-3, 4, size=(21, 24)).astype(np.float32)
        r = rng.randint(-3, 4, size=(700, 24)).astype(np.float32)
        searcher = SimilaritySearcher(r)
        assert searcher._collection_mode(24, 32, True) is True
        qi, ri, s = searcher.global_topk(q, 333)
        oqi, ori, os_ = brute_force_global_topk(q, r, 333)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)

    def test_dynamic_pool_budget(self, monkeypatch):
        # The pool budget is measured from device memory_stats when
        # available (real TPU): limit - resident - transient reserve,
        # floored at the static f32-calibrated default. CPU devices
        # report no stats, so tests always see the static budget.
        import vsc2022_tpu.ops.similarity as S

        rng = np.random.RandomState(3)
        r = rng.randn(700, 24).astype(np.float32)
        searcher = SimilaritySearcher(r)
        over = S.POOL_BYTES_BUDGET + 1  # measured headroom would decide
        assert searcher._pool_budget_bytes(over) == S.POOL_BYTES_BUDGET

        class FakeDev:
            def __init__(self, limit, used):
                self._stats = {"bytes_limit": limit, "bytes_in_use": used}
                self.calls = 0

            def memory_stats(self):
                self.calls += 1
                return dict(self._stats)

        class FakeArr:
            def __init__(self, dev):
                self._dev = dev

            def devices(self):
                return {self._dev}

        # A pool inside the static budget never pays the stats RPC.
        dev = FakeDev(16 << 30, 4 << 30)
        monkeypatch.setattr(
            searcher, "_refs", FakeArr(dev), raising=False,
        )
        assert (
            searcher._pool_budget_bytes(S.POOL_BYTES_BUDGET)
            == S.POOL_BYTES_BUDGET
        )
        assert dev.calls == 0
        # A compact corpus leaves measurable headroom: budget grows.
        want = (16 << 30) - (4 << 30) - S.POOL_HBM_RESERVE
        assert searcher._pool_budget_bytes(over) == want
        assert dev.calls == 1
        # NO caching when the measure decides: another consumer (the
        # localizer's ref tables, a second index) may have claimed HBM
        # since — each deciding search re-measures (ADVICE round 4).
        dev._stats["bytes_in_use"] = 12 << 30
        assert searcher._pool_budget_bytes(over) == S.POOL_BYTES_BUDGET
        assert dev.calls == 2

        # A transient stats failure (relay stall) falls back to the
        # static budget WITHOUT poisoning later searches: once stats
        # return, the measured budget is live again.
        flaky = FakeDev(16 << 30, 4 << 30)

        def _raise_once():
            flaky.calls += 1
            if flaky.calls == 1:
                raise RuntimeError("relay stall")
            return dict(flaky._stats)

        flaky.memory_stats = _raise_once
        monkeypatch.setattr(
            searcher, "_refs", FakeArr(flaky), raising=False,
        )
        assert searcher._pool_budget_bytes(over) == S.POOL_BYTES_BUDGET
        assert searcher._pool_budget_bytes(over) == want

    def test_pooled_l2_multi_block(self, monkeypatch):
        # L2 goodness scale through the pooled path, with several
        # column blocks so pool levels interleave block-major slices.
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", "pooled")
        rng = np.random.RandomState(5)
        q = rng.randint(-3, 4, size=(16, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(1500, 12)).astype(np.float32)
        searcher = SimilaritySearcher(r, metric="L2", col_block=256)
        qi, ri, s = searcher.global_topk(q, 900)
        oqi, ori, os_ = brute_force_global_topk(q, r, 900, "L2")
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)
        np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-4)

    def test_sort_key_monotone(self):
        from vsc2022_tpu.ops.similarity import _f32_sort_key, _key_to_f32
        import jax.numpy as jnp

        vals = np.array(
            [-np.inf, -1e30, -2.0, -1.0, -1e-30, 0.0, 1e-30, 1.0, 2.0,
             1e30, np.inf],
            dtype=np.float32,
        )
        keys = np.asarray(_f32_sort_key(jnp.asarray(vals)))
        assert (np.diff(keys.astype(np.int64)) > 0).all()
        back = np.asarray(_key_to_f32(jnp.asarray(keys)))
        np.testing.assert_array_equal(back, vals)


def dequantized_oracle_topk(q, r, k):
    """Brute force over the int8-DEQUANTIZED corpus, in the device's
    compute order: f32 integer-exact dot against the int8 codes, then
    one per-column scale multiply (see quantize_rows_int8)."""
    from vsc2022_tpu.ops.similarity import quantize_rows_int8

    r_i8, scale = quantize_rows_int8(r)
    dense = (q @ r_i8.astype(np.float32).T) * scale[None, :]
    flat = dense.ravel()
    k = min(k, flat.size)
    order = np.lexsort(
        (
            np.tile(np.arange(r.shape[0]), q.shape[0]),
            np.repeat(np.arange(q.shape[0]), r.shape[0]),
            -flat,
        )
    )[:k]
    qi, ri = np.unravel_index(order, dense.shape)
    return qi, ri, dense[qi, ri]


class TestInt8Mode:
    """int8 corpus storage (the FAISS SQ8 analog; quarter the HBM of
    f32). Searches are EXACT — incl. tie-breaks — over the dequantized
    corpus; integer-valued features make the oracle bit-comparable
    (the int8 dot is integer-exact in f32, the scale multiply is one
    f32 op in both implementations)."""

    def test_global_topk_matches_dequantized_oracle(self):
        rng = np.random.RandomState(3)
        q = rng.randint(-3, 4, size=(37, 24)).astype(np.float32)
        r = rng.randint(-3, 4, size=(211, 24)).astype(np.float32)
        searcher = SimilaritySearcher(r, dtype="int8")
        for k in [1, 7, 100, 2000]:
            qi, ri, s = searcher.global_topk(q, k)
            oqi, ori, os_ = dequantized_oracle_topk(q, r, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_array_equal(s, os_)

    @pytest.mark.parametrize("collection", ["stream", "pooled"])
    def test_collection_modes(self, monkeypatch, collection):
        monkeypatch.setenv("VSC2022_TPU_COLLECTION", collection)
        rng = np.random.RandomState(11)
        q = rng.randint(-3, 4, size=(16, 12)).astype(np.float32)
        r = rng.randint(-3, 4, size=(1500, 12)).astype(np.float32)
        searcher = SimilaritySearcher(r, dtype="int8", col_block=256)
        qi, ri, s = searcher.global_topk(q, 900)
        oqi, ori, os_ = dequantized_oracle_topk(q, r, 900)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)
        np.testing.assert_array_equal(s, os_)

    def test_row_topk(self):
        from vsc2022_tpu.ops.similarity import quantize_rows_int8

        rng = np.random.RandomState(4)
        q = rng.randint(-3, 4, size=(19, 16)).astype(np.float32)
        r = rng.randint(-3, 4, size=(301, 16)).astype(np.float32)
        searcher = SimilaritySearcher(r, dtype="int8")
        s, i = searcher.row_topk(q, 5)
        r_i8, scale = quantize_rows_int8(r)
        dense = (q @ r_i8.astype(np.float32).T) * scale[None, :]
        expect_i = np.argsort(-dense, axis=1, kind="stable")[:, :5]
        np.testing.assert_array_equal(
            s, np.take_along_axis(dense, expect_i, 1)
        )

    def test_append_and_keep_match_fresh(self):
        rng = np.random.RandomState(7)
        q = rng.randint(-3, 4, size=(19, 16)).astype(np.float32)
        r1 = rng.randint(-3, 4, size=(97, 16)).astype(np.float32)
        r2 = rng.randint(-3, 4, size=(61, 16)).astype(np.float32)
        searcher = SimilaritySearcher(r1, dtype="int8")
        searcher.append_rows(r2)
        fresh = SimilaritySearcher(np.concatenate([r1, r2]), dtype="int8")
        for a, b in zip(searcher.global_topk(q, 500),
                        fresh.global_topk(q, 500)):
            np.testing.assert_array_equal(a, b)
        keep = np.sort(rng.choice(158, 90, replace=False))
        searcher.keep_rows(keep)
        fresh2 = SimilaritySearcher(
            np.concatenate([r1, r2])[keep], dtype="int8"
        )
        for a, b in zip(searcher.global_topk(q, 500),
                        fresh2.global_topk(q, 500)):
            np.testing.assert_array_equal(a, b)

    def test_float_fuzz_vs_dequantized_oracle(self):
        """Float descriptors: exactness is defined over the
        DEQUANTIZED corpus (integer codes keep the dot order-exact in
        f32; only the final scale multiply is a float op, identical in
        both implementations)."""
        rng = np.random.RandomState(12)
        for _ in range(4):
            nq = int(rng.randint(5, 40))
            nr = int(rng.randint(20, 300))
            q = rng.randn(nq, 16).astype(np.float32)
            r = rng.randn(nr, 16).astype(np.float32)
            k = int(rng.randint(1, nq * nr + 1))
            searcher = SimilaritySearcher(r, dtype="int8")
            qi, ri, s = searcher.global_topk(q, k)
            oqi, ori, os_ = dequantized_oracle_topk(q, r, k)
            # Float q makes the per-element products non-integer, so
            # dot summation order can differ from numpy by ~1 ulp:
            # compare the selected SET tolerance-aware, scores tightly.
            assert len(qi) == len(oqi)
            np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-6)

    def test_quantization_quality_unit_norm(self):
        """Planted unit-norm copies must still rank first under int8
        quantization (the SSCD descriptor regime)."""
        rng = np.random.RandomState(5)
        l2n = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)
        r = l2n(rng.randn(300, 64).astype(np.float32))
        q = l2n(rng.randn(20, 64).astype(np.float32))
        q[:5] = r[100:105]
        searcher = SimilaritySearcher(r, dtype="int8")
        qi, ri, s = searcher.global_topk(q, 5)
        # The 5 planted pairs are the global top-5 (order: score desc —
        # quantization perturbs the planted ~1.0 scores differently).
        assert set(zip(qi.tolist(), ri.tolist())) == {
            (i, 100 + i) for i in range(5)
        }
        assert (s > 0.99).all()

    def test_int8_requires_ip(self):
        with pytest.raises(AssertionError):
            SimilaritySearcher(
                np.zeros((4, 8), np.float32), metric="L2", dtype="int8"
            )

    def test_video_index_sq8_codec(self):
        rng = np.random.RandomState(6)
        refs = [
            VideoFeature(
                video_id=f"R{i:06d}",
                timestamps=np.arange(20, dtype=np.float64),
                feature=rng.randint(-3, 4, size=(20, 16)).astype(
                    np.float32
                ),
            )
            for i in range(6)
        ]
        q = [
            VideoFeature(
                video_id="Q000000",
                timestamps=np.arange(10, dtype=np.float64),
                feature=refs[2].feature[:10].copy(),
            )
        ]
        idx = VideoIndex(16, codec_str="SQ8")
        assert idx.dtype == "int8"
        idx.add(refs)
        results = idx.search(q, 30)
        best = max(
            results,
            key=lambda pm: max(m["score"] for m in pm.records()),
        )
        assert best.ref_id == "R000002"
        with pytest.raises(ValueError):
            VideoIndex(16, codec_str="PQ16")


class TestInt8ScoreNorm:
    def test_sn_pipeline_matches_dequantized_oracle(self):
        """The one-dispatch fused SN pipeline under int8 staging (both
        corpora quantized): ids exactly equal the dequantized oracle's,
        scores to f32 dot-order tolerance (the appended bias column is
        non-integer)."""
        from vsc2022_tpu.ops.similarity import quantize_rows_int8
        from vsc2022_tpu.retrieval.sn_search import ScoreNormalizedSearcher

        rng = np.random.RandomState(5)
        l2n = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)
        q = l2n(rng.randn(40, 32).astype(np.float32))
        r = l2n(rng.randn(300, 32).astype(np.float32))
        noise = l2n(rng.randn(120, 32).astype(np.float32))
        q[3:9] = r[10:16]

        sn = ScoreNormalizedSearcher(r, noise, beta=1.2, dtype="int8")
        qi, ri, s = sn.global_topk(q, 200)

        r_sn = np.concatenate([r, np.ones((300, 1), np.float32)], axis=1)
        r_i8, r_sc = quantize_rows_int8(r_sn)
        n_i8, n_sc = quantize_rows_int8(noise)
        bias = ((q @ n_i8.astype(np.float32).T) * n_sc[None, :]).max(axis=1)
        q_sn = np.concatenate([q, (-1.2 * bias)[:, None]], axis=1)
        dense = (q_sn @ r_i8.astype(np.float32).T) * r_sc[None, :]
        order = np.lexsort(
            (np.tile(np.arange(300), 40), np.repeat(np.arange(40), 300),
             -dense.ravel())
        )[:200]
        oqi, ori = np.unravel_index(order, dense.shape)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)
        np.testing.assert_allclose(s, dense[oqi, ori], rtol=1e-5, atol=1e-6)
        # The planted copies rank first.
        assert set(qi[:6]) == set(range(3, 9))
