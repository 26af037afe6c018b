"""IVF pruned-tier tests: block pruning must never change results.

The contract (ops/ivf.py): ``IVFSimilaritySearcher.global_topk`` is
bit-exact vs the dense brute-force oracle — including (q, r) tie-breaks
in the CALLER's id space — on every path (pruned, certificate-repaired,
full-scan fallback, saturation repair, bf16/int8 tiers, post-mutation).
Pruning only moves work, never answers. Modeled on the reference's
codec surface (vsc/index.py:78-82, faiss.index_factory IVF family) and
this suite's test_search.py oracle conventions.

Integer-valued features keep every score exact in f32, so tie-break
determinism is fully testable (same trick as test_search.py).
"""

import numpy as np
import pytest

from tests.test_search import brute_force_global_topk
from vsc2022_tpu.ops.ivf import IVFSimilaritySearcher, kmeans_assign
from vsc2022_tpu.ops.similarity import SimilaritySearcher
from vsc2022_tpu.retrieval import VideoIndex
from vsc2022_tpu.types import VideoFeature


def clustered_ints(rng, n, d, n_clusters, spread=12, noise=2):
    """Integer rows in well-separated clusters (exact f32 scores, and
    k-means finds real structure so the probe phase actually prunes).
    Cluster membership round-robins over row ids, so the contiguous
    layout's permutation interleaves caller ids — any tie between rows
    of different clusters exercises the id remap before the tie sort."""
    centers = rng.randint(-spread, spread + 1, size=(n_clusters, d)) * 8
    assign = np.arange(n) % n_clusters
    rows = centers[assign] + rng.randint(-noise, noise + 1, size=(n, d))
    return rows.astype(np.float32), assign


class TestIVFExactness:
    def test_pruned_matches_oracle(self):
        rng = np.random.RandomState(0)
        r, _ = clustered_ints(rng, 3000, 24, n_clusters=12)
        q = r[rng.choice(3000, size=40, replace=False)] + rng.randint(
            -1, 2, size=(40, 24)
        ).astype(np.float32)
        s = IVFSimilaritySearcher(r, nlist=12, col_block=128)
        for k in [1, 10, 200, 2000]:
            qi, ri, sc = s.global_topk(q, k)
            oqi, ori, osc = brute_force_global_topk(q, r, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(sc, osc, rtol=1e-6)
        # Clustered queries near a few cells: pruning must engage.
        assert s.last_search_stats["pruned"] is True
        assert s.last_search_stats["probed"] < s.last_search_stats["n_blocks"]

    def test_low_nprobe_certificate_repairs(self):
        # nprobe=1 probes each row's single best block; the tau
        # certificate + count repair must recover everything the probe
        # missed. Queries BETWEEN clusters make misses certain.
        rng = np.random.RandomState(1)
        r, assign = clustered_ints(rng, 2048, 16, n_clusters=8)
        mid = (
            r[assign == 0][:32].astype(np.float64)
            + r[assign == 1][:32].astype(np.float64)
        ) / 2.0
        q = np.round(mid).astype(np.float32)
        s = IVFSimilaritySearcher(r, nlist=8, nprobe=1, col_block=128)
        for k in [5, 64, 700]:
            qi, ri, sc = s.global_topk(q, k)
            oqi, ori, osc = brute_force_global_topk(q, r, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(sc, osc, rtol=1e-6)

    def test_isotropic_data_still_exact(self):
        # No cluster structure: bounds cannot prune (or barely), the
        # searcher degrades toward a full scan — exactness unaffected.
        rng = np.random.RandomState(2)
        r = rng.randint(-4, 5, size=(1536, 16)).astype(np.float32)
        q = rng.randint(-4, 5, size=(23, 16)).astype(np.float32)
        s = IVFSimilaritySearcher(r, nlist=8, col_block=128)
        for k in [1, 50, 900]:
            qi, ri, sc = s.global_topk(q, k)
            oqi, ori, osc = brute_force_global_topk(q, r, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(sc, osc, rtol=1e-6)

    def test_saturation_repair_under_pruning(self):
        # One query hot against half a cluster: its per-row κ budget
        # saturates and the exact repair pass must fire on the PERMUTED
        # corpus, then remap ids (test_search.py's fallback test, IVF'd).
        rng = np.random.RandomState(3)
        r, assign = clustered_ints(rng, 2048, 16, n_clusters=8)
        q = rng.randint(-2, 3, size=(8, 16)).astype(np.float32)
        q[3] = r[assign == 2][0] * 3
        s = IVFSimilaritySearcher(r, nlist=8, col_block=128)
        k = 600
        qi, ri, sc = s.global_topk(q, k, kappa=64)
        oqi, ori, osc = brute_force_global_topk(q, r, k)
        np.testing.assert_array_equal(qi, oqi)
        np.testing.assert_array_equal(ri, ori)
        np.testing.assert_allclose(sc, osc, rtol=1e-6)

    def test_small_corpus_and_exact_fallbacks(self):
        # < 4 blocks, approx_candidates=False, and k=0 all route to the
        # base searcher unchanged.
        rng = np.random.RandomState(4)
        r = rng.randint(-3, 4, size=(300, 8)).astype(np.float32)
        q = rng.randint(-3, 4, size=(9, 8)).astype(np.float32)
        s = IVFSimilaritySearcher(r, nlist=4, col_block=128)
        for kwargs in [{}, {"approx_candidates": False}]:
            qi, ri, sc = s.global_topk(q, 25, **kwargs)
            oqi, ori, osc = brute_force_global_topk(q, r, 25)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
        assert s.global_topk(q, 0)[0].size == 0

    def test_row_topk_and_row_nn_remap(self):
        rng = np.random.RandomState(5)
        r, _ = clustered_ints(rng, 1024, 16, n_clusters=8)
        s = IVFSimilaritySearcher(r, nlist=8, col_block=128)
        q = (r[[7, 500, 1011]] * 5).astype(np.float32)
        sc, ids = s.row_topk(q, 3)
        dense = q @ r.T
        # Each returned id, looked up in the CALLER's corpus, must
        # reproduce its returned score — a staged (permuted) id leaking
        # out would land on an unrelated row and fail this.
        np.testing.assert_allclose(
            np.take_along_axis(dense, ids, axis=1), sc, rtol=1e-6
        )
        np.testing.assert_allclose(
            sc[:, 0], dense.max(axis=1), rtol=1e-6
        )
        np.testing.assert_allclose(
            s.row_nn(q), dense.max(axis=1), rtol=1e-6
        )


class TestIVFDtypes:
    """The storage tiers compose with pruning: per-row bf16 cast and
    per-row int8 quantization are permutation-invariant, so the IVF
    searcher must equal the PLAIN searcher of the same dtype bit-for-
    bit, tie-breaks included."""

    @pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
    def test_matches_plain_searcher_same_dtype(self, dtype):
        rng = np.random.RandomState(6)
        r, _ = clustered_ints(rng, 1792, 16, n_clusters=8)
        q = rng.randint(-6, 7, size=(17, 16)).astype(np.float32)
        ivf = IVFSimilaritySearcher(
            r, nlist=8, col_block=128, dtype=dtype
        )
        plain = SimilaritySearcher(r, col_block=128, dtype=dtype)
        for k in [1, 40, 800]:
            gi, gr, gs = ivf.global_topk(q, k)
            pi, pr, ps = plain.global_topk(q, k)
            np.testing.assert_array_equal(gi, pi)
            np.testing.assert_array_equal(gr, pr)
            np.testing.assert_array_equal(gs, ps)


class TestIVFMutations:
    def test_append_stays_exact(self):
        rng = np.random.RandomState(7)
        r1, _ = clustered_ints(rng, 1536, 16, n_clusters=8)
        r2 = rng.randint(-8, 9, size=(200, 16)).astype(np.float32)
        q = rng.randint(-6, 7, size=(13, 16)).astype(np.float32)
        s = IVFSimilaritySearcher(r1, nlist=8, col_block=128)
        s.global_topk(q, 10)  # stage + search before growing
        s.append_rows(r2)
        both = np.concatenate([r1, r2])
        for k in [1, 64, 1200]:
            qi, ri, sc = s.global_topk(q, k)
            oqi, ori, osc = brute_force_global_topk(q, both, k)
            np.testing.assert_array_equal(qi, oqi)
            np.testing.assert_array_equal(ri, ori)
            np.testing.assert_allclose(sc, osc, rtol=1e-6)

    def test_keep_rows_matches_fresh_plain(self):
        # keep_idx is in CALLER id space; survivors renumber by keep
        # order (the contract every index/serve caller relies on), so
        # the shrunk IVF searcher must equal a fresh PLAIN searcher
        # over refs[keep_idx] exactly.
        rng = np.random.RandomState(8)
        r, _ = clustered_ints(rng, 1536, 16, n_clusters=8)
        q = rng.randint(-6, 7, size=(11, 16)).astype(np.float32)
        keep = np.sort(rng.choice(1536, size=900, replace=False))
        s = IVFSimilaritySearcher(r, nlist=8, col_block=128)
        s.global_topk(q, 10)
        s.keep_rows(keep)
        fresh = SimilaritySearcher(r[keep], col_block=128)
        for k in [1, 64, 700]:
            gi, gr, gs = s.global_topk(q, k)
            fi, fr, fs = fresh.global_topk(q, k)
            np.testing.assert_array_equal(gi, fi)
            np.testing.assert_array_equal(gr, fr)
            np.testing.assert_array_equal(gs, fs)

    def test_kmeans_assign_shapes(self):
        rng = np.random.RandomState(9)
        r, true_assign = clustered_ints(rng, 640, 8, n_clusters=5)
        a, cent = kmeans_assign(r, nlist=5, iters=6, seed=0)
        assert a.shape == (640,) and a.min() >= 0 and a.max() < 5
        assert cent.shape == (5, 8)
        # Well-separated clusters: k-means must recover a relabeling of
        # the truth (every true cluster lands in exactly one cell).
        for c in range(5):
            assert len(set(a[true_assign == c])) == 1

    def test_order_clusters_chains_neighbors(self):
        from vsc2022_tpu.ops.ivf import order_clusters

        # Centroids on a line, shuffled: the chain must visit them in
        # line order (from whichever end index 0 sits nearer).
        line = np.array([0.0, 10.0, 20.0, 30.0, 40.0])[:, None]
        shuf = np.array([2, 0, 4, 1, 3])
        order = order_clusters(line[shuf])
        positions = shuf[order]  # visit order in line coordinates
        diffs = np.diff(positions)
        assert np.all(np.abs(diffs) == 1) or sorted(
            np.abs(diffs).tolist()
        ).count(1) >= 3  # one restart allowed when 0 starts mid-line
        assert order_clusters(np.zeros((1, 3))).tolist() == [0]


def _vf(vid, f):
    return VideoFeature(
        video_id=vid,
        timestamps=np.arange(f.shape[0], dtype=np.float64),
        feature=f,
    )


class TestIVFVideoIndex:
    def test_codec_parse_and_equality_with_flat(self):
        rng = np.random.RandomState(10)
        feats, _ = clustered_ints(rng, 900, 16, n_clusters=6)
        refs = [_vf(i, feats[i * 90 : (i + 1) * 90]) for i in range(10)]
        queries = [
            _vf(0, feats[:40] + rng.randint(-1, 2, (40, 16)).astype(np.float32))
        ]
        ivf = VideoIndex(16, codec_str="IVF6,Flat")
        ivf.add(refs)
        flat = VideoIndex(16)
        flat.add(refs)
        key = lambda pm: (pm.query_id, pm.ref_id)  # noqa: E731
        got = {key(pm): pm.matches for pm in ivf.search(queries, global_k=50)}
        exp = {key(pm): pm.matches for pm in flat.search(queries, global_k=50)}
        assert set(got) == set(exp)
        for k in exp:
            assert [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in got[k]
            ] == [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in exp[k]
            ]

    def test_codec_sq8_variant_sets_int8(self):
        idx = VideoIndex(8, codec_str="IVF32,SQ8")
        assert idx.dtype == "int8" and idx._ivf_nlist == 32
        assert VideoIndex(8, codec_str="IVF32")._ivf_nlist == 32

    def test_bad_codecs_rejected(self):
        with pytest.raises(ValueError, match="Unsupported codec"):
            VideoIndex(8, codec_str="IVF32,PQ4")
        with pytest.raises(ValueError, match="Unsupported codec"):
            VideoIndex(8, codec_str="HNSW32")

    def test_ivf_l2_rejected(self):
        with pytest.raises(ValueError, match="IP"):
            IVFSimilaritySearcher(
                np.zeros((16, 4), np.float32), nlist=2, metric="L2"
            )

    def test_mesh_plus_ivf_rejected(self):
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        with pytest.raises(ValueError, match="single-chip"):
            VideoIndex(8, codec_str="IVF16", mesh=corpus_mesh(8))


class TestIVFScoreNormalized:
    """IVF under the production SN pipeline: ScoreNormalizedVideoIndex
    with an IVF codec must equal the Flat index bit-for-bit (the IVF
    searcher takes the two-dispatch path — bias, then the pruned
    candidate phase — instead of the one-dispatch fusion; both are
    exact, so results including tie-breaks must be identical)."""

    def test_sn_ivf_matches_flat_and_prunes(self):
        from vsc2022_tpu.retrieval.index import ScoreNormalizedVideoIndex

        rng = np.random.RandomState(12)
        n, d, fpv = 33000, 24, 825  # >= 4 streaming blocks at default
        r, assign = clustered_ints(rng, n, d, n_clusters=8)
        refs = [
            _vf(i, r[i * fpv : (i + 1) * fpv].astype(np.float32))
            for i in range(n // fpv)
        ]
        noise = [
            _vf(
                1000 + i,
                rng.randint(-4, 5, size=(50, d)).astype(np.float32),
            )
            for i in range(3)
        ]
        # One FOCUSED query video near cluster 0: the probe union must
        # stay small enough to prune.
        q = [_vf(0, (r[assign == 0][:40]).astype(np.float32))]

        flat = ScoreNormalizedVideoIndex(d, noise, beta=1.2)
        flat.add(refs)
        ivf = ScoreNormalizedVideoIndex(d, noise, beta=1.2,
                                        codec_str="IVF8")
        ivf.add(refs)

        key = lambda pm: (pm.query_id, pm.ref_id)  # noqa: E731
        exp = {key(pm): pm.matches for pm in flat.search(q, global_k=500)}
        got = {key(pm): pm.matches for pm in ivf.search(q, global_k=500)}
        assert set(got) == set(exp)
        for kk in exp:
            assert [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in got[kk]
            ] == [
                (m.query_timestamps, m.ref_timestamps, m.score)
                for m in exp[kk]
            ]
        stats = ivf._searcher.searcher.last_search_stats
        assert stats is not None and stats["pruned"] is True
        assert stats["probed"] < stats["n_blocks"]

    def test_sn_ivf_mutations_stay_exact(self):
        from vsc2022_tpu.retrieval.index import ScoreNormalizedVideoIndex

        rng = np.random.RandomState(13)
        d = 16
        base = [
            _vf(i, rng.randint(-4, 5, (30, d)).astype(np.float32))
            for i in range(6)
        ]
        more = [
            _vf(10 + i, rng.randint(-4, 5, (25, d)).astype(np.float32))
            for i in range(2)
        ]
        noise = [
            _vf(100, rng.randint(-4, 5, (40, d)).astype(np.float32))
        ]
        q = [_vf(0, base[2].feature[:12].copy())]

        ivf = ScoreNormalizedVideoIndex(d, noise, codec_str="IVF4")
        ivf.add(base)
        ivf.search(q, global_k=10)  # stage before mutating
        ivf.add(more)
        ivf.remove([1])

        fresh = ScoreNormalizedVideoIndex(d, noise)
        fresh.add([b for b in base if b.video_id != 1] + more)

        key = lambda pm: (pm.query_id, pm.ref_id)  # noqa: E731
        got = {key(pm): pm.matches for pm in ivf.search(q, global_k=60)}
        exp = {key(pm): pm.matches for pm in fresh.search(q, global_k=60)}
        assert set(got) == set(exp)
        for kk in exp:
            assert [(m.query_timestamps, m.score) for m in got[kk]] == [
                (m.query_timestamps, m.score) for m in exp[kk]
            ]

    def test_sn_mesh_plus_ivf_rejected(self):
        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.retrieval.index import ScoreNormalizedVideoIndex

        rng = np.random.RandomState(14)
        noise = [_vf(100, rng.randn(30, 8).astype(np.float32))]
        with pytest.raises(ValueError, match="single-chip"):
            ScoreNormalizedVideoIndex(
                8, noise, codec_str="IVF4", mesh=corpus_mesh(8)
            )


@pytest.mark.slow
class TestIVFServe:
    def test_serve_ivf_flag_matches_plain_server(self, tmp_path):
        """`serve --ivf N` must answer bit-identically to a plain
        server over the same corpus (the IVF layout is invisible in
        results — only the scan schedule changes)."""
        import os

        from vsc2022_tpu.metrics import Dataset
        from vsc2022_tpu.retrieval.client import ServeClient
        from vsc2022_tpu.storage import store_features

        rng = np.random.RandomState(15)
        d = 16
        refs = [
            _vf(i, rng.randint(-4, 5, (30, d)).astype(np.float32))
            for i in range(8)
        ]
        noise = [
            _vf(100, rng.randint(-4, 5, (40, d)).astype(np.float32))
        ]
        q = [_vf(0, refs[3].feature[:12].copy())]
        rp = str(tmp_path / "refs.npz")
        np_ = str(tmp_path / "noise.npz")
        qp = str(tmp_path / "q.npz")
        store_features(rp, refs, Dataset.REFS)
        store_features(np_, noise, Dataset.REFS)
        store_features(qp, q, Dataset.QUERIES)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
        outs = {}
        for name, extra in [("flat", []), ("ivf", ["--ivf", "4"])]:
            csv = str(tmp_path / f"{name}.csv")
            with ServeClient.spawn(
                rp, score_norm_features=np_, env=env, cwd=repo,
                extra_args=["--no_warmup"] + extra,
            ) as c:
                c.search(qp, candidates_csv=csv)
            outs[name] = open(csv).read()
        assert outs["ivf"] == outs["flat"]
