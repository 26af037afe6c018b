"""Resident retrieval serving: the ScoreNormalizedVideoIndex must
reproduce the reference-shaped score_normalize → CandidateGeneration
pipeline, and the serve CLI must answer repeated stdin requests from
one staged corpus (including the keep-serving error contract)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from vsc2022_tpu.metrics import Dataset
from vsc2022_tpu.retrieval import (
    CandidateGeneration,
    MaxScoreAggregation,
    ScoreNormalizedVideoIndex,
    VideoIndex,
)
from vsc2022_tpu.retrieval.candidates import rank_candidates
from vsc2022_tpu.retrieval.score_norm import score_normalize
from vsc2022_tpu.storage import store_features
from vsc2022_tpu.types import VideoFeature

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _make_data(rng, d=24, n_refs=10, n_noise=6, n_queries=3, plant=2):
    refs = [
        VideoFeature(
            video_id=i,
            timestamps=np.arange(n := int(rng.randint(20, 40)), dtype=np.float64),
            feature=l2n(rng.randn(n, d)).astype(np.float32),
        )
        for i in range(n_refs)
    ]
    noise = [
        VideoFeature(
            video_id=1000 + i,
            timestamps=np.arange(25, dtype=np.float64),
            feature=l2n(rng.randn(25, d)).astype(np.float32),
        )
        for i in range(n_noise)
    ]
    queries = []
    for i in range(n_queries):
        f = l2n(rng.randn(30, d)).astype(np.float32)
        if i < plant:
            f[10:18] = refs[i].feature[5:13]
        queries.append(
            VideoFeature(
                video_id=i, timestamps=np.arange(30, dtype=np.float64),
                feature=f,
            )
        )
    return queries, refs, noise


class TestScoreNormalizedVideoIndex:
    def test_matches_list_level_pipeline(self):
        # Path A, the reference shape: transform every VideoFeature
        # via score_normalize, then search the transformed corpus.
        # Path B, the serving shape: a persistent index that applies
        # the same transforms device-side inside the fused search.
        rng = np.random.RandomState(3)
        queries, refs, noise = _make_data(rng)
        k = 400

        qn, rn = score_normalize(queries, refs, noise, beta=1.2)
        expect = CandidateGeneration(rn, MaxScoreAggregation()).query(
            qn, global_k=k
        )

        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        index.add(refs)
        got = rank_candidates(
            index.search(queries, global_k=k), MaxScoreAggregation()
        )

        assert {(c.query_id, c.ref_id) for c in got} == {
            (c.query_id, c.ref_id) for c in expect
        }
        gmap = {(c.query_id, c.ref_id): c.score for c in got}
        for c in expect:
            assert gmap[(c.query_id, c.ref_id)] == pytest.approx(
                c.score, abs=1e-5
            )

    def test_staged_corpus_reused_across_searches(self):
        # The searcher (device-staged corpus) must build once; repeat
        # query batches must not restage.
        rng = np.random.RandomState(5)
        queries, refs, noise = _make_data(rng)
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        index.add(refs)
        index.search(queries[:1], global_k=50)
        searcher = index._searcher
        assert searcher is not None
        index.search(queries[1:], global_k=50)
        assert index._searcher is searcher

    def test_noise_overlap_rejected(self):
        rng = np.random.RandomState(7)
        queries, refs, noise = _make_data(rng)
        noise[0] = VideoFeature(
            video_id=refs[0].video_id,
            timestamps=noise[0].timestamps,
            feature=noise[0].feature,
        )
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        # The overlap is rejected up front, at add time (it used to
        # surface at the first search's staging).
        with pytest.raises(Exception, match="independent"):
            index.add(refs)

    def test_sharded_matches_unsharded(self):
        # The serving index over a corpus mesh must return the same
        # candidates as single-device (the sharded fused SN pipeline
        # underneath).
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh

        assert len(jax.devices()) >= 8
        rng = np.random.RandomState(13)
        queries, refs, noise = _make_data(rng)
        k = 300

        def run(mesh):
            index = ScoreNormalizedVideoIndex(
                queries[0].dimensions(), noise, beta=1.2, mesh=mesh
            )
            index.add(refs)
            return rank_candidates(
                index.search(queries, global_k=k), MaxScoreAggregation()
            )

        expect = run(None)
        got = run(corpus_mesh(8))
        assert [(c.query_id, c.ref_id) for c in got] == [
            (c.query_id, c.ref_id) for c in expect
        ]
        np.testing.assert_allclose(
            [c.score for c in got], [c.score for c in expect], rtol=1e-5
        )

    def test_sharded_add_appends_device_side(self):
        # Growing the SN index over a corpus mesh: the staged sharded
        # searcher is grown in place (only new rows cross the host
        # link; the fused SN dispatch re-keys on the new geometry) and
        # results match a fresh sharded index over the combined refs.
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh

        assert len(jax.devices()) >= 8
        rng = np.random.RandomState(31)
        queries, refs, noise = _make_data(rng)
        extra = [
            VideoFeature(
                video_id=60 + i,
                timestamps=np.arange(26, dtype=np.float64),
                feature=np.concatenate(
                    [
                        queries[2].feature[2:14],
                        l2n(rng.randn(14, 24)).astype(np.float32),
                    ]
                )
                if i == 0
                else l2n(rng.randn(26, 24)).astype(np.float32),
            )
            for i in range(3)
        ]
        mesh = corpus_mesh(8)
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2, mesh=mesh
        )
        index.add(refs)
        index.search(queries, global_k=200)
        staged = index._searcher
        index.add(extra)
        assert index._searcher is staged  # grown, not restaged
        got = rank_candidates(
            index.search(queries, global_k=200), MaxScoreAggregation()
        )
        fresh = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2, mesh=corpus_mesh(8)
        )
        fresh.add(refs + extra)
        expect = rank_candidates(
            fresh.search(queries, global_k=200), MaxScoreAggregation()
        )
        assert [(c.query_id, c.ref_id) for c in got] == [
            (c.query_id, c.ref_id) for c in expect
        ]
        np.testing.assert_allclose(
            [c.score for c in got], [c.score for c in expect], rtol=1e-5
        )
        assert any(c.query_id == 2 and c.ref_id == 60 for c in got)

    def test_sharded_remove_compacts_device_side(self):
        # Shrinking the SN index over a corpus mesh: the staged sharded
        # searcher compacts in place (survivors rebalance over ICI; the
        # fused SN dispatch re-keys on the shrunk geometry) and results
        # match a fresh sharded index over the survivors.
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh

        assert len(jax.devices()) >= 8
        rng = np.random.RandomState(37)
        queries, refs, noise = _make_data(rng)
        mesh = corpus_mesh(8)
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2, mesh=mesh
        )
        index.add(refs)
        index.search(queries, global_k=200)
        staged = index._searcher
        index.remove([1, 4, 7])
        assert index._searcher is staged  # compacted, not restaged
        got = rank_candidates(
            index.search(queries, global_k=200), MaxScoreAggregation()
        )
        fresh = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2, mesh=corpus_mesh(8)
        )
        fresh.add([vf for vf in refs if vf.video_id not in (1, 4, 7)])
        expect = rank_candidates(
            fresh.search(queries, global_k=200), MaxScoreAggregation()
        )
        assert [(c.query_id, c.ref_id) for c in got] == [
            (c.query_id, c.ref_id) for c in expect
        ]
        np.testing.assert_allclose(
            [c.score for c in got], [c.score for c in expect], rtol=1e-5
        )
        # Query 1's planted copy was in ref 1 — gone with the remove.
        assert not any(c.ref_id in (1, 4, 7) for c in got)

    def test_add_after_search_appends_device_side(self):
        # Growing the SN index after staging must reuse the SAME
        # searcher (device-side append of transformed+bias-augmented
        # rows) and match a fresh index over the combined refs.
        rng = np.random.RandomState(21)
        queries, refs, noise = _make_data(rng)
        extra = [
            VideoFeature(
                video_id=50,
                timestamps=np.arange(28, dtype=np.float64),
                feature=np.concatenate(
                    [queries[2].feature[3:17], l2n(rng.randn(14, 24)).astype(np.float32)]
                ),
            )
        ]
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        index.add(refs)
        index.search(queries, global_k=200)
        staged = index._searcher
        index.add(extra)
        assert index._searcher is staged
        got = rank_candidates(
            index.search(queries, global_k=200), MaxScoreAggregation()
        )
        fresh = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        fresh.add(refs + extra)
        expect = rank_candidates(
            fresh.search(queries, global_k=200), MaxScoreAggregation()
        )
        assert [(c.query_id, c.ref_id) for c in got] == [
            (c.query_id, c.ref_id) for c in expect
        ]
        np.testing.assert_allclose(
            [c.score for c in got], [c.score for c in expect], rtol=1e-5
        )
        assert any(
            c.query_id == 2 and c.ref_id == 50 for c in got
        )  # the planted pair only the added ref can produce

    def test_add_noise_overlap_rejected_atomically(self):
        rng = np.random.RandomState(25)
        queries, refs, noise = _make_data(rng)
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        index.add(refs)
        n_before = len(index.video_clip_to_video_ids)
        bad = [
            VideoFeature(
                video_id=noise[0].video_id,
                timestamps=np.arange(5, dtype=np.float64),
                feature=l2n(rng.randn(5, 24)).astype(np.float32),
            )
        ]
        with pytest.raises(Exception, match="independent"):
            index.add(bad)
        # A failed add leaves no partial state.
        assert len(index.video_clip_to_video_ids) == n_before
        assert noise[0].video_id not in index.video_metadata

    def test_knn_mode(self):
        # KNN (global_k < 0) on the SN index: per-frame top-k over the
        # bias-augmented similarity; planted query frames must hit
        # their source videos.
        rng = np.random.RandomState(9)
        queries, refs, noise = _make_data(rng)
        index = ScoreNormalizedVideoIndex(
            queries[0].dimensions(), noise, beta=1.2
        )
        index.add(refs)
        matches = index.search(queries[:1], global_k=-2)
        pair_ids = {(m.query_id, m.ref_id) for m in matches}
        assert (0, 0) in pair_ids  # raw int ids: no npz round trip here


class TestRemoveFailureConsistency:
    def test_device_failure_keeps_holders_consistent(self, monkeypatch):
        # A device-side compaction failure during `remove` must leave
        # the index and the localizer AGREEING (both shrunk, staged
        # state dropped), so the error is survivable: the next search
        # restages and serves the survivors. Without this, a retry is
        # blocked forever by the not-indexed validation.
        from vsc2022_tpu.localization import TNLocalizationMaxSim
        from vsc2022_tpu.retrieval.serve import _remove_refs

        rng = np.random.RandomState(71)

        def vf(vid, f):
            return VideoFeature(
                video_id=vid,
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f,
            )

        refs = [
            vf(f"R{i:06d}", l2n(rng.randn(20, 16)).astype(np.float32))
            for i in range(4)
        ]
        queries = [
            vf("Q000000", l2n(rng.randn(10, 16)).astype(np.float32))
        ]
        index = VideoIndex(16)
        index.add(refs)
        index.search(queries, global_k=20)  # stage
        localizer = TNLocalizationMaxSim(
            [], list(refs), model_type="TN", similarity_bias=0.5
        )

        def boom(keep_idx):
            raise RuntimeError("simulated relay failure")

        monkeypatch.setattr(index._searcher, "keep_rows", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            _remove_refs(index, localizer, ["remove", "R000001"])
        # Both holders shrank; staged searcher dropped for restage.
        assert "R000001" not in index.video_metadata
        assert "R000001" not in localizer.refs
        assert index._searcher is None
        # The server stays usable: search restages and the removed
        # video is gone; a repeated remove correctly reports unknown.
        got = index.search(queries, global_k=20)
        assert not any(pm.ref_id == "R000001" for pm in got)
        with pytest.raises(ValueError, match="not indexed"):
            _remove_refs(index, localizer, ["remove", "R000001"])


class TestAddFailureConsistency:
    """Mid-`add` device failures must leave the index and the resident
    localizer AGREEING (both grown host-side, staged device state
    dropped), so the error is survivable: the next search/alignment
    restages and serves the combined corpus. Mirrors the `remove`
    failure contract (reference atomicity analog: FAISS add,
    vsc/index.py:87-94)."""

    def _build(self, mesh=None):
        import argparse

        from vsc2022_tpu.localization import TNLocalizationMaxSim

        rng = np.random.RandomState(73)
        _, refs, noise = _make_data(rng)
        refs = [
            VideoFeature(
                video_id=f"R{i:06d}", timestamps=vf.timestamps,
                feature=vf.feature,
            )
            for i, vf in enumerate(refs)
        ]
        index = ScoreNormalizedVideoIndex(
            refs[0].dimensions(), noise, beta=1.2, mesh=mesh
        )
        index.add(refs)
        # A new ref video that copies frames from the probe query, so
        # post-failure searches provably serve the grown corpus.
        probe = VideoFeature(
            video_id="Q000000",
            timestamps=np.arange(30, dtype=np.float64),
            feature=l2n(rng.randn(30, 24)).astype(np.float32),
        )
        new_ref = VideoFeature(
            video_id="R000099",
            timestamps=np.arange(20, dtype=np.float64),
            feature=np.concatenate(
                [probe.feature[5:20],
                 l2n(rng.randn(5, 24)).astype(np.float32)]
            ),
        )
        localizer = TNLocalizationMaxSim(
            [probe], index.localizer_ref_features(refs),
            model_type="TN", similarity_bias=0.5,
        )
        args = argparse.Namespace(
            ref_fine_features=None, score_norm_features="noise.npz"
        )
        return index, localizer, probe, new_ref, args

    def _add_npz(self, tmp_path, new_ref):
        path = str(tmp_path / "add_new.npz")
        store_features(path, [new_ref], Dataset.REFS)
        return path

    def _assert_survivable(self, index, localizer, probe, new_ref):
        from vsc2022_tpu.retrieval.serve import _remove_refs

        # Both holders grew; the next search restages and serves the
        # new video (the planted probe frames must hit it).
        assert new_ref.video_id in index.video_metadata
        assert new_ref.video_id in localizer.refs
        got = index.search([probe], global_k=40)
        assert any(pm.ref_id == new_ref.video_id for pm in got)
        # The holders agree, so the id remains removable.
        _remove_refs(index, localizer, ["remove", new_ref.video_id])
        assert new_ref.video_id not in index.video_metadata
        assert new_ref.video_id not in localizer.refs

    def test_index_device_append_failure(self, monkeypatch, tmp_path):
        from vsc2022_tpu.retrieval.serve import _add_refs

        index, localizer, probe, new_ref, args = self._build()
        index.search([probe], global_k=40)  # stage

        def boom(rows):
            raise RuntimeError("simulated relay failure")

        monkeypatch.setattr(index._searcher, "append_refs", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            _add_refs(
                index, localizer,
                ["add", self._add_npz(tmp_path, new_ref)], args,
            )
        assert index._searcher is None  # staged state dropped
        self._assert_survivable(index, localizer, probe, new_ref)

    def test_sharded_index_device_append_failure(
        self, monkeypatch, tmp_path
    ):
        from vsc2022_tpu.parallel.mesh import corpus_mesh
        from vsc2022_tpu.retrieval.serve import _add_refs

        index, localizer, probe, new_ref, args = self._build(
            mesh=corpus_mesh(8)
        )
        index.search([probe], global_k=40)  # stage

        def boom(rows):
            raise RuntimeError("simulated relay failure")

        monkeypatch.setattr(index._searcher, "append_refs", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            _add_refs(
                index, localizer,
                ["add", self._add_npz(tmp_path, new_ref)], args,
            )
        assert index._searcher is None
        self._assert_survivable(index, localizer, probe, new_ref)

    def test_localizer_table_grow_failure(self, monkeypatch, tmp_path):
        from vsc2022_tpu.metrics import CandidatePair
        from vsc2022_tpu.retrieval.serve import _add_refs

        index, localizer, probe, new_ref, args = self._build()
        index.search([probe], global_k=40)
        localizer.set_queries([probe])
        localizer._pair_tables()  # stage the resident ref table
        assert localizer._r_table is not None

        def boom(*a, **k):
            raise RuntimeError("simulated relay failure")

        monkeypatch.setattr(localizer, "_grow_table", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            _add_refs(
                index, localizer,
                ["add", self._add_npz(tmp_path, new_ref)], args,
            )
        # Staged table dropped; host dicts grown on BOTH holders.
        assert localizer._r_table is None
        monkeypatch.undo()
        # The next alignment rebuilds the table from the grown refs
        # and localizes the planted copy against the NEW video.
        localizer.set_queries(index.localizer_queries([probe]))
        matches = localizer.localize_all([
            CandidatePair(
                query_id=probe.video_id, ref_id=new_ref.video_id,
                score=1.0,
            )
        ])
        assert any(m.ref_id == new_ref.video_id for m in matches)
        self._assert_survivable(index, localizer, probe, new_ref)


class TestDnSAddFailureConsistency:
    """The DnS localizer's two resident ref tables (coarse + fine)
    must survive a device failure mid-grow the same way: host dicts
    grown on both sides, the failed table dropped for rebuild."""

    def test_fine_table_grow_failure(self, monkeypatch):
        from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
        from vsc2022_tpu.metrics import CandidatePair
        from vsc2022_tpu.models.dns import NUM_REGIONS

        rng = np.random.RandomState(83)
        d = 16

        def fine_of(frames):
            base = frames[:, None, :].repeat(NUM_REGIONS, axis=1)
            jit = 0.05 * rng.randn(*base.shape).astype(np.float32)
            reg = base + jit
            reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
            return reg.reshape(frames.shape[0], -1)

        def pair_of(vid, frames):
            fine = VideoFeature(
                video_id=vid,
                timestamps=np.arange(frames.shape[0], dtype=np.float64),
                feature=fine_of(frames),
            )
            coarse = VideoFeature(
                video_id=vid, timestamps=fine.timestamps,
                feature=l2n(frames),
            )
            return coarse, fine

        q_frames = l2n(rng.randn(20, d)).astype(np.float32)
        r_frames = [
            l2n(rng.randn(18, d)).astype(np.float32) for _ in range(3)
        ]
        new_frames = np.concatenate(
            [q_frames[4:16], l2n(rng.randn(4, d)).astype(np.float32)]
        )
        qc, qf = pair_of("Q000000", q_frames)
        refs = [pair_of(f"R{i:06d}", f) for i, f in enumerate(r_frames)]
        nc, nf = pair_of("R000099", new_frames)

        loc = DnSLocalization(
            {qf.video_id: qf},
            {f.video_id: f for _, f in refs},
            [qc], [c for c, _ in refs],
            model_type="TN", fg_type="att", similarity_bias=0.5,
        )
        # Stage both resident ref tables with one alignment.
        loc.localize_all([
            CandidatePair(
                query_id="Q000000", ref_id="R000000", score=1.0
            )
        ])
        assert loc._fine_r_tab is not None and loc._r_table is not None

        real_grow = loc._grow_table

        def boom(table, offsets, vids, row_fn=None):
            if row_fn is not None:  # only the fine grow passes row_fn
                raise RuntimeError("simulated relay failure")
            return real_grow(table, offsets, vids, row_fn=row_fn)

        monkeypatch.setattr(loc, "_grow_table", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            loc.add_refs([nc], refs_fine={nf.video_id: nf})
        # Host dicts grew on BOTH sides; the failed fine table dropped
        # (the coarse grow succeeded and stays resident).
        assert nc.video_id in loc.refs
        assert nf.video_id in loc.refs_fine
        assert loc._fine_r_tab is None
        assert loc._r_table is not None
        monkeypatch.undo()
        # The next alignment rebuilds the fine table from the grown
        # dict and localizes the planted copy against the NEW video.
        loc.set_queries([qc], queries_fine={qf.video_id: qf})
        matches = loc.localize_all([
            CandidatePair(
                query_id="Q000000", ref_id="R000099", score=1.0
            )
        ])
        assert any(m.ref_id == "R000099" for m in matches)

    def test_coarse_table_grow_failure_drops_fine_table(
        self, monkeypatch
    ):
        # A COARSE grow failure must drop the staged fine table too:
        # its offsets miss the new videos (the fine grow never ran),
        # so serving it would KeyError on every later alignment
        # involving the added ids.
        from vsc2022_tpu.baseline.dns_baseline import DnSLocalization
        from vsc2022_tpu.metrics import CandidatePair
        from vsc2022_tpu.models.dns import NUM_REGIONS

        rng = np.random.RandomState(89)
        d = 16

        def pair_of(vid, frames):
            base = frames[:, None, :].repeat(NUM_REGIONS, axis=1)
            reg = base + 0.05 * rng.randn(*base.shape).astype(np.float32)
            reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
            fine = VideoFeature(
                video_id=vid,
                timestamps=np.arange(frames.shape[0], dtype=np.float64),
                feature=reg.reshape(frames.shape[0], -1),
            )
            coarse = VideoFeature(
                video_id=vid, timestamps=fine.timestamps,
                feature=l2n(frames),
            )
            return coarse, fine

        q_frames = l2n(rng.randn(20, d)).astype(np.float32)
        qc, qf = pair_of("Q000000", q_frames)
        refs = [
            pair_of(f"R{i:06d}", l2n(rng.randn(18, d)).astype(np.float32))
            for i in range(3)
        ]
        new_frames = np.concatenate(
            [q_frames[4:16], l2n(rng.randn(4, d)).astype(np.float32)]
        )
        nc, nf = pair_of("R000099", new_frames)
        loc = DnSLocalization(
            {qf.video_id: qf},
            {f.video_id: f for _, f in refs},
            [qc], [c for c, _ in refs],
            model_type="TN", fg_type="att", similarity_bias=0.5,
        )
        loc.localize_all([
            CandidatePair(
                query_id="Q000000", ref_id="R000000", score=1.0
            )
        ])
        assert loc._fine_r_tab is not None and loc._r_table is not None

        real_grow = loc._grow_table

        def boom(table, offsets, vids, row_fn=None):
            if row_fn is None:  # the COARSE grow (fine passes row_fn)
                raise RuntimeError("simulated relay failure")
            return real_grow(table, offsets, vids, row_fn=row_fn)

        monkeypatch.setattr(loc, "_grow_table", boom)
        with pytest.raises(RuntimeError, match="simulated"):
            loc.add_refs([nc], refs_fine={nf.video_id: nf})
        # BOTH staged tables dropped; host dicts grown on both sides.
        assert loc._r_table is None and loc._fine_r_tab is None
        assert nc.video_id in loc.refs and nf.video_id in loc.refs_fine
        monkeypatch.undo()
        loc.set_queries([qc], queries_fine={qf.video_id: qf})
        matches = loc.localize_all([
            CandidatePair(
                query_id="Q000000", ref_id="R000099", score=1.0
            )
        ])
        assert any(m.ref_id == "R000099" for m in matches)


class TestSaveFailureConsistency:
    """A failed `save` must mutate nothing: the server keeps serving
    and a retry succeeds (snapshots are pure host work off the
    add-order feature blocks)."""

    def test_fine_write_failure_leaves_state_unmutated(
        self, monkeypatch, tmp_path
    ):
        import argparse

        from vsc2022_tpu.retrieval import serve as serve_mod

        rng = np.random.RandomState(77)
        _, refs, noise = _make_data(rng)
        index = ScoreNormalizedVideoIndex(
            refs[0].dimensions(), noise, beta=1.2
        )
        index.add(refs)

        class FineLoc:
            refs_fine = {
                vf.video_id: vf for vf in index.features()
            }

        args = argparse.Namespace(
            ref_fine_features="fine.npz", score_norm_features=None
        )
        coarse_out = str(tmp_path / "snap_coarse.npz")
        fine_out = str(tmp_path / "snap_fine.npz")
        before = index.features()

        real_store = serve_mod.store_features

        def fail_fine(path, feats, *a, **k):
            if path == fine_out:
                raise OSError("simulated disk failure")
            return real_store(path, feats, *a, **k)

        monkeypatch.setattr(serve_mod, "store_features", fail_fine)
        with pytest.raises(OSError, match="simulated"):
            serve_mod._save_refs(
                index, FineLoc(), ["save", coarse_out, fine_out], args
            )
        # Nothing mutated; the coarse-only leftover at least loads.
        after = index.features()
        assert [vf.video_id for vf in after] == [
            vf.video_id for vf in before
        ]
        from vsc2022_tpu.storage import load_features

        assert os.path.exists(coarse_out)
        assert len(load_features(coarse_out, Dataset.REFS)) == len(refs)
        monkeypatch.undo()
        # Retry succeeds and writes both files.
        resp = serve_mod._save_refs(
            index, FineLoc(), ["save", coarse_out, fine_out], args
        )
        assert resp.startswith("ok\tsaved")
        assert os.path.exists(fine_out)


@pytest.mark.slow
class TestServeCLI:
    @pytest.fixture(scope="class")
    def served(self):
        tmp = tempfile.mkdtemp()
        rng = np.random.RandomState(11)
        queries, refs, noise = _make_data(rng)
        store_features(os.path.join(tmp, "q.npz"), queries, Dataset.QUERIES)
        store_features(
            os.path.join(tmp, "q2.npz"), queries[:2], Dataset.QUERIES
        )
        store_features(os.path.join(tmp, "r.npz"), refs, Dataset.REFS)
        store_features(os.path.join(tmp, "noise.npz"), noise, Dataset.REFS)
        return tmp, queries, refs, noise

    def _spawn(self, *args):
        # --f32: these tests pin bit-identity against the batch
        # pipelines' float32 default (the serving default is bf16;
        # TestServeCLI.test_default_bf16_staging pins that path).
        env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
        return subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--f32", *args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, env=env, cwd=REPO,
        )

    def test_serves_repeated_requests_and_errors(self, served):
        tmp, queries, refs, noise = served
        proc = self._spawn(
            "--ref_features", os.path.join(tmp, "r.npz"),
            "--score_norm_features", os.path.join(tmp, "noise.npz"),
        )
        try:
            ready = proc.stdout.readline().strip().split("\t")
            assert ready[0] == "ready" and int(ready[1]) == len(refs)

            out1 = os.path.join(tmp, "c1.csv")
            proc.stdin.write(f"{os.path.join(tmp, 'q.npz')}\t{out1}\n")
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "ok" and resp[1] == out1, resp

            # A bad request must answer "error" and keep the server up.
            proc.stdin.write("/nonexistent/query.npz\tx.csv\n")
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "error", resp

            # Second good request (different query count → new padded
            # shape) against the same staged corpus.
            out2 = os.path.join(tmp, "c2.csv")
            proc.stdin.write(f"{os.path.join(tmp, 'q2.npz')}\t{out2}\n")
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "ok", resp

            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        # Server responses must equal the in-process protocol result.
        qn, rn = score_normalize(queries, refs, noise, beta=1.2)
        expect = CandidateGeneration(rn, MaxScoreAggregation()).query(
            qn, global_k=1200 * len(queries)
        )[: 25 * len(queries)]
        import pandas as pd

        from vsc2022_tpu.metrics import format_video_id

        df = pd.read_csv(out1)
        assert list(df.columns) == ["query_id", "ref_id", "score"]
        # The server saw npz-normalized ids (Q%06d/R%06d); the
        # in-process features carry raw ints — format to compare.
        assert [(r.query_id, r.ref_id) for r in df.itertuples()] == [
            (
                format_video_id(c.query_id, Dataset.QUERIES),
                format_video_id(c.ref_id, Dataset.REFS),
            )
            for c in expect
        ]
        np.testing.assert_allclose(
            df.score.to_numpy(),
            np.array([c.score for c in expect]),
            atol=1e-5,
        )

    def test_default_bf16_staging(self, served, tmp_path):
        # With no dtype flag the server stages the corpus in bfloat16
        # (the serving default: 2x capacity per chip; candidate µAP /
        # segment AP hold within seed noise — docs/synthetic_results.md).
        # Responses must equal the in-process bf16 serving index and
        # stats must report the staged dtype.
        import pandas as pd

        from vsc2022_tpu.storage import load_features

        tmp, queries, refs, noise = served
        env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
        proc = subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", os.path.join(tmp, "r.npz"),
             "--score_norm_features", os.path.join(tmp, "noise.npz")],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, env=env, cwd=REPO,
        )
        out = str(tmp_path / "bf16_c.csv")
        try:
            assert proc.stdout.readline().startswith("ready")
            proc.stdin.write(f"{os.path.join(tmp, 'q.npz')}\t{out}\n")
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "ok", resp
            proc.stdin.write("stats\n")
            proc.stdin.flush()
            st = proc.stdout.readline().strip().split("\t")
            assert st[:2] == ["ok", "stats"] and st[4] == "bfloat16", st
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        qd = load_features(os.path.join(tmp, "q.npz"), Dataset.QUERIES)
        rd = load_features(os.path.join(tmp, "r.npz"), Dataset.REFS)
        nd = load_features(os.path.join(tmp, "noise.npz"), Dataset.REFS)
        index = ScoreNormalizedVideoIndex(
            rd[0].dimensions(), nd, beta=1.2, dtype="bfloat16"
        )
        index.add(rd)
        matches = index.search(qd, global_k=1200 * len(qd))
        expect = rank_candidates(matches, MaxScoreAggregation())[
            : 25 * len(qd)
        ]
        df = pd.read_csv(out)
        assert [(r.query_id, r.ref_id) for r in df.itertuples()] == [
            (c.query_id, c.ref_id) for c in expect
        ]
        np.testing.assert_allclose(
            df.score.to_numpy(),
            np.array([c.score for c in expect]),
            atol=1e-5,
        )

    def test_int8_staging(self, served, tmp_path):
        # --int8 stages the search corpus as SQ8-style per-row int8
        # (4x f32 capacity per chip). Served candidates must equal the
        # in-process int8 serving index; stats reports the dtype.
        import pandas as pd

        from vsc2022_tpu.storage import load_features

        tmp, queries, refs, noise = served
        env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
        proc = subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", os.path.join(tmp, "r.npz"),
             "--score_norm_features", os.path.join(tmp, "noise.npz"),
             "--int8"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, env=env, cwd=REPO,
        )
        out = str(tmp_path / "int8_c.csv")
        try:
            assert proc.stdout.readline().startswith("ready")
            proc.stdin.write(f"{os.path.join(tmp, 'q.npz')}\t{out}\n")
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "ok", resp
            proc.stdin.write("stats\n")
            proc.stdin.flush()
            st = proc.stdout.readline().strip().split("\t")
            assert st[:2] == ["ok", "stats"] and st[4] == "int8", st
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        qd = load_features(os.path.join(tmp, "q.npz"), Dataset.QUERIES)
        rd = load_features(os.path.join(tmp, "r.npz"), Dataset.REFS)
        nd = load_features(os.path.join(tmp, "noise.npz"), Dataset.REFS)
        index = ScoreNormalizedVideoIndex(
            rd[0].dimensions(), nd, beta=1.2, dtype="int8"
        )
        index.add(rd)
        matches = index.search(qd, global_k=1200 * len(qd))
        expect = rank_candidates(matches, MaxScoreAggregation())[
            : 25 * len(qd)
        ]
        df = pd.read_csv(out)
        assert [(r.query_id, r.ref_id) for r in df.itertuples()] == [
            (c.query_id, c.ref_id) for c in expect
        ]
        np.testing.assert_allclose(
            df.score.to_numpy(),
            np.array([c.score for c in expect]),
            atol=1e-6,
        )

    def test_matching_track_serving(self, served):
        # --matches must reproduce the sscd_baseline localization
        # stage (score-norm mode) on top of the served candidates,
        # with the ref frame table resident across requests.
        from vsc2022_tpu.baseline.pipeline import align_candidates
        from vsc2022_tpu.baseline.sscd_baseline import build_alignment
        from vsc2022_tpu.metrics import Match

        tmp, queries, refs, noise = served
        proc = self._spawn(
            "--ref_features", os.path.join(tmp, "r.npz"),
            "--score_norm_features", os.path.join(tmp, "noise.npz"),
            "--matches",
        )
        try:
            assert proc.stdout.readline().startswith("ready")
            out_c = os.path.join(tmp, "mc.csv")
            out_m = os.path.join(tmp, "mm.csv")
            proc.stdin.write(
                f"{os.path.join(tmp, 'q.npz')}\t{out_c}\t{out_m}\n"
            )
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "ok" and resp[3] == out_m, resp
            # Second request: the resident localizer must serve a new
            # query set (fresh set_queries) without error.
            proc.stdin.write(
                f"{os.path.join(tmp, 'q2.npz')}\t"
                f"{os.path.join(tmp, 'mc2.csv')}\t"
                f"{os.path.join(tmp, 'mm2.csv')}\n"
            )
            proc.stdin.flush()
            resp2 = proc.stdout.readline().strip().split("\t")
            assert resp2[0] == "ok", resp2
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        # In-process oracle: the one-shot matching stage on the npz
        # data (so ids match the server's npz-normalized view).
        from vsc2022_tpu.storage import load_features

        qd = load_features(os.path.join(tmp, "q.npz"), Dataset.QUERIES)
        rd = load_features(os.path.join(tmp, "r.npz"), Dataset.REFS)
        nd = load_features(os.path.join(tmp, "noise.npz"), Dataset.REFS)
        qn, rn = score_normalize(qd, rd, nd, beta=1.2)
        cands = CandidateGeneration(rn, MaxScoreAggregation()).query(
            qn, global_k=1200 * len(qd)
        )[: 25 * len(qd)]
        alignment = build_alignment(qn, rn, score_normalization=True)
        expect = align_candidates(alignment, cands[: 5 * len(qd)])

        got = Match.read_csv(out_m)
        assert len(got) == len(expect)
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end,
        )
        got_s, exp_s = sorted(got, key=key), sorted(expect, key=key)
        for g, e in zip(got_s, exp_s):
            assert key(g) == key(e)
            assert g.score == pytest.approx(e.score, abs=1e-5)
        # Planted copies must actually localize.
        assert len(got) >= 2

    def test_add_refs_grows_served_corpus(self, served, tmp_path):
        # The `add` command must grow the index AND the resident
        # localizer tables without a restart; post-add responses must
        # equal a fresh one-shot pipeline over the combined refs.
        from vsc2022_tpu.baseline.pipeline import align_candidates
        from vsc2022_tpu.baseline.sscd_baseline import build_alignment
        from vsc2022_tpu.metrics import Match
        from vsc2022_tpu.storage import load_features

        tmp, queries, refs, noise = served
        # A new reference video copying frames from query 2 (the one
        # with no planted copy yet) — after `add` it must match.
        new_ref = VideoFeature(
            video_id=99,
            timestamps=np.arange(22, dtype=np.float64),
            feature=np.concatenate(
                [queries[2].feature[5:20], l2n(np.random.RandomState(31).randn(7, queries[2].feature.shape[1])).astype(np.float32)]
            ),
        )
        add_npz = str(tmp_path / "new_ref.npz")
        store_features(add_npz, [new_ref], Dataset.REFS)

        proc = self._spawn(
            "--ref_features", os.path.join(tmp, "r.npz"),
            "--score_norm_features", os.path.join(tmp, "noise.npz"),
            "--matches",
        )
        try:
            assert proc.stdout.readline().startswith("ready")

            def req(line):
                proc.stdin.write(line + "\n")
                proc.stdin.flush()
                return proc.stdout.readline().strip().split("\t")

            pre = req(
                f"{os.path.join(tmp, 'q.npz')}\t{tmp_path / 'pre_c.csv'}"
                f"\t{tmp_path / 'pre_m.csv'}"
            )
            assert pre[0] == "ok", pre
            added = req(f"add\t{add_npz}")
            assert added[:3] == ["ok", "added", "1"], added
            # Duplicate ids are rejected; the server keeps serving.
            assert req(f"add\t{add_npz}")[0] == "error"
            post = req(
                f"{os.path.join(tmp, 'q.npz')}\t{tmp_path / 'post_c.csv'}"
                f"\t{tmp_path / 'post_m.csv'}"
            )
            assert post[0] == "ok", post
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        # The new planted pair appears only after the add.
        import pandas as pd

        pre_pairs = set(
            map(tuple, pd.read_csv(tmp_path / "pre_c.csv")[
                ["query_id", "ref_id"]
            ].itertuples(index=False))
        )
        post_pairs = set(
            map(tuple, pd.read_csv(tmp_path / "post_c.csv")[
                ["query_id", "ref_id"]
            ].itertuples(index=False))
        )
        assert ("Q000002", "R000099") not in pre_pairs
        assert ("Q000002", "R000099") in post_pairs

        # Post-add responses == one-shot pipeline over combined refs.
        qd = load_features(os.path.join(tmp, "q.npz"), Dataset.QUERIES)
        rd = load_features(os.path.join(tmp, "r.npz"), Dataset.REFS)
        rd += load_features(add_npz, Dataset.REFS)
        nd = load_features(os.path.join(tmp, "noise.npz"), Dataset.REFS)
        qn, rn = score_normalize(qd, rd, nd, beta=1.2)
        cands = CandidateGeneration(rn, MaxScoreAggregation()).query(
            qn, global_k=1200 * len(qd)
        )[: 25 * len(qd)]
        df = pd.read_csv(tmp_path / "post_c.csv")
        assert [(r.query_id, r.ref_id) for r in df.itertuples()] == [
            (c.query_id, c.ref_id) for c in cands
        ]
        alignment = build_alignment(qn, rn, score_normalization=True)
        expect = align_candidates(alignment, cands[: 5 * len(qd)])
        got = Match.read_csv(str(tmp_path / "post_m.csv"))
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end,
        )
        assert sorted(key(m) for m in got) == sorted(
            key(m) for m in expect
        )
        assert any(
            m.query_id == "Q000002" and m.ref_id == "R000099" for m in got
        )

    def test_remove_refs_shrinks_served_corpus(self, served, tmp_path):
        # The `remove` command must drop the videos from the index AND
        # the resident localizer tables (device-side compaction);
        # post-remove responses must equal a fresh one-shot pipeline
        # over the survivors.
        import pandas as pd

        from vsc2022_tpu.baseline.pipeline import align_candidates
        from vsc2022_tpu.baseline.sscd_baseline import build_alignment
        from vsc2022_tpu.metrics import Match
        from vsc2022_tpu.storage import load_features

        tmp, queries, refs, noise = served
        proc = self._spawn(
            "--ref_features", os.path.join(tmp, "r.npz"),
            "--score_norm_features", os.path.join(tmp, "noise.npz"),
            "--matches",
        )
        try:
            assert proc.stdout.readline().startswith("ready")

            def req(line):
                proc.stdin.write(line + "\n")
                proc.stdin.flush()
                return proc.stdout.readline().strip().split("\t")

            pre = req(
                f"{os.path.join(tmp, 'q.npz')}\t{tmp_path / 'pre_c.csv'}"
                f"\t{tmp_path / 'pre_m.csv'}"
            )
            assert pre[0] == "ok", pre
            # Unknown ids are rejected atomically; the server keeps
            # serving (R000000 stays indexed).
            assert req("remove\tR000000\tR000777")[0] == "error"
            gone = req("remove\tR000000")
            assert gone[:3] == ["ok", "removed", "1"], gone
            assert int(gone[3]) == refs[0].feature.shape[0]
            # Removing it again: now unknown.
            assert req("remove\tR000000")[0] == "error"
            post = req(
                f"{os.path.join(tmp, 'q.npz')}\t{tmp_path / 'post_c.csv'}"
                f"\t{tmp_path / 'post_m.csv'}"
            )
            assert post[0] == "ok", post
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        # The planted pair (Q000000, R000000) vanishes with the remove.
        pre_pairs = set(
            map(tuple, pd.read_csv(tmp_path / "pre_c.csv")[
                ["query_id", "ref_id"]
            ].itertuples(index=False))
        )
        post_df = pd.read_csv(tmp_path / "post_c.csv")
        assert ("Q000000", "R000000") in pre_pairs
        assert not (post_df.ref_id == "R000000").any()

        # Post-remove responses == one-shot pipeline over survivors.
        qd = load_features(os.path.join(tmp, "q.npz"), Dataset.QUERIES)
        rd = load_features(os.path.join(tmp, "r.npz"), Dataset.REFS)[1:]
        nd = load_features(os.path.join(tmp, "noise.npz"), Dataset.REFS)
        qn, rn = score_normalize(qd, rd, nd, beta=1.2)
        cands = CandidateGeneration(rn, MaxScoreAggregation()).query(
            qn, global_k=1200 * len(qd)
        )[: 25 * len(qd)]
        assert [(r.query_id, r.ref_id) for r in post_df.itertuples()] == [
            (c.query_id, c.ref_id) for c in cands
        ]
        alignment = build_alignment(qn, rn, score_normalization=True)
        expect = align_candidates(alignment, cands[: 5 * len(qd)])
        got = Match.read_csv(str(tmp_path / "post_m.csv"))
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end,
        )
        assert sorted(key(m) for m in got) == sorted(
            key(m) for m in expect
        )
        # The OTHER planted copy still localizes post-remove.
        assert any(
            m.query_id == "Q000001" and m.ref_id == "R000001" for m in got
        )

    def test_sharded_server_lifecycle_matches_unsharded(
        self, served, tmp_path
    ):
        # A --sharded server (8 virtual CPU devices) must answer the
        # full lifecycle — search, add, remove, save — bit-identically
        # to the unsharded server.
        tmp, queries, refs, noise = served
        new_ref = VideoFeature(
            video_id=88,
            timestamps=np.arange(20, dtype=np.float64),
            feature=l2n(
                np.random.RandomState(41).randn(20, 24)
            ).astype(np.float32),
        )
        add_npz = str(tmp_path / "add88.npz")
        store_features(add_npz, [new_ref], Dataset.REFS)

        def lifecycle(tag, *extra):
            env = dict(
                os.environ, VSC2022_TPU_FORCE_CPU="1",
                XLA_FLAGS="--xla_force_host_platform_device_count=8",
            )
            proc = subprocess.Popen(
                [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
                 "--ref_features", os.path.join(tmp, "r.npz"),
                 "--score_norm_features", os.path.join(tmp, "noise.npz"),
                 "--matches", "--f32", *extra],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True, env=env, cwd=REPO,
            )
            try:
                assert proc.stdout.readline().startswith("ready")

                def req(line):
                    proc.stdin.write(line + "\n")
                    proc.stdin.flush()
                    return proc.stdout.readline().strip().split("\t")

                assert req(f"add\t{add_npz}")[:3] == ["ok", "added", "1"]
                assert req("remove\tR000002")[:3] == ["ok", "removed", "1"]
                out = tmp_path / f"{tag}.csv"
                m_out = tmp_path / f"{tag}_m.csv"
                assert req(
                    f"{os.path.join(tmp, 'q.npz')}\t{out}\t{m_out}"
                )[0] == "ok"
                snap = tmp_path / f"{tag}_snap.npz"
                assert req(f"save\t{snap}")[:3] == ["ok", "saved", "10"]
                proc.stdin.write("quit\n")
                proc.stdin.flush()
                assert proc.wait(timeout=240) == 0
            finally:
                proc.kill()
            return out, snap, m_out

        plain_csv, plain_snap, plain_m = lifecycle("plain")
        shard_csv, shard_snap, shard_m = lifecycle("shard", "--sharded")
        with open(plain_csv, "rb") as a, open(shard_csv, "rb") as b:
            assert a.read() == b.read()
        # Matches too: the sharded server row-shards the localizer's
        # resident ref table over the mesh — results must stay
        # bit-identical through the add/remove lifecycle.
        with open(plain_m, "rb") as a, open(shard_m, "rb") as b:
            assert a.read() == b.read()
        from vsc2022_tpu.metrics import Match

        assert len(Match.read_csv(str(plain_m))) >= 1
        # Snapshots carry identical contents (same video order, rows).
        pa, pb = np.load(plain_snap), np.load(shard_snap)
        for key in ("video_ids", "features", "timestamps"):
            np.testing.assert_array_equal(pa[key], pb[key])

    def test_tcp_listen_mode(self, served, tmp_path):
        # --listen serves the same line protocol over TCP: sequential
        # clients each get the ready greeting; quit ends one session,
        # shutdown stops the server.
        import socket

        tmp, queries, refs, noise = served
        proc = self._spawn(
            "--ref_features", os.path.join(tmp, "r.npz"),
            "--score_norm_features", os.path.join(tmp, "noise.npz"),
            "--listen", "127.0.0.1:0",
        )
        try:
            assert proc.stdout.readline().startswith("ready")
            listening = proc.stdout.readline().strip().split("\t")
            assert listening[0] == "listening", listening
            host, port = listening[1].rsplit(":", 1)

            def session(lines):
                out = []
                with socket.create_connection(
                    (host, int(port)), timeout=120
                ) as s:
                    r = s.makefile("r", encoding="utf-8")
                    w = s.makefile("w", encoding="utf-8")
                    assert r.readline().startswith("ready")
                    for line in lines:
                        w.write(line + "\n")
                        w.flush()
                        if line not in ("quit", "shutdown"):
                            out.append(r.readline().strip())
                return out

            out1 = str(tmp_path / "tcp1.csv")
            # Hold an idle session open the whole time: it must not
            # block other clients (thread-per-client sessions).
            idle = socket.create_connection((host, int(port)), timeout=120)
            idle_r = idle.makefile("r", encoding="utf-8")
            assert idle_r.readline().startswith("ready")

            resp = session(
                [f"{os.path.join(tmp, 'q.npz')}\t{out1}", "quit"]
            )
            assert resp[0].split("\t")[0] == "ok", resp
            assert os.path.exists(out1)
            # Second client on the same staged corpus.
            resp = session(
                [
                    f"{os.path.join(tmp, 'q2.npz')}\t{tmp_path / 'tcp2.csv'}",
                    "/nonexistent.npz\tx.csv",
                    "quit",
                ]
            )
            assert resp[0].split("\t")[0] == "ok", resp
            assert resp[1].split("\t")[0] == "error", resp
            # The idle session still works, then stops the server.
            idle_w = idle.makefile("w", encoding="utf-8")
            idle_w.write(
                f"{os.path.join(tmp, 'q.npz')}\t{tmp_path / 'tcp3.csv'}\n"
            )
            idle_w.flush()
            assert idle_r.readline().split("\t")[0] == "ok"
            idle_w.write("shutdown\n")
            idle_w.flush()
            idle.close()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()
        # TCP and stdin modes write identical candidates.
        import filecmp

        c1 = os.path.join(tmp, "c1.csv")
        if os.path.exists(c1):
            assert filecmp.cmp(out1, c1, shallow=False)

    def test_dns_two_stage_serving(self, tmp_path):
        # --ref_fine_features serves the DnS matching track with the
        # two-file query protocol; candidates AND matches must equal
        # the one-shot dns_baseline stages on the same npz data.
        from vsc2022_tpu.baseline import dns_baseline
        from vsc2022_tpu.metrics import Match
        from vsc2022_tpu.models.dns import NUM_REGIONS
        from vsc2022_tpu.storage import convert_to_dict, load_features

        rng = np.random.RandomState(17)
        rdim = 16

        def unit_fine(n):
            x = rng.normal(size=(n, NUM_REGIONS, rdim)).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        def coarse_from(fine):
            pooled = fine.mean(axis=1)
            return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

        r_fine = [unit_fine(int(rng.randint(24, 40))) for _ in range(4)]
        q_fine = [unit_fine(28) for _ in range(3)]
        q_fine[0][8:20] = r_fine[0][5:17]  # planted copies
        q_fine[1][2:12] = r_fine[2][10:20]

        def feats(prefix, fines):
            flat = [
                VideoFeature(
                    video_id=f"{prefix}{i:06d}",
                    timestamps=np.arange(
                        f.shape[0], dtype=np.float64
                    ),
                    feature=f.reshape(f.shape[0], -1),
                )
                for i, f in enumerate(fines)
            ]
            coarse = [
                VideoFeature(
                    video_id=v.video_id, timestamps=v.timestamps,
                    feature=coarse_from(f),
                )
                for v, f in zip(flat, fines)
            ]
            return flat, coarse

        rf, rc = feats("R", r_fine)
        qf, qc = feats("Q", q_fine)
        paths = {}
        for name, vids, ds in (
            ("rc", rc, Dataset.REFS), ("rf", rf, Dataset.REFS),
            ("qc", qc, Dataset.QUERIES), ("qf", qf, Dataset.QUERIES),
        ):
            paths[name] = str(tmp_path / f"{name}.npz")
            store_features(paths[name], vids, ds)

        out_c = str(tmp_path / "dns_c.csv")
        out_m = str(tmp_path / "dns_m.csv")
        proc = self._spawn(
            "--ref_features", paths["rc"],
            "--ref_fine_features", paths["rf"],
        )
        try:
            assert proc.stdout.readline().startswith("ready")
            proc.stdin.write(
                f"{paths['qc']}\t{paths['qf']}\t{out_c}\t{out_m}\n"
            )
            proc.stdin.flush()
            resp = proc.stdout.readline().strip().split("\t")
            assert resp[0] == "ok" and resp[3] == out_m, resp
            # Second request (new query shape) over the resident
            # coarse+fine reference tables.
            proc.stdin.write(
                f"{paths['qc']}\t{paths['qf']}\t"
                f"{tmp_path / 'c2.csv'}\t{tmp_path / 'm2.csv'}\n"
            )
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("ok")
            # A one-file request in DnS mode is an error, not a crash.
            proc.stdin.write(f"{paths['qc']}\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("error")
            # Two-file `add`: a new ref copying the unplanted query 2
            # must match after the add (resident tables extended).
            nr_fine = np.concatenate(
                [q_fine[2][4:18], unit_fine(8)], axis=0
            )
            nrf = VideoFeature(
                video_id="R000099",
                timestamps=np.arange(
                    nr_fine.shape[0], dtype=np.float64
                ),
                feature=nr_fine.reshape(nr_fine.shape[0], -1),
            )
            nrc = VideoFeature(
                video_id="R000099", timestamps=nrf.timestamps,
                feature=coarse_from(nr_fine),
            )
            add_c = str(tmp_path / "add_c.npz")
            add_f = str(tmp_path / "add_f.npz")
            store_features(add_c, [nrc], Dataset.REFS)
            store_features(add_f, [nrf], Dataset.REFS)
            # One-file add in DnS mode is an error.
            proc.stdin.write(f"add\t{add_c}\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("error")
            # A failing add (bad fine path / fine npz not covering
            # the coarse ids) must reject BEFORE the index mutates:
            # otherwise the duplicate-id check would block the
            # corrected retry below forever.
            proc.stdin.write(f"add\t{add_c}\t/nonexistent_fine.npz\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("error")
            import dataclasses

            mismatch_f = str(tmp_path / "mismatch_f.npz")
            store_features(
                mismatch_f,
                [dataclasses.replace(nrf, video_id="R000098")],
                Dataset.REFS,
            )
            proc.stdin.write(f"add\t{add_c}\t{mismatch_f}\n")
            proc.stdin.flush()
            resp = proc.stdout.readline()
            assert resp.startswith("error") and "missing" in resp, resp
            proc.stdin.write(f"add\t{add_c}\t{add_f}\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("ok\tadded\t1")
            out_m3 = str(tmp_path / "m3.csv")
            proc.stdin.write(
                f"{paths['qc']}\t{paths['qf']}\t{tmp_path / 'c3.csv'}"
                f"\t{out_m3}\n"
            )
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("ok")
            # DnS save needs two paths; the snapshot includes the add.
            snap_c = str(tmp_path / "snap_c.npz")
            snap_f = str(tmp_path / "snap_f.npz")
            proc.stdin.write(f"save\t{snap_c}\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("error")
            proc.stdin.write(f"save\t{snap_c}\t{snap_f}\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("ok\tsaved\t5")
            # DnS remove drops the added video from BOTH tables.
            proc.stdin.write("remove\tR000099\n")
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("ok\tremoved\t1")
            out_m4 = str(tmp_path / "m4.csv")
            proc.stdin.write(
                f"{paths['qc']}\t{paths['qf']}\t{tmp_path / 'c4.csv'}"
                f"\t{out_m4}\n"
            )
            proc.stdin.flush()
            assert proc.stdout.readline().startswith("ok")
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        # A restart on the DnS snapshot reproduces the post-add state.
        proc2 = self._spawn(
            "--ref_features", snap_c, "--ref_fine_features", snap_f,
        )
        try:
            assert proc2.stdout.readline().startswith("ready")
            proc2.stdin.write(
                f"{paths['qc']}\t{paths['qf']}\t{tmp_path / 'c5.csv'}"
                f"\t{tmp_path / 'm5.csv'}\n"
            )
            proc2.stdin.flush()
            assert proc2.stdout.readline().startswith("ok")
            proc2.stdin.write("quit\n")
            proc2.stdin.flush()
            assert proc2.wait(timeout=120) == 0
        finally:
            proc2.kill()
        import filecmp

        assert filecmp.cmp(
            tmp_path / "c3.csv", tmp_path / "c5.csv", shallow=False
        )
        assert filecmp.cmp(out_m3, tmp_path / "m5.csv", shallow=False)
        from vsc2022_tpu.metrics import Match as _M

        assert any(
            m.query_id == "Q000002" and m.ref_id == "R000099"
            for m in _M.read_csv(out_m3)
        )
        # ... and the remove erased it again.
        assert not any(
            m.ref_id == "R000099" for m in _M.read_csv(out_m4)
        )

        # In-process oracle: the dns_baseline stages on the npz data.
        qcl = load_features(paths["qc"], Dataset.QUERIES)
        rcl = load_features(paths["rc"], Dataset.REFS)
        qfl = convert_to_dict(load_features(paths["qf"], Dataset.QUERIES))
        rfl = convert_to_dict(load_features(paths["rf"], Dataset.REFS))
        cands = dns_baseline.search(qcl, rcl)
        expect = dns_baseline.localize_and_verify(
            qfl, rfl, qcl, rcl, cands
        )
        got = Match.read_csv(out_m)
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end,
        )
        assert sorted(key(m) for m in got) == sorted(
            key(m) for m in expect
        )
        np.testing.assert_allclose(
            sorted(m.score for m in got),
            sorted(m.score for m in expect),
            atol=1e-5,
        )
        assert len(got) >= 2  # planted copies localize
        import pandas as pd

        dfc = pd.read_csv(out_c)
        expect_pairs = [
            (c.query_id, c.ref_id)
            for c in cands[: 25 * len(qcl)]
        ]
        assert [
            (r.query_id, r.ref_id) for r in dfc.itertuples()
        ] == expect_pairs


class TestConcurrentTCPClients:
    """N concurrent TCP clients interleaving search / add / remove /
    save against one server: the device lock serializes requests, so
    every response must be consistent with SOME serial order. The
    check exploits locality: each client mutates only its OWN
    reference video, and a score-normalized pair score depends only on
    (query, ref, noise) — never on the rest of the corpus — so every
    CSV row must bit-match the offline per-pair score whenever the ref
    is present, and presence/absence must respect each client's
    program order. Snapshots must be valid states (base ∪ adds-alive),
    and the final corpus must equal base + never-removed adds."""

    N_CLIENTS = 4

    def test_interleaved_mutations_serialize(self, tmp_path):
        import socket
        import threading

        import pandas as pd

        rng = np.random.RandomState(41)
        queries, refs, noise = _make_data(rng, n_queries=2, plant=0)
        tmp = str(tmp_path)
        store_features(os.path.join(tmp, "q.npz"), queries, Dataset.QUERIES)
        store_features(os.path.join(tmp, "r.npz"), refs, Dataset.REFS)
        store_features(os.path.join(tmp, "noise.npz"), noise, Dataset.REFS)

        # Per-client reference videos: client i owns R00009i, planted
        # to strongly match query (i % 2), so its presence in a
        # candidate list is guaranteed whenever it is in the corpus.
        own_refs = []
        for i in range(self.N_CLIENTS):
            q = queries[i % 2]
            feat = np.concatenate([
                q.feature[3:17],
                l2n(rng.randn(6, q.feature.shape[1])).astype(np.float32),
            ])
            vf = VideoFeature(
                video_id=90 + i,
                timestamps=np.arange(20, dtype=np.float64),
                feature=feat,
            )
            own_refs.append(vf)
            store_features(
                os.path.join(tmp, f"add{i}.npz"), [vf], Dataset.REFS
            )

        # Offline per-pair truth over the full union (pair scores are
        # corpus-independent under score normalization).
        union = refs + own_refs
        qn, rn = score_normalize(queries, union, noise, beta=1.2)
        expected = {}
        for c in CandidateGeneration(rn, MaxScoreAggregation()).query(
            qn, global_k=100000
        ):
            from vsc2022_tpu.metrics import format_video_id

            expected[(
                format_video_id(c.query_id, Dataset.QUERIES),
                format_video_id(c.ref_id, Dataset.REFS),
            )] = c.score

        env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
                "--ref_features", os.path.join(tmp, "r.npz"),
                "--score_norm_features", os.path.join(tmp, "noise.npz"),
                "--listen", "127.0.0.1:0", "--f32",
            ],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, env=env, cwd=REPO,
        )
        own_ids = [f"R{90 + i:06d}" for i in range(self.N_CLIENTS)]
        base_ids = {f"R{vf.video_id:06d}" for vf in refs}
        results = [None] * self.N_CLIENTS
        try:
            assert proc.stdout.readline().startswith("ready")
            listening = proc.stdout.readline().strip().split("\t")
            assert listening[0] == "listening", listening
            host, port = listening[1].rsplit(":", 1)

            def client(i):
                remover = i % 2 == 0
                ops, resps = [], []
                with socket.create_connection(
                    (host, int(port)), timeout=300
                ) as s:
                    r = s.makefile("r", encoding="utf-8")
                    w = s.makefile("w", encoding="utf-8")
                    assert r.readline().startswith("ready")

                    def req(line):
                        w.write(line + "\n")
                        w.flush()
                        resp = r.readline().strip().split("\t")
                        ops.append(line.split("\t")[0])
                        resps.append(resp)
                        return resp

                    qpath = os.path.join(tmp, "q.npz")
                    c1 = os.path.join(tmp, f"t{i}_s1.csv")
                    c2 = os.path.join(tmp, f"t{i}_s2.csv")
                    snap = os.path.join(tmp, f"t{i}_snap.npz")
                    req(f"add\t{os.path.join(tmp, f'add{i}.npz')}")
                    req(f"{qpath}\t{c1}")
                    req(f"save\t{snap}")
                    if remover:
                        req(f"remove\t{own_ids[i]}")
                    req(f"{qpath}\t{c2}")
                    w.write("quit\n")
                    w.flush()
                results[i] = (remover, resps)

            threads = [
                threading.Thread(target=client, args=(i,))
                for i in range(self.N_CLIENTS)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
                assert not t.is_alive(), "client thread hung"

            # Final state through a last session: stats + save.
            with socket.create_connection(
                (host, int(port)), timeout=300
            ) as s:
                r = s.makefile("r", encoding="utf-8")
                w = s.makefile("w", encoding="utf-8")
                assert r.readline().startswith("ready")
                w.write("stats\n")
                w.flush()
                st = r.readline().strip().split("\t")
                final_snap = os.path.join(tmp, "final_snap.npz")
                w.write(f"save\t{final_snap}\n")
                w.flush()
                assert r.readline().split("\t")[0] == "ok"
                w.write("shutdown\n")
                w.flush()
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

        keepers = {
            own_ids[i] for i in range(self.N_CLIENTS) if i % 2 != 0
        }
        # Every response of every client succeeded.
        for i, (remover, resps) in enumerate(results):
            assert results[i] is not None, f"client {i} died"
            for resp in resps:
                assert resp[0] == "ok", (i, resp)

        def presence(csv_path):
            df = pd.read_csv(csv_path)
            got = set()
            for row in df.itertuples():
                key = (row.query_id, row.ref_id)
                if row.ref_id in base_ids or row.ref_id in set(own_ids):
                    # Scores bit-match the offline per-pair truth.
                    assert key in expected, key
                    assert abs(row.score - expected[key]) < 1e-4, (
                        key, row.score, expected[key]
                    )
                got.add(row.ref_id)
            return got

        for i, (remover, _) in enumerate(results):
            s1 = presence(os.path.join(tmp, f"t{i}_s1.csv"))
            s2 = presence(os.path.join(tmp, f"t{i}_s2.csv"))
            # Program order: own add precedes search1; own remove
            # precedes search2. Other clients' ids may come and go.
            assert own_ids[i] in s1, f"client {i} search1 missed own add"
            if remover:
                assert own_ids[i] not in s2, (
                    f"client {i} search2 saw its removed video"
                )
            else:
                assert own_ids[i] in s2
            # Base refs are never removed: always served.
            assert base_ids <= s1 and base_ids <= s2
            # Each snapshot is a valid state: base ∪ (some alive adds),
            # own id included (saved between own add and own remove).
            from vsc2022_tpu.storage import load_features

            snap_ids = {
                vf.video_id
                for vf in load_features(
                    os.path.join(tmp, f"t{i}_snap.npz"), Dataset.REFS
                )
            }
            assert base_ids <= snap_ids
            assert own_ids[i] in snap_ids
            assert snap_ids - base_ids <= set(own_ids)

        # Final corpus = base + never-removed adds, exactly.
        assert st[0] == "ok" and st[1] == "stats", st
        assert int(st[2]) == len(refs) + len(keepers), st
        from vsc2022_tpu.storage import load_features

        final_ids = {
            vf.video_id
            for vf in load_features(
                os.path.join(tmp, "final_snap.npz"), Dataset.REFS
            )
        }
        assert final_ids == base_ids | keepers


@pytest.mark.slow
class TestServeClient:
    """The Python client wrapper must round-trip the full protocol —
    spawn + TCP attach, search/add/stats, typed errors — against a
    real server process."""

    @pytest.fixture(scope="class")
    def served(self):
        tmp = tempfile.mkdtemp()
        rng = np.random.RandomState(33)
        queries, refs, noise = _make_data(rng)
        extra = [
            VideoFeature(
                video_id=77,
                timestamps=np.arange(22, dtype=np.float64),
                feature=l2n(rng.randn(22, 24)).astype(np.float32),
            )
        ]
        store_features(os.path.join(tmp, "q.npz"), queries, Dataset.QUERIES)
        store_features(os.path.join(tmp, "r.npz"), refs, Dataset.REFS)
        store_features(os.path.join(tmp, "extra.npz"), extra, Dataset.REFS)
        store_features(os.path.join(tmp, "noise.npz"), noise, Dataset.REFS)
        return tmp, queries, refs, noise

    def _client(self, tmp, **kw):
        from vsc2022_tpu.retrieval import ServeClient

        return ServeClient.spawn(
            os.path.join(tmp, "r.npz"),
            score_norm_features=os.path.join(tmp, "noise.npz"),
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            cwd=REPO, stderr=subprocess.DEVNULL, **kw,
        )

    def test_spawn_search_add_stats_errors(self, served, tmp_path):
        from vsc2022_tpu.retrieval import ServeError

        tmp, queries, refs, noise = served
        n_frames = sum(len(vf.timestamps) for vf in refs)
        with self._client(tmp, matches=True) as client:
            assert client.n_ref_videos == len(refs)

            st = client.stats()
            assert (st.n_videos, st.n_frames) == (len(refs), n_frames)
            # The serving default stages bfloat16 (round 4;
            # docs/synthetic_results.md) — stats reports it.
            assert st.dtype == "bfloat16"
            assert not st.sharded and st.matches

            res = client.search(
                os.path.join(tmp, "q.npz"),
                candidates_csv=str(tmp_path / "c.csv"),
                matches_csv=str(tmp_path / "m.csv"),
            )
            assert res.candidates_csv == str(tmp_path / "c.csv")
            assert res.n_candidates == len(res.candidates()) > 0
            assert res.matches_csv == str(tmp_path / "m.csv")
            assert res.n_matches == len(res.matches()) > 0
            # Planted copies rank first with npz-normalized ids.
            top = res.candidates()[0]
            assert top.query_id.startswith("Q")

            # Typed error, session keeps serving.
            with pytest.raises(ServeError, match="No such file|not"):
                client.search("/nonexistent/query.npz")

            assert client.add(os.path.join(tmp, "extra.npz")) == 1
            st2 = client.stats()
            assert st2.n_videos == len(refs) + 1
            assert st2.n_frames == n_frames + 22

            res2 = client.search(
                os.path.join(tmp, "q.npz"),
                candidates_csv=str(tmp_path / "c2.csv"),
                matches_csv=str(tmp_path / "m2.csv"),
            )
            ref_ids = {c.ref_id for c in res2.candidates()}
            assert "R000077" in ref_ids  # the added video is served

            # Naming ONLY the matches CSV defaults the candidates one.
            res3 = client.search(
                os.path.join(tmp, "q.npz"),
                matches_csv=str(tmp_path / "m3.csv"),
            )
            assert res3.candidates_csv == os.path.join(
                tmp, "q.npz.candidates.csv"
            )
            assert res3.matches_csv == str(tmp_path / "m3.csv")

            # remove undoes the add (typed reply + typed error).
            assert client.remove(["R000077"]) == (1, 22)
            st3 = client.stats()
            assert (st3.n_videos, st3.n_frames) == (len(refs), n_frames)
            with pytest.raises(ServeError, match="not indexed"):
                client.remove(["R000077"])
            res4 = client.search(
                os.path.join(tmp, "q.npz"),
                candidates_csv=str(tmp_path / "c4.csv"),
                matches_csv=str(tmp_path / "m4.csv"),
            )
            assert "R000077" not in {
                c.ref_id for c in res4.candidates()
            }

    def test_probe_reports_compute_figures(self, served):
        # `probe` returns the relay-jitter-free device-compute pair
        # (search_s, tn_s) for a warm request's shapes: finite,
        # non-negative, and tn covers the geometry of the MOST RECENT
        # request (so it needs a search first to have TN batches).
        tmp, queries, refs, noise = served
        with self._client(tmp, matches=True) as client:
            client.search(os.path.join(tmp, "q.npz"))
            search_s, tn_s = client.probe(os.path.join(tmp, "q.npz"))
            assert np.isfinite(search_s) and search_s >= 0.0
            assert np.isfinite(tn_s) and tn_s >= 0.0
            # Probing again without a new search replays the same
            # geometry trail (deterministic reply shape).
            s2, t2 = client.probe(os.path.join(tmp, "q.npz"))
            assert np.isfinite(s2) and np.isfinite(t2)

    def test_probe_needs_score_normalization(self, served):
        # Typed protocol error on a plain (non-SN) index; the session
        # keeps serving afterwards.
        from vsc2022_tpu.retrieval import ServeClient, ServeError

        tmp, queries, refs, noise = served
        plain = ServeClient.spawn(
            os.path.join(tmp, "r.npz"),
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            cwd=REPO, stderr=subprocess.DEVNULL,
        )
        with plain as client:
            with pytest.raises(ServeError, match="score-normalized"):
                client.probe(os.path.join(tmp, "q.npz"))
            res = client.search(os.path.join(tmp, "q.npz"))
            assert res.n_candidates > 0

    def test_save_snapshot_restarts_bit_identical(self, served, tmp_path):
        # `save` after add/remove mutations must snapshot the live
        # corpus so a fresh server on the snapshot answers
        # bit-identically (row order = live corpus order).
        tmp, queries, refs, noise = served
        from vsc2022_tpu.retrieval import ServeClient

        snap = str(tmp_path / "snap.npz")
        with self._client(tmp) as client:
            client.add(os.path.join(tmp, "extra.npz"))
            client.remove(["R000003", "R000005"])
            assert client.save(snap) == len(refs) - 2 + 1
            live = client.search(
                os.path.join(tmp, "q.npz"),
                candidates_csv=str(tmp_path / "live.csv"),
            )
            assert live.n_candidates > 0

        # Snapshot video order = live corpus order (adds at the end).
        from vsc2022_tpu.storage import load_features

        saved = load_features(snap, Dataset.REFS)
        assert [vf.video_id for vf in saved] == [
            f"R{i:06d}" for i in range(len(refs)) if i not in (3, 5)
        ] + ["R000077"]

        restarted = ServeClient.spawn(
            snap,
            score_norm_features=os.path.join(tmp, "noise.npz"),
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            cwd=REPO, stderr=subprocess.DEVNULL,
        )
        with restarted as client2:
            client2.search(
                os.path.join(tmp, "q.npz"),
                candidates_csv=str(tmp_path / "restarted.csv"),
            )
        with open(tmp_path / "live.csv", "rb") as a, open(
            tmp_path / "restarted.csv", "rb"
        ) as b:
            assert a.read() == b.read()

    def test_default_csv_paths(self, served):
        tmp, queries, refs, noise = served
        with self._client(tmp) as client:
            res = client.search(os.path.join(tmp, "q.npz"))
            assert res.candidates_csv == os.path.join(
                tmp, "q.npz.candidates.csv"
            )
            assert res.matches_csv is None
            with pytest.raises(ValueError, match="matches"):
                res.matches()

    def test_spawn_failure_reaps_child(self):
        from vsc2022_tpu.retrieval import ServeClient, ServeError

        with pytest.raises(ServeError, match="exited with code"):
            ServeClient.spawn(
                "/nonexistent/refs.npz",
                env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
                cwd=REPO, stderr=subprocess.DEVNULL,
            )

    def test_tcp_connect(self, served, tmp_path):
        from vsc2022_tpu.retrieval import ServeClient

        tmp, queries, refs, noise = served
        env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
                "--ref_features", os.path.join(tmp, "r.npz"),
                "--listen", "127.0.0.1:0",
            ],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env, cwd=REPO,
        )
        try:
            assert proc.stdout.readline().startswith("ready")
            host, port = (
                proc.stdout.readline().strip().split("\t")[1].rsplit(":", 1)
            )
            with ServeClient.connect(host, int(port), timeout=120) as c1:
                assert c1.n_ref_videos == len(refs)
                res = c1.search(
                    os.path.join(tmp, "q.npz"),
                    candidates_csv=str(tmp_path / "tcp.csv"),
                )
                assert res.n_candidates > 0
            # quit ended the session, not the server: reattach and stop.
            # The ready greeting reads the LIVE corpus size — a new
            # client after an add must not see the startup count.
            c2 = ServeClient.connect(host, int(port), timeout=120)
            assert c2.add(os.path.join(tmp, "extra.npz")) == 1
            c2.close()
            c3 = ServeClient.connect(host, int(port), timeout=120)
            assert c3.n_ref_videos == len(refs) + 1
            assert c3.stats().n_videos == len(refs) + 1
            c3.close(shutdown=True)
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()


@pytest.mark.slow
class TestDnSShardedServe:
    """--sharded + --ref_fine_features: both DnS reference tables
    (coarse retrieval corpus and the localizer's coarse+fine tables)
    live row-sharded over the mesh; served candidates and matches must
    be byte-identical to the unsharded DnS server through add/remove."""

    def test_sharded_dns_serve_matches_unsharded(self, tmp_path):
        from vsc2022_tpu.models.dns import NUM_REGIONS

        rng = np.random.RandomState(37)

        def unit_fine(n):
            x = rng.normal(size=(n, NUM_REGIONS, 16)).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        def coarse_from(fine):
            pooled = fine.mean(axis=1)
            return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

        r_fine = [unit_fine(int(rng.randint(24, 40))) for _ in range(5)]
        q_fine = [unit_fine(28) for _ in range(3)]
        q_fine[0][8:20] = r_fine[0][5:17]
        q_fine[1][2:12] = r_fine[2][10:20]
        extra_fine = unit_fine(26)
        extra_fine[4:16] = q_fine[2][6:18]  # planted in the added ref

        def vids(prefix, fines, start=0):
            fine_v, coarse_v = [], []
            for i, f in enumerate(fines):
                ts = np.arange(f.shape[0], dtype=np.float64)
                vid = f"{prefix}{start + i:06d}"
                fine_v.append(VideoFeature(
                    video_id=vid, timestamps=ts,
                    feature=f.reshape(f.shape[0], -1),
                ))
                coarse_v.append(VideoFeature(
                    video_id=vid, timestamps=ts, feature=coarse_from(f),
                ))
            return fine_v, coarse_v

        rf, rc = vids("R", r_fine)
        qf, qc = vids("Q", q_fine)
        af, ac = vids("R", [extra_fine], start=99)
        paths = {}
        for name, v, ds in (
            ("rc", rc, Dataset.REFS), ("rf", rf, Dataset.REFS),
            ("qc", qc, Dataset.QUERIES), ("qf", qf, Dataset.QUERIES),
            ("ac", ac, Dataset.REFS), ("af", af, Dataset.REFS),
        ):
            paths[name] = str(tmp_path / f"{name}.npz")
            store_features(paths[name], v, ds)

        env = dict(
            os.environ, VSC2022_TPU_FORCE_CPU="1",
            XLA_FLAGS="--xla_force_host_platform_device_count=8",
        )

        def lifecycle(tag, *extra):
            proc = subprocess.Popen(
                [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
                 "--ref_features", paths["rc"],
                 "--ref_fine_features", paths["rf"], *extra],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True, env=env, cwd=REPO,
            )
            try:
                assert proc.stdout.readline().startswith("ready")

                def req(line):
                    proc.stdin.write(line + "\n")
                    proc.stdin.flush()
                    return proc.stdout.readline().strip().split("\t")

                assert req(
                    f"add\t{paths['ac']}\t{paths['af']}"
                )[:3] == ["ok", "added", "1"]
                assert req("remove\tR000001")[:3] == ["ok", "removed", "1"]
                c_out = tmp_path / f"{tag}_c.csv"
                m_out = tmp_path / f"{tag}_m.csv"
                assert req(
                    f"{paths['qc']}\t{paths['qf']}\t{c_out}\t{m_out}"
                )[0] == "ok"
                proc.stdin.write("quit\n")
                proc.stdin.flush()
                assert proc.wait(timeout=240) == 0
            finally:
                proc.kill()
            return c_out, m_out

        plain_c, plain_m = lifecycle("plain")
        shard_c, shard_m = lifecycle("shard", "--sharded")
        for a, b in ((plain_c, shard_c), (plain_m, shard_m)):
            with open(a, "rb") as fa, open(b, "rb") as fb:
                assert fa.read() == fb.read()
        from vsc2022_tpu.metrics import Match

        got = Match.read_csv(str(plain_m))
        assert any(
            m.query_id == "Q000002" and m.ref_id == "R000099" for m in got
        )


class TestInbandProtocol:
    """searchb / addb / saveb: npz and CSV payload bytes travel on the
    request stream itself, so a remote --listen client needs no shared
    filesystem. The in-band results must equal the path-based protocol
    exactly, over both stdio and TCP."""

    @pytest.fixture(scope="class")
    def served(self):
        tmp = tempfile.mkdtemp()
        rng = np.random.RandomState(71)
        queries, refs, noise = _make_data(rng)
        extra = [
            VideoFeature(
                video_id=91,
                timestamps=np.arange(21, dtype=np.float64),
                feature=l2n(rng.randn(21, 24)).astype(np.float32),
            )
        ]
        extra[0].feature[2:10] = queries[2].feature[11:19]
        store_features(os.path.join(tmp, "q.npz"), queries, Dataset.QUERIES)
        store_features(os.path.join(tmp, "r.npz"), refs, Dataset.REFS)
        store_features(os.path.join(tmp, "noise.npz"), noise, Dataset.REFS)
        store_features(os.path.join(tmp, "extra.npz"), extra, Dataset.REFS)
        return tmp, queries, refs, noise, extra

    def _client(self, tmp, **kw):
        from vsc2022_tpu.retrieval import ServeClient

        return ServeClient.spawn(
            os.path.join(tmp, "r.npz"),
            score_norm_features=os.path.join(tmp, "noise.npz"),
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            cwd=REPO, stderr=subprocess.DEVNULL, **kw,
        )

    @staticmethod
    def _ckey(c):
        return (c.query_id, c.ref_id, c.score)

    @staticmethod
    def _mkey(m):
        return (
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )

    def test_inband_equals_paths_over_stdio(self, served, tmp_path):
        from vsc2022_tpu.retrieval import ServeError

        tmp, queries, refs, noise, extra = served
        with self._client(tmp, matches=True) as client:
            by_path = client.search(
                os.path.join(tmp, "q.npz"),
                candidates_csv=str(tmp_path / "c.csv"),
                matches_csv=str(tmp_path / "m.csv"),
            )
            inband = client.search_features(queries)
            assert list(map(self._ckey, inband.candidates)) == list(
                map(self._ckey, by_path.candidates())
            )
            assert list(map(self._mkey, inband.matches)) == list(
                map(self._mkey, by_path.matches())
            )
            assert len(inband.candidates) >= 1

            # In-band add: grows the corpus like the path form; the
            # planted copy in the added ref then localizes.
            assert client.add_features(extra) == 1
            post = client.search_features(queries)
            assert any(
                m.query_id == "Q000002" and m.ref_id == "R000091"
                for m in post.matches
            )
            # Duplicate-id rejection travels as a typed error and the
            # session keeps serving.
            with pytest.raises(ServeError, match="already indexed"):
                client.add_features(extra)
            client.remove(["R000091"])

            # In-band snapshot equals the on-disk save.
            snap_refs, snap_fine = client.snapshot()
            assert snap_fine is None
            client.save(str(tmp_path / "snap.npz"))
            from vsc2022_tpu.storage import load_features

            disk = load_features(str(tmp_path / "snap.npz"), Dataset.REFS)
            assert [vf.video_id for vf in snap_refs] == [
                vf.video_id for vf in disk
            ]
            for a, b in zip(snap_refs, disk):
                np.testing.assert_array_equal(a.feature, b.feature)
                np.testing.assert_array_equal(a.timestamps, b.timestamps)

            # Malformed payload lengths answer an error and keep the
            # session alive (nothing was consumed off the stream).
            client._write_line("searchb\tnotanumber")
            client._wfile.flush()
            reply = client._read_line()
            assert reply.startswith("error")
            assert client.stats().n_videos == len(refs)

    def test_inband_over_tcp_needs_no_shared_paths(self, served):
        from vsc2022_tpu.retrieval import ServeClient

        tmp, queries, refs, noise, extra = served
        proc = subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", os.path.join(tmp, "r.npz"),
             "--score_norm_features", os.path.join(tmp, "noise.npz"),
             "--matches", "--listen", "127.0.0.1:0"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"), cwd=REPO,
        )
        try:
            assert proc.stdout.readline().startswith("ready")
            host, port = proc.stdout.readline().split("\t")[1].rsplit(
                ":", 1
            )
            with ServeClient.connect(host, int(port)) as c1:
                r1 = c1.search_features(queries)
                assert len(r1.candidates) >= 1
                assert r1.matches is not None and len(r1.matches) >= 1
                assert c1.add_features(extra) == 1
                snap_refs, _ = c1.snapshot()
                assert len(snap_refs) == len(refs) + 1
            # Results identical to a second, path-based session.
            with ServeClient.connect(host, int(port)) as c2:
                r2 = c2.search_features(queries)
                assert list(map(self._ckey, r2.candidates)) != list(
                    map(self._ckey, r1.candidates)
                ) or True  # corpus grew between the two searches
                c2.remove(["R000091"])
                r3 = c2.search_features(queries)
                assert list(map(self._ckey, r3.candidates)) == list(
                    map(self._ckey, r1.candidates)
                )
                assert list(map(self._mkey, r3.matches)) == list(
                    map(self._mkey, r1.matches)
                )
                c2.close(shutdown=True)
            assert proc.wait(timeout=120) == 0
        finally:
            proc.kill()

    def test_inband_dns_two_payloads(self, tmp_path):
        from vsc2022_tpu.models.dns import NUM_REGIONS
        from vsc2022_tpu.retrieval import ServeClient

        rng = np.random.RandomState(73)

        def unit_fine(n):
            x = rng.normal(size=(n, NUM_REGIONS, 16)).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        def coarse_from(f):
            p = f.mean(axis=1)
            return p / np.linalg.norm(p, axis=-1, keepdims=True)

        r_fine = [unit_fine(int(rng.randint(22, 34))) for _ in range(4)]
        q_fine = [unit_fine(26) for _ in range(2)]
        q_fine[0][5:17] = r_fine[2][4:16]

        def vids(prefix, fines):
            fv, cv = [], []
            for i, f in enumerate(fines):
                ts = np.arange(f.shape[0], dtype=np.float64)
                vid = f"{prefix}{i:06d}"
                fv.append(VideoFeature(
                    video_id=vid, timestamps=ts,
                    feature=f.reshape(f.shape[0], -1),
                ))
                cv.append(VideoFeature(
                    video_id=vid, timestamps=ts, feature=coarse_from(f),
                ))
            return fv, cv

        rf, rc = vids("R", r_fine)
        qf, qc = vids("Q", q_fine)
        store_features(str(tmp_path / "rc.npz"), rc, Dataset.REFS)
        store_features(str(tmp_path / "rf.npz"), rf, Dataset.REFS)

        with ServeClient.spawn(
            str(tmp_path / "rc.npz"),
            ref_fine_features=str(tmp_path / "rf.npz"),
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            cwd=REPO, stderr=subprocess.DEVNULL,
        ) as client:
            res = client.search_features(qc, queries_fine=qf)
            assert res.matches is not None
            assert any(
                m.query_id == "Q000000" and m.ref_id == "R000002"
                for m in res.matches
            )
            # Single-payload searchb against a DnS server is an error.
            from vsc2022_tpu.retrieval import ServeError

            with pytest.raises(ServeError, match="searchb"):
                client.search_features(qc)
            # Snapshot returns BOTH sides in-band.
            snap_refs, snap_fine = client.snapshot()
            assert snap_fine is not None
            assert [v.video_id for v in snap_refs] == [
                v.video_id for v in snap_fine
            ]


W_E2E, H_E2E, FRAMES_E2E = 48, 32, 8


@pytest.mark.slow
class TestEndToEndServe:
    """extract / searchv on a resident SSCD model: end-to-end serving
    from raw videos must equal the one-shot flow (inference CLI →
    descriptor npz → path-based search) bit-for-bit. Decode uses stub
    ffmpeg/ffprobe emitting frames derived from each video file's
    content byte, so a query sharing a ref's byte is an exact copy."""

    @pytest.fixture(scope="class")
    def rig(self, tmp_path_factory):
        import stat

        tmp = tmp_path_factory.mktemp("e2e")
        tools = tmp / "tools"
        tools.mkdir()

        def executable(path, content):
            path.write_text(content)
            os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)

        executable(
            tools / "ffprobe",
            "#!/usr/bin/env python3\n"
            f'print(\'{{"streams": [{{"width": {W_E2E}, '
            f'"height": {H_E2E}}}]}}\')\n',
        )
        executable(
            tools / "ffmpeg",
            "#!/usr/bin/env python3\n"
            "import sys\n"
            "path = sys.argv[sys.argv.index('-i') + 1]\n"
            "seed = open(path, 'rb').read(1)[0]\n"
            f"for j in range({FRAMES_E2E}):\n"
            "    sys.stdout.buffer.write("
            f"bytes([(seed + 17 * j) % 256]) * {W_E2E * H_E2E * 3})\n",
        )
        rdir, qdir = tmp / "refs", tmp / "queries"
        rdir.mkdir()
        qdir.mkdir()
        for i, seed in enumerate([10, 60, 110]):
            (rdir / f"R{i:06d}.mp4").write_bytes(bytes([seed]))
        (qdir / "Q000000.mp4").write_bytes(bytes([200]))
        # Q000001 = an exact copy of R000002 (same content byte).
        (qdir / "Q000001.mp4").write_bytes(bytes([110]))

        # One deterministic checkpoint shared by every process.
        import jax
        import jax.numpy as jnp

        from vsc2022_tpu.models import SSCDModel
        from vsc2022_tpu.utils.checkpoint import save_variables

        variables = SSCDModel().init(
            jax.random.PRNGKey(7), jnp.zeros((1, 224, 224, 3), jnp.float32)
        )
        ckpt = str(tmp / "sscd.npz")
        save_variables(ckpt, variables)

        def one_shot(dataset_path, out):
            r = subprocess.run(
                [sys.executable, "-m", "vsc2022_tpu.inference.cli",
                 "--baseline", "sscd", "--accelerator", "cpu",
                 "--checkpoint_path", ckpt,
                 "--transforms", "RESIZE_224_SQUARE", "--batch_size", "8",
                 "--dataset_path", dataset_path,
                 "--ffmpeg_path", str(tools / "ffmpeg"),
                 "--output_file", out],
                cwd=REPO, env={**os.environ}, capture_output=True,
                text=True, timeout=600,
            )
            assert r.returncode == 0, r.stderr[-2000:]

        one_shot(str(rdir), str(tmp / "r.npz"))
        one_shot(str(qdir), str(tmp / "q.npz"))

        # Noise corpus (descriptor space, 512-d) for the SN+matches arm.
        rng = np.random.RandomState(5)
        noise = [
            VideoFeature(
                video_id=2000 + i,
                timestamps=np.arange(20, dtype=np.float64),
                feature=l2n(rng.randn(20, 512)).astype(np.float32),
            )
            for i in range(4)
        ]
        store_features(str(tmp / "noise.npz"), noise, Dataset.REFS)
        return tmp, tools, rdir, qdir, ckpt

    def _spawn(self, tmp, extra_args=(), **kw):
        from vsc2022_tpu.retrieval import ServeClient

        return ServeClient.spawn(
            str(tmp / "r.npz"),
            env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            cwd=REPO, stderr=subprocess.DEVNULL,
            extra_args=list(extra_args), **kw,
        )

    def test_extract_and_searchv_match_one_shot(self, rig, tmp_path):
        from vsc2022_tpu.retrieval import ServeError

        tmp, tools, rdir, qdir, ckpt = rig
        with self._spawn(
            tmp,
            extra_args=[
                "--baseline", "sscd", "--checkpoint_path", ckpt,
                "--extract_transforms", "RESIZE_224_SQUARE",
                "--extract_batch_size", "8",
                "--ffmpeg_path", str(tools / "ffmpeg"),
            ],
        ) as client:
            # `extract` equals the one-shot inference CLI, bit for bit.
            out_npz = str(tmp_path / "served_q.npz")
            n_videos, n_frames = client.extract(str(qdir), out_npz)
            assert (n_videos, n_frames) == (2, 2 * FRAMES_E2E)
            with np.load(out_npz) as a, np.load(tmp / "q.npz") as b:
                assert list(a["video_ids"]) == list(b["video_ids"])
                np.testing.assert_array_equal(a["features"], b["features"])
                np.testing.assert_array_equal(
                    a["timestamps"], b["timestamps"]
                )

            # `searchv` equals a path search over the one-shot npz.
            client.search(
                str(tmp / "q.npz"),
                candidates_csv=str(tmp_path / "c1.csv"),
            )
            by_video = client.search_videos(
                str(qdir), candidates_csv=str(tmp_path / "c2.csv"),
            )
            c1 = (tmp_path / "c1.csv").read_text()
            c2 = (tmp_path / "c2.csv").read_text()
            assert c1 == c2 and len(c2.splitlines()) > 1
            assert by_video.n_candidates == len(c2.splitlines()) - 1
            # The planted copy pair is among the candidates. (Raw
            # SSCD descriptors are unnormalized, so without score
            # normalization the IP magnitude tracks vector norms —
            # rank assertions belong to the SN test below.)
            rows = [ln.split(",") for ln in c2.splitlines()[1:]]
            assert ("Q000001", "R000002") in {(r[0], r[1]) for r in rows}

            # Default CSV naming anchors to the videos directory.
            res = client.search_videos(str(qdir))
            assert res.candidates_csv == str(qdir) + ".candidates.csv"
            assert os.path.exists(res.candidates_csv)

            with pytest.raises(ServeError, match="Not a video directory"):
                client.search_videos(str(tmp_path / "missing"))

    def test_searchv_serves_the_full_matching_track(self, rig, tmp_path):
        """searchv under --score_norm_features --matches: the TN stage
        runs on the extracted queries and both CSVs equal the
        path-based request over the one-shot npz."""
        tmp, tools, rdir, qdir, ckpt = rig
        with self._spawn(
            tmp,
            score_norm_features=str(tmp / "noise.npz"),
            matches=True,
            extra_args=[
                "--baseline", "sscd", "--checkpoint_path", ckpt,
                "--extract_transforms", "RESIZE_224_SQUARE",
                "--extract_batch_size", "8",
                "--ffmpeg_path", str(tools / "ffmpeg"),
            ],
        ) as client:
            client.search(
                str(tmp / "q.npz"),
                candidates_csv=str(tmp_path / "c1.csv"),
                matches_csv=str(tmp_path / "m1.csv"),
            )
            res = client.search_videos(
                str(qdir),
                candidates_csv=str(tmp_path / "c2.csv"),
                matches_csv=str(tmp_path / "m2.csv"),
            )
            assert res.matches_csv == str(tmp_path / "m2.csv")
            assert (tmp_path / "c1.csv").read_text() == (
                tmp_path / "c2.csv"
            ).read_text()
            assert (tmp_path / "m1.csv").read_text() == (
                tmp_path / "m2.csv"
            ).read_text()
            # Typed result coherence. (Whether the degenerate
            # constant-frame random-init similarity clears the TN gate
            # is not a contract — copy localization is pinned on real
            # feature geometry in the serve tests above; the contract
            # HERE is searchv ≡ path search, asserted on both CSVs.)
            assert res.n_matches == len(res.matches())

    def test_no_resident_model_is_a_typed_error(self, rig):
        from vsc2022_tpu.retrieval import ServeError

        tmp, tools, rdir, qdir, ckpt = rig
        with self._spawn(tmp) as client:
            with pytest.raises(ServeError, match="No resident model"):
                client.search_videos(str(qdir))
            with pytest.raises(ServeError, match="No resident model"):
                client.extract(str(qdir), str(tmp / "never.npz"))
            # The session keeps serving after the errors.
            assert client.stats().n_videos == 3

    def test_weights_without_architecture_fail_startup(self, rig):
        tmp, tools, rdir, qdir, ckpt = rig
        proc = subprocess.run(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", str(tmp / "r.npz"),
             "--checkpoint_path", ckpt],
            cwd=REPO, env=dict(os.environ, VSC2022_TPU_FORCE_CPU="1"),
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode != 0
        assert "--baseline" in proc.stderr
