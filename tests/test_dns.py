"""DnS two-stage pipeline tests: indexing driver semantics and the
fused fine+coarse localization on planted copies."""

import numpy as np

import jax.numpy as jnp

from vsc2022_tpu.baseline.dns_baseline import (
    DnSLocalization,
    _fused_fine_coarse_sims,
)
from vsc2022_tpu.baseline.dns_index import index_videos
from vsc2022_tpu.metrics import CandidatePair
from vsc2022_tpu.models.dns import DnSStudent, NUM_REGIONS, REDUCED_DIM
from vsc2022_tpu.types import VideoFeature


def vf(video_id, feature, dtype=np.float32):
    return VideoFeature(
        video_id=video_id,
        timestamps=np.arange(feature.shape[0], dtype=np.float64),
        feature=np.asarray(feature, dtype=dtype),
    )


class TestIndexVideos:
    def make_raw(self, rng, n=5):
        return [vf(f"Q{i:06d}", rng.randn(4, NUM_REGIONS * 3840)) for i in range(n)]

    def test_cg_indexing(self, ):
        rng = np.random.RandomState(0)
        model = DnSStudent("cg")
        out = index_videos(model, self.make_raw(rng, 2))
        assert all(o.feature.shape == (4, 1024) for o in out)
        # Metadata preserved.
        assert [o.video_id for o in out] == ["Q000000", "Q000001"]

    def test_fg_bin_indexing_is_boolean(self):
        rng = np.random.RandomState(1)
        model = DnSStudent("fg", "bin")
        out = index_videos(model, self.make_raw(rng, 1))
        assert out[0].feature.dtype == bool

    def test_fg_att_indexing_is_fp16(self):
        rng = np.random.RandomState(2)
        model = DnSStudent("fg", "att")
        out = index_videos(model, self.make_raw(rng, 1))
        assert out[0].feature.dtype == np.float16


class TestFusedSims:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(3)
        b, nq, nr, r, d, dc = 2, 4, 5, NUM_REGIONS, 8, 6
        qf = rng.randn(b, nq, r, d).astype(np.float32)
        rf = rng.randn(b, nr, r, d).astype(np.float32)
        qc = rng.randn(b, nq, dc).astype(np.float32)
        rc = rng.randn(b, nr, dc).astype(np.float32)
        bias = 0.5
        got = np.asarray(
            _fused_fine_coarse_sims(
                jnp.asarray(qf), jnp.asarray(rf), jnp.asarray(qc),
                jnp.asarray(rc), jnp.float32(bias), symmetric=True,
            )
        )
        # Reference formula (vsc/baseline/dns_baseline.py:138-163).
        for i in range(b):
            prods = np.einsum("qad,ncd->qnac", qf[i], rf[i])
            fg = prods.max(axis=3).mean(axis=2)
            fg_t = prods.max(axis=2).mean(axis=2)
            sim = (fg + fg_t) / 2.0
            sim = sim / 2.0 + 0.5
            cg = qc[i] @ rc[i].T + bias
            expect = np.sqrt(sim.clip(1e-7) * cg.clip(1e-7))
            np.testing.assert_allclose(got[i], expect, rtol=1e-4, atol=1e-5)


class TestDnSLocalization:
    def test_planted_copy(self):
        rng = np.random.RandomState(7)
        nq, nr = 40, 50

        def unit_regions(n):
            x = rng.normal(size=(n, NUM_REGIONS, REDUCED_DIM)).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        q_fine = unit_regions(nq)
        r_fine = unit_regions(nr)
        q_fine[10:22] = r_fine[5:17]  # planted copy

        def coarse_from(fine):
            pooled = fine.mean(axis=1)
            return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

        queries_fine = {"Q000001": vf("Q000001", q_fine.reshape(nq, -1))}
        refs_fine = {"R000002": vf("R000002", r_fine.reshape(nr, -1))}
        queries_coarse = [vf("Q000001", coarse_from(q_fine))]
        refs_coarse = [vf("R000002", coarse_from(r_fine))]

        loc = DnSLocalization(
            queries_fine, refs_fine, queries_coarse, refs_coarse,
            model_type="TN", tn_max_step=5, min_length=4, similarity_bias=0.5,
        )
        matches = loc.localize_all([CandidatePair("Q000001", "R000002", 1.0)])
        assert len(matches) >= 1
        m = max(matches, key=lambda x: x.score)
        assert m.query_start <= 11 and m.query_end >= 20
        assert m.ref_start <= 6 and m.ref_end >= 15


class TestDnSResidentTables:
    def test_ref_tables_survive_set_queries(self):
        # Serving contract: replacing the query set must NOT restage
        # the reference coarse/fine tables (device-resident corpus).
        rng = np.random.RandomState(11)

        def fine(n):
            return rng.randn(n, NUM_REGIONS * 16).astype(np.float32)

        refs_fine = {"R000001": vf("R000001", fine(20))}
        refs_coarse = [vf("R000001", rng.randn(20, 8).astype(np.float32))]
        q1_fine = {"Q000001": vf("Q000001", fine(12))}
        q1_coarse = [vf("Q000001", rng.randn(12, 8).astype(np.float32))]

        loc = DnSLocalization(
            q1_fine, refs_fine, q1_coarse, refs_coarse,
            model_type="TN", similarity_bias=0.5,
        )
        loc.localize_all([CandidatePair("Q000001", "R000001", 1.0)])
        r_coarse_tab = loc._r_table
        r_fine_tab = loc._fine_r_tab
        assert r_coarse_tab is not None and r_fine_tab is not None

        q2_fine = {"Q000002": vf("Q000002", fine(15))}
        q2_coarse = [vf("Q000002", rng.randn(15, 8).astype(np.float32))]
        loc.set_queries(q2_coarse, queries_fine=q2_fine)
        loc.localize_all([CandidatePair("Q000002", "R000001", 1.0)])
        assert loc._r_table is r_coarse_tab
        assert loc._fine_r_tab is r_fine_tab

    def test_add_refs_grows_both_tables_device_side(self):
        # Serving `add` on DnS: both resident ref tables (coarse +
        # fine) grow by device-side concat, and alignments over the
        # grown tables equal a fresh build over the combined refs.
        rng = np.random.RandomState(13)

        def unit_regions(n):
            x = rng.normal(size=(n, NUM_REGIONS, REDUCED_DIM)).astype(
                np.float32
            )
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        def coarse_from(fine):
            pooled = fine.mean(axis=1)
            return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

        q_fine = unit_regions(40)
        r1_fine = unit_regions(50)
        r2_fine = unit_regions(45)
        r2_fine[5:17] = q_fine[10:22]  # plant the copy in the ADDED ref

        queries_fine = {"Q000001": vf("Q000001", q_fine.reshape(40, -1))}
        queries_coarse = [vf("Q000001", coarse_from(q_fine))]
        refs_fine = {"R000001": vf("R000001", r1_fine.reshape(50, -1))}
        refs_coarse = [vf("R000001", coarse_from(r1_fine))]
        add_fine = {"R000002": vf("R000002", r2_fine.reshape(45, -1))}
        add_coarse = [vf("R000002", coarse_from(r2_fine))]
        pairs = [
            CandidatePair("Q000001", "R000001", 1.0),
            CandidatePair("Q000001", "R000002", 1.0),
        ]
        kw = dict(
            model_type="TN", tn_max_step=5, min_length=4,
            similarity_bias=0.5,
        )

        grown = DnSLocalization(
            dict(queries_fine), dict(refs_fine),
            queries_coarse, list(refs_coarse), **kw
        )
        grown.localize_all([pairs[0]])  # stage both ref tables
        coarse_tab, fine_tab = grown._r_table, grown._fine_r_tab
        grown.add_refs(add_coarse, refs_fine=add_fine)
        assert grown._r_table.shape[0] == coarse_tab.shape[0] + 45
        assert grown._fine_r_tab.shape[0] == fine_tab.shape[0] + 45
        got = grown.localize_all(pairs)

        fresh = DnSLocalization(
            dict(queries_fine), {**refs_fine, **add_fine},
            queries_coarse, refs_coarse + add_coarse, **kw
        )
        expect = fresh.localize_all(pairs)
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )
        assert sorted(key(m) for m in got) == sorted(key(m) for m in expect)
        assert any(m.ref_id == "R000002" for m in got)

    def test_remove_refs_compacts_both_tables_device_side(self):
        # Serving `remove` on DnS: both resident ref tables (coarse +
        # fine) compact device-side, and alignments over the shrunken
        # tables equal a fresh build over the survivors.
        rng = np.random.RandomState(17)

        def unit_regions(n):
            x = rng.normal(size=(n, NUM_REGIONS, REDUCED_DIM)).astype(
                np.float32
            )
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        def coarse_from(fine):
            pooled = fine.mean(axis=1)
            return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

        q_fine = unit_regions(40)
        r1_fine = unit_regions(50)
        r2_fine = unit_regions(45)
        r2_fine[5:17] = q_fine[10:22]  # the copy SURVIVES the remove

        queries_fine = {"Q000001": vf("Q000001", q_fine.reshape(40, -1))}
        queries_coarse = [vf("Q000001", coarse_from(q_fine))]
        refs_fine = {
            "R000001": vf("R000001", r1_fine.reshape(50, -1)),
            "R000002": vf("R000002", r2_fine.reshape(45, -1)),
        }
        refs_coarse = [
            vf("R000001", coarse_from(r1_fine)),
            vf("R000002", coarse_from(r2_fine)),
        ]
        pair = CandidatePair("Q000001", "R000002", 1.0)
        kw = dict(
            model_type="TN", tn_max_step=5, min_length=4,
            similarity_bias=0.5,
        )

        shrunk = DnSLocalization(
            dict(queries_fine), dict(refs_fine),
            queries_coarse, list(refs_coarse), **kw
        )
        shrunk.localize_all([pair])  # stage both ref tables
        coarse_tab, fine_tab = shrunk._r_table, shrunk._fine_r_tab
        shrunk.remove_refs(["R000001"])
        assert shrunk._r_table.shape[0] == coarse_tab.shape[0] - 50
        assert shrunk._fine_r_tab.shape[0] == fine_tab.shape[0] - 50
        assert "R000001" not in shrunk.refs_fine
        got = shrunk.localize_all([pair])

        fresh = DnSLocalization(
            dict(queries_fine),
            {"R000002": refs_fine["R000002"]},
            queries_coarse, [refs_coarse[1]], **kw
        )
        expect = fresh.localize_all([pair])
        key = lambda m: (  # noqa: E731
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )
        assert sorted(key(m) for m in got) == sorted(key(m) for m in expect)
        assert len(got) >= 1


class TestDnSMeshLocalization:
    def test_mesh_matches_single_device(self):
        # The DnS localizer over a corpus mesh (batched TN DP sharded
        # on the pair axis) must emit the same matches as one device.
        import jax

        from vsc2022_tpu.parallel.mesh import corpus_mesh

        assert len(jax.devices()) >= 8
        rng = np.random.RandomState(23)

        def unit_regions(n):
            x = rng.normal(size=(n, NUM_REGIONS, 16)).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        r_fine = [unit_regions(int(rng.randint(24, 40))) for _ in range(6)]
        q_fine = [unit_regions(30) for _ in range(3)]
        q_fine[0][8:20] = r_fine[1][5:17]
        q_fine[2][0:10] = r_fine[4][12:22]

        def coarse_from(f):
            p = f.mean(axis=1)
            return p / np.linalg.norm(p, axis=-1, keepdims=True)

        refs_fine = {
            f"R{i:06d}": vf(f"R{i:06d}", f.reshape(f.shape[0], -1))
            for i, f in enumerate(r_fine)
        }
        queries_fine = {
            f"Q{i:06d}": vf(f"Q{i:06d}", f.reshape(f.shape[0], -1))
            for i, f in enumerate(q_fine)
        }
        refs_coarse = [
            vf(f"R{i:06d}", coarse_from(f)) for i, f in enumerate(r_fine)
        ]
        queries_coarse = [
            vf(f"Q{i:06d}", coarse_from(f)) for i, f in enumerate(q_fine)
        ]
        cands = [
            CandidatePair(q.video_id, r.video_id, 1.0)
            for q in queries_coarse
            for r in refs_coarse
        ]

        def run(mesh):
            loc = DnSLocalization(
                queries_fine, refs_fine, queries_coarse, refs_coarse,
                model_type="TN", tn_max_step=5, min_length=4,
                similarity_bias=0.5, mesh=mesh,
            )
            return loc.localize_all(cands)

        expect = run(None)
        got = run(corpus_mesh(8))
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
        assert len(expect) >= 2  # planted copies localize


class TestDnSTwoStageFlow:
    """dns_index → dns_baseline via their main() entry points and npz/csv
    file contracts (random-init students; checks plumbing, not quality)."""

    def test_index_then_match(self, tmp_path):
        import argparse

        from vsc2022_tpu.baseline import dns_baseline, dns_index
        from vsc2022_tpu.metrics import Dataset
        from vsc2022_tpu.storage import store_features

        rng = np.random.RandomState(0)
        raw_dim = NUM_REGIONS * 3840

        def vids(prefix, n, frames=6):
            return [
                vf(f"{prefix}{i:06d}", rng.randn(frames, raw_dim) * 0.05)
                for i in range(n)
            ]

        store_features(str(tmp_path / "q.npz"), vids("Q", 2), Dataset.QUERIES)
        store_features(str(tmp_path / "r.npz"), vids("R", 3), Dataset.REFS)
        store_features(
            str(tmp_path / "noise.npz"), vids("R", 2)[0:2], Dataset.REFS
        )
        # rename noise ids to avoid overlap with refs
        from vsc2022_tpu.storage import load_features
        noise = load_features(str(tmp_path / "noise.npz"))
        for i, n in enumerate(noise):
            n.video_id = f"R{900 + i:06d}"
        store_features(str(tmp_path / "noise.npz"), noise)

        # Stage 1a: coarse indexing with score norm.
        dns_index.main(argparse.Namespace(
            query_features=str(tmp_path / "q.npz"),
            ref_features=str(tmp_path / "r.npz"),
            score_norm_features=str(tmp_path / "noise.npz"),
            output_path=str(tmp_path / "idx"),
            student="cg", fg_type="att", checkpoint_path=None,
        ))
        assert (tmp_path / "idx" / "queries_cg_student_sn.npz").exists()
        assert (tmp_path / "idx" / "refs_cg_student_sn.npz").exists()

        # Stage 1b: fine indexing (att).
        dns_index.main(argparse.Namespace(
            query_features=str(tmp_path / "q.npz"),
            ref_features=str(tmp_path / "r.npz"),
            score_norm_features=None,
            output_path=str(tmp_path / "idx"),
            student="fg", fg_type="att", checkpoint_path=None,
        ))
        assert (tmp_path / "idx" / "queries_fg_att_student.npz").exists()

        # fg + score-norm is rejected (reference rule).
        import pytest as _pytest
        with _pytest.raises(Exception, match="score normalization"):
            dns_index.main(argparse.Namespace(
                query_features=str(tmp_path / "q.npz"),
                ref_features=str(tmp_path / "r.npz"),
                score_norm_features=str(tmp_path / "noise.npz"),
                output_path=str(tmp_path / "idx"),
                student="fg", fg_type="att", checkpoint_path=None,
            ))

        # Stage 2: matching.
        dns_baseline.main(argparse.Namespace(
            query_coarse_features=str(
                tmp_path / "idx" / "queries_cg_student_sn.npz"
            ),
            ref_coarse_features=str(tmp_path / "idx" / "refs_cg_student_sn.npz"),
            query_fine_features=str(
                tmp_path / "idx" / "queries_fg_att_student.npz"
            ),
            ref_fine_features=str(tmp_path / "idx" / "refs_fg_att_student.npz"),
            fg_type="att", output_path=str(tmp_path / "out"),
            ground_truth=None, overwrite=False,
        ))
        assert (tmp_path / "out" / "candidates.csv").exists()
        assert (tmp_path / "out" / "matches.csv").exists()


class TestDnSShardedRefTables:
    """shard_ref_table for DnS: both resident reference tables (coarse
    and fine) row-shard over the corpus mesh. The chamfer is nonlinear
    in the gathered rows, so the ROWS psum_scatter to their pair tile
    (each row owned by exactly one shard → exact) before the fused
    chamfer runs per tile — results must equal the unsharded localizer
    through the add/remove lifecycle."""

    @staticmethod
    def _key(m):
        return (
            m.query_id, m.ref_id, m.query_start, m.query_end,
            m.ref_start, m.ref_end, m.score,
        )

    def _case(self, rng, n_refs=6):
        def unit_regions(n):
            x = rng.normal(size=(n, NUM_REGIONS, 16)).astype(np.float32)
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        def coarse_from(f):
            p = f.mean(axis=1)
            return p / np.linalg.norm(p, axis=-1, keepdims=True)

        r_fine = [unit_regions(int(rng.randint(24, 40)))
                  for _ in range(n_refs)]
        q_fine = [unit_regions(30) for _ in range(3)]
        q_fine[0][8:20] = r_fine[1][5:17]
        q_fine[2][0:10] = r_fine[4][12:22]
        refs_fine = {
            f"R{i:06d}": vf(f"R{i:06d}", f.reshape(f.shape[0], -1))
            for i, f in enumerate(r_fine)
        }
        queries_fine = {
            f"Q{i:06d}": vf(f"Q{i:06d}", f.reshape(f.shape[0], -1))
            for i, f in enumerate(q_fine)
        }
        refs_coarse = [
            vf(f"R{i:06d}", coarse_from(f)) for i, f in enumerate(r_fine)
        ]
        queries_coarse = [
            vf(f"Q{i:06d}", coarse_from(f)) for i, f in enumerate(q_fine)
        ]
        cands = [
            CandidatePair(q.video_id, r.video_id, 1.0)
            for q in queries_coarse
            for r in refs_coarse
        ]
        return (queries_fine, refs_fine, queries_coarse, refs_coarse,
                cands, unit_regions, coarse_from)

    def _build(self, qf, rf, qc, rc, mesh=None, shard=False):
        kw = {"mesh": mesh} if mesh is not None else {}
        if shard:
            kw["shard_ref_table"] = True
        return DnSLocalization(
            qf, rf, qc, rc, model_type="TN", tn_max_step=5,
            min_length=4, similarity_bias=0.5, **kw,
        )

    def test_sharded_tables_match_unsharded(self):
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        rng = np.random.RandomState(29)
        qf, rf, qc, rc, cands, _, _ = self._case(rng)
        mesh = corpus_mesh(8)
        sharded = self._build(qf, rf, qc, rc, mesh=mesh, shard=True)
        plain = self._build(qf, rf, qc, rc)
        got = sharded.localize_all(cands)
        expect = plain.localize_all(cands)
        assert len(expect) >= 2
        assert sorted(map(self._key, got)) == sorted(
            map(self._key, expect)
        )
        # Both resident ref tables really are distributed.
        for tab in (sharded._r_table, sharded._fine_r_tab):
            assert len(tab.sharding.device_set) == 8
            assert not tab.sharding.is_fully_replicated
        assert sharded._fine_r_rows is not None

    def test_sharded_lifecycle_matches_fresh(self):
        from vsc2022_tpu.parallel.mesh import corpus_mesh

        rng = np.random.RandomState(31)
        (qf, rf, qc, rc, cands,
         unit_regions, coarse_from) = self._case(rng)
        mesh = corpus_mesh(8)

        new_fine = unit_regions(27)
        # Plant a copy from query 1 so the ADDED ref localizes.
        new_fine[3:14] = np.asarray(
            qf["Q000001"].feature
        ).reshape(30, NUM_REGIONS, -1)[10:21]
        add_rf = {"R000099": vf("R000099",
                                new_fine.reshape(27, -1))}
        add_rc = [vf("R000099", coarse_from(new_fine))]
        drop = ["R000000", "R000003"]

        mutated = self._build(qf, rf, qc, rc, mesh=mesh, shard=True)
        mutated.localize_all(cands[:2])  # stage tables
        mutated.add_refs(add_rc, refs_fine=add_rf)
        mutated.remove_refs(drop)
        final_pairs = [
            c for c in cands if c.ref_id not in drop
        ] + [CandidatePair(q.video_id, "R000099", 1.0) for q in qc]
        got = mutated.localize_all(final_pairs)

        surv_rc = [v for v in rc if v.video_id not in drop] + add_rc
        surv_rf = {
            k: v for k, v in rf.items() if k not in drop
        }
        surv_rf.update(add_rf)
        fresh = self._build(qf, surv_rf, qc, surv_rc)
        expect = fresh.localize_all(final_pairs)
        assert any(m.ref_id == "R000099" for m in expect)
        assert sorted(map(self._key, got)) == sorted(
            map(self._key, expect)
        )
