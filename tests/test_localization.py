"""TN localization tests: planted-copy recovery (modeled on reference
tests/test_localization.py) plus direct DP-kernel checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from vsc2022_tpu.localization import TNLocalizationMaxSim
from vsc2022_tpu.metrics import CandidatePair
from vsc2022_tpu.ops.tn_align import TNParams, tn_align
from vsc2022_tpu.types import VideoFeature

D = 64


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_feature(i, feature, timestamps=None):
    if timestamps is None:
        timestamps = np.arange(feature.shape[0]) * 1.0
    return VideoFeature(video_id=i, feature=feature, timestamps=timestamps)


def make_planted_case(rng):
    a = l2n(rng.normal(size=(45, D))).astype(np.float32)
    b = l2n(rng.normal(size=(30, D))).astype(np.float32)
    c = l2n(rng.normal(size=(60, D))).astype(np.float32)
    a[20:30, :] = c[30:40, :]
    queries = [make_feature(1, a)]
    refs = [make_feature(2, b), make_feature(3, c)]
    return queries, refs


class TestTNAlignKernel:
    def run_align(self, sim, params=TNParams()):
        sim = jnp.asarray(sim[None], dtype=jnp.float32)
        q_len = jnp.asarray([sim.shape[1]], dtype=jnp.int32)
        r_len = jnp.asarray([sim.shape[2]], dtype=jnp.int32)
        boxes, valid, scores = tn_align(sim, q_len, r_len, params)
        return np.asarray(boxes[0]), np.asarray(valid[0]), np.asarray(scores[0])

    def test_single_diagonal(self):
        sim = np.zeros((32, 40), dtype=np.float32)
        for t in range(10):
            sim[5 + t, 12 + t] = 0.9
        boxes, valid, scores = self.run_align(sim)
        assert valid[0]
        np.testing.assert_array_equal(boxes[0], [5, 12, 14, 21])
        assert scores[0] == pytest.approx(0.9)
        assert not valid[1:].any()

    def test_min_length_filter(self):
        sim = np.zeros((32, 40), dtype=np.float32)
        for t in range(3):  # below min_length=4
            sim[5 + t, 12 + t] = 0.9
        _, valid, _ = self.run_align(sim)
        assert not valid.any()

    def test_gap_within_max_step(self):
        # Path with gaps of 3 frames still forms one segment (max_step=5).
        sim = np.zeros((64, 64), dtype=np.float32)
        for t in range(0, 24, 3):
            sim[10 + t, 20 + t] = 0.8
        boxes, valid, _ = self.run_align(sim)
        assert valid[0]
        np.testing.assert_array_equal(boxes[0], [10, 20, 31, 41])

    def test_gap_beyond_max_step_splits(self):
        # A 10-frame hole (> max_step) must split into two segments.
        sim = np.zeros((64, 64), dtype=np.float32)
        for t in range(6):
            sim[t, t] = 0.8
        for t in range(20, 26):
            sim[t, t] = 0.8
        boxes, valid, _ = self.run_align(sim)
        assert valid[0] and valid[1]
        got = sorted(boxes[p].tolist() for p in range(2))
        assert got == [[0, 0, 5, 5], [20, 20, 25, 25]]

    def test_two_separate_paths(self):
        sim = np.zeros((64, 64), dtype=np.float32)
        for t in range(8):
            sim[5 + t, 40 + t] = 0.9  # path 1
            sim[40 + t, 5 + t] = 0.7  # path 2 (reversed corner)
        boxes, valid, scores = self.run_align(sim)
        assert valid[0] and valid[1]
        assert not valid[2:].any()
        got = sorted(boxes[p].tolist() for p in range(2))
        assert got == [[5, 40, 12, 47], [40, 5, 47, 12]]

    def test_below_min_sim_ignored(self):
        sim = np.full((32, 32), 0.1, dtype=np.float32)  # below min_sim=0.2
        for t in range(10):
            sim[t, t] = 0.15
        _, valid, _ = self.run_align(sim)
        assert not valid.any()

    def test_padding_is_inert(self):
        # Identical content in a larger padded buffer must give same boxes.
        sim = np.zeros((32, 40), dtype=np.float32)
        for t in range(10):
            sim[5 + t, 12 + t] = 0.9
        big = np.full((64, 96), 5.0, dtype=np.float32)  # junk in padding
        big[:32, :40] = sim
        sims = jnp.asarray(big[None])
        boxes, valid, _ = tn_align(
            sims, jnp.asarray([32], jnp.int32), jnp.asarray([40], jnp.int32)
        )
        assert np.asarray(valid)[0, 0]
        np.testing.assert_array_equal(np.asarray(boxes)[0, 0], [5, 12, 14, 21])


class TestTNLocalization:
    def test_localize_planted_copy(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        localization = TNLocalizationMaxSim(queries, refs, "TN")
        # No matches for the unrelated pair:
        matches = localization.localize(CandidatePair(1, 2, 1.0))
        assert len(matches) == 0
        # The planted pair localizes to the copied region:
        matches = localization.localize(CandidatePair(1, 3, 2.0))
        assert len(matches) >= 1
        m = matches[0]
        assert m.query_id == 1 and m.ref_id == 3
        # Box should cover the planted region (query 20-29 ↔ ref 30-39).
        assert m.query_start <= 21 and m.query_end >= 28
        assert m.ref_start <= 31 and m.ref_end >= 38
        assert m.score == pytest.approx(1.0, abs=0.05)

    def test_localize_all_batches(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        localization = TNLocalizationMaxSim(queries, refs, "TN")
        matches = localization.localize_all(
            [CandidatePair(1, 2, 1.0), CandidatePair(1, 3, 2.0)]
        )
        assert len(matches) >= 1
        for match in matches:
            assert match.query_id == 1
            assert match.ref_id == 3

    def test_reference_signature_accepted(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        # The reference construction signature must work as-is
        # (reference: vsc/baseline/sscd_baseline.py:118-126).
        loc = TNLocalizationMaxSim(
            queries,
            refs,
            model_type="TN",
            tn_max_step=5,
            min_length=4,
            concurrency=16,
            similarity_bias=0.5,
        )
        matches = loc.localize_all([CandidatePair(1, 3, 2.0)])
        assert len(matches) >= 1
        # MaxSim score is bias-corrected.
        assert matches[0].score == pytest.approx(1.0, abs=0.05)

    def test_unsupported_model_type(self):
        rng = np.random.RandomState(5)
        queries, refs = make_planted_case(rng)
        with pytest.raises(ValueError):
            TNLocalizationMaxSim(queries, refs, "DTW")
