"""Score-normalization tests: bias encoding, dim replacement, rule check."""

import numpy as np
import pytest

from vsc2022_tpu.retrieval.score_norm import (
    l2_normalize_rows,
    score_normalize,
    transform_features,
)
from vsc2022_tpu.types import VideoFeature


def vf(video_id, feature):
    return VideoFeature(
        video_id=video_id,
        timestamps=np.arange(feature.shape[0], dtype=np.float64),
        feature=np.asarray(feature, dtype=np.float32),
    )


def make_data(rng, d=16):
    queries = [vf(f"Q{i:06d}", rng.randn(6, d)) for i in range(3)]
    refs = [vf(f"R{i:06d}", rng.randn(8, d)) for i in range(4)]
    noise = [vf(f"R{i:06d}", rng.randn(10, d)) for i in range(100, 105)]
    return queries, refs, noise


class TestScoreNormalize:
    def test_bias_encoding(self):
        rng = np.random.RandomState(0)
        queries, refs, noise = make_data(rng)
        beta = 1.2
        sn_q, sn_r = score_normalize(
            queries, refs, noise, beta=beta, replace_dim=False
        )
        # Dimensions grow by exactly one.
        assert sn_q[0].dimensions() == queries[0].dimensions() + 1
        assert sn_r[0].dimensions() == refs[0].dimensions() + 1
        # Ref extra dim is constant 1.
        for r in sn_r:
            np.testing.assert_array_equal(r.feature[:, -1], 1.0)
        # Query extra dim is −β·(max similarity to the L2-normalized noise set).
        noise_n = np.concatenate(
            [l2_normalize_rows(n.feature) for n in noise], axis=0
        )
        for q_orig, q_sn in zip(queries, sn_q):
            qn = l2_normalize_rows(q_orig.feature)
            expect = -beta * (qn @ noise_n.T).max(axis=1)
            np.testing.assert_allclose(
                q_sn.feature[:, -1], expect, rtol=1e-5, atol=1e-5
            )
            # Leading dims are the normalized original.
            np.testing.assert_allclose(q_sn.feature[:, :-1], qn, rtol=1e-6)
        # Inner product realizes sim + bias.
        sim_sn = sn_q[0].feature @ sn_r[0].feature.T
        qn = l2_normalize_rows(queries[0].feature)
        rn = l2_normalize_rows(refs[0].feature)
        expect = qn @ rn.T + sn_q[0].feature[:, -1][:, None]
        np.testing.assert_allclose(sim_sn, expect, rtol=1e-5, atol=1e-5)

    def test_replace_dim_keeps_budget(self):
        rng = np.random.RandomState(1)
        queries, refs, noise = make_data(rng)
        # Kill variance in one noise dimension so it's the one dropped.
        for n in noise:
            n.feature[:, 7] = 0.5
        sn_q, sn_r = score_normalize(queries, refs, noise, replace_dim=True)
        # Dim budget preserved: one dim dropped, one added.
        assert sn_q[0].dimensions() == queries[0].dimensions()
        assert sn_r[0].dimensions() == refs[0].dimensions()

    def test_eval_set_overlap_rejected(self):
        rng = np.random.RandomState(2)
        queries, refs, _ = make_data(rng)
        with pytest.raises(Exception, match="independent dataset"):
            score_normalize(queries, refs, refs)

    def test_transform_features_preserves_metadata(self):
        rng = np.random.RandomState(3)
        queries, _, _ = make_data(rng)
        doubled = transform_features(queries, lambda f: f * 2)
        for a, b in zip(queries, doubled):
            assert a.video_id == b.video_id
            np.testing.assert_array_equal(a.timestamps, b.timestamps)
            np.testing.assert_allclose(b.feature, a.feature * 2)
