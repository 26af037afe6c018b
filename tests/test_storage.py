"""NPZ storage round-trip tests (modeled on reference tests/test_storage.py)."""

import tempfile

import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc2022_tpu.metrics import Dataset
from vsc2022_tpu.storage import load_features, store_features
from vsc2022_tpu.types import VideoFeature

DIMS = 32


def fake_vf(video_id, length, fps=1.0, intervals=False):
    rng = np.random.RandomState(abs(hash((video_id, length))) % (2**31))
    timestamps = np.arange(length) / fps
    if intervals:
        timestamps = np.stack([timestamps, timestamps + fps], axis=1)
    return VideoFeature(
        video_id=video_id,
        timestamps=timestamps,
        feature=rng.randn(length, DIMS),
    )


@pytest.mark.parametrize("intervals", [False, True])
def test_merged_storage_roundtrip(intervals):
    features = [
        fake_vf(2, 10, intervals=intervals),
        fake_vf(3, 20, fps=3.0, intervals=intervals),
        fake_vf(1, 30, fps=0.5, intervals=intervals),
    ]
    with tempfile.NamedTemporaryFile() as f:
        store_features(f, features, Dataset.QUERIES)
        f.flush()
        restored = load_features(f.name)

    assert len(features) == len(restored)
    for a, b in zip(features, restored):
        assert f"Q{a.video_id:06d}" == b.video_id
        assert_allclose(b.timestamps, a.timestamps)
        assert_allclose(b.feature, a.feature)

    # String ids round-trip without a Dataset enum.
    with tempfile.NamedTemporaryFile() as f:
        store_features(f, restored)
        f.flush()
        restored2 = load_features(f.name)
    for a, b in zip(restored, restored2):
        assert a.video_id == b.video_id
        assert_allclose(b.timestamps, a.timestamps)
        assert_allclose(b.feature, a.feature)


def test_shape_validation():
    with tempfile.NamedTemporaryFile() as f:
        np.savez(
            f,
            video_ids=np.full(3, "Q000001"),
            features=np.zeros((3, 4)),
            timestamps=np.zeros((2,)),
        )
        f.flush()
        with pytest.raises(ValueError):
            load_features(f.name)
