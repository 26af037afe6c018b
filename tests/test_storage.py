"""NPZ storage tests: the on-disk archive layout is frozen contract
(reference: vsc/storage.py — video_ids / features / timestamps arrays,
contiguous rows per video)."""

import io
import tempfile

import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc2022_tpu.metrics import Dataset
from vsc2022_tpu.storage import convert_to_dict, load_features, store_features
from vsc2022_tpu.types import VideoFeature

DIM = 32


def synth_video(video_id, n_frames, fps=1.0, intervals=False):
    rng = np.random.RandomState(abs(hash((video_id, n_frames))) % (2**31))
    ts = np.arange(n_frames) / fps
    if intervals:
        ts = np.stack([ts, ts + fps], axis=1)
    return VideoFeature(
        video_id=video_id, timestamps=ts, feature=rng.randn(n_frames, DIM)
    )


def roundtrip(videos, dataset=None):
    with tempfile.NamedTemporaryFile() as f:
        store_features(f, videos, dataset)
        f.flush()
        return load_features(f.name)


@pytest.mark.parametrize("intervals", [False, True], ids=["points", "spans"])
def test_roundtrip_preserves_everything(intervals):
    # Unsorted ids + fractional fps on purpose: order and values must
    # survive exactly, and int ids get the dataset prefix applied.
    videos = [
        synth_video(2, 10, intervals=intervals),
        synth_video(3, 20, fps=3.0, intervals=intervals),
        synth_video(1, 30, fps=0.5, intervals=intervals),
    ]
    loaded = roundtrip(videos, Dataset.QUERIES)

    assert [v.video_id for v in loaded] == ["Q000002", "Q000003", "Q000001"]
    for original, got in zip(videos, loaded):
        assert_allclose(got.timestamps, original.timestamps)
        assert_allclose(got.feature, original.feature)

    # Already-prefixed string ids need no Dataset on the second pass.
    again = roundtrip(loaded)
    assert [v.video_id for v in again] == [v.video_id for v in loaded]
    for a, b in zip(loaded, again):
        assert_allclose(b.timestamps, a.timestamps)
        assert_allclose(b.feature, a.feature)


def test_noncontiguous_ids_split_into_runs():
    # The format splits on contiguous runs: a video id that re-appears
    # after a different id becomes a second VideoFeature, by design.
    buf = io.BytesIO()
    np.savez(
        buf,
        video_ids=np.array(["Q000001"] * 2 + ["Q000002"] * 3 + ["Q000001"]),
        features=np.arange(6 * DIM, dtype=np.float32).reshape(6, DIM),
        timestamps=np.arange(6, dtype=np.float64),
    )
    buf.seek(0)
    loaded = load_features(buf)
    assert [(v.video_id, len(v)) for v in loaded] == [
        ("Q000001", 2),
        ("Q000002", 3),
        ("Q000001", 1),
    ]


def test_row_count_mismatch_rejected():
    buf = io.BytesIO()
    np.savez(
        buf,
        video_ids=np.full(3, "Q000001"),
        features=np.zeros((3, 4)),
        timestamps=np.zeros((2,)),
    )
    buf.seek(0)
    with pytest.raises(ValueError, match="mismatch"):
        load_features(buf)


def test_bad_timestamp_rank_rejected():
    buf = io.BytesIO()
    np.savez(
        buf,
        video_ids=np.full(3, "Q000001"),
        features=np.zeros((3, 4)),
        timestamps=np.zeros((3, 3)),  # neither [N] nor [N, 2]
    )
    buf.seek(0)
    with pytest.raises(ValueError, match="intervals"):
        load_features(buf)


def test_convert_to_dict_keys_by_id():
    videos = [synth_video("Q000005", 4), synth_video("Q000009", 6)]
    table = convert_to_dict(videos)
    assert set(table) == {"Q000005", "Q000009"}
    assert table["Q000009"] is videos[1]
