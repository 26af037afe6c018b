"""NPZ feature storage — the frozen external contract.

Format (reference: vsc/storage.py:13-25): arrays ``video_ids`` (one
string per frame), ``features`` [ΣN, D], ``timestamps`` [ΣN] or [ΣN, 2].
A video's rows must be contiguous; ``load_features`` splits on
contiguous same-id ranges (reference: vsc/storage.py:28-68).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from vsc2022_tpu.metrics import Dataset, format_video_id
from vsc2022_tpu.types import VideoFeature


def store_features(
    f, features: List[VideoFeature], dataset: Optional[Dataset] = None
) -> None:
    video_ids = []
    feats = []
    timestamps = []
    for feature in features:
        video_id = format_video_id(feature.video_id, dataset)
        video_ids.append(np.full(len(feature), video_id))
        feats.append(feature.feature)
        timestamps.append(feature.timestamps)
    np.savez(
        f,
        video_ids=np.concatenate(video_ids),
        features=np.concatenate(feats),
        timestamps=np.concatenate(timestamps),
    )


def same_value_ranges(values) -> Iterator[Tuple[str, int, int]]:
    """Yield (value, start, end) for contiguous runs of equal values.

    Vectorized run-length detection (the reference walks element by
    element in Python; vsc/storage.py:28-39 — noticeable on
    million-frame corpora)."""
    arr = np.asarray(values)
    if arr.shape[0] == 0:
        return
    boundaries = np.flatnonzero(arr[1:] != arr[:-1]) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [arr.shape[0]]])
    for start, end in zip(starts.tolist(), ends.tolist()):
        yield arr[start], start, end


def load_features(f, dataset: Optional[Dataset] = None) -> List[VideoFeature]:
    data = np.load(f, allow_pickle=False)
    video_ids = data["video_ids"]
    feats = data["features"]
    timestamps = data["timestamps"]

    if timestamps.shape[0] != feats.shape[0]:
        raise ValueError(
            f"Expected the same number of timestamps as features: got "
            f"{timestamps.shape[0]} timestamps for {feats.shape[0]} features"
        )
    if not (timestamps.ndim == 1 or timestamps.shape[1:] == (2,)):
        raise ValueError(f"Unexpected timestamp shape. Got {timestamps.shape}")

    results = []
    for video_id, start, end in same_value_ranges(video_ids):
        results.append(
            VideoFeature(
                video_id=format_video_id(video_id, dataset),
                timestamps=timestamps[start:end],
                feature=feats[start:end, :],
            )
        )
    return results


def convert_to_dict(features: List[VideoFeature]) -> Dict[str, VideoFeature]:
    return {m.video_id: m for m in features}
