"""Core host-side data model.

TPU-native rebuild of the reference data model (reference:
vsc/index.py:18-71). These objects live on the host and hold numpy
arrays; device code receives flat, padded arrays derived from them.

Design notes (vs the reference):
  * The reference couples its data model to the FAISS index module; here
    the data model is standalone so device code (ops/, retrieval/)
    depends only on arrays, never on index state.
  * ``VideoFeature`` keeps numpy (not jax) arrays: descriptors are
    staged to device in large flat batches by the retrieval layer, which
    is where sharding/padding decisions belong.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, NamedTuple, Tuple

import numpy as np


@dataclasses.dataclass
class VideoMetadata:
    """Identity and frame timing for one video.

    ``timestamps`` is either shape [N] (point timestamps) or [N, 2]
    (start/end intervals per frame), matching the reference semantics
    (reference: vsc/index.py:19-30).
    """

    video_id: str
    timestamps: np.ndarray

    def __len__(self) -> int:
        return self.timestamps.shape[0]

    def get_timestamps(self, idx: int) -> Tuple[float, float]:
        t = self.timestamps[idx]
        if self.timestamps.ndim == 1:
            return (t, t)
        return (t[0], t[1])


@dataclasses.dataclass
class VideoFeature(VideoMetadata):
    """Per-frame descriptors [N, D] plus timing metadata.

    (reference: vsc/index.py:33-46)
    """

    feature: np.ndarray

    def __post_init__(self):
        assert self.feature.shape[0] == len(
            self.timestamps
        ), "Mismatched timestamps / feature size"

    def metadata(self) -> VideoMetadata:
        return VideoMetadata(video_id=self.video_id, timestamps=self.timestamps)

    def dimensions(self) -> int:
        return self.feature.shape[1]


class PairMatch(NamedTuple):
    """One frame-level correspondence between a query and a ref video.

    (reference: vsc/index.py:49-52)
    """

    query_timestamps: Tuple[float, float]
    ref_timestamps: Tuple[float, float]
    score: float


@dataclasses.dataclass
class PairMatches:
    """All frame matches for one (query video, ref video) pair.

    (reference: vsc/index.py:55-71)
    """

    query_id: str
    ref_id: str
    matches: List[PairMatch]

    def records(self) -> Iterator[dict]:
        for m in self.matches:
            yield {
                "query_id": self.query_id,
                "ref_id": self.ref_id,
                "query_start": m.query_timestamps[0],
                "query_end": m.query_timestamps[1],
                "ref_start": m.ref_timestamps[0],
                "ref_end": m.ref_timestamps[1],
                "score": m.score,
            }
