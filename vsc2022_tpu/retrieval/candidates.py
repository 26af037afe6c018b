"""Candidate generation: frame search → per-pair score aggregation.

(reference: vsc/candidates.py)
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List

import numpy as np

from vsc2022_tpu.metrics import CandidatePair
from vsc2022_tpu.retrieval.index import VideoIndex
from vsc2022_tpu.types import PairMatches, VideoFeature


class ScoreAggregation(ABC):
    @abstractmethod
    def aggregate(self, match: PairMatches) -> float:
        ...

    def score(self, match: PairMatches) -> CandidatePair:
        return CandidatePair(
            query_id=match.query_id, ref_id=match.ref_id, score=self.aggregate(match)
        )


class MaxScoreAggregation(ScoreAggregation):
    """Video-pair score = max frame-match score
    (reference: vsc/candidates.py:24-26)."""

    def aggregate(self, match: PairMatches) -> float:
        return np.max([m.score for m in match.matches])


class CandidateGeneration:
    def __init__(
        self,
        references: List[VideoFeature],
        aggregation: ScoreAggregation,
        mesh=None,
    ):
        self.aggregation = aggregation
        dim = references[0].dimensions()
        self.index = VideoIndex(dim, mesh=mesh)
        self.index.add(references)

    def query(self, queries: List[VideoFeature], global_k: int) -> List[CandidatePair]:
        matches = self.index.search(queries, global_k=global_k)
        candidates = [self.aggregation.score(match) for match in matches]
        candidates.sort(key=lambda c: c.score, reverse=True)
        return candidates
