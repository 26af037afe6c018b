"""Retrieval: frame-level search index and candidate generation."""

from vsc2022_tpu.retrieval.candidates import (  # noqa: F401
    CandidateGeneration,
    MaxScoreAggregation,
    ScoreAggregation,
)
from vsc2022_tpu.retrieval.client import (  # noqa: F401
    InbandSearchResult,
    SearchResult,
    ServeClient,
    ServeError,
    ServeStats,
)
from vsc2022_tpu.retrieval.index import (  # noqa: F401
    ScoreNormalizedVideoIndex,
    VideoIndex,
)
