"""CSLS-style score normalization, computed on device.

Semantics (reference: vsc/baseline/score_normalization.py:31-105):

  bias(query) = −β · sim(query, nearest neighbor in noise corpus)

encoded as an extra descriptor dimension — queries get their bias
appended, references get a constant 1 appended — so that plain inner
product realizes the normalized similarity:

  [q  bias(q)] · [r  1] = sim(q, r) + bias(q)

The k=1 noise-NN search is a fused row-max over the noise corpus on the
TPU (one matmul + max-reduce streaming pass) rather than a FAISS index
build. Guards, the min-variance dimension drop (``replace_dim``) and
optional L2 normalization follow the reference exactly.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, List, Tuple

import numpy as np

from vsc2022_tpu.ops.similarity import SimilaritySearcher
from vsc2022_tpu.types import VideoFeature

logger = logging.getLogger(__name__)


def transform_features(
    features: List[VideoFeature], transform: Callable[[np.ndarray], np.ndarray]
) -> List[VideoFeature]:
    return [
        dataclasses.replace(feature, feature=transform(feature.feature))
        for feature in features
    ]


def l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization (sklearn ``normalize`` equivalent;
    zero rows are left unchanged, matching sklearn)."""
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms = np.where(norms == 0, 1.0, norms)
    return x / norms


def score_normalize(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    score_norm_refs: List[VideoFeature],
    l2_normalize: bool = True,
    replace_dim: bool = True,
    beta: float = 1.0,
) -> Tuple[List[VideoFeature], List[VideoFeature]]:
    overlap = {f.video_id for f in refs} & {f.video_id for f in score_norm_refs}
    if overlap:
        raise Exception(
            f"Noise corpus shares {len(overlap)} video(s) with the eval "
            "refs; VSC rules require score normalization against an "
            "independent dataset."
        )
    if score_norm_refs is not None and replace_dim:
        # Make space for the additional score-normalization dimension by
        # dropping the minimum-variance dimension of the noise corpus
        # (reference: vsc/baseline/score_normalization.py:68-79).
        sn_features = np.concatenate([ref.feature for ref in score_norm_refs], axis=0)
        low_var_dim = int(sn_features.var(axis=0).argmin())
        logger.info(f"Dropping min-variance dimension {low_var_dim}")
        queries, refs, score_norm_refs = [
            transform_features(x, lambda f: np.delete(f, low_var_dim, axis=1))
            for x in [queries, refs, score_norm_refs]
        ]
    if l2_normalize:
        logger.info("L2-normalizing descriptor rows")
        queries, refs, score_norm_refs = [
            transform_features(x, l2_normalize_rows)
            for x in [queries, refs, score_norm_refs]
        ]

    logger.info(f"Score-normalizing with beta={beta}")
    noise_corpus = np.concatenate([ref.feature for ref in score_norm_refs], axis=0)
    searcher = SimilaritySearcher(noise_corpus.astype(np.float32))

    # One fused pass over ALL query frames: nearest-noise similarity
    # (the reference loops a FAISS search per video;
    # vsc/baseline/score_normalization.py:93-99 — batching avoids
    # per-video dispatch/transfer latency).
    all_query_frames = np.concatenate(
        [q.feature for q in queries], axis=0
    ).astype(np.float32)
    all_similarity = searcher.row_nn(all_query_frames)

    adapted_queries = []
    offset = 0
    for query in queries:
        n = len(query)
        similarity = all_similarity[offset : offset + n]
        offset += n
        norm_term = (-beta * similarity)[:, None].astype(query.feature.dtype)
        feature = np.concatenate([query.feature, norm_term], axis=1)
        adapted_queries.append(dataclasses.replace(query, feature=feature))

    adapted_refs = []
    for ref in refs:
        ones = np.ones_like(ref.feature[:, :1])
        feature = np.concatenate([ref.feature, ones], axis=1)
        adapted_refs.append(dataclasses.replace(ref, feature=feature))
    return adapted_queries, adapted_refs
