"""End-to-end matching pipeline test on synthetic planted-copy data:
search → score-norm → TN localization → metrics. The synthetic analog of
the reference's golden-number runbooks (SURVEY.md §4)."""

import os
import tempfile

import numpy as np
import pytest

from vsc2022_tpu.baseline.sscd_baseline import (
    localize_and_verify,
    match,
    search,
)
from vsc2022_tpu.metrics import (
    CandidatePair,
    Match,
    average_precision,
    match_metric,
)
from vsc2022_tpu.retrieval.score_norm import score_normalize
from vsc2022_tpu.storage import load_features, store_features
from vsc2022_tpu.types import VideoFeature


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def build_corpus(rng, d=64, n_refs=16, n_queries=6, n_noise=10):
    """Queries 0..2 copy a segment of refs 0..2; the rest are clean."""
    refs, queries, noise, gt = [], [], [], []
    for i in range(n_refs):
        n = int(rng.randint(30, 60))
        refs.append(
            VideoFeature(
                video_id=i,
                timestamps=np.arange(n, dtype=np.float64),
                feature=l2n(rng.normal(size=(n, d))).astype(np.float32),
            )
        )
    for i in range(n_queries):
        n = 40
        f = l2n(rng.normal(size=(n, d))).astype(np.float32)
        if i < 3:
            # Copy ref i frames 8:20 into query frames 15:27 with noise.
            copied = refs[i].feature[8:20] + 0.1 * rng.normal(size=(12, d)).astype(
                np.float32
            )
            f[15:27] = l2n(copied)
            gt.append(
                Match(
                    query_id=f"Q{i:06d}",
                    ref_id=f"R{i:06d}",
                    score=1.0,
                    query_start=15.0,
                    query_end=27.0,
                    ref_start=8.0,
                    ref_end=20.0,
                )
            )
        queries.append(
            VideoFeature(
                video_id=i, timestamps=np.arange(n, dtype=np.float64), feature=f
            )
        )
    for i in range(n_noise):
        n = int(rng.randint(20, 40))
        noise.append(
            VideoFeature(
                video_id=1000 + i,
                timestamps=np.arange(n, dtype=np.float64),
                feature=l2n(rng.normal(size=(n, d))).astype(np.float32),
            )
        )
    return queries, refs, noise, gt


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(11)
    queries, refs, noise, gt = build_corpus(rng)
    # Store and reload to exercise the npz path + id formatting.
    tmp = tempfile.mkdtemp()
    from vsc2022_tpu.metrics import Dataset

    store_features(os.path.join(tmp, "q.npz"), queries, Dataset.QUERIES)
    store_features(os.path.join(tmp, "r.npz"), refs, Dataset.REFS)
    store_features(os.path.join(tmp, "n.npz"), noise, Dataset.REFS)
    return (
        load_features(os.path.join(tmp, "q.npz")),
        load_features(os.path.join(tmp, "r.npz")),
        load_features(os.path.join(tmp, "n.npz")),
        gt,
        tmp,
    )


class TestEndToEnd:
    def test_raw_pipeline(self, corpus):
        queries, refs, noise, gt, tmp = corpus
        candidates = search(queries, refs)
        gt_pairs = CandidatePair.from_matches(gt)
        uap = average_precision(gt_pairs, candidates)
        assert uap.ap > 0.9  # planted pairs must rank on top

        matches = localize_and_verify(queries, refs, candidates)
        seg_ap = match_metric(gt, matches).ap
        assert seg_ap > 0.5

    def test_score_norm_pipeline(self, corpus):
        queries, refs, noise, gt, tmp = corpus
        sn_q, sn_r = score_normalize(queries, refs, noise, beta=1.2)
        candidates = search(sn_q, sn_r)
        gt_pairs = CandidatePair.from_matches(gt)
        uap = average_precision(gt_pairs, candidates)
        assert uap.ap > 0.9

        matches = localize_and_verify(
            sn_q, sn_r, candidates, score_normalization=True
        )
        seg_ap = match_metric(gt, matches).ap
        assert seg_ap > 0.5
        # MaxSim scoring: planted matches should score high (≈ biased
        # max-sim minus bias ≈ raw similarity ≈ 1 + bias terms).
        best = max(matches, key=lambda m: m.score)
        assert best.pair_id() in {g.pair_id() for g in gt}

    def test_score_norm_pipeline_int8(self, corpus):
        # The SQ8 staging tier through the real SN pipeline (noise
        # bias AND retrieval corpus int8-staged): planted copies must
        # still dominate the ranking and localize.
        queries, refs, noise, gt, tmp = corpus
        sn_q, sn_r = score_normalize(
            queries, refs, noise, beta=1.2, dtype="int8"
        )
        candidates = search(sn_q, sn_r, dtype="int8")
        gt_pairs = CandidatePair.from_matches(gt)
        uap = average_precision(gt_pairs, candidates)
        assert uap.ap > 0.9

        matches = localize_and_verify(
            sn_q, sn_r, candidates, score_normalization=True
        )
        seg_ap = match_metric(gt, matches).ap
        assert seg_ap > 0.5

    def test_match_writes_artifacts(self, corpus):
        queries, refs, noise, gt, tmp = corpus
        out = os.path.join(tmp, "out")
        candidate_file, match_file = match(queries, refs, out)
        assert os.path.exists(candidate_file)
        assert os.path.exists(match_file)
        # CSV round-trip preserves matches.
        recovered = Match.read_csv(match_file)
        assert len(recovered) > 0
