"""Metric-layer tests: bit-compatibility with the reference definitions
(modeled on reference tests/test_metrics.py; engine-free)."""

import io
import tempfile

import numpy as np
import pytest

from vsc2022_tpu.metrics import (
    CandidatePair,
    Dataset,
    Intervals,
    Match,
    average_precision,
    binary_average_precision,
    evaluate_matching_track,
    format_video_id,
    match_metric,
)


def match(
    query_start,
    query_end,
    ref_start,
    ref_end,
    score=1.0,
    query_id="Q1",
    ref_id="R2",
):
    return Match(
        query_id=query_id,
        ref_id=ref_id,
        query_start=query_start,
        query_end=query_end,
        ref_start=ref_start,
        ref_end=ref_end,
        score=score,
    )


class TestIntervals:
    def test_intersect_length(self):
        a = Intervals([(2, 5), (7, 8)])
        b = Intervals([(1, 3), (4, 7)])
        c = Intervals([(-1, 0), (3.5, 12)])
        assert a.intersect_length(b) == pytest.approx(2)
        assert a.intersect_length(c) == pytest.approx(2.5)

    def test_touching_merge(self):
        a = Intervals([(0, 1), (1, 2), (5, 6)])
        assert a.intervals == [(0, 2), (5, 6)]
        assert a.total_length() == pytest.approx(3)

    def test_add(self):
        a = Intervals([(0, 1)])
        a.add((0.5, 3))
        assert a.intervals == [(0, 3)]


class TestMatchMetric:
    def score(self, gt, predictions):
        return match_metric(gt, predictions).ap

    def test_perfect(self):
        gt = [match(4, 14, 10, 18)]
        detections = [match(4, 14, 10, 18, score=1.0)]
        assert self.score(gt, detections) == pytest.approx(1.0)

    def test_split(self):
        gt = [match(4, 14, 10, 18)]
        detections = [
            match(4, 8, 10, 14, score=1.0),
            match(8, 14, 14, 18, score=2.0),
        ]
        assert self.score(gt, detections) == pytest.approx(1.0)

    def test_imperfect_calibrated(self):
        gt = [match(4, 14, 10, 18)]
        detections = [
            match(4, 8, 10, 14, score=1.0),
            match(8, 14, 16, 18, score=2.0),
            match(0, 30, 5, 25, score=0.0),
        ]
        metric = self.score(gt, detections)
        assert 0.9 < metric < 1.0

    def test_imperfect_poorly_calibrated(self):
        gt = [match(4, 14, 10, 18)]
        detections = [
            match(4, 8, 10, 14, score=1.0),
            match(8, 14, 16, 18, score=2.0),
            match(0, 30, 5, 25, score=3.0),
        ]
        assert self.score(gt, detections) < 0.5

    def test_vcsl_fig4f(self):
        # No GT/pred overlap → metric must be 0 (overlap-gated GT fix).
        gt = [match(4, 14, 10, 18), match(20, 28, 21, 29)]
        detections = [
            match(4, 14, 21, 29, score=1.0),
            match(20, 28, 10, 18, score=1.0),
        ]
        assert self.score(gt, detections) == pytest.approx(0.0)

    def test_multiple_pairs(self):
        gt = [match(4, 14, 10, 18, query_id="Q1", ref_id="R2")]
        detections = [
            match(4, 14, 10, 18, score=3.0, query_id="Q2", ref_id="R2"),
            match(4, 14, 10, 18, score=2.0, query_id="Q1", ref_id="R1"),
            match(4, 14, 10, 18, score=1.0, query_id="Q1", ref_id="R2"),
        ]
        assert self.score(gt, detections) == pytest.approx(1 / 3.0)

    def test_robustness_to_order(self):
        gt = [match(4, 14, 10, 18, query_id="Q1", ref_id="R2")]
        detections = [
            match(4, 10, 10, 14, score=3.0, query_id="Q1", ref_id="R2"),
            match(4, 10, 10, 14, score=3.0, query_id="Q2", ref_id="R1"),
            match(4, 14, 10, 18, score=2.0, query_id="Q1", ref_id="R1"),
            match(4, 14, 10, 18, score=1.0, query_id="Q2", ref_id="R2"),
            match(4, 14, 10, 18, score=1.0, query_id="Q2", ref_id="R1"),
            match(10, 14, 14, 18, score=1.0, query_id="Q1", ref_id="R2"),
        ]
        rng = np.random.RandomState(0)
        metrics = []
        for _ in range(10):
            rng.shuffle(detections)
            metrics.append(self.score(gt, detections))
        assert len(set(metrics)) == 1


class TestEvaluateMatchingTrack:
    def run_csv_test(self, gt, detections) -> float:
        with tempfile.NamedTemporaryFile() as gt_file:
            with tempfile.NamedTemporaryFile() as det_file:
                Match.write_csv(gt, gt_file.name)
                Match.write_csv(detections, det_file.name)
                return evaluate_matching_track(
                    gt_file.name, det_file.name
                ).segment_ap.ap

    def test_multiple_pairs(self):
        gt = [match(4, 14, 10, 18, query_id=1, ref_id=2)]
        detections = [
            match(4, 14, 10, 18, score=3.0, query_id=2, ref_id=2),
            match(4, 14, 10, 18, score=2.0, query_id=1, ref_id=1),
            match(4, 14, 10, 18, score=1.0, query_id=1, ref_id=2),
        ]
        assert self.run_csv_test(gt, detections) == pytest.approx(1 / 3.0)

    def test_inline_csv_column_order_and_int_ids(self):
        gt_str = (
            "query_start,query_end,ref_start,ref_end,query_id,ref_id\n"
            "4,14,10,18,Q000001,R000002\n"
        )
        predictions_str = (
            "query_id,ref_id,query_start,query_end,ref_start,ref_end,score\n"
            "2,2,4,14,10,18,3.0\n"
            "1,1,4,14,10,18,2.0\n"
            "1,2,4,14,10,18,1.0\n"
        )
        with tempfile.NamedTemporaryFile("wt") as gt_file:
            with tempfile.NamedTemporaryFile("wt") as det_file:
                gt_file.write(gt_str)
                gt_file.flush()
                det_file.write(predictions_str)
                det_file.flush()
                metrics = evaluate_matching_track(gt_file.name, det_file.name)
        assert metrics.segment_ap.ap == pytest.approx(1 / 3.0)


def make_candidate(query_id, ref_id, score):
    return CandidatePair(
        format_video_id(query_id, Dataset.QUERIES),
        format_video_id(ref_id, Dataset.REFS),
        score,
    )


class TestDescriptorTrack:
    def ap(self, gt, predictions):
        metrics = average_precision(gt, predictions)
        assert metrics.ap == pytest.approx(metrics.simple_ap)
        return metrics.ap

    def test_uap(self):
        C = make_candidate
        gt = [C(1, 10, 1.0), C(2, 11, 1.0)]
        assert self.ap(gt, [C(1, 10, 8.0), C(2, 11, 4.0), C(99, 99, 2.0)]) == 1.0
        assert self.ap(
            gt, [C(1, 10, 8.0), C(2, 11, 4.0), C(99, 99, 5.0)]
        ) == pytest.approx(np.mean([1, 2 / 3]))
        assert self.ap(
            gt, [C(1, 10, 3.0), C(2, 10, 2.0), C(99, 99, 1.0)]
        ) == pytest.approx(np.mean([1, 0]))
        assert self.ap(
            gt, [C(1, 10, 2.0), C(2, 10, 3.0), C(99, 99, 1.0)]
        ) == pytest.approx(np.mean([1 / 2, 0]))

    def test_duplicate_detection(self):
        C = make_candidate
        gt = [C(1, 10, 1.0)]
        with pytest.raises(AssertionError):
            average_precision(gt, [C(1, 10, 1.0), C(1, 10, 2.0)])

    def test_candidate_csv_roundtrip(self):
        C = make_candidate
        candidates = [C(1, 10, 1.0), C(2, 11, 2.0)]
        with io.StringIO() as buf:
            CandidatePair.write_csv(candidates, buf)
            buf.seek(0)
            recovered = CandidatePair.read_csv(buf)
        assert candidates == recovered


class TestBinaryAveragePrecision:
    """Our AP core must be numerically identical to sklearn's
    (the reference delegates to sklearn; vsc/metrics.py:478)."""

    def test_matches_sklearn(self):
        from sklearn.metrics import average_precision_score

        rng = np.random.RandomState(7)
        for trial in range(30):
            n = rng.randint(2, 200)
            y_true = rng.rand(n) < 0.3
            if not y_true.any():
                y_true[0] = True
            # Mix continuous scores and heavy ties.
            if trial % 2:
                y_score = rng.randint(0, 5, size=n).astype(float)
            else:
                y_score = rng.randn(n)
            ours = binary_average_precision(y_true, y_score)
            theirs = average_precision_score(y_true, y_score)
            assert ours == pytest.approx(theirs, abs=1e-12)


class TestMatchSerialization:
    def test_roundtrip(self):
        matches = [
            match(4, 8, 10, 14, score=1.0, query_id="Q123456", ref_id="R000100"),
            match(8, 14, 14, 18, score=2.0, query_id="Q000011", ref_id="R000101"),
        ]
        with io.StringIO() as buf:
            Match.write_csv(matches, buf)
            buf.seek(0)
            recovered = Match.read_csv(buf)
        assert matches == recovered
