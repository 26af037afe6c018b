"""Metric-layer tests.

The numeric cases are the spec: golden AP values, the VCSL figure-4f
counterexample, tie/order invariance and CSV round-trips must match the
reference definitions bit-for-bit (reference: vsc/metrics.py and its
tests). Scaffolding here is pytest-native and parametrized.
"""

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

Q1R2 = ("Q1", "R2")


def seg(box, s=1.0, pair=Q1R2):
    """Segment match from a (q_start, q_end, r_start, r_end) box."""
    qs, qe, rs, re = box
    return Match(
        query_id=pair[0],
        ref_id=pair[1],
        score=s,
        query_start=qs,
        query_end=qe,
        ref_start=rs,
        ref_end=re,
    )


def segment_ap(gt, preds) -> float:
    return match_metric(gt, preds).ap


class TestIntervals:
    def test_intersect_length(self):
        a = Intervals([(2, 5), (7, 8)])
        assert a.intersect_length(Intervals([(1, 3), (4, 7)])) == pytest.approx(2)
        assert a.intersect_length(
            Intervals([(-1, 0), (3.5, 12)])
        ) == pytest.approx(2.5)

    def test_touching_intervals_coalesce(self):
        merged = Intervals([(0, 1), (1, 2), (5, 6)])
        assert merged.intervals == [(0, 2), (5, 6)]
        assert merged.total_length() == pytest.approx(3)

    def test_add_extends_in_place(self):
        ivs = Intervals([(0, 1)])
        ivs.add((0.5, 3))
        assert ivs.intervals == [(0, 3)]


class TestSegmentAP:
    def test_exact_hit_scores_one(self):
        truth = [seg((4, 14, 10, 18))]
        assert segment_ap(truth, [seg((4, 14, 10, 18))]) == pytest.approx(1.0)

    def test_two_piece_cover_still_one(self):
        # The GT segment found as two disjoint predictions is a full hit.
        truth = [seg((4, 14, 10, 18))]
        preds = [seg((4, 8, 10, 14), s=1.0), seg((8, 14, 14, 18), s=2.0)]
        assert segment_ap(truth, preds) == pytest.approx(1.0)

    @pytest.mark.parametrize(
        "sloppy_score,lo,hi",
        [
            # Imprecise box ranked last → near-perfect metric.
            (0.0, 0.9, 1.0),
            # Same boxes, imprecise one ranked first → heavy penalty.
            (3.0, 0.0, 0.5),
        ],
    )
    def test_calibration_sensitivity(self, sloppy_score, lo, hi):
        truth = [seg((4, 14, 10, 18))]
        preds = [
            seg((4, 8, 10, 14), s=1.0),
            seg((8, 14, 16, 18), s=2.0),
            seg((0, 30, 5, 25), s=sloppy_score),
        ]
        value = segment_ap(truth, preds)
        assert lo < value < hi

    def test_vcsl_fig4f_counterexample(self):
        # Two GT boxes and two predictions whose per-axis projections
        # line up but which never overlap as 2-D boxes. Without the
        # overlap gate the metric would read 1.0; the corrected
        # definition reads 0.
        truth = [seg((4, 14, 10, 18)), seg((20, 28, 21, 29))]
        preds = [seg((4, 14, 21, 29)), seg((20, 28, 10, 18))]
        assert segment_ap(truth, preds) == pytest.approx(0.0)

    def test_one_hit_in_three_pairs(self):
        truth = [seg((4, 14, 10, 18), pair=Q1R2)]
        preds = [
            seg((4, 14, 10, 18), s=3.0, pair=("Q2", "R2")),
            seg((4, 14, 10, 18), s=2.0, pair=("Q1", "R1")),
            seg((4, 14, 10, 18), s=1.0, pair=Q1R2),
        ]
        assert segment_ap(truth, preds) == pytest.approx(1 / 3.0)

    def test_input_order_invariance(self):
        truth = [seg((4, 14, 10, 18), pair=Q1R2)]
        preds = [
            seg((4, 10, 10, 14), s=3.0, pair=Q1R2),
            seg((4, 10, 10, 14), s=3.0, pair=("Q2", "R1")),
            seg((4, 14, 10, 18), s=2.0, pair=("Q1", "R1")),
            seg((4, 14, 10, 18), s=1.0, pair=("Q2", "R2")),
            seg((4, 14, 10, 18), s=1.0, pair=("Q2", "R1")),
            seg((10, 14, 14, 18), s=1.0, pair=Q1R2),
        ]
        rng = np.random.RandomState(0)
        seen = set()
        for _ in range(10):
            rng.shuffle(preds)
            seen.add(segment_ap(truth, preds))
        assert len(seen) == 1


class TestMatchingTrackFromCsv:
    def eval_files(self, gt_rows, pred_rows) -> float:
        with tempfile.NamedTemporaryFile() as gt_f, tempfile.NamedTemporaryFile() as pr_f:
            Match.write_csv(gt_rows, gt_f.name)
            Match.write_csv(pred_rows, pr_f.name)
            return evaluate_matching_track(gt_f.name, pr_f.name).segment_ap.ap

    def test_int_ids_formatted_on_read(self):
        truth = [seg((4, 14, 10, 18), pair=(1, 2))]
        preds = [
            seg((4, 14, 10, 18), s=3.0, pair=(2, 2)),
            seg((4, 14, 10, 18), s=2.0, pair=(1, 1)),
            seg((4, 14, 10, 18), s=1.0, pair=(1, 2)),
        ]
        assert self.eval_files(truth, preds) == pytest.approx(1 / 3.0)

    def test_any_column_order_and_missing_gt_score(self):
        gt_csv = (
            "query_start,query_end,ref_start,ref_end,query_id,ref_id\n"
            "4,14,10,18,Q000001,R000002\n"
        )
        pred_csv = (
            "query_id,ref_id,query_start,query_end,ref_start,ref_end,score\n"
            "2,2,4,14,10,18,3.0\n"
            "1,1,4,14,10,18,2.0\n"
            "1,2,4,14,10,18,1.0\n"
        )
        with tempfile.NamedTemporaryFile("wt") as gt_f, tempfile.NamedTemporaryFile(
            "wt"
        ) as pr_f:
            gt_f.write(gt_csv)
            gt_f.flush()
            pr_f.write(pred_csv)
            pr_f.flush()
            result = evaluate_matching_track(gt_f.name, pr_f.name)
        assert result.segment_ap.ap == pytest.approx(1 / 3.0)


def cand(query, ref, score):
    return CandidatePair(
        format_video_id(query, Dataset.QUERIES),
        format_video_id(ref, Dataset.REFS),
        score,
    )


class TestDescriptorMicroAP:
    TWO_POSITIVES = [cand(1, 10, 1.0), cand(2, 11, 1.0)]

    @pytest.mark.parametrize(
        "preds,expected",
        [
            # Both positives ranked above the junk pair.
            ([cand(1, 10, 8.0), cand(2, 11, 4.0), cand(99, 99, 2.0)], 1.0),
            # Junk pair splits the positives.
            (
                [cand(1, 10, 8.0), cand(2, 11, 4.0), cand(99, 99, 5.0)],
                np.mean([1, 2 / 3]),
            ),
            # Second positive predicted against the wrong ref.
            (
                [cand(1, 10, 3.0), cand(2, 10, 2.0), cand(99, 99, 1.0)],
                np.mean([1, 0]),
            ),
            # Wrong pair additionally outranks the true one.
            (
                [cand(1, 10, 2.0), cand(2, 10, 3.0), cand(99, 99, 1.0)],
                np.mean([1 / 2, 0]),
            ),
        ],
    )
    def test_uap_golden_values(self, preds, expected):
        result = average_precision(self.TWO_POSITIVES, preds)
        # On these small exhaustive cases canonical == simple AP.
        assert result.ap == pytest.approx(result.simple_ap)
        assert result.ap == pytest.approx(expected)

    def test_rejects_duplicate_predictions(self):
        truth = [cand(1, 10, 1.0)]
        with pytest.raises(AssertionError):
            average_precision(truth, [cand(1, 10, 1.0), cand(1, 10, 2.0)])

    def test_candidate_csv_roundtrip(self):
        pairs = [cand(1, 10, 1.0), cand(2, 11, 2.0)]
        with io.StringIO() as buf:
            CandidatePair.write_csv(pairs, buf)
            buf.seek(0)
            assert CandidatePair.read_csv(buf) == pairs


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


def test_match_csv_roundtrip():
    rows = [
        seg((4, 8, 10, 14), s=1.0, pair=("Q123456", "R000100")),
        seg((8, 14, 14, 18), s=2.0, pair=("Q000011", "R000101")),
    ]
    with io.StringIO() as buf:
        Match.write_csv(rows, buf)
        buf.seek(0)
        assert Match.read_csv(buf) == rows
