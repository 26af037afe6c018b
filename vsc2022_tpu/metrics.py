"""Evaluation layer: descriptor-track micro-AP and matching-track segment AP.

This is a from-scratch, bit-compatible rebuild of the reference metric
definitions (reference: vsc/metrics.py). Public names, CSV schemas, the
``Q%06d``/``R%06d`` id convention and the numeric definitions are kept
identical; internals differ:

  * The binary average-precision core is a self-contained numpy
    implementation equivalent to ``sklearn.metrics.average_precision_score``
    (reference: vsc/metrics.py:477-481 delegates to sklearn) so the eval
    layer has no sklearn dependency.
  * Interval union/merge is vectorized with numpy instead of a Python
    sweep (reference: vsc/metrics.py:154-169).

Matching-track metric semantics (reference: vsc/metrics.py:238-378):
segment AP over predictions sorted by score, tie-groups updated together,
per-axis precision/recall combined by geometric mean, and GT boxes only
count toward the intersection once they overlap at least one prediction
(the VCSL figure-4f correction).
"""

from __future__ import annotations

import collections
import dataclasses
import enum
import itertools
from math import sqrt
from typing import (
    Collection,
    Dict,
    List,
    NamedTuple,
    Optional,
    TextIO,
    Tuple,
    Union,
)

import numpy as np
import pandas as pd


class Dataset(enum.Enum):
    QUERIES = "Q"
    REFS = "R"


def format_video_id(video_id: Union[str, int], dataset: Optional[Dataset]) -> str:
    """Normalize a video id to the ``Q%06d`` / ``R%06d`` convention.

    (reference: vsc/metrics.py:26-40)
    """
    if isinstance(video_id, (int, np.integer)):
        if dataset is None:
            raise ValueError(
                "Unable to convert integer video_id without a Dataset enum"
            )
        return f"{dataset.value}{video_id:06d}"
    assert isinstance(
        video_id, str
    ), f"unexpected video_id: {video_id} of type {type(video_id)}"
    if dataset is not None:
        assert (
            video_id[0] == dataset.value
        ), f"dataset mismatch? got {video_id} for dataset {dataset}"
    return video_id


@dataclasses.dataclass
class CandidatePair:
    """A (query video, ref video) candidate with a retrieval score.

    CSV schema: ``query_id,ref_id,score`` (reference: vsc/metrics.py:43-93).
    """

    query_id: str
    ref_id: str
    score: float

    @classmethod
    def to_dataframe(cls, candidates: Collection["CandidatePair"]) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "query_id": format_video_id(c.query_id, Dataset.QUERIES),
                    "ref_id": format_video_id(c.ref_id, Dataset.REFS),
                    "score": c.score,
                }
                for c in candidates
            ],
        )

    @classmethod
    def write_csv(
        cls, candidates: Collection["CandidatePair"], file: Union[str, TextIO]
    ):
        cls.to_dataframe(candidates).to_csv(file, index=False)

    @classmethod
    def read_csv(cls, file: Union[str, TextIO]) -> List["CandidatePair"]:
        df = pd.read_csv(file)
        return [
            CandidatePair(
                query_id=format_video_id(row.query_id, Dataset.QUERIES),
                ref_id=format_video_id(row.ref_id, Dataset.REFS),
                score=row.score,
            )
            for row in df.itertuples()
        ]

    @classmethod
    def from_matches(cls, matches: Collection["Match"]) -> List["CandidatePair"]:
        """Per-pair max-score reduction over segment matches.

        (reference: vsc/metrics.py:85-93)
        """
        scores: Dict[Tuple[str, str], float] = collections.defaultdict(float)
        for m in matches:
            key = (m.query_id, m.ref_id)
            scores[key] = max(m.score, scores[key])
        return [
            CandidatePair(query_id=q, ref_id=r, score=s)
            for ((q, r), s) in scores.items()
        ]


@dataclasses.dataclass
class PrecisionRecallCurve:
    precisions: np.ndarray
    recalls: np.ndarray
    scores: np.ndarray

    def plot(self, ax=None, **kwargs):
        # Lazy import: matplotlib is only needed when plotting.
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
            ax.set_xlabel("recall")
            ax.set_ylabel("precision")
            ax.set_xlim(0, 1.05)
            ax.set_ylim(0, 1.05)
        ax.plot(self.recalls, self.precisions, **kwargs)
        return ax


@dataclasses.dataclass
class AveragePrecision:
    ap: float
    pr_curve: PrecisionRecallCurve
    simple_ap: Optional[float] = None


def _merge_intervals(intervals: List[Tuple[float, float]]) -> List[Tuple[float, float]]:
    """Union-merge into sorted, non-overlapping intervals (vectorized).

    Touching intervals (start == previous end) merge, matching the
    reference sweep (reference: vsc/metrics.py:154-169).
    """
    if len(intervals) <= 1:
        return sorted(intervals)
    arr = np.asarray(sorted(intervals), dtype=np.float64)
    starts, ends = arr[:, 0], arr[:, 1]
    running_end = np.maximum.accumulate(ends)
    # A new group starts where this interval begins after every prior end.
    new_group = np.empty(len(arr), dtype=bool)
    new_group[0] = True
    new_group[1:] = starts[1:] > running_end[:-1]
    group = np.cumsum(new_group) - 1
    group_starts = starts[new_group]
    n_groups = group[-1] + 1
    group_ends = np.full(n_groups, -np.inf)
    np.maximum.at(group_ends, group, ends)
    return list(zip(group_starts.tolist(), group_ends.tolist()))


class Intervals:
    """A set of non-overlapping, ordered intervals with union/intersection
    length algebra: |A ∩ B| = |A| + |B| − |A ∪ B|.

    (reference: vsc/metrics.py:120-174)
    """

    intervals: List[Tuple[float, float]]

    def __init__(self, intervals: Optional[List[Tuple[float, float]]] = None):
        self.intervals = _merge_intervals(list(intervals or []))

    def add(self, interval: Tuple[float, float]):
        self.intervals = _merge_intervals(self.intervals + [interval])

    def union(self, other: "Intervals") -> "Intervals":
        return Intervals(self.intervals + other.intervals)

    def total_length(self) -> float:
        return float(sum(end - start for start, end in self.intervals))

    def intersect_length(self, other: "Intervals") -> float:
        union = self.union(other)
        return self.total_length() + other.total_length() - union.total_length()

    def __str__(self):
        return str(self.intervals)

    __repr__ = __str__


class Axis(enum.Enum):
    QUERY = enum.auto()
    REF = enum.auto()


class Match(NamedTuple):
    """A ground-truth or predicted segment match; also a 2-D box in
    (query-time × ref-time) space.

    CSV schema (7 columns, any order): query_id, ref_id, score,
    query_start, query_end, ref_start, ref_end
    (reference: vsc/metrics.py:182-235).
    """

    query_id: str
    ref_id: str
    score: float
    query_start: float
    query_end: float
    ref_start: float
    ref_end: float

    def pair_id(self) -> Tuple[str, str]:
        return (self.query_id, self.ref_id)

    def interval(self, axis: Axis) -> Tuple[float, float]:
        if axis == Axis.QUERY:
            return (self.query_start, self.query_end)
        return (self.ref_start, self.ref_end)

    def intersection_area(self, other: "Match") -> float:
        dq = min(self.query_end, other.query_end) - max(
            self.query_start, other.query_start
        )
        dr = min(self.ref_end, other.ref_end) - max(self.ref_start, other.ref_start)
        return max(dq, 0.0) * max(dr, 0.0)

    def overlaps(self, other: "Match") -> bool:
        return self.intersection_area(other) > 0.0

    @classmethod
    def write_csv(cls, matches: Collection["Match"], file: Union[str, TextIO]):
        df = pd.DataFrame([m._asdict() for m in matches], columns=cls._fields)
        df.to_csv(file, index=False)

    @classmethod
    def read_csv(
        cls, file: Union[str, TextIO], is_gt: bool = False, check: bool = True
    ) -> List["Match"]:
        df = pd.read_csv(file)
        df["query_id"] = df.query_id.map(lambda x: format_video_id(x, Dataset.QUERIES))
        df["ref_id"] = df.ref_id.map(lambda x: format_video_id(x, Dataset.REFS))
        if is_gt:
            # GT scores are not meaningful; force 1.0
            # (reference: vsc/metrics.py:230-231).
            df["score"] = 1.0
        if check:
            for field in cls._fields:
                assert not df[field].isna().any(), f"NaN in column {field}"
            # Negative-length segments would poison the interval algebra
            # downstream (division by a cancelled total); fail loudly here
            # instead. (The reference crashes with ZeroDivisionError.)
            bad = (df.query_end < df.query_start) | (df.ref_end < df.ref_start)
            if bad.any():
                raise ValueError(
                    f"Negative-length segments in rows {df.index[bad].tolist()}: "
                    "segment end must be >= start"
                )
        return [Match(**record) for record in df.to_dict("records")]


class VideoPair:
    """Incremental per-(query, ref) matching state.

    ``add_prediction`` returns the *deltas* of per-axis GT-intersection
    and prediction-total lengths, where only GT boxes overlapping at
    least one prediction contribute to the intersection (the VCSL
    figure-4f correction; reference: vsc/metrics.py:238-301).
    """

    def __init__(self):
        self.intersections: Dict[Axis, float] = {axis: 0.0 for axis in Axis}
        self.totals: Dict[Axis, float] = {axis: 0.0 for axis in Axis}
        self.gts: List[Match] = []
        self.preds: List[Match] = []

    def total_gt_length(self, axis: Axis) -> float:
        return Intervals([gt.interval(axis) for gt in self.gts]).total_length()

    def total_pred_length(self, axis: Axis) -> float:
        return Intervals([p.interval(axis) for p in self.preds]).total_length()

    def gt_overlaps(self, gt: Match) -> bool:
        return any(gt.overlaps(pred) for pred in self.preds)

    def add_gt(self, bbox: Match):
        self.gts.append(bbox)

    def add_prediction(
        self, bbox: Match
    ) -> Tuple[Dict[Axis, float], Dict[Axis, float]]:
        self.preds.append(bbox)
        gts_to_consider = [gt for gt in self.gts if self.gt_overlaps(gt)]

        intersect_deltas: Dict[Axis, float] = {}
        total_deltas: Dict[Axis, float] = {}
        for axis in Axis:
            pred_ints = Intervals([p.interval(axis) for p in self.preds])
            gt_ints = Intervals([gt.interval(axis) for gt in gts_to_consider])
            intersect_length = pred_ints.intersect_length(gt_ints)
            prediction_length = pred_ints.total_length()
            intersect_deltas[axis] = intersect_length - self.intersections[axis]
            total_deltas[axis] = prediction_length - self.totals[axis]
            self.intersections[axis] = intersect_length
            self.totals[axis] = prediction_length
        return intersect_deltas, total_deltas


def _match_metric_native(
    gts: Collection[Match], predictions: Collection[Match]
) -> Optional[AveragePrecision]:
    """C++ fast path for match_metric (identical semantics; see
    vsc2022_tpu/native/match_metric.cpp). Returns None when the native
    library is unavailable."""
    from vsc2022_tpu.native import get_library

    lib = get_library()
    if lib is None:
        return None
    import ctypes

    predictions = sorted(predictions, key=lambda x: x.score, reverse=True)
    pair_ids: Dict[Tuple[str, str], int] = {}

    def pair_idx(m: Match) -> int:
        return pair_ids.setdefault(m.pair_id(), len(pair_ids))

    gt_pair = np.array([pair_idx(g) for g in gts], dtype=np.int64)
    pred_pair = np.array([pair_idx(p) for p in predictions], dtype=np.int64)
    gt_boxes = np.array(
        [[g.query_start, g.query_end, g.ref_start, g.ref_end] for g in gts],
        dtype=np.float64,
    ).reshape(-1, 4)
    pred_boxes = np.array(
        [[p.query_start, p.query_end, p.ref_start, p.ref_end] for p in predictions],
        dtype=np.float64,
    ).reshape(-1, 4)
    pred_scores = np.array([p.score for p in predictions], dtype=np.float64)

    n_pred = len(predictions)
    out_metric = np.zeros(1, dtype=np.float64)
    out_recalls = np.empty(n_pred, dtype=np.float64)
    out_precisions = np.empty(n_pred, dtype=np.float64)
    out_scores = np.empty(n_pred, dtype=np.float64)
    out_n = np.zeros(1, dtype=np.int64)

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.vsc_match_metric(
        len(gts), ptr(gt_pair), ptr(gt_boxes),
        n_pred, ptr(pred_pair), ptr(pred_boxes), ptr(pred_scores),
        len(pair_ids), ptr(out_metric),
        ptr(out_recalls), ptr(out_precisions), ptr(out_scores), ptr(out_n),
    )
    if rc != 0:
        raise ZeroDivisionError("float division by zero")
    n = int(out_n[0])
    curve = PrecisionRecallCurve(
        out_precisions[:n].copy(), out_recalls[:n].copy(), out_scores[:n].copy()
    )
    return AveragePrecision(float(out_metric[0]), curve)


def match_metric(
    gts: Collection[Match],
    predictions: Collection[Match],
) -> AveragePrecision:
    """Matching-track segment AP.

    AP = Σ P(i) ΔR(i) with P = √(P_q·P_r), R = √(R_q·R_r); predictions
    visited in descending score order, score ties applied as one group
    (reference: vsc/metrics.py:304-378). Runs the C++ core when
    available (vsc2022_tpu/native); the Python path below is the
    reference semantics and the fallback.
    """
    if gts and predictions:
        native = _match_metric_native(gts, predictions)
        if native is not None:
            return native

    predictions = sorted(predictions, key=lambda x: x.score, reverse=True)

    video_pairs: Dict[Tuple[str, str], VideoPair] = collections.defaultdict(VideoPair)
    for gt in gts:
        video_pairs[gt.pair_id()].add_gt(gt)

    gt_total_lengths = {axis: 0.0 for axis in Axis}
    for pair in video_pairs.values():
        for axis in Axis:
            gt_total_lengths[axis] += pair.total_gt_length(axis)

    recall = 0.0
    metric = 0.0
    intersections = {axis: 0.0 for axis in Axis}
    totals = {axis: 0.0 for axis in Axis}
    pr_recalls: List[float] = []
    pr_precisions: List[float] = []
    pr_scores: List[float] = []

    for score, group in itertools.groupby(predictions, key=lambda x: x.score):
        for prediction in group:
            intersect_deltas, total_deltas = video_pairs[
                prediction.pair_id()
            ].add_prediction(prediction)
            for axis in Axis:
                intersections[axis] += intersect_deltas[axis]
                totals[axis] += total_deltas[axis]

        recalls = {axis: intersections[axis] / gt_total_lengths[axis] for axis in Axis}
        precisions = {axis: intersections[axis] / totals[axis] for axis in Axis}
        new_recall = sqrt(recalls[Axis.QUERY] * recalls[Axis.REF])
        precision = sqrt(precisions[Axis.QUERY] * precisions[Axis.REF])

        delta_recall = new_recall - recall
        metric += precision * delta_recall
        recall = new_recall
        if delta_recall > 0:
            pr_recalls.append(recall)
            pr_precisions.append(precision)
            pr_scores.append(score)

    curve = PrecisionRecallCurve(
        np.array(pr_precisions), np.array(pr_recalls), np.array(pr_scores)
    )
    return AveragePrecision(metric, curve)


@dataclasses.dataclass
class MatchingTrackMetrics:
    segment_ap: AveragePrecision
    pairwise_micro_ap: AveragePrecision


def evaluate_matching_track(
    ground_truth_filename: str, predictions_filename: str
) -> MatchingTrackMetrics:
    """Matching-track evaluation from CSV files.

    (reference: vsc/metrics.py:389-415)
    """
    gt = Match.read_csv(ground_truth_filename, is_gt=True)
    predictions = Match.read_csv(predictions_filename)
    metric = match_metric(gt, predictions)
    gt_pairs = CandidatePair.from_matches(gt)
    pairs = CandidatePair.from_matches(predictions)
    pair_ap = average_precision(gt_pairs, pairs)
    return MatchingTrackMetrics(segment_ap=metric, pairwise_micro_ap=pair_ap)


def binary_average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Binary average precision, numerically identical to
    ``sklearn.metrics.average_precision_score`` for unweighted binary
    labels (the only form the reference uses; vsc/metrics.py:478).

    Step-wise AP over the PR curve: AP = Σ_n (R_n − R_{n−1}) P_n with
    score ties collapsed to one threshold.
    """
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    assert y_true.shape == y_score.shape

    # Stable sort by descending score (ties keep input order).
    order = np.argsort(-y_score, kind="mergesort")
    y_true = y_true[order]
    y_score = y_score[order]

    # Threshold boundaries: last index of each tie group.
    distinct = np.where(np.diff(y_score))[0]
    threshold_idxs = np.r_[distinct, y_true.size - 1]

    tps = np.cumsum(y_true)[threshold_idxs]
    fps = 1 + threshold_idxs - tps
    if tps[-1] == 0:
        return 0.0
    precision = tps / (tps + fps)
    recall = tps / tps[-1]

    # AP = sum over ascending-recall steps; prepend the (R=0, P=1) point.
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def average_precision(
    ground_truth: Collection[CandidatePair], predictions: Collection[CandidatePair]
) -> AveragePrecision:
    """Descriptor-track micro-AP over candidate pairs.

    Includes the canonical DrivenData AP (rescaled by the fraction of GT
    positives that are present in the prediction set) plus a simple
    cumulative AP and the PR curve sampled at correct hits
    (reference: vsc/metrics.py:418-450).
    """
    gt_pairs = {(pair.query_id, pair.ref_id) for pair in ground_truth}
    if len(gt_pairs) != len(ground_truth):
        raise AssertionError("Duplicates detected in ground truth")
    predicted_pairs = {(pair.query_id, pair.ref_id) for pair in predictions}
    if len(predicted_pairs) != len(predictions):
        raise AssertionError("Duplicates detected in predictions")

    canonical_ap = drivendata_average_precision(
        predicted=CandidatePair.to_dataframe(predictions),
        ground_truth=CandidatePair.to_dataframe(ground_truth),
    )

    predictions = sorted(predictions, key=lambda x: x.score, reverse=True)
    scores = np.array([pair.score for pair in predictions])
    correct = np.array(
        [(pair.query_id, pair.ref_id) in gt_pairs for pair in predictions]
    )
    total_pairs = len(gt_pairs)
    cumulative_correct = np.cumsum(correct)
    cumulative_predicted = np.arange(len(correct)) + 1
    recall = cumulative_correct / total_pairs
    precision = cumulative_correct / cumulative_predicted
    simple_ap = np.sum(precision * correct) / total_pairs
    indices = np.nonzero(correct)[0]
    curve = PrecisionRecallCurve(precision[indices], recall[indices], scores[indices])
    return AveragePrecision(ap=canonical_ap, pr_curve=curve, simple_ap=simple_ap)


def drivendata_average_precision(
    predicted: pd.DataFrame,
    ground_truth: pd.DataFrame,
) -> float:
    """Canonical challenge AP: unadjusted binary AP over predictions
    (left-merged against GT) rescaled by predicted_n_pos / actual_n_pos
    to penalize non-exhaustive prediction sets.

    (reference: vsc/metrics.py:453-489)
    """
    actual = ground_truth[["query_id", "ref_id"]]
    scores = predicted["score"]
    if not np.isfinite(scores).all() or np.isnan(scores).any():
        raise ValueError("Scores must be finite.")

    predicted = predicted.sort_values("score", ascending=False)
    merged = predicted.merge(
        right=actual.assign(actual=1.0),
        how="left",
        on=["query_id", "ref_id"],
    ).fillna({"actual": 0.0})

    unadjusted_ap = (
        binary_average_precision(merged["actual"].values, merged["score"].values)
        if merged["actual"].sum()
        else 0.0
    )
    predicted_n_pos = int(merged["actual"].sum())
    actual_n_pos = int(actual["ref_id"].notna().sum())
    return unadjusted_ap * (predicted_n_pos / actual_n_pos)
