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
  * Segment-AP bookkeeping carries (query-axis, ref-axis) quantities as
    length-2 vectors rather than per-axis dict plumbing, and the
    DrivenData AP realizes the GT left-merge as a set-membership lookup.

Matching-track metric semantics (reference: vsc/metrics.py:238-378):
segment AP over predictions sorted by score, tie-groups updated together,
per-axis precision/recall combined by geometric mean, and GT boxes only
count toward the intersection once they overlap at least one prediction
(the VCSL figure-4f correction).
"""

from __future__ import annotations

import dataclasses
import enum
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

    Integer ids are rendered with the dataset's prefix; string ids pass
    through after a prefix sanity check. (reference: vsc/metrics.py:26-40)
    """
    prefix = None if dataset is None else dataset.value
    if isinstance(video_id, str):
        # np.str_ is a str subclass, so ids loaded from npz land here too.
        if prefix is not None and not video_id.startswith(prefix):
            raise AssertionError(
                f"video id {video_id!r} lacks the {prefix!r} prefix "
                f"expected for {dataset}"
            )
        return video_id
    if isinstance(video_id, (int, np.integer)):
        if prefix is None:
            raise ValueError(
                "Unable to convert integer video_id without a Dataset enum"
            )
        return f"{prefix}{int(video_id):06d}"
    raise AssertionError(
        f"video id must be str or int; got {type(video_id).__name__}"
    )


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
        if not candidates:
            return pd.DataFrame([])
        return pd.DataFrame(
            {
                "query_id": [
                    format_video_id(c.query_id, Dataset.QUERIES)
                    for c in candidates
                ],
                "ref_id": [
                    format_video_id(c.ref_id, Dataset.REFS) for c in candidates
                ],
                "score": [c.score for c in candidates],
            }
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
        """Per-pair max-score reduction over segment matches; scores are
        floored at 0.0 as in the reference (vsc/metrics.py:85-93, whose
        defaultdict(float) starts every pair at zero)."""
        best: Dict[Tuple[str, str], float] = {}
        for m in matches:
            k = (m.query_id, m.ref_id)
            best[k] = max(best.get(k, 0.0), m.score)
        return [
            CandidatePair(query_id=q, ref_id=r, score=s)
            for (q, r), s in best.items()
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

    def spans(self) -> Tuple[Tuple[float, float], Tuple[float, float]]:
        """(query span, ref span) — index 0/1 = the two time axes."""
        return (
            (self.query_start, self.query_end),
            (self.ref_start, self.ref_end),
        )

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
        # NamedTuples unpack directly as DataFrame rows.
        pd.DataFrame(list(matches), columns=cls._fields).to_csv(file, index=False)

    @classmethod
    def read_csv(
        cls, file: Union[str, TextIO], is_gt: bool = False, check: bool = True
    ) -> List["Match"]:
        df = pd.read_csv(file)
        df["query_id"] = [
            format_video_id(v, Dataset.QUERIES) for v in df["query_id"]
        ]
        df["ref_id"] = [format_video_id(v, Dataset.REFS) for v in df["ref_id"]]
        if is_gt:
            # GT scores are not meaningful; force 1.0
            # (reference: vsc/metrics.py:230-231).
            df["score"] = 1.0
        if check:
            na_cols = [f for f in cls._fields if df[f].isna().any()]
            assert not na_cols, f"NaN values in column(s): {na_cols}"
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
    """Incremental per-(query, ref) matching state for segment AP.

    Carries per-axis quantities as length-2 vectors (index 0 = query
    time axis, 1 = ref time axis): ``covered`` is the length of GT that
    predictions intersect, ``claimed`` the total length predictions
    span. A GT box participates in ``covered`` only once at least one
    prediction touches it — the VCSL figure-4f correction
    (reference semantics: vsc/metrics.py:238-301).
    """

    __slots__ = ("gts", "preds", "covered", "claimed")

    def __init__(self):
        self.gts: List[Match] = []
        self.preds: List[Match] = []
        self.covered = np.zeros(2)
        self.claimed = np.zeros(2)

    def add_gt(self, bbox: Match):
        self.gts.append(bbox)

    def total_gt_length(self) -> np.ndarray:
        """GT union length per axis, as a (2,) vector."""
        per_axis = zip(*(gt.spans() for gt in self.gts)) if self.gts else ((), ())
        return np.array(
            [Intervals(list(spans)).total_length() for spans in per_axis]
        )

    def add_prediction(self, bbox: Match) -> Tuple[np.ndarray, np.ndarray]:
        """Fold one prediction in; return the (2,) deltas of
        (GT-intersection length, prediction-total length) per axis."""
        self.preds.append(bbox)
        # Only GT boxes touched by some prediction count (fig. 4f).
        active = [
            gt
            for gt in self.gts
            if any(gt.overlaps(p) for p in self.preds)
        ]

        state = np.empty((2, 2))  # rows: covered, claimed; cols: axis
        for ax in range(2):
            pred_union = Intervals([p.spans()[ax] for p in self.preds])
            gt_union = Intervals([g.spans()[ax] for g in active])
            state[0, ax] = pred_union.intersect_length(gt_union)
            state[1, ax] = pred_union.total_length()

        covered_delta = state[0] - self.covered
        claimed_delta = state[1] - self.claimed
        self.covered, self.claimed = state[0], state[1]
        return covered_delta, claimed_delta


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
    (reference semantics: vsc/metrics.py:304-378). Runs the C++ core
    when available (vsc2022_tpu/native); the Python path below is the
    fallback.
    """
    if gts and predictions:
        native = _match_metric_native(gts, predictions)
        if native is not None:
            return native

    ledgers: Dict[Tuple[str, str], VideoPair] = {}
    for gt in gts:
        ledgers.setdefault(gt.pair_id(), VideoPair()).add_gt(gt)

    # Denominator: total GT length per axis across all pairs, (2,).
    gt_span = sum(
        (pair.total_gt_length() for pair in ledgers.values()),
        start=np.zeros(2),
    )

    ranked = sorted(predictions, key=lambda m: m.score, reverse=True)
    covered = np.zeros(2)
    claimed = np.zeros(2)
    ap = 0.0
    last_recall = 0.0
    curve_rows: List[Tuple[float, float, float]] = []  # (P, R, score)

    # Walk tie groups: all predictions sharing a score land together.
    i = 0
    while i < len(ranked):
        j = i + 1
        while j < len(ranked) and ranked[j].score == ranked[i].score:
            j += 1
        for pred in ranked[i:j]:
            ledger = ledgers.setdefault(pred.pair_id(), VideoPair())
            covered_delta, claimed_delta = ledger.add_prediction(pred)
            covered += covered_delta
            claimed += claimed_delta

        # Plain-float division so an empty axis raises ZeroDivisionError,
        # as the reference does.
        recall_qr = [float(covered[ax]) / float(gt_span[ax]) for ax in range(2)]
        precision_qr = [float(covered[ax]) / float(claimed[ax]) for ax in range(2)]
        recall = sqrt(recall_qr[0] * recall_qr[1])
        precision = sqrt(precision_qr[0] * precision_qr[1])

        ap += precision * (recall - last_recall)
        if recall > last_recall:
            curve_rows.append((precision, recall, ranked[i].score))
        last_recall = recall
        i = j

    columns = list(zip(*curve_rows)) if curve_rows else ([], [], [])
    curve = PrecisionRecallCurve(*(np.array(col) for col in columns))
    return AveragePrecision(ap, curve)


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
    (reference semantics: vsc/metrics.py:418-450).
    """
    positives = {(c.query_id, c.ref_id) for c in ground_truth}
    assert len(positives) == len(ground_truth), (
        "Duplicates detected in ground truth"
    )
    distinct_preds = {(c.query_id, c.ref_id) for c in predictions}
    assert len(distinct_preds) == len(predictions), (
        "Duplicates detected in predictions"
    )

    canonical_ap = drivendata_average_precision(
        predicted=CandidatePair.to_dataframe(predictions),
        ground_truth=CandidatePair.to_dataframe(ground_truth),
    )

    ranked = sorted(predictions, key=lambda c: c.score, reverse=True)
    hits = np.fromiter(
        ((c.query_id, c.ref_id) in positives for c in ranked),
        dtype=bool,
        count=len(ranked),
    )
    hits_so_far = np.cumsum(hits)
    precision_at = hits_so_far / np.arange(1, hits.size + 1)
    # numpy division: empty GT yields nan (+RuntimeWarning), matching
    # the reference rather than raising ZeroDivisionError
    # (vsc/metrics.py:441-446).
    with np.errstate(invalid="ignore", divide="ignore"):
        simple_ap = float(
            np.float64(precision_at[hits].sum()) / len(positives)
        )
        recall_at_hits = hits_so_far[hits] / max(len(positives), 1)

    scores = np.array([c.score for c in ranked])
    curve = PrecisionRecallCurve(precision_at[hits], recall_at_hits, scores[hits])
    return AveragePrecision(ap=canonical_ap, pr_curve=curve, simple_ap=simple_ap)


def drivendata_average_precision(
    predicted: pd.DataFrame,
    ground_truth: pd.DataFrame,
) -> float:
    """Canonical challenge AP: unadjusted binary AP over predictions
    labeled against GT, rescaled by predicted_n_pos / actual_n_pos to
    penalize non-exhaustive prediction sets.

    The reference realizes the labeling as a pandas left-merge
    (vsc/metrics.py:453-489); a set-membership lookup is equivalent
    because the caller guarantees GT pairs are unique.
    """
    scores = predicted["score"].to_numpy(dtype=np.float64)
    if not np.isfinite(scores).all():
        raise ValueError("Scores must be finite.")

    gt_rows = ground_truth[["query_id", "ref_id"]]
    positives = set(zip(gt_rows["query_id"], gt_rows["ref_id"]))
    labels = np.fromiter(
        (
            pair in positives
            for pair in zip(predicted["query_id"], predicted["ref_id"])
        ),
        dtype=np.float64,
        count=len(predicted),
    )

    matched_n_pos = int(labels.sum())
    if matched_n_pos == 0:
        return 0.0
    raw_ap = binary_average_precision(labels, scores)
    # Rows with a blank ref_id exist only to validate query ids upstream;
    # they are not scorable positives.
    actual_n_pos = int(gt_rows["ref_id"].notna().sum())
    return raw_ap * (matched_n_pos / actual_n_pos)
