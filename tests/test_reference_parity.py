"""Direct parity fuzz against the reference implementation.

The reference's metric/storage layers are pure-Python (sklearn/pandas/
numpy), so they run here as an oracle: these tests import
/root/reference/vsc and require OUR implementations to produce
bit-identical results on randomized workloads — hard evidence for the
"metric definitions bit-compatible with the reference" contract, beyond
hand-derived golden cases.

Skipped automatically when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "vsc")),
    reason="reference checkout not available",
)

if os.path.isdir(os.path.join(REFERENCE, "vsc")):
    # APPEND (not insert-at-0): the reference tree carries colliding
    # top-level names (descriptor_eval, matching_eval, tests, docs);
    # repo paths must keep winning resolution.
    sys.path.append(REFERENCE)
    # vsc.index imports faiss (+ faiss.contrib.exhaustive_search) at
    # module top solely for VideoIndex; the data model and storage need
    # only the module objects to exist.
    _faiss = types.ModuleType("faiss")
    _faiss.__path__ = []  # mark as package so submodule imports resolve
    _faiss.METRIC_INNER_PRODUCT = 0  # default-arg value read at def time
    _contrib = types.ModuleType("faiss.contrib")
    _contrib.__path__ = []
    _contrib.exhaustive_search = types.ModuleType(
        "faiss.contrib.exhaustive_search"
    )
    _faiss.contrib = _contrib
    sys.modules.setdefault("faiss", _faiss)
    sys.modules.setdefault("faiss.contrib", _contrib)
    sys.modules.setdefault(
        "faiss.contrib.exhaustive_search", _contrib.exhaustive_search
    )
    import vsc.metrics as ref_metrics
    import vsc.storage as ref_storage
    from vsc.index import VideoFeature as RefVideoFeature

from vsc2022_tpu import metrics as our_metrics
from vsc2022_tpu import storage as our_storage
from vsc2022_tpu.types import VideoFeature


def random_matches(rng, n, n_q=4, n_r=4, scored=True, cls=None):
    cls = cls or our_metrics.Match
    rows = []
    for _ in range(n):
        qs = rng.uniform(0, 50)
        rs = rng.uniform(0, 50)
        # Integer-ish scores sometimes → heavy tie groups.
        score = (
            float(rng.randint(0, 4)) if rng.rand() < 0.5 else float(rng.rand())
        ) if scored else 1.0
        rows.append(cls(
            query_id=f"Q{rng.randint(n_q):06d}",
            ref_id=f"R{rng.randint(n_r):06d}",
            score=score,
            query_start=qs,
            query_end=qs + rng.uniform(0.5, 20),
            ref_start=rs,
            ref_end=rs + rng.uniform(0.5, 20),
        ))
    return rows


class TestMatchMetricParity:
    def to_ref(self, matches):
        return [ref_metrics.Match(**m._asdict()) for m in matches]

    def test_segment_ap_fuzz(self):
        rng = np.random.RandomState(31)
        for trial in range(25):
            gts = random_matches(rng, rng.randint(1, 8), scored=False)
            preds = random_matches(rng, rng.randint(1, 30))
            ours = our_metrics.match_metric(gts, preds)
            refs = ref_metrics.match_metric(self.to_ref(gts), self.to_ref(preds))
            assert ours.ap == pytest.approx(refs.ap, abs=1e-12), trial
            np.testing.assert_allclose(
                ours.pr_curve.recalls, refs.pr_curve.recalls, atol=1e-12
            )
            np.testing.assert_allclose(
                ours.pr_curve.precisions, refs.pr_curve.precisions, atol=1e-12
            )

    def test_python_fallback_matches_reference_too(self, monkeypatch):
        # Force the pure-Python path (no C++ core) for the same fuzz.
        import vsc2022_tpu.native as native

        monkeypatch.setattr(native, "get_library", lambda: None)
        rng = np.random.RandomState(32)
        for _ in range(10):
            gts = random_matches(rng, rng.randint(1, 6), scored=False)
            preds = random_matches(rng, rng.randint(1, 20))
            ours = our_metrics.match_metric(gts, preds)
            refs = ref_metrics.match_metric(self.to_ref(gts), self.to_ref(preds))
            assert ours.ap == pytest.approx(refs.ap, abs=1e-12)


class TestDescriptorAPParity:
    def test_average_precision_fuzz(self):
        rng = np.random.RandomState(33)
        for trial in range(25):
            n_gt = rng.randint(1, 12)
            gt_pairs = set()
            while len(gt_pairs) < n_gt:
                gt_pairs.add((rng.randint(20), rng.randint(20)))
            gts = [
                our_metrics.CandidatePair(f"Q{q:06d}", f"R{r:06d}", 1.0)
                for q, r in gt_pairs
            ]
            pred_pairs = set()
            while len(pred_pairs) < rng.randint(1, 40):
                pred_pairs.add((rng.randint(20), rng.randint(20)))
            scores = (
                rng.randint(0, 5, size=len(pred_pairs)).astype(float)
                if trial % 2 else rng.rand(len(pred_pairs))
            )
            preds = [
                our_metrics.CandidatePair(f"Q{q:06d}", f"R{r:06d}", float(s))
                for (q, r), s in zip(pred_pairs, scores)
            ]
            ref_gts = [
                ref_metrics.CandidatePair(c.query_id, c.ref_id, c.score)
                for c in gts
            ]
            ref_preds = [
                ref_metrics.CandidatePair(c.query_id, c.ref_id, c.score)
                for c in preds
            ]
            ours = our_metrics.average_precision(gts, preds)
            refs = ref_metrics.average_precision(ref_gts, ref_preds)
            assert ours.ap == pytest.approx(refs.ap, abs=1e-12), trial
            assert ours.simple_ap == pytest.approx(refs.simple_ap, abs=1e-12)


class TestIntervalsParity:
    def test_union_and_intersection_fuzz(self):
        rng = np.random.RandomState(34)
        for _ in range(50):
            def rand_intervals():
                out = []
                for _ in range(rng.randint(1, 8)):
                    a = rng.uniform(0, 30)
                    out.append((a, a + rng.uniform(0, 10)))
                return out

            a, b = rand_intervals(), rand_intervals()
            ours_a = our_metrics.Intervals(list(a))
            ours_b = our_metrics.Intervals(list(b))
            refs_a = ref_metrics.Intervals(list(a))
            refs_b = ref_metrics.Intervals(list(b))
            assert ours_a.intervals == refs_a.intervals
            assert ours_a.total_length() == pytest.approx(
                refs_a.total_length(), abs=1e-12
            )
            assert ours_a.intersect_length(ours_b) == pytest.approx(
                refs_a.intersect_length(refs_b), abs=1e-9
            )


class TestStorageCrossCompat:
    def make_videos(self, rng, cls):
        out = []
        for i in range(4):
            n = int(rng.randint(3, 9))
            out.append(cls(
                video_id=i,
                timestamps=np.arange(n, dtype=np.float64) / 2.0,
                feature=rng.randn(n, 16).astype(np.float32),
            ))
        return out

    def test_ours_writes_reference_reads(self, tmp_path):
        rng = np.random.RandomState(35)
        videos = self.make_videos(rng, VideoFeature)
        path = str(tmp_path / "ours.npz")
        our_storage.store_features(path, videos, our_metrics.Dataset.QUERIES)
        loaded = ref_storage.load_features(path)
        assert [v.video_id for v in loaded] == [
            f"Q{v.video_id:06d}" for v in videos
        ]
        for ref_v, orig in zip(loaded, videos):
            np.testing.assert_array_equal(ref_v.feature, orig.feature)
            np.testing.assert_array_equal(ref_v.timestamps, orig.timestamps)

    def test_reference_writes_ours_reads(self, tmp_path):
        rng = np.random.RandomState(36)
        videos = self.make_videos(rng, RefVideoFeature)
        path = str(tmp_path / "refs.npz")
        ref_storage.store_features(path, videos, ref_metrics.Dataset.REFS)
        loaded = our_storage.load_features(path)
        assert [v.video_id for v in loaded] == [
            f"R{v.video_id:06d}" for v in videos
        ]
        for our_v, orig in zip(loaded, videos):
            np.testing.assert_array_equal(our_v.feature, orig.feature)
            np.testing.assert_array_equal(our_v.timestamps, orig.timestamps)
