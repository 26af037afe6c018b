"""Native C++ metric core: must agree exactly with the Python reference
path on randomized workloads (and be substantially faster)."""

import os
import time

import numpy as np
import pytest

from vsc2022_tpu.metrics import Match, _match_metric_native, match_metric
from vsc2022_tpu.native import native_available


def python_match_metric(gts, preds):
    os.environ["VSC2022_TPU_NO_NATIVE"] = "1"
    try:
        return match_metric(gts, preds)
    finally:
        del os.environ["VSC2022_TPU_NO_NATIVE"]


def random_matches(rng, n, n_pairs, tie_scores=False):
    out = []
    for _ in range(n):
        q = int(rng.randint(n_pairs))
        r = int(rng.randint(n_pairs))
        qs = float(rng.randint(0, 50))
        rs = float(rng.randint(0, 50))
        score = float(rng.randint(0, 5)) if tie_scores else float(rng.rand())
        out.append(
            Match(
                query_id=f"Q{q:06d}",
                ref_id=f"R{r:06d}",
                score=score,
                query_start=qs,
                query_end=qs + float(rng.randint(1, 20)),
                ref_start=rs,
                ref_end=rs + float(rng.randint(1, 20)),
            )
        )
    return out


@pytest.mark.skipif(not native_available(), reason="native build unavailable")
class TestNativeMatchMetric:
    @pytest.mark.parametrize("ties", [False, True])
    def test_matches_python_randomized(self, ties):
        rng = np.random.RandomState(0)
        for trial in range(10):
            gts = random_matches(rng, rng.randint(1, 20), 6)
            preds = random_matches(rng, rng.randint(1, 60), 6, tie_scores=ties)
            want = python_match_metric(gts, preds)
            got = _match_metric_native(gts, preds)
            assert got.ap == pytest.approx(want.ap, abs=1e-12)
            np.testing.assert_allclose(
                got.pr_curve.recalls, want.pr_curve.recalls, atol=1e-12
            )
            np.testing.assert_allclose(
                got.pr_curve.precisions, want.pr_curve.precisions, atol=1e-12
            )
            np.testing.assert_allclose(
                got.pr_curve.scores, want.pr_curve.scores, atol=1e-12
            )

    def test_zero_division_matches_python(self):
        # Zero-length predictions → both paths raise ZeroDivisionError.
        gts = [
            Match("Q000001", "R000001", 1.0, 0.0, 10.0, 0.0, 10.0),
        ]
        preds = [
            Match("Q000001", "R000001", 2.0, 5.0, 5.0, 5.0, 5.0),
        ]
        with pytest.raises(ZeroDivisionError):
            python_match_metric(gts, preds)
        with pytest.raises(ZeroDivisionError):
            _match_metric_native(gts, preds)

    def test_speedup(self):
        rng = np.random.RandomState(1)
        gts = random_matches(rng, 500, 100)
        preds = random_matches(rng, 3000, 100)
        _match_metric_native(gts, preds)  # warm (builds/loads the .so)
        # Best-of-3 both sides: scheduler hiccups on a loaded machine
        # once flaked a single-sample comparison.
        native_t = min(
            self._timed(_match_metric_native, gts, preds)[0]
            for _ in range(3)
        )
        python_t, want = min(
            (self._timed(python_match_metric, gts, preds) for _ in range(3)),
            key=lambda t: t[0],
        )
        got = _match_metric_native(gts, preds)
        assert got.ap == pytest.approx(want.ap, abs=1e-10)
        # The C++ core is typically 20-100× faster at this size; assert
        # a conservative margin to stay robust under CI load.
        assert native_t * 3 < python_t, (native_t, python_t)

    @staticmethod
    def _timed(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        return time.perf_counter() - t0, out
