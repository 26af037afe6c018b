"""Root CLI surface tests: drive descriptor_eval.py / matching_eval.py
as subprocesses on synthetic planted-copy data (CPU), asserting the
frozen flag and output contracts."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from vsc2022_tpu.metrics import Dataset
from vsc2022_tpu.storage import store_features
from vsc2022_tpu.types import VideoFeature

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def data_dir():
    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(42)
    d = 32
    refs = [
        VideoFeature(
            video_id=i,
            timestamps=np.arange(n := int(rng.randint(20, 40)), dtype=np.float64),
            feature=l2n(rng.randn(n, d)).astype(np.float32),
        )
        for i in range(8)
    ]
    queries = []
    gt_rows = ["query_id,ref_id,query_start,query_end,ref_start,ref_end"]
    for i in range(3):
        f = l2n(rng.randn(30, d)).astype(np.float32)
        if i < 2:
            f[10:18] = refs[i].feature[5:13]
            gt_rows.append(f"Q{i:06d},R{i:06d},10,18,5,13")
        queries.append(
            VideoFeature(
                video_id=i, timestamps=np.arange(30, dtype=np.float64), feature=f
            )
        )
    store_features(os.path.join(tmp, "q.npz"), queries, Dataset.QUERIES)
    store_features(os.path.join(tmp, "r.npz"), refs, Dataset.REFS)
    with open(os.path.join(tmp, "gt.csv"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    return tmp


def run_cli(script, *args):
    env = dict(os.environ, VSC2022_TPU_FORCE_CPU="1")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )


class TestDescriptorEvalCLI:
    def test_end_to_end(self, data_dir):
        out_csv = os.path.join(data_dir, "candidates.csv")
        result = run_cli(
            "descriptor_eval.py",
            "--query_features", os.path.join(data_dir, "q.npz"),
            "--ref_features", os.path.join(data_dir, "r.npz"),
            "--ground_truth", os.path.join(data_dir, "gt.csv"),
            "--candidates_output", out_csv,
        )
        assert result.returncode == 0, result.stderr
        assert "micro-AP (uAP): 1.0000" in result.stderr + result.stdout
        # Candidate CSV: planted pairs on top with score ~1.
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert list(df.columns) == ["query_id", "ref_id", "score"]
        assert df.iloc[0].score == pytest.approx(1.0, abs=1e-4)

    def test_int8_staging(self, data_dir):
        # --int8 stages the corpus as SQ8-style per-row int8; planted
        # copies must still rank first (µAP 1.0) with near-1 scores.
        out_csv = os.path.join(data_dir, "candidates_int8.csv")
        result = run_cli(
            "descriptor_eval.py",
            "--query_features", os.path.join(data_dir, "q.npz"),
            "--ref_features", os.path.join(data_dir, "r.npz"),
            "--ground_truth", os.path.join(data_dir, "gt.csv"),
            "--candidates_output", out_csv, "--int8",
        )
        assert result.returncode == 0, result.stderr
        assert "micro-AP (uAP): 1.0000" in result.stderr + result.stdout
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert df.iloc[0].score == pytest.approx(1.0, abs=0.05)

    def test_int8_bf16_mutually_exclusive(self, data_dir):
        result = run_cli(
            "descriptor_eval.py",
            "--query_features", os.path.join(data_dir, "q.npz"),
            "--ref_features", os.path.join(data_dir, "r.npz"),
            "--bf16", "--int8",
        )
        assert result.returncode != 0
        assert "not allowed with" in result.stderr

    def test_missing_required_flag(self, data_dir):
        result = run_cli(
            "descriptor_eval.py",
            "--query_features", os.path.join(data_dir, "q.npz"),
        )
        assert result.returncode != 0
        assert "ref_features" in result.stderr


class TestMatchingEvalCLI:
    def test_perfect_predictions(self, data_dir):
        pred = os.path.join(data_dir, "pred.csv")
        with open(os.path.join(data_dir, "gt.csv")) as f:
            lines = f.read().strip().split("\n")
        with open(pred, "w") as f:
            f.write(lines[0] + ",score\n")
            for i, line in enumerate(lines[1:]):
                f.write(f"{line},{2.0 - i}\n")
        result = run_cli(
            "matching_eval.py",
            "--predictions", pred,
            "--ground_truth", os.path.join(data_dir, "gt.csv"),
        )
        assert result.returncode == 0, result.stderr
        assert "Matching track segment AP: 1.0000" in result.stdout


class TestShardedDescriptorEvalCLI:
    def test_sharded_matches_unsharded(self, data_dir):
        env = dict(
            os.environ,
            VSC2022_TPU_FORCE_CPU="1",
            XLA_FLAGS=(
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
            ).strip(),
        )
        # Produce the unsharded baseline here (no dependence on a
        # sibling test's side effects / run order).
        base_csv = os.path.join(data_dir, "candidates_base.csv")
        base = run_cli(
            "descriptor_eval.py",
            "--query_features", os.path.join(data_dir, "q.npz"),
            "--ref_features", os.path.join(data_dir, "r.npz"),
            "--ground_truth", os.path.join(data_dir, "gt.csv"),
            "--candidates_output", base_csv,
        )
        assert base.returncode == 0, base.stderr
        out_csv = os.path.join(data_dir, "candidates_sharded.csv")
        result = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "descriptor_eval.py"),
                "--query_features", os.path.join(data_dir, "q.npz"),
                "--ref_features", os.path.join(data_dir, "r.npz"),
                "--ground_truth", os.path.join(data_dir, "gt.csv"),
                "--candidates_output", out_csv, "--sharded",
            ],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        assert result.returncode == 0, result.stderr
        assert "micro-AP (uAP): 1.0000" in result.stderr + result.stdout
        import pandas as pd

        df = pd.read_csv(out_csv)
        ref = pd.read_csv(base_csv)
        # The corpus-sharded search must produce the identical candidate
        # list (exactness is mesh-invariant).
        pd.testing.assert_frame_equal(df, ref)
