"""End-to-end test of the single-machine ``--processes N`` spawn path,
including the failure contract (reference: vsc/baseline/inference.py:
107-149 — spawn N workers, success iff every exitcode is EX_OK, merge
per-rank shards; any failure logs "Inference FAILED!" and produces NO
merged output). Decode uses stub ffmpeg/ffprobe executables emitting
deterministic frames derived from each video file's content, so the
merged result must reproduce a single-process run bit-for-bit."""

import os
import stat
import subprocess
import sys

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # spawned inference worker subprocesses (~2.5 min)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, FRAMES_PER_VIDEO = 32, 24, 3


def _write_executable(path, content):
    path.write_text(content)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture()
def stub_tools(tmp_path):
    tools = tmp_path / "tools"
    tools.mkdir()
    # ffprobe fails (nonzero exit) on videos whose first byte is 0xFF —
    # the poison pill for the failure-contract test.
    _write_executable(
        tools / "ffprobe",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "path = sys.argv[-1]\n"
        "seed = open(path, 'rb').read(1)[0]\n"
        "if seed == 0xFF:\n"
        "    sys.exit(1)\n"
        f'print(\'{{"streams": [{{"width": {W}, "height": {H}}}]}}\')\n',
    )
    _write_executable(
        tools / "ffmpeg",
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "path = sys.argv[sys.argv.index('-i') + 1]\n"
        "seed = open(path, 'rb').read(1)[0]\n"
        f"for j in range({FRAMES_PER_VIDEO}):\n"
        f"    sys.stdout.buffer.write(bytes([(seed + j) % 256]) * {W * H * 3})\n",
    )
    return str(tools / "ffmpeg")


@pytest.fixture()
def video_dir(tmp_path):
    d = tmp_path / "videos"
    d.mkdir()
    for i in range(5):
        (d / f"vid{i}.mp4").write_bytes(bytes([30 * i + 5]))
    return str(d)


def _run_cli(video_dir, ffmpeg, out, extra, scratch=None):
    cmd = [
        sys.executable, "-m", "vsc2022_tpu.inference.cli",
        "--baseline", "sscd", "--accelerator", "cpu",
        "--transforms", "RESIZE_224_SQUARE", "--batch_size", "8",
        "--dataset_path", video_dir, "--ffmpeg_path", ffmpeg,
        "--output_file", out, *extra,
    ]
    if scratch:
        cmd += ["--scratch_path", scratch]
    return subprocess.run(
        cmd, cwd=REPO, env={**os.environ}, capture_output=True, text=True,
        timeout=600,
    )


def _load_as_dict(path):
    from vsc2022_tpu.storage import load_features

    return {vf.video_id: vf for vf in load_features(path)}


class TestProcessesSpawn:
    def test_two_workers_match_single_process(
        self, stub_tools, video_dir, tmp_path
    ):
        scratch = str(tmp_path / "scratch")
        merged = str(tmp_path / "merged.npz")
        result = _run_cli(
            video_dir, stub_tools, merged, ["--processes", "2"], scratch
        )
        assert result.returncode == 0, result.stderr[-3000:]
        assert "Inference succeeded" in result.stderr + result.stdout
        # Per-rank shards land in the scratch dir (round-robin split).
        shard0 = _load_as_dict(os.path.join(scratch, "0.npz"))
        assert set(shard0) == {"vid0", "vid2", "vid4"}

        single = str(tmp_path / "single.npz")
        result = _run_cli(video_dir, stub_tools, single, [])
        assert result.returncode == 0, result.stderr[-3000:]

        got, want = _load_as_dict(merged), _load_as_dict(single)
        assert set(got) == set(want) == {f"vid{i}" for i in range(5)}
        for vid in want:
            np.testing.assert_array_equal(got[vid].feature, want[vid].feature)
            np.testing.assert_array_equal(
                got[vid].timestamps, want[vid].timestamps
            )

    def test_failed_worker_fails_run_and_writes_no_output(
        self, stub_tools, video_dir, tmp_path
    ):
        # Poison vid3 (rank 1's shard): its worker must die, the parent
        # must report failure, and no merged output may appear.
        with open(os.path.join(video_dir, "vid3.mp4"), "wb") as f:
            f.write(bytes([0xFF]))
        merged = str(tmp_path / "merged_fail.npz")
        result = _run_cli(video_dir, stub_tools, merged, ["--processes", "2"])
        assert "Inference FAILED!" in result.stderr + result.stdout
        assert not os.path.exists(merged)
