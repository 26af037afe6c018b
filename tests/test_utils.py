"""Utility-layer tests: checkpoint round-trip, profiling hook, umbrella
CLI listing."""

import subprocess
import sys

import numpy as np

from vsc2022_tpu.utils.checkpoint import load_variables, save_variables
from vsc2022_tpu.utils.profiling import maybe_profile


class TestCheckpoint:
    def test_roundtrip_nested_tree(self, tmp_path):
        rng = np.random.RandomState(0)
        tree = {
            "params": {
                "backbone": {"conv1": {"kernel": rng.randn(3, 3, 3, 8)}},
                "project": {"kernel": rng.randn(8, 4), "bias": rng.randn(4)},
            },
            "batch_stats": {"bn1": {"mean": rng.randn(8), "var": rng.rand(8)}},
        }
        path = str(tmp_path / "ckpt.npz")
        save_variables(path, tree)
        restored = load_variables(path)
        np.testing.assert_array_equal(
            restored["params"]["backbone"]["conv1"]["kernel"],
            tree["params"]["backbone"]["conv1"]["kernel"],
        )
        np.testing.assert_array_equal(
            restored["batch_stats"]["bn1"]["var"], tree["batch_stats"]["bn1"]["var"]
        )
        assert set(restored.keys()) == {"params", "batch_stats"}


class TestProfiling:
    def test_noop_without_dir(self):
        with maybe_profile(None):
            x = 1 + 1
        assert x == 2


class TestUmbrellaCLI:
    def test_lists_commands(self):
        result = subprocess.run(
            [sys.executable, "-m", "vsc2022_tpu", "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert result.returncode == 0
        for cmd in ("inference", "sscd-baseline", "dns-index", "train"):
            assert cmd in result.stdout

    def test_unknown_command_exits_nonzero(self):
        result = subprocess.run(
            [sys.executable, "-m", "vsc2022_tpu", "frobnicate"],
            capture_output=True, text=True, timeout=120,
        )
        assert result.returncode == 2


class TestScaleBench:
    def test_tiny_run(self):
        """tools/scale_bench.py on a toy workload prints valid JSON."""
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        result = subprocess.run(
            [
                sys.executable, os.path.join(repo, "tools", "scale_bench.py"),
                "--corpus", "600", "--queries", "64", "--query_videos", "4",
                "--noise", "100", "--dim", "16", "--k_per_query", "10",
                "--repeats", "1",
            ],
            capture_output=True, text=True, timeout=300, cwd=repo,
            env={**os.environ, "VSC2022_TPU_FORCE_CPU": "1"},
        )
        assert result.returncode == 0, result.stderr[-2000:]
        line = [ln for ln in result.stdout.splitlines() if ln.startswith("{")][-1]
        out = json.loads(line)
        assert out["corpus_frames"] == 600
        assert out["query_videos_per_sec"] > 0


class TestDieWithParent:
    def test_grandchild_dies_when_spawner_is_sigkilled(self):
        """PDEATHSIG lifetime chain (utils/procs.py): a process spawned
        with die_with_parent must be kernel-killed when its spawner is
        SIGKILLed — the rig's chip lease makes orphaned chip-holders
        (e.g. a bench serving child's server) poison every later run."""
        import os
        import signal
        import time

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        wrapper_code = (
            "import subprocess, sys, time\n"
            "from vsc2022_tpu.utils.procs import die_with_parent\n"
            "p = subprocess.Popen([sys.executable, '-c',"
            " 'import time; time.sleep(120)'], preexec_fn=die_with_parent)\n"
            "print(p.pid, flush=True)\n"
            "time.sleep(120)\n"
        )
        wrapper = subprocess.Popen(
            [sys.executable, "-c", wrapper_code],
            stdout=subprocess.PIPE, text=True,
            env={**os.environ, "PYTHONPATH": repo},
        )
        try:
            sleeper_pid = int(wrapper.stdout.readline())
            os.kill(wrapper.pid, signal.SIGKILL)
            wrapper.wait()
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline:
                try:
                    os.kill(sleeper_pid, 0)  # existence probe only
                except ProcessLookupError:
                    return  # kernel reaped it with the parent
                time.sleep(0.05)
            os.kill(sleeper_pid, signal.SIGKILL)  # clean up the leak
            raise AssertionError(
                "grandchild survived its spawner's SIGKILL"
            )
        finally:
            wrapper.stdout.close()
            if wrapper.poll() is None:
                wrapper.kill()
                wrapper.wait()
