"""Multi-host (DCN) smoke test: two real inference CLI processes
rendezvous through ``jax.distributed`` on localhost and shard one video
corpus between them, exercising the --coordinator/--num_processes/
--process_id path end-to-end (reference analog: the multi-machine mode
of vsc/baseline/inference.py:95-99,140-158, documented there as "not
tested"). Decode uses stub ffmpeg/ffprobe executables emitting
deterministic frames derived from each video file's content, so the
merged shards must reproduce a single-process run bit-for-bit."""

import os
import socket
import stat
import subprocess
import sys

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # real 2-process jax.distributed pods (~2 min)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, FRAMES_PER_VIDEO = 32, 24, 3


def _write_executable(path, content):
    path.write_text(content)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture()
def stub_tools(tmp_path):
    tools = tmp_path / "tools"
    tools.mkdir()
    _write_executable(
        tools / "ffprobe",
        "#!/bin/bash\n"
        f'echo \'{{"streams": [{{"width": {W}, "height": {H}}}]}}\'\n',
    )
    # Frame j of a video is filled with (seed + j) where seed is the
    # video file's first byte — per-video distinct, fully deterministic.
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
    for i in range(4):
        (d / f"vid{i}.mp4").write_bytes(bytes([40 * i + 7]))
    return str(d)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli_cmd(video_dir, ffmpeg, out, extra):
    return [
        sys.executable, "-m", "vsc2022_tpu.inference.cli",
        "--baseline", "sscd", "--accelerator", "cpu",
        "--transforms", "RESIZE_224_SQUARE", "--batch_size", "8",
        "--dataset_path", video_dir, "--ffmpeg_path", ffmpeg,
        "--output_file", out, *extra,
    ]


def _load_as_dict(path):
    from vsc2022_tpu.storage import load_features

    return {vf.video_id: vf for vf in load_features(path)}


SEARCH_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(sys.argv[3], 2, int(sys.argv[1]))
import numpy as np
from vsc2022_tpu.parallel.mesh import corpus_mesh
from vsc2022_tpu.parallel.sharded_search import ShardedSimilaritySearcher
from vsc2022_tpu.ops.similarity import SimilaritySearcher

assert jax.device_count() == 8, jax.device_count()
rng = np.random.RandomState(3)
q = rng.randint(-3, 4, size=(21, 16)).astype(np.float32)
r = rng.randint(-3, 4, size=(300, 16)).astype(np.float32)
sharded = ShardedSimilaritySearcher(r, corpus_mesh(), row_block=16)
hq, hr, hs = sharded.global_topk(q, 50)
sq, sr, ss = SimilaritySearcher(r).global_topk(q, 50)
assert np.array_equal(hq, sq) and np.array_equal(hr, sr)
assert np.allclose(hs, ss, rtol=1e-6)

# The POOLED mesh collection across the two processes: per-process
# shard pools, psum'd selection over the global mesh, repairs through
# the process-sharded pool. Both ranks run identical host logic (SPMD)
# and must match the single-device result exactly.
q2 = rng.randint(-3, 4, size=(21, 16)).astype(np.float32)
r2 = rng.randint(-3, 4, size=(16384, 16)).astype(np.float32)
sq2, sr2, ss2 = SimilaritySearcher(r2).global_topk(q2, 700)
os.environ["VSC2022_TPU_COLLECTION"] = "pooled"
pooled = ShardedSimilaritySearcher(r2, corpus_mesh())
kappa_eff, _ = pooled._plan(21, 700)
assert pooled._collection_mode(24, kappa_eff, True) == "pooled"
hq2, hr2, hs2 = pooled.global_topk(q2, 700)
assert np.array_equal(hq2, sq2) and np.array_equal(hr2, sr2)
assert np.allclose(hs2, ss2, rtol=1e-6)
print("SEARCH RANK", jax.process_index(), "OK", flush=True)
"""


def test_two_process_sharded_search_matches_single_device():
    """Corpus-sharded retrieval over a REAL 2-process jax.distributed
    mesh (4 virtual devices per process, corpus split across all 8):
    every rank's global top-k must be bit-identical to a single-device
    searcher — the DCN scale-out story for the search index
    (reference analog: FAISS index_cpu_to_all_gpus, vsc/index.py:169)."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-c", SEARCH_WORKER, str(i), REPO,
                f"localhost:{port}",
            ],
            env={**os.environ},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"SEARCH RANK {i} OK" in out


def test_two_process_dcn_matches_single_process(
    stub_tools, video_dir, tmp_path
):
    port = _free_port()
    env = {**os.environ}
    shards = [str(tmp_path / f"shard{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            _cli_cmd(
                video_dir, stub_tools, shards[i],
                [
                    "--coordinator", f"localhost:{port}",
                    "--num_processes", "2", "--process_id", str(i),
                ],
            ),
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert "Inference succeeded" in out

    single_out = str(tmp_path / "single.npz")
    result = subprocess.run(
        _cli_cmd(video_dir, stub_tools, single_out, []),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]

    from vsc2022_tpu.inference.pipeline import merge_feature_files

    merged = str(tmp_path / "merged.npz")
    assert merge_feature_files(shards, merged) == 4

    got, want = _load_as_dict(merged), _load_as_dict(single_out)
    assert set(got) == set(want) == {f"vid{i}" for i in range(4)}
    # Round-robin shard: rank 0 owns videos 0,2; rank 1 owns 1,3.
    shard0 = set(_load_as_dict(shards[0]))
    assert shard0 == {"vid0", "vid2"}
    for vid in want:
        np.testing.assert_array_equal(got[vid].feature, want[vid].feature)
        np.testing.assert_array_equal(
            got[vid].timestamps, want[vid].timestamps
        )


def test_two_process_serving_pod_matches_single_process(tmp_path):
    """Multi-host resident serving: rank 0 speaks the client protocol
    and relays every request over --control; rank 1 executes them in
    SPMD lockstep so the corpus-mesh collectives never deadlock. The
    full lifecycle (search with matches, add, remove, error, save,
    in-band searchb) must be bit-identical to a single-process
    unsharded server over the same request sequence."""
    from vsc2022_tpu.metrics import Dataset
    from vsc2022_tpu.storage import store_features
    from vsc2022_tpu.types import VideoFeature

    def l2n(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    rng = np.random.RandomState(11)
    d = 24
    refs = [
        VideoFeature(
            video_id=i,
            timestamps=np.arange(
                n := int(rng.randint(20, 40)), dtype=np.float64
            ),
            feature=l2n(rng.randn(n, d)).astype(np.float32),
        )
        for i in range(10)
    ]
    noise = [
        VideoFeature(
            video_id=1000 + i,
            timestamps=np.arange(25, dtype=np.float64),
            feature=l2n(rng.randn(25, d)).astype(np.float32),
        )
        for i in range(6)
    ]
    queries = []
    for i in range(3):
        f = l2n(rng.randn(30, d)).astype(np.float32)
        if i < 2:
            f[10:18] = refs[i].feature[5:13]
        queries.append(
            VideoFeature(
                video_id=i, timestamps=np.arange(30, dtype=np.float64),
                feature=f,
            )
        )
    r_npz = str(tmp_path / "r.npz")
    noise_npz = str(tmp_path / "noise.npz")
    q_npz = str(tmp_path / "q.npz")
    add_npz = str(tmp_path / "add.npz")
    store_features(r_npz, refs, Dataset.REFS)
    store_features(noise_npz, noise, Dataset.REFS)
    store_features(q_npz, queries, Dataset.QUERIES)
    store_features(
        add_npz,
        [VideoFeature(
            video_id=77,
            timestamps=np.arange(20, dtype=np.float64),
            feature=l2n(
                np.random.RandomState(41).randn(20, d)
            ).astype(np.float32),
        )],
        Dataset.REFS,
    )
    with open(q_npz, "rb") as f:
        q_bytes = f.read()

    def drive(proc, tag):
        """The client request sequence; returns output file paths and
        the in-band candidate CSV bytes."""
        def req(line):
            proc.stdin.write((line + "\n").encode("utf-8"))
            proc.stdin.flush()
            return proc.stdout.readline().decode("utf-8").strip().split("\t")

        out1 = str(tmp_path / f"{tag}_1.csv")
        m1 = str(tmp_path / f"{tag}_1m.csv")
        assert req(f"{q_npz}\t{out1}\t{m1}")[0] == "ok"
        assert req(f"add\t{add_npz}")[:3] == ["ok", "added", "1"]
        assert req("remove\tR000002")[:3] == ["ok", "removed", "1"]
        # An error request must keep every rank consistent and serving.
        assert req("remove\tR999999")[0] == "error"
        out2 = str(tmp_path / f"{tag}_2.csv")
        m2 = str(tmp_path / f"{tag}_2m.csv")
        assert req(f"{q_npz}\t{out2}\t{m2}")[0] == "ok"
        # In-band search on the mutated corpus: payload bytes are
        # relayed verbatim to the followers.
        proc.stdin.write(f"searchb\t{len(q_bytes)}\n".encode("utf-8"))
        proc.stdin.write(q_bytes)
        proc.stdin.flush()
        head = proc.stdout.readline().decode("utf-8").strip().split("\t")
        assert head[0] == "okb", head
        cand_bytes = proc.stdout.read(int(head[2]))
        match_bytes = proc.stdout.read(int(head[4]))
        snap = str(tmp_path / f"{tag}_snap.npz")
        assert req(f"save\t{snap}")[:3] == ["ok", "saved", "10"]
        proc.stdin.write(b"quit\n")
        proc.stdin.flush()
        return out1, m1, out2, m2, cand_bytes, match_bytes, snap

    def spawn(extra, n_local_devices):
        env = dict(
            os.environ, VSC2022_TPU_FORCE_CPU="1",
            XLA_FLAGS=(
                "--xla_force_host_platform_device_count="
                f"{n_local_devices}"
            ),
        )
        return subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", r_npz,
             "--score_norm_features", noise_npz,
             "--matches", *extra],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, env=env, cwd=REPO,
        )

    # Oracle: one unsharded single-process server.
    oracle = spawn([], 8)
    try:
        assert oracle.stdout.readline().startswith(b"ready")
        want = drive(oracle, "single")
        assert oracle.wait(timeout=240) == 0
    finally:
        oracle.kill()

    # Pod: 2 ranks x 4 virtual devices, corpus sharded over all 8.
    coord, control = _free_port(), _free_port()
    pod_flags = [
        "--sharded", "--coordinator", f"localhost:{coord}",
        "--num_processes", "2", "--control", f"localhost:{control}",
    ]
    leader = spawn([*pod_flags, "--process_id", "0"], 4)
    follower = spawn([*pod_flags, "--process_id", "1"], 4)

    def wait_line(proc, prefix):
        # The gloo rendezvous chats on stdout; skip until the protocol
        # line arrives.
        for _ in range(50):
            line = proc.stdout.readline()
            if line.startswith(prefix):
                return
            assert line, f"EOF waiting for {prefix!r}"
        raise AssertionError(f"never saw {prefix!r}")

    try:
        wait_line(follower, b"follower")
        wait_line(leader, b"ready")
        got = drive(leader, "pod")
        assert leader.wait(timeout=240) == 0
        # quit on the leader releases the follower via the relay.
        assert follower.wait(timeout=240) == 0
    finally:
        leader.kill()
        follower.kill()

    for w, g in zip(want[:4], got[:4]):
        with open(w, "rb") as a, open(g, "rb") as b:
            assert a.read() == b.read(), (w, g)
    assert want[4] == got[4]  # in-band candidates CSV bytes
    assert want[5] == got[5]  # in-band matches CSV bytes
    pa, pb = np.load(want[6]), np.load(got[6])
    for key in ("video_ids", "features", "timestamps"):
        np.testing.assert_array_equal(pa[key], pb[key])


def test_serving_pod_follower_death_fails_fast(tmp_path):
    """Failure contract: when a follower rank dies, device requests
    must turn into error responses (executing a collective on a broken
    pod would hang the leader forever), and the leader must still exit
    cleanly on quit."""
    import signal
    import time as _time

    from vsc2022_tpu.metrics import Dataset
    from vsc2022_tpu.storage import store_features
    from vsc2022_tpu.types import VideoFeature

    rng = np.random.RandomState(5)
    d = 16
    refs = [
        VideoFeature(
            video_id=i, timestamps=np.arange(20, dtype=np.float64),
            feature=(f := rng.randn(20, d).astype(np.float32))
            / np.linalg.norm(f, axis=1, keepdims=True),
        )
        for i in range(6)
    ]
    q = rng.randn(15, d).astype(np.float32)
    queries = [
        VideoFeature(
            video_id=0, timestamps=np.arange(15, dtype=np.float64),
            feature=q / np.linalg.norm(q, axis=1, keepdims=True),
        )
    ]
    r_npz, q_npz = str(tmp_path / "r.npz"), str(tmp_path / "q.npz")
    store_features(r_npz, refs, Dataset.REFS)
    store_features(q_npz, queries, Dataset.QUERIES)

    coord, control = _free_port(), _free_port()

    def spawn(rank):
        env = dict(
            os.environ, VSC2022_TPU_FORCE_CPU="1",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        return subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", r_npz, "--sharded",
             "--coordinator", f"localhost:{coord}",
             "--num_processes", "2", "--control", f"localhost:{control}",
             "--process_id", str(rank)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, env=env, cwd=REPO,
        )

    leader, follower = spawn(0), spawn(1)

    def wait_line(proc, prefix):
        for _ in range(50):
            line = proc.stdout.readline()
            if line.startswith(prefix):
                return
            assert line, f"EOF waiting for {prefix!r}"
        raise AssertionError(f"never saw {prefix!r}")

    def req(line):
        leader.stdin.write((line + "\n").encode("utf-8"))
        leader.stdin.flush()
        return leader.stdout.readline().decode("utf-8").strip()

    try:
        wait_line(follower, b"follower")
        wait_line(leader, b"ready")
        out = str(tmp_path / "c.csv")
        assert req(f"{q_npz}\t{out}").startswith("ok\t")

        follower.send_signal(signal.SIGKILL)
        follower.wait(timeout=60)
        _time.sleep(0.5)  # let the FIN reach the leader's control conn

        first = req(f"{q_npz}\t{out}")
        assert first.startswith("error\t"), first
        assert "rank" in first and "restart" in first, first
        second = req(f"{q_npz}\t{out}")
        assert second.startswith("error\t"), second
        assert "degraded" in second, second

        leader.stdin.write(b"quit\n")
        leader.stdin.flush()
        # The leader must TERMINATE on quit (not hang in a half-pod
        # collective). Exit code is nonzero by design: jax.distributed's
        # shutdown barrier fails when a peer died, which tells a pod
        # supervisor this rank needs a restart rather than a clean end.
        leader.wait(timeout=120)
    finally:
        leader.kill()
        follower.kill()


def test_serving_pod_dns_two_stage_matches_single_process(tmp_path):
    """The DnS two-stage matching track over a 2-rank serving pod:
    the two-file request form (coarse + fine query npz) relays to the
    followers, both resident reference tables shard over the pod mesh,
    and search/add/save stay bit-identical to a single-process
    unsharded DnS server."""
    from vsc2022_tpu.metrics import Dataset
    from vsc2022_tpu.models.dns import NUM_REGIONS
    from vsc2022_tpu.storage import store_features
    from vsc2022_tpu.types import VideoFeature

    rng = np.random.RandomState(23)
    rdim = 16

    def unit_fine(n):
        x = rng.normal(size=(n, NUM_REGIONS, rdim)).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def coarse_from(fine):
        pooled = fine.mean(axis=1)
        return pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    r_fine = [unit_fine(int(rng.randint(24, 40))) for _ in range(4)]
    q_fine = [unit_fine(28) for _ in range(3)]
    q_fine[0][8:20] = r_fine[0][5:17]
    q_fine[1][2:12] = r_fine[2][10:20]

    def feats(prefix, fines):
        flat = [
            VideoFeature(
                video_id=f"{prefix}{i:06d}",
                timestamps=np.arange(f.shape[0], dtype=np.float64),
                feature=f.reshape(f.shape[0], -1),
            )
            for i, f in enumerate(fines)
        ]
        coarse = [
            VideoFeature(
                video_id=v.video_id, timestamps=v.timestamps,
                feature=coarse_from(f),
            )
            for v, f in zip(flat, fines)
        ]
        return flat, coarse

    rf, rc = feats("R", r_fine)
    qf, qc = feats("Q", q_fine)
    paths = {}
    for name, vids, ds in (
        ("rc", rc, Dataset.REFS), ("rf", rf, Dataset.REFS),
        ("qc", qc, Dataset.QUERIES), ("qf", qf, Dataset.QUERIES),
    ):
        paths[name] = str(tmp_path / f"{name}.npz")
        store_features(paths[name], vids, ds)
    nr_fine = unit_fine(14)
    nrf = VideoFeature(
        video_id="R000099",
        timestamps=np.arange(14, dtype=np.float64),
        feature=nr_fine.reshape(14, -1),
    )
    nrc = VideoFeature(
        video_id="R000099", timestamps=nrf.timestamps,
        feature=coarse_from(nr_fine),
    )
    add_c, add_f = str(tmp_path / "add_c.npz"), str(tmp_path / "add_f.npz")
    store_features(add_c, [nrc], Dataset.REFS)
    store_features(add_f, [nrf], Dataset.REFS)

    def spawn(extra, n_local_devices):
        env = dict(
            os.environ, VSC2022_TPU_FORCE_CPU="1",
            XLA_FLAGS=(
                "--xla_force_host_platform_device_count="
                f"{n_local_devices}"
            ),
        )
        return subprocess.Popen(
            [sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
             "--ref_features", paths["rc"],
             "--ref_fine_features", paths["rf"], *extra],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, env=env, cwd=REPO,
        )

    def drive(proc, tag):
        def req(line):
            proc.stdin.write((line + "\n").encode("utf-8"))
            proc.stdin.flush()
            return proc.stdout.readline().decode("utf-8").strip().split("\t")

        c1 = str(tmp_path / f"{tag}_c1.csv")
        m1 = str(tmp_path / f"{tag}_m1.csv")
        assert req(f"{paths['qc']}\t{paths['qf']}\t{c1}\t{m1}")[0] == "ok"
        assert req(f"add\t{add_c}\t{add_f}")[:3] == ["ok", "added", "1"]
        c2 = str(tmp_path / f"{tag}_c2.csv")
        m2 = str(tmp_path / f"{tag}_m2.csv")
        assert req(f"{paths['qc']}\t{paths['qf']}\t{c2}\t{m2}")[0] == "ok"
        snap_c = str(tmp_path / f"{tag}_snap_c.npz")
        snap_f = str(tmp_path / f"{tag}_snap_f.npz")
        assert req(f"save\t{snap_c}\t{snap_f}")[:3] == ["ok", "saved", "5"]
        proc.stdin.write(b"quit\n")
        proc.stdin.flush()
        return c1, m1, c2, m2, snap_c, snap_f

    oracle = spawn([], 8)
    try:
        assert oracle.stdout.readline().startswith(b"ready")
        want = drive(oracle, "single")
        assert oracle.wait(timeout=240) == 0
    finally:
        oracle.kill()

    coord, control = _free_port(), _free_port()
    pod_flags = [
        "--sharded", "--coordinator", f"localhost:{coord}",
        "--num_processes", "2", "--control", f"localhost:{control}",
    ]
    leader = spawn([*pod_flags, "--process_id", "0"], 4)
    follower = spawn([*pod_flags, "--process_id", "1"], 4)

    def wait_line(proc, prefix):
        for _ in range(50):
            line = proc.stdout.readline()
            if line.startswith(prefix):
                return
            assert line, f"EOF waiting for {prefix!r}"
        raise AssertionError(f"never saw {prefix!r}")

    try:
        wait_line(follower, b"follower")
        wait_line(leader, b"ready")
        got = drive(leader, "pod")
        assert leader.wait(timeout=240) == 0
        assert follower.wait(timeout=240) == 0
    finally:
        leader.kill()
        follower.kill()

    for w, g in zip(want[:4], got[:4]):
        with open(w, "rb") as a, open(g, "rb") as b:
            assert a.read() == b.read(), (w, g)
    for w, g in zip(want[4:], got[4:]):
        pa, pb = np.load(w), np.load(g)
        for key in ("video_ids", "features", "timestamps"):
            np.testing.assert_array_equal(pa[key], pb[key])
