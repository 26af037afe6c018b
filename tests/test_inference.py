"""Inference pipeline tests: dataset sharding, extraction engine,
prefetch, shard merge (decode itself is gated on ffmpeg; tests use
ArrayVideoReader)."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from vsc2022_tpu.inference.pipeline import (
    DescriptorExtractor,
    VideoDataset,
    merge_feature_files,
)
from vsc2022_tpu.inference.transforms import InferenceTransforms
from vsc2022_tpu.inference.video_reader import ArrayVideoReader, FFMpegVideoReader
from vsc2022_tpu.storage import load_features, store_features
from vsc2022_tpu.types import VideoFeature


def fake_video_dir(tmpdir, names):
    for name in names:
        open(os.path.join(tmpdir, name), "wb").write(b"x")


class TestVideoDataset:
    def test_glob_sort_shard(self):
        with tempfile.TemporaryDirectory() as tmp:
            fake_video_dir(tmp, ["b.mp4", "a.mp4", "c.mp4", "d.avi"])
            ds0 = VideoDataset(
                tmp, reader_factory=None, distributed_rank=0,
                distributed_world_size=2,
            )
            ds1 = VideoDataset(
                tmp, reader_factory=None, distributed_rank=1,
                distributed_world_size=2,
            )
            # Only .mp4, sorted, round-robin sharded.
            assert [os.path.basename(v) for _, v in ds0.selected_videos] == [
                "a.mp4", "c.mp4",
            ]
            assert [os.path.basename(v) for _, v in ds1.selected_videos] == [
                "b.mp4",
            ]
            assert ds0.num_videos() + ds1.num_videos() == 3

    def test_multiple_extensions(self):
        with tempfile.TemporaryDirectory() as tmp:
            fake_video_dir(tmp, ["a.mp4", "b.avi", "c.mkv"])
            ds = VideoDataset(
                tmp, reader_factory=None, extensions=["mp4", "avi"]
            )
            assert ds.num_videos() == 2

    def test_empty_raises(self):
        with tempfile.TemporaryDirectory() as tmp:
            with pytest.raises(Exception, match="No videos"):
                VideoDataset(tmp, reader_factory=None)


class FakeFrameDataset(VideoDataset):
    """Dataset over synthetic in-memory videos."""

    def __init__(self, videos, rank=0, world=1):
        self._videos = videos  # dict name -> frames
        self.selected_videos = [
            (i, name)
            for i, name in enumerate(sorted(videos))
            if i % world == rank
        ]

    def num_videos(self):
        return len(self.selected_videos)

    def iter_decoded(self):
        for _, name in self.selected_videos:
            frames = self._videos[name]
            reader = ArrayVideoReader(frames)
            decoded, ts = [], []
            for start, end, frame in reader.frames():
                decoded.append(frame)
                ts.append((start, end))
            yield name, np.stack(decoded), np.asarray(ts)


def mean_color_model(variables, images):
    """Tiny stand-in descriptor: per-channel mean (deterministic)."""
    return jnp.mean(images, axis=(1, 2))


class TestDescriptorExtractor:
    def make_videos(self, rng, n=3):
        return {
            f"v{i:03d}": (rng.rand(int(rng.randint(3, 9)), 32, 48, 3) * 255)
            .astype(np.uint8)
            for i in range(n)
        }

    def test_extract_shapes_and_timestamps(self):
        rng = np.random.RandomState(0)
        videos = self.make_videos(rng)
        ds = FakeFrameDataset(videos)
        extractor = DescriptorExtractor(
            mean_color_model, {}, InferenceTransforms.RESIZE_224_SQUARE,
            batch_size=4,
        )
        feats = list(extractor.extract(ds))
        assert len(feats) == 3
        for vf in feats:
            n = videos[vf.video_id].shape[0]
            assert vf.feature.shape == (n, 3)
            np.testing.assert_allclose(vf.timestamps[:, 0], np.arange(n))
            np.testing.assert_allclose(vf.timestamps[:, 1], np.arange(n) + 1)

    def test_batch_padding_does_not_change_results(self):
        rng = np.random.RandomState(1)
        videos = self.make_videos(rng, n=2)
        ds = FakeFrameDataset(videos)
        outs = {}
        for batch_size in (3, 64):
            extractor = DescriptorExtractor(
                mean_color_model, {}, InferenceTransforms.RESIZE_224_SQUARE,
                batch_size=batch_size,
            )
            outs[batch_size] = {
                vf.video_id: vf.feature
                for vf in extractor.extract(FakeFrameDataset(videos))
            }
        for vid in outs[3]:
            np.testing.assert_allclose(
                outs[3][vid], outs[64][vid], rtol=1e-5, atol=1e-6
            )

    def test_bf16_compute_close_to_f32(self):
        rng = np.random.RandomState(4)
        videos = self.make_videos(rng, n=2)
        outs = {}
        for dtype in ("float32", "bfloat16"):
            extractor = DescriptorExtractor(
                mean_color_model, {}, InferenceTransforms.RESIZE_224_SQUARE,
                batch_size=4, compute_dtype=dtype,
            )
            outs[dtype] = {
                vf.video_id: vf.feature
                for vf in extractor.extract(FakeFrameDataset(videos))
            }
        for vid in outs["float32"]:
            assert outs["bfloat16"][vid].dtype == np.float32
            np.testing.assert_allclose(
                outs["bfloat16"][vid], outs["float32"][vid],
                rtol=2e-2, atol=2e-2,
            )

    def test_store_fp16(self):
        rng = np.random.RandomState(2)
        ds = FakeFrameDataset(self.make_videos(rng, n=1))
        extractor = DescriptorExtractor(
            mean_color_model, {}, InferenceTransforms.RESIZE_224_SQUARE,
            batch_size=4,
        )
        feats = list(extractor.extract(ds, store_fp16=True))
        assert feats[0].feature.dtype == np.float16


class TestShardMerge:
    def test_merge_feature_files(self):
        rng = np.random.RandomState(3)
        with tempfile.TemporaryDirectory() as tmp:
            shards = []
            for rank in range(3):
                vfs = [
                    VideoFeature(
                        video_id=f"Q{rank * 10 + i:06d}",
                        timestamps=np.arange(4, dtype=np.float64),
                        feature=rng.randn(4, 8).astype(np.float32),
                    )
                    for i in range(2)
                ]
                path = os.path.join(tmp, f"{rank}.npz")
                store_features(path, vfs)
                shards.append(path)
            out = os.path.join(tmp, "merged.npz")
            num = merge_feature_files(shards, out)
            assert num == 6
            assert len(load_features(out)) == 6


class TestFFmpegGate:
    def test_missing_ffmpeg_clear_error(self):
        with pytest.raises(RuntimeError, match="ffmpeg binary not found"):
            FFMpegVideoReader("/tmp/x.mp4", 1.0, ffmpeg_path="/nonexistent/ffmpeg")


class TestMultiHost:
    """Multi-host DCN wiring (reference analog: the manually-assigned
    --distributed_rank/size mode, vsc/baseline/inference.py:95-99)."""

    def test_initialize_distributed_single_process_noop(self, monkeypatch):
        import jax

        from vsc2022_tpu.parallel.mesh import initialize_distributed

        def boom(**kwargs):
            raise AssertionError("jax.distributed.initialize called")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        # num_processes <= 1 (or unset) must never touch jax.distributed.
        initialize_distributed(None, None, None)
        initialize_distributed("10.0.0.1:8476", 1, 0)

    def make_args(self, cli, **overrides):
        args = cli.parser.parse_args(
            ["--output_file", "/tmp/out.npz", "--dataset_path", "/tmp/ds"]
        )
        for key, value in overrides.items():
            setattr(args, key, value)
        return args

    def test_cli_routes_through_distributed_init(self, monkeypatch, tmp_path):
        from vsc2022_tpu.inference import cli
        from vsc2022_tpu.parallel import mesh

        calls = {}
        monkeypatch.setattr(
            mesh,
            "initialize_distributed",
            lambda coord, n, pid: calls.setdefault("init", (coord, n, pid)),
        )
        monkeypatch.setattr(
            cli,
            "worker_process",
            lambda args, rank, size, out: calls.setdefault(
                "worker", (rank, size, out)
            ),
        )
        out = str(tmp_path / "h1.npz")
        args = self.make_args(
            cli, output_file=out, coordinator="c:1234",
            num_processes=4, process_id=1,
        )
        cli.main(args)
        assert calls["init"] == ("c:1234", 4, 1)
        assert calls["worker"] == (1, 4, out)

    def test_cli_rejects_mixed_distribution_schemes(self):
        from vsc2022_tpu.inference import cli

        args = self.make_args(cli, num_processes=2, distributed_size=2)
        with pytest.raises(Exception, match="one distribution scheme"):
            cli.main(args)
