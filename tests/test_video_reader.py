"""FFmpeg pipe-reader test using stub ffmpeg/ffprobe executables that
emit deterministic raw RGB frames — exercises the real subprocess +
pipe-framing path without a real ffmpeg install."""

import os
import stat

import pytest

from vsc2022_tpu.inference.video_reader import FFMpegVideoReader

W, H, FRAMES = 16, 8, 5


def write_stub(path, content):
    with open(path, "w") as f:
        f.write(content)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture()
def stub_tools(tmp_path):
    ffprobe = tmp_path / "ffprobe"
    write_stub(
        str(ffprobe),
        "#!/bin/bash\n"
        f'echo \'{{"streams": [{{"width": {W}, "height": {H}}}]}}\'\n',
    )
    ffmpeg = tmp_path / "ffmpeg"
    # Emit FRAMES frames; frame i is filled with byte value i.
    write_stub(
        str(ffmpeg),
        "#!/usr/bin/env python3\n"
        "import sys\n"
        f"w, h, n = {W}, {H}, {FRAMES}\n"
        "for i in range(n):\n"
        "    sys.stdout.buffer.write(bytes([i]) * (w * h * 3))\n",
    )
    return str(ffmpeg), str(ffprobe)


class TestFFmpegPipeReader:
    def test_frames_and_timestamps(self, stub_tools, tmp_path):
        ffmpeg, ffprobe = stub_tools
        video = tmp_path / "v.mp4"
        video.write_bytes(b"")
        reader = FFMpegVideoReader(
            str(video), required_fps=2.0, ffmpeg_path=ffmpeg,
            ffprobe_path=ffprobe,
        )
        frames = list(reader.frames())
        assert len(frames) == FRAMES
        for i, (start, end, frame) in enumerate(frames):
            assert start == pytest.approx(i / 2.0)
            assert end == pytest.approx((i + 1) / 2.0)
            assert frame.shape == (H, W, 3)
            assert (frame == i).all()

    def test_reference_compat_timestamps(self, stub_tools, tmp_path):
        # With the compat flag, frame spans are 1 s regardless of fps
        # (the reference reader's hardcoded behavior;
        # vsc/baseline/video_reader/ffmpeg_video_reader.py:47-54).
        ffmpeg, ffprobe = stub_tools
        video = tmp_path / "v.mp4"
        video.write_bytes(b"")
        reader = FFMpegVideoReader(
            str(video), required_fps=2.0, ffmpeg_path=ffmpeg,
            ffprobe_path=ffprobe, reference_compat_timestamps=True,
        )
        spans = [(s, e) for s, e, _ in reader.frames()]
        assert spans == [(float(i), float(i + 1)) for i in range(FRAMES)]

    def test_truncated_stream_stops_cleanly(self, stub_tools, tmp_path):
        ffmpeg, ffprobe = stub_tools
        # Stub that emits 1.5 frames: the partial frame must be dropped.
        trunc = tmp_path / "ffmpeg_trunc"
        write_stub(
            str(trunc),
            "#!/usr/bin/env python3\n"
            "import sys\n"
            f"sys.stdout.buffer.write(b'x' * ({W * H * 3} + 100))\n",
        )
        video = tmp_path / "v.mp4"
        video.write_bytes(b"")
        reader = FFMpegVideoReader(
            str(video), required_fps=1.0, ffmpeg_path=str(trunc),
            ffprobe_path=ffprobe,
        )
        frames = list(reader.frames())
        assert len(frames) == 1
