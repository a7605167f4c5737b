"""Live/streaming capture mode (reference USE_CAMERA, main.cpp:10,26-30):
frames written into a directory by a concurrent producer are consumed and
odometrized as they appear (utils/stream.py)."""

import os
import threading
import time

import numpy as np
import pytest

from dvo_tpu.config import DVOConfig, PyramidConfig
from dvo_tpu.utils.stream import run_stream, watch_directory


def _frames(n, h=48, w=64):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.4 * np.sin(0.3 * xs) * np.sin(0.4 * ys)
    return [np.roll(base, i, axis=1).astype(np.float32) for i in range(n)]


def test_watch_directory_sees_late_files(tmp_path):
    from PIL import Image

    d = tmp_path / "cap"
    d.mkdir()
    frames = _frames(6)

    def write(i):
        arr = (frames[i] * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:04d}.png")

    write(0)

    def producer():
        for i in range(1, 6):
            time.sleep(0.12)
            write(i)

    t = threading.Thread(target=producer)
    t.start()
    got = list(watch_directory(str(d), poll_s=0.02, idle_timeout_s=1.5))
    t.join()
    assert [os.path.basename(p) for p in got] == [f"{i:04d}.png" for i in range(6)]


def test_watch_directory_idle_timeout(tmp_path):
    t0 = time.monotonic()
    got = list(watch_directory(str(tmp_path), poll_s=0.02, idle_timeout_s=0.3))
    assert got == []
    assert time.monotonic() - t0 < 2.0


def test_run_stream_live_producer(tmp_path):
    """End-to-end: producer thread drops PNGs while run_stream consumes —
    every frame lands in the trajectory, which is appended live."""
    from PIL import Image

    class Calib:
        K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
        distortion = None

    d = tmp_path / "cap"
    d.mkdir()
    frames = _frames(5)

    def write(i):
        Image.fromarray((frames[i] * 255).astype(np.uint8)).save(d / f"{i:04d}.png")

    write(0)
    write(1)

    def producer():
        for i in range(2, 5):
            time.sleep(0.3)
            write(i)

    cfg = DVOConfig(pyramid=PyramidConfig(levels=2, culls=0))
    traj = tmp_path / "live.txt"
    t = threading.Thread(target=producer)
    t.start()
    seen = []
    ts, poses, secs = run_stream(
        watch_directory(str(d), poll_s=0.02, idle_timeout_s=3.0),
        Calib(), cfg, undistort=False,
        on_pose=lambda i, T: seen.append(i),
        trajectory_out=str(traj),
    )
    t.join()
    assert poses.shape == (5, 4, 4)
    assert np.all(np.isfinite(poses))
    assert seen == list(range(5))
    lines = traj.read_text().strip().splitlines()
    assert len(lines) == 5 and len(lines[0].split()) == 8


def test_run_stream_accepts_arrays():
    """Arrays (an in-process camera) work as well as paths."""

    class Calib:
        K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
        distortion = None

    cfg = DVOConfig(pyramid=PyramidConfig(levels=2, culls=0))
    ts, poses, secs = run_stream(iter(_frames(3)), Calib(), cfg, undistort=False)
    assert poses.shape == (3, 4, 4)
    assert np.all(np.isfinite(poses))


# ---------------------------------------------------------------- recorder

def test_record_mono_roundtrip(tmp_path):
    """record() writes the logicool-layout dataset (record.cpp:21-54's
    output contract) and InfoSequence reads it back bit-for-bit."""
    from dvo_tpu.utils.datasets import InfoSequence
    from dvo_tpu.utils.record import record
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (24, 32), dtype=np.uint8) for _ in range(4)]
    out = str(tmp_path / "recorded")
    n = record(iter(frames), out)
    assert n == 4
    seq = list(InfoSequence(os.path.join(out, "info.txt")))
    assert len(seq) == 4
    for item, orig in zip(seq, frames):
        got = np.asarray(Image.open(item.gray_path).convert("L"))
        np.testing.assert_array_equal(got, orig)


def test_record_rgbd_roundtrip(tmp_path):
    """record_rgbd() writes the kinectv2 two-column layout; depth survives
    the 16-bit 1/5000 m encoding to within half a count."""
    from dvo_tpu.utils.datasets import InfoSequence
    from dvo_tpu.utils.record import DEPTH_SCALE, record_rgbd
    from PIL import Image

    rng = np.random.default_rng(1)
    pairs = [
        (
            rng.random((16, 20), dtype=np.float32),
            rng.uniform(0.5, 4.0, (16, 20)).astype(np.float32),
        )
        for _ in range(3)
    ]
    out = str(tmp_path / "recorded_rgbd")
    assert record_rgbd(iter(pairs), out) == 3
    seq = list(InfoSequence(os.path.join(out, "info.txt")))
    assert len(seq) == 3 and seq[0].depth_path is not None
    for item, (gray, depth) in zip(seq, pairs):
        d = np.asarray(Image.open(item.depth_path), np.float32) / DEPTH_SCALE
        np.testing.assert_allclose(d, depth, atol=0.5 / DEPTH_SCALE + 1e-7)


def test_record_stream_rerecords_live_directory(tmp_path):
    """record_stream consumes the watch_directory producer convention and
    emits a numbered dataset — the record.cpp camera-loop equivalent."""
    from dvo_tpu.utils.record import record_stream
    from PIL import Image

    src = tmp_path / "live"
    src.mkdir()
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (12, 16), dtype=np.uint8) for _ in range(3)]
    for i, im in enumerate(imgs):
        Image.fromarray(im, "L").save(str(src / f"frame_{i:03d}.png"))
    out = str(tmp_path / "rec")
    n = record_stream(str(src), out, idle_timeout_s=0.5)
    assert n == 3
    got = np.asarray(Image.open(os.path.join(out, "0001.png")).convert("L"))
    np.testing.assert_array_equal(got, imgs[1])
