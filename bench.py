"""Benchmark: full per-frame VO pipeline throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Baseline: the reference budgets 200 ms/frame for tracking alone on its
exhibition laptop (src/track/tracker.cpp:18,68-73) with mapping on top, i.e.
<= 5 frames/s end-to-end (SURVEY.md §6).  BASELINE.json's north star is
>= 10x on one TPU v5e chip.

Headline metric: the COMPLETE monocular frame (reference main.cpp path at
its native 640x480 input) — frame build (cull pyramid + gradients),
coarse-to-fine GN tracking, keyframe policy + epipolar depth mapping or
propagate, and regularization.  Frames run as one ``lax.scan`` device
program per 24-frame chunk (models/odometry.monocular_run) with the
host->device chunk transfer inside the timed region; the reported number is
the MEDIAN over 5 timed repetitions (the first post-warmup dispatch is
reliably ~30% slow — host page faults on the chunk buffer).  Real frames
from the reference's logicool0 dataset when available, synthetic otherwise.

``extra`` reports the second operating point (RGB-D tracking at the
reference's 512x424 Kinect input, system.hpp:30,82), GN iterations/s, the
8-stream batched throughput mode (monocular_run_batched), and which tracker
backend was measured (the resolved TrackerConfig.backend — "pallas" on TPU,
chosen by fetch-synced measurement; see bench_probe.py).

Timing honesty: every timed region ends with utils.metrics.device_sync — a
one-element device->host fetch — because ``jax.block_until_ready`` has been
observed returning before remote execution completes on tunneled PJRT
backends, which silently turns a throughput bench into a dispatch bench.
"""

import json
import os
import time

import numpy as np

from dvo_tpu.utils.metrics import device_sync

REFERENCE_FPS = 5.0  # 200 ms/frame tracking budget, tracker.cpp:18

DATA = "/root/reference/data/logicool0"


def _synth(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.zeros((h, w), np.float32)
    for _ in range(8):
        fx, fy = rng.uniform(0.05, 0.5, 2)
        ph = rng.uniform(0, 6.28, 2)
        base += rng.uniform(0.3, 1.0) * np.sin(fx * xs + ph[0]) * np.sin(fy * ys + ph[1])
    base = (base - base.min()) / (base.max() - base.min())
    return [np.roll(base, i, axis=1) for i in range(n)]


def _load_frames(n):
    """Frames as uint8 [0, 255]: the pipeline normalizes on device
    (models/frame._normalize_gray), so the bench ships 4x fewer bytes per
    chunk — exactly what a production feeder would do."""
    if os.path.isdir(DATA):
        try:
            from PIL import Image

            frames = []
            for i in range(n):
                p = os.path.join(DATA, f"{i:04d}.png")
                frames.append(np.asarray(Image.open(p).convert("L"), np.uint8))
            return frames, np.array(
                [[780.0, 0, 378], [0, 796.0, 220], [0, 0, 1]], np.float32
            )
        except Exception:
            pass
    h, w = 480, 640
    return [np.clip(f * 255.0, 0, 255).astype(np.uint8) for f in _synth(h, w, n)], np.array(
        [[600.0, 0, w / 2], [0, 600.0, h / 2], [0, 0, 1]], np.float32
    )


def bench_monocular(reps=5, chunk=24):
    import jax
    import jax.numpy as jnp

    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    cfg = DVOConfig.monocular()
    frames, K = _load_frames(2 * chunk + 1)
    h, w = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((h, w), bool)
    masks = jnp.ones((chunk, h, w), bool)
    chunks = [np.stack(frames[1 + i * chunk : 1 + (i + 1) * chunk]) for i in range(2)]

    state = monocular_init(jnp.asarray(frames[0]), mask, Kd, jax.random.PRNGKey(0), cfg)
    # Warmup compiles the scanned step (both mapper branches are cond arms).
    state, res = monocular_run(state, jnp.asarray(chunks[0]), masks, Kd, cfg)
    device_sync(res.T_world)

    fps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, res = monocular_run(state, jnp.asarray(chunks[1]), masks, Kd, cfg)
        device_sync(res.T_world)
        fps.append(chunk / (time.perf_counter() - t0))
    med = float(np.median(fps))
    # The program evaluates every GN iteration (convergence is masked).
    gn_iters = cfg.tracker.max_iterations * cfg.pyramid.levels
    from dvo_tpu.config import resolve_backend

    return med, med * gn_iters, resolve_backend(cfg.tracker.backend)


def bench_batched(reps=3, chunk=24, streams=8):
    """Multi-stream throughput mode: B independent monocular pipelines
    vmapped into one device program (models/odometry.monocular_run_batched).
    The per-stream arrays are too small to fill the MXU; batching is the
    TPU-native way to serve many cameras per chip.  Returns aggregate
    frames/s across all streams."""
    import jax
    import jax.numpy as jnp

    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import monocular_init_batched, monocular_run_batched

    cfg = DVOConfig.monocular()
    frames, K = _load_frames(chunk + 1)
    h, w = frames[0].shape
    # Streams differ by a deterministic circular shift so no two pipelines
    # see identical inputs (keyframe cadences diverge).
    base = np.stack(frames)                                  # (N+1, H, W)
    grays = np.stack([np.roll(base, 3 * s, axis=2) for s in range(streams)])
    Kd = jnp.asarray(K)
    masks = jnp.ones((streams, chunk, h, w), bool)

    states = monocular_init_batched(
        jnp.asarray(grays[:, 0]), masks[:, 0], Kd, jax.random.PRNGKey(0), cfg
    )
    _, res = monocular_run_batched(states, jnp.asarray(grays[:, 1:]), masks, Kd, cfg)
    device_sync(res.T_world)
    fps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, res = monocular_run_batched(states, jnp.asarray(grays[:, 1:]), masks, Kd, cfg)
        device_sync(res.T_world)
        fps.append(streams * chunk / (time.perf_counter() - t0))
    return float(np.median(fps)), streams


def bench_rgbd(reps=5, chunk=16):
    import jax
    import jax.numpy as jnp

    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import rgbd_init, rgbd_run

    cfg = DVOConfig.rgbd()
    h, w = 424, 512  # Kinect v2 depth-camera frame (system.hpp:30,82)
    frames = _synth(h, w, chunk + 1, seed=2)
    depth = np.full((h, w), 1.6, np.float32)
    sigma = np.full((h, w), 0.1, np.float32)
    K = jnp.asarray([[365.0, 0, w / 2], [0, 365.0, h / 2], [0, 0, 1]], jnp.float32)
    mask = jnp.ones((h, w), bool)

    state = rgbd_init(
        jnp.asarray(frames[0]), mask, jnp.asarray(depth), jnp.asarray(sigma), K, cfg
    )
    grays = np.stack(frames[1:])
    masks = jnp.ones((chunk, h, w), bool)
    depths = jnp.broadcast_to(jnp.asarray(depth), (chunk, h, w))
    sigmas = jnp.broadcast_to(jnp.asarray(sigma), (chunk, h, w))

    _, res = rgbd_run(state, jnp.asarray(grays), masks, depths, sigmas, K, cfg)
    device_sync(res.T_world)
    fps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, res = rgbd_run(state, jnp.asarray(grays), masks, depths, sigmas, K, cfg)
        device_sync(res.T_world)
        fps.append(chunk / (time.perf_counter() - t0))
    return float(np.median(fps))


def main():
    mono_fps, gn_iters_per_s, backend = bench_monocular()
    rgbd_fps = bench_rgbd()
    batched_fps, streams = bench_batched()
    print(json.dumps({
        "metric": "full_pipeline_fps_per_chip",
        "value": round(mono_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(mono_fps / REFERENCE_FPS, 2),
        "extra": {
            "rgbd_tracking_fps_512x424": round(rgbd_fps, 2),
            "gn_iters_per_s": round(gn_iters_per_s, 1),
            f"batched_{streams}stream_agg_fps": round(batched_fps, 2),
            "tracker_backend": backend,
            "reps": "median of 5 (batched: 3)",
            "sync": "device->host fetch (block_until_ready unreliable on tunneled backends)",
        },
    }))


if __name__ == "__main__":
    main()
