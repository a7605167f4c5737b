"""Benchmark: full per-frame VO pipeline throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference budgets 200 ms/frame for tracking alone on its
exhibition laptop (src/track/tracker.cpp:18,68-73) with mapping on top, i.e.
<= 5 frames/s end-to-end (SURVEY.md §6).  BASELINE.json's north star is
>= 10x on one TPU v5e chip.

The benchmarked step is the COMPLETE monocular frame (reference main.cpp
path at its native 640x480 input): frame build (cull pyramid + gradients),
coarse-to-fine GN tracking, keyframe policy + epipolar depth mapping or
propagate, and regularization.  Frames run as one ``lax.scan`` device
program per 24-frame chunk (models/odometry.monocular_run) with the
host->device chunk transfer inside the timed region.  Real frames from the
reference's logicool0 dataset when available, synthetic otherwise.
"""

import json
import os
import time

import numpy as np

REFERENCE_FPS = 5.0  # 200 ms/frame tracking budget, tracker.cpp:18

DATA = "/root/reference/data/logicool0"


def _load_frames(n):
    frames = []
    if os.path.isdir(DATA):
        try:
            from PIL import Image

            for i in range(n):
                p = os.path.join(DATA, f"{i:04d}.png")
                frames.append(np.asarray(Image.open(p).convert("L"), np.float32) / 255.0)
            return frames, np.array(
                [[780.0, 0, 378], [0, 796.0, 220], [0, 0, 1]], np.float32
            )
        except Exception:
            frames = []
    rng = np.random.default_rng(0)
    h, w = 480, 640
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.zeros((h, w), np.float32)
    for _ in range(8):
        fx, fy = rng.uniform(0.05, 0.5, 2)
        ph = rng.uniform(0, 6.28, 2)
        base += rng.uniform(0.3, 1.0) * np.sin(fx * xs + ph[0]) * np.sin(fy * ys + ph[1])
    base = (base - base.min()) / (base.max() - base.min())
    frames = [np.roll(base, i, axis=1) for i in range(n)]
    return frames, np.array([[600.0, 0, w / 2], [0, 600.0, h / 2], [0, 0, 1]], np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    cfg = DVOConfig.monocular()
    chunk = 24
    frames, K = _load_frames(2 * chunk + 1)
    h, w = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((h, w), bool)
    masks = jnp.ones((chunk, h, w), bool)
    # Host->device transfer is part of the measured path: frames arrive as
    # stacked numpy chunks, the whole chunk runs as one lax.scan device
    # program (models/odometry.monocular_run).
    chunks = [
        np.stack(frames[1 + i * chunk : 1 + (i + 1) * chunk]) for i in range(2)
    ]

    state = monocular_init(jnp.asarray(frames[0]), mask, Kd, jax.random.PRNGKey(0), cfg)
    # Warmup: compiles the scanned step (both mapper branches are cond arms).
    state, res = monocular_run(state, jnp.asarray(chunks[0]), masks, Kd, cfg)
    jax.block_until_ready(res.T_world)

    t0 = time.perf_counter()
    state, res = monocular_run(state, jnp.asarray(chunks[1]), masks, Kd, cfg)
    jax.block_until_ready(res.T_world)
    dt = time.perf_counter() - t0
    fps = chunk / dt

    print(json.dumps({
        "metric": "full_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
