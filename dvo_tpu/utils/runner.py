"""Full-sequence drivers: run a dataset through the VO pipeline, emit a
TUM-format trajectory (the reference only draws its trajectory live,
main.cpp:49-54; we write files so ATE can be evaluated)."""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu.config import DVOConfig
from dvo_tpu.models.odometry import (
    monocular_init,
    monocular_step,
    rgbd_init,
    rgbd_step,
)
from dvo_tpu.utils.datasets import (
    Calibration,
    build_undistort_map,
    load_depth_meters,
    load_gray_normalized,
    remap_nearest,
)


def _prep_gray(item, calib, srcmap):
    gray = load_gray_normalized(item.gray_path)
    if srcmap is not None:
        gray, mask = remap_nearest(gray, srcmap, border=0.0)
    else:
        mask = np.ones_like(gray, bool)
    return gray.astype(np.float32), mask


def run_monocular(
    sequence,
    calib: Calibration,
    cfg: DVOConfig = DVOConfig.monocular(),
    seed: int = 0,
    max_frames: Optional[int] = None,
    undistort: bool = True,
    verbose: bool = False,
):
    """Monocular VO over a sequence.  Returns (timestamps, poses (N,4,4),
    per-frame seconds)."""
    srcmap = build_undistort_map(calib) if undistort and calib.distortion is not None else None
    K = jnp.asarray(calib.K)
    items = list(sequence)[:max_frames]
    gray, mask = _prep_gray(items[0], calib, srcmap)
    state = monocular_init(
        jnp.asarray(gray), jnp.asarray(mask), K, jax.random.PRNGKey(seed), cfg
    )
    poses = [np.eye(4, dtype=np.float32)]
    times = [items[0].timestamp]
    secs = []
    for item in items[1:]:
        gray, mask = _prep_gray(item, calib, srcmap)
        t0 = time.perf_counter()
        state, res = monocular_step(state, jnp.asarray(gray), jnp.asarray(mask), K, cfg)
        jax.block_until_ready(res.T_world)
        secs.append(time.perf_counter() - t0)
        poses.append(np.asarray(res.T_world))
        times.append(item.timestamp)
        if verbose:
            print(
                f"frame {int(state.frame_count)-1:4d} kf={bool(res.is_keyframe)} "
                f"acc={int(res.mapping.accepted):5d} {secs[-1]*1e3:7.1f} ms"
            )
    return np.asarray(times), np.stack(poses), np.asarray(secs)


def run_rgbd(
    sequence,
    calib: Calibration,
    cfg: DVOConfig = DVOConfig.rgbd(),
    depth_sigma: float = 0.1,
    max_frames: Optional[int] = None,
    undistort: bool = True,
    verbose: bool = False,
):
    """RGB-D frame-to-frame tracking (odometrizeUsingDepth mode).  Depth
    pixels with no measurement get sigma 1.0, valid ones ``depth_sigma``
    (transform.cpp:74 convention).  Returns (timestamps, poses, secs)."""
    srcmap = build_undistort_map(calib) if undistort and calib.distortion is not None else None
    K = jnp.asarray(calib.K)
    items = list(sequence)[:max_frames]

    def prep(item):
        gray, mask = _prep_gray(item, calib, srcmap)
        depth = load_depth_meters(item.depth_path)
        if srcmap is not None:
            depth, dmask = remap_nearest(depth, srcmap, border=0.0)
        valid = depth > 1e-6
        sigma = np.where(valid, depth_sigma, 1.0).astype(np.float32)
        return gray, mask, depth.astype(np.float32), sigma

    gray, mask, depth, sigma = prep(items[0])
    state = rgbd_init(
        jnp.asarray(gray), jnp.asarray(mask), jnp.asarray(depth), jnp.asarray(sigma), K, cfg
    )
    poses = [np.eye(4, dtype=np.float32)]
    times = [items[0].timestamp]
    secs = []
    for item in items[1:]:
        gray, mask, depth, sigma = prep(item)
        t0 = time.perf_counter()
        state, res = rgbd_step(
            state, jnp.asarray(gray), jnp.asarray(mask),
            jnp.asarray(depth), jnp.asarray(sigma), K, cfg,
        )
        jax.block_until_ready(res.T_world)
        secs.append(time.perf_counter() - t0)
        poses.append(np.asarray(res.T_world))
        times.append(item.timestamp)
        if verbose:
            print(f"frame {int(state.frame_count)-1:4d} {secs[-1]*1e3:7.1f} ms")
    return np.asarray(times), np.stack(poses), np.asarray(secs)
