"""Full-sequence drivers: run a dataset through the VO pipeline, emit a
TUM-format trajectory (the reference only draws its trajectory live,
main.cpp:49-54; we write files so ATE can be evaluated)."""

from __future__ import annotations

import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu.config import DVOConfig
from dvo_tpu.utils.metrics import device_sync
from dvo_tpu.models.odometry import (
    monocular_init,
    monocular_init_with_depth,
    monocular_step,
    rgbd_init,
    rgbd_step,
)
from dvo_tpu.utils.datasets import (
    Calibration,
    KinectCalibration,
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


def _image_stream(paths, scale, srcmap, loaders=()):
    """Yield (image f32, valid bool) per path, decoding (+undistorting) on
    the native C++ prefetch threads when ``libdvonative.so`` is available
    (dvo_tpu.native, reference src/core/loader.cpp's threaded role) so the
    main thread overlaps decode with device work.  Falls back to the
    PIL/NumPy path per file otherwise.  ``loaders`` collects the live
    PrefetchLoader so callers can close it."""
    try:
        from dvo_tpu import native

        loader = native.PrefetchLoader(
            list(paths), scale, map_xy=srcmap, border=0.0,
            threads=max(2, os.cpu_count() or 2),
        )
    except Exception:
        loader = None
    if loader is not None:
        if isinstance(loaders, list):
            loaders.append(loader)
        for _idx, img, valid in loader:
            yield img, valid
        return
    from dvo_tpu.utils.datasets import _decode_gray

    for p in paths:
        img = _decode_gray(p) * scale
        if srcmap is not None:
            img, valid = remap_nearest(img, srcmap, border=0.0)
        else:
            valid = np.ones_like(img, bool)
        yield img.astype(np.float32), valid


def run_monocular(
    sequence,
    calib: Calibration,
    cfg: DVOConfig = DVOConfig.monocular(),
    seed: int = 0,
    max_frames: Optional[int] = None,
    undistort: bool = True,
    verbose: bool = False,
    metrics=None,
    checkpoint_out: Optional[str] = None,
    gallery_out: Optional[str] = None,
    pose_graph: bool = False,
):
    """Monocular VO over a sequence.  Returns (timestamps, poses (N,4,4),
    per-frame seconds).  ``metrics``: utils.metrics.MetricsLogger for JSONL
    per-frame records; ``checkpoint_out``: path to save the final device
    state (utils.checkpoint); ``gallery_out``: PNG path for the final
    keyframe-ring gallery (the reference's SHOW_KEYFRAME panel);
    ``pose_graph``: harvest odometry/BA/loop-closure constraints during the
    run and globally refine the keyframe trajectory at sequence end
    (models/posegraph.py) — the returned poses are then the refined ones."""
    srcmap = build_undistort_map(calib) if undistort and calib.distortion is not None else None
    K = jnp.asarray(calib.K)
    items = list(sequence)[:max_frames]
    loaders: list = []
    stream = _image_stream(
        [it.gray_path for it in items], 1 / 255.0, srcmap, loaders=loaders
    )
    gray, mask = next(stream)
    state = monocular_init(
        jnp.asarray(gray), jnp.asarray(mask), K, jax.random.PRNGKey(seed), cfg
    )
    harvester = None
    if pose_graph:
        from dvo_tpu.models.posegraph import PoseGraphHarvester

        harvester = PoseGraphHarvester(cfg, np.asarray(calib.K), verbose=verbose)
    poses = [np.eye(4, dtype=np.float32)]
    times = [items[0].timestamp]
    secs = []
    for fi, item in enumerate(items[1:], start=1):
        gray, mask = next(stream)
        t0 = time.perf_counter()
        state, res = monocular_step(state, jnp.asarray(gray), jnp.asarray(mask), K, cfg)
        device_sync(res.T_world)
        secs.append(time.perf_counter() - t0)
        poses.append(np.asarray(res.T_world))
        times.append(item.timestamp)
        if harvester is not None:
            harvester.on_frame(fi, res, state, gray, mask)
        if metrics is not None:
            metrics.log_frame(res, secs[-1], item.timestamp)
        if verbose:
            print(
                f"frame {int(state.frame_count)-1:4d} kf={bool(res.is_keyframe)} "
                f"acc={int(res.mapping.accepted):5d} {secs[-1]*1e3:7.1f} ms"
            )
    pose_arr = np.stack(poses)
    if harvester is not None:
        pose_arr, pg_costs = harvester.finalize(np.asarray(times), pose_arr, state)
        if verbose and pg_costs.size:
            print(
                f"pose-graph: {len(harvester.nodes)} nodes, "
                f"{len(harvester.e_w)} edges ({harvester.closures} closures), "
                f"cost {pg_costs[0]:.3e} -> {pg_costs[-1]:.3e}"
            )
    if checkpoint_out:
        from dvo_tpu.utils.checkpoint import save_state

        save_state(checkpoint_out, state)
    if gallery_out:
        from dvo_tpu.utils.viz import keyframe_gallery, save_png

        save_png(gallery_out, keyframe_gallery(state.history))
    for ld in loaders:
        ld.close()
    return np.asarray(times), pose_arr, np.asarray(secs)


def run_rgbd(
    sequence,
    calib: Calibration,
    cfg: DVOConfig = DVOConfig.rgbd(),
    depth_sigma: float = 0.1,
    max_frames: Optional[int] = None,
    undistort: bool = True,
    verbose: bool = False,
    metrics=None,
):
    """RGB-D frame-to-frame tracking (odometrizeUsingDepth mode).  Depth
    pixels with no measurement get sigma 1.0, valid ones ``depth_sigma``
    (transform.cpp:74 convention).  Returns (timestamps, poses, secs)."""
    from dvo_tpu.utils.datasets import TUM_DEPTH_SCALE

    srcmap = build_undistort_map(calib) if undistort and calib.distortion is not None else None
    K = jnp.asarray(calib.K)
    items = list(sequence)[:max_frames]
    loaders: list = []
    gray_stream = _image_stream(
        [it.gray_path for it in items], 1 / 255.0, srcmap, loaders=loaders
    )
    depth_stream = _image_stream(
        [it.depth_path for it in items], 1.0 / TUM_DEPTH_SCALE, srcmap,
        loaders=loaders,
    )

    def prep(_item):
        gray, mask = next(gray_stream)
        depth, _dmask = next(depth_stream)
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
        device_sync(res.T_world)
        secs.append(time.perf_counter() - t0)
        poses.append(np.asarray(res.T_world))
        times.append(item.timestamp)
        if metrics is not None:
            metrics.log_frame(res, secs[-1], item.timestamp)
        if verbose:
            print(f"frame {int(state.frame_count)-1:4d} {secs[-1]*1e3:7.1f} ms")
    for ld in loaders:
        ld.close()
    return np.asarray(times), np.stack(poses), np.asarray(secs)


def run_kinect(
    sequence,
    kcalib: KinectCalibration = None,
    cfg: DVOConfig = None,
    mode: str = "mono",
    max_frames: Optional[int] = None,
    undistort: bool = True,
    verbose: bool = False,
    metrics=None,
):
    """Kinect v2 dual-camera pipeline (reference KinectLoader::getMappedImages,
    loader.cpp:90-101 + test/kinect-vo.cpp): undistort color and depth with
    their own intrinsics, register the color image into the depth camera's
    frame via the extrinsic (``map_depth_to_gray``), then run VO at depth
    resolution with the depth camera's K.

    ``mode="mono"``: full pipeline seeded with the first frame's measured
    depth (kinect-vo.cpp).  ``mode="rgbd"``: frame-to-frame tracking with
    measured depth every frame (test/sequence.cpp).

    The registration is part of the jitted device program — the host only
    decodes and undistorts.
    """
    from dvo_tpu.ops.warp import map_depth_to_gray

    if kcalib is None:
        kcalib = KinectCalibration.kinect_v2()
    if cfg is None:
        cfg = DVOConfig.rgbd() if mode == "rgbd" else DVOConfig.monocular()
    rgb_map = (
        build_undistort_map(kcalib.rgb)
        if undistort and kcalib.rgb.distortion is not None
        else None
    )
    depth_map = (
        build_undistort_map(kcalib.depth)
        if undistort and kcalib.depth.distortion is not None
        else None
    )
    rgb_K = jnp.asarray(kcalib.rgb.K)
    depth_K = jnp.asarray(kcalib.depth.K)
    invT = jnp.asarray(kcalib.invT)

    @jax.jit
    def register(gray, gray_mask, depth):
        return map_depth_to_gray(depth, gray, gray_mask, rgb_K, depth_K, invT)

    def prep(item):
        gray = load_gray_normalized(item.gray_path)
        depth = load_depth_meters(item.depth_path)
        if rgb_map is not None:
            gray, gmask = remap_nearest(gray, rgb_map, border=0.0)
        else:
            gmask = np.ones_like(gray, bool)
        if depth_map is not None:
            depth, _ = remap_nearest(depth, depth_map, border=0.0)
        mapped, mask, sigma = register(
            jnp.asarray(gray.astype(np.float32)),
            jnp.asarray(gmask),
            jnp.asarray(depth.astype(np.float32)),
        )
        return mapped, mask, jnp.asarray(depth.astype(np.float32)), sigma

    items = list(sequence)[:max_frames]
    mapped, mask, depth, sigma = prep(items[0])
    poses = [np.eye(4, dtype=np.float32)]
    times = [items[0].timestamp]
    secs = []

    if mode == "rgbd":
        state = rgbd_init(mapped, mask, depth, sigma, depth_K, cfg)
        for item in items[1:]:
            mapped, mask, depth, sigma = prep(item)
            t0 = time.perf_counter()
            state, res = rgbd_step(state, mapped, mask, depth, sigma, depth_K, cfg)
            device_sync(res.T_world)
            secs.append(time.perf_counter() - t0)
            poses.append(np.asarray(res.T_world))
            times.append(item.timestamp)
            if metrics is not None:
                metrics.log_frame(res, secs[-1], item.timestamp)
            if verbose:
                print(f"frame {int(state.frame_count)-1:4d} {secs[-1]*1e3:7.1f} ms")
    else:
        state = monocular_init_with_depth(
            mapped, mask, depth, sigma, depth_K, jax.random.PRNGKey(0), cfg
        )
        for item in items[1:]:
            mapped, mask, _, _ = prep(item)
            t0 = time.perf_counter()
            state, res = monocular_step(state, mapped, mask, depth_K, cfg)
            device_sync(res.T_world)
            secs.append(time.perf_counter() - t0)
            poses.append(np.asarray(res.T_world))
            times.append(item.timestamp)
            if metrics is not None:
                metrics.log_frame(res, secs[-1], item.timestamp)
            if verbose:
                print(
                    f"frame {int(state.frame_count)-1:4d} kf={bool(res.is_keyframe)} "
                    f"{secs[-1]*1e3:7.1f} ms"
                )
    return np.asarray(times), np.stack(poses), np.asarray(secs)
