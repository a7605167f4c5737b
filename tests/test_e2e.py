"""End-to-end: synthetic RGB-D sequence with ground truth -> sequence driver
-> TUM trajectory file -> ATE within bound.  This is the full BASELINE
config-2 loop made assertable without network access to TUM data."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dvo_tpu import lie
from dvo_tpu.config import DVOConfig, PyramidConfig, TrackerConfig
from dvo_tpu.models.odometry import rgbd_init, rgbd_step
from dvo_tpu.utils.trajectory import ate_rmse, read_tum, write_tum

from test_odometry import render_sequence


def test_rgbd_sequence_ate(tmp_path, rng):
    h, w = 96, 128
    n = 10
    step = np.array([0.006, -0.003, 0.004, 0.0012, -0.0008, 0.001], np.float32)
    frames, depth0, K = render_sequence(rng, n, h, w, step)
    sigma = np.full((h, w), 0.1, np.float32)
    cfg = DVOConfig(pyramid=PyramidConfig(levels=3, culls=0),
                    tracker=TrackerConfig(min_residual=0.0))

    state = rgbd_init(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
        jnp.asarray(depth0), jnp.asarray(sigma), jnp.asarray(K), cfg
    )
    poses = [np.eye(4, dtype=np.float32)]
    gt = [np.eye(4)]
    xi = np.zeros(6, np.float32)
    for k in range(1, n):
        img, mask = frames[k]
        dk = depth0 - k * step[2]
        state, res = rgbd_step(
            state, jnp.asarray(img), jnp.asarray(mask),
            jnp.asarray(dk), jnp.asarray(sigma), jnp.asarray(K), cfg
        )
        poses.append(np.asarray(res.T_world))
        xi = np.asarray(lie.compose(jnp.asarray(xi), jnp.asarray(step)))
        # Ground truth in the framework's own pose convention: T_world is
        # the accumulated tracked twist (exp of the warp twist the frame was
        # rendered with).
        gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))

    ts = np.arange(float(n))
    est_path = str(tmp_path / "est.txt")
    gt_path = str(tmp_path / "gt.txt")
    write_tum(est_path, ts, poses)
    write_tum(gt_path, ts, gt)

    et, exyz = read_tum(est_path)
    gt_t, gxyz = read_tum(gt_path)
    err = ate_rmse(et, exyz, gt_t, gxyz)
    # Cumulative motion ~ 7 cm/axis over 10 frames; demand mm-level ATE.
    assert err < 0.005, err
