"""Windowed BA wired into the VO pipeline (BAConfig.enabled): refined
poses/depths must flow back into the keyframe ring, the reference keyframe,
and the emitted trajectory (VERDICT round-1 item 1; hook point mirrors the
reference's keyframe-creation path, src/map/mapper.cpp:16-33)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu import lie
from dvo_tpu.config import BAConfig, DVOConfig, MapperConfig, PyramidConfig
from dvo_tpu.models.odometry import monocular_init_with_depth, monocular_step

from test_odometry import render_sequence


def _run_pipeline(frames, depth0, K, cfg, depth_noise, rng):
    """Run the monocular pipeline seeded with noisy measured depth.
    Returns (poses (N,4,4), ba_costs list, state)."""
    h, w = depth0.shape
    noisy = (depth0 + depth_noise * rng.standard_normal((h, w))).astype(np.float32)
    noisy = np.maximum(noisy, 0.3)
    sigma = np.full((h, w), 0.2, np.float32)
    state = monocular_init_with_depth(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
        jnp.asarray(noisy), jnp.asarray(sigma), jnp.asarray(K),
        jax.random.PRNGKey(0), cfg,
    )
    poses = [np.eye(4, dtype=np.float32)]
    costs = []
    for k in range(1, len(frames)):
        state, res = monocular_step(
            state, jnp.asarray(frames[k][0]), jnp.asarray(frames[k][1]),
            jnp.asarray(K), cfg,
        )
        poses.append(np.asarray(res.T_world))
        c = float(np.asarray(res.ba_cost))
        if c >= 0:
            costs.append(c)
    return np.stack(poses), costs, state


def _gt_positions(n, step):
    xs = [np.zeros(3, np.float32)]
    xi = np.zeros(6, np.float32)
    for _ in range(n - 1):
        xi = np.asarray(lie.compose(jnp.asarray(xi), jnp.asarray(step)))
        xs.append(np.asarray(lie.se3_exp(jnp.asarray(xi)))[:3, 3])
    return np.stack(xs)


def test_ba_in_pipeline_runs_and_improves(rng):
    """BA-on must (a) actually run (ba_cost emitted on keyframe promotions),
    (b) not degrade — and with noisy initial depth, improve — trajectory
    error vs BA-off, and (c) emit BA-refined keyframe poses into the
    trajectory."""
    h, w = 96, 128
    step = np.array([0.012, 0.0, -0.006, 0.0, 0.0015, 0.0], np.float32)
    frames, depth0, K = render_sequence(rng, 13, h, w, step)
    # max_forward=3 forces a regular keyframe cadence (promotion every 3
    # frames) so BA fires deterministically regardless of tracked norms.
    base_cfg = DVOConfig(
        pyramid=PyramidConfig(levels=2, culls=0),
        mapper=MapperConfig(crop_x=(12, 116), crop_y=(10, 86), max_forward=3),
    )
    cfg_off = base_cfg
    cfg_on = dataclasses.replace(
        base_cfg, ba=BAConfig(enabled=True, window=3, iterations=3)
    )

    noise_rng = np.random.default_rng(42)
    noise = noise_rng.standard_normal((h, w))  # shared across both runs

    class _FixedNoise:
        def standard_normal(self, shape):
            return noise

    poses_off, costs_off, _ = _run_pipeline(
        frames, depth0, K, cfg_off, 0.25, _FixedNoise()
    )
    poses_on, costs_on, state_on = _run_pipeline(
        frames, depth0, K, cfg_on, 0.25, _FixedNoise()
    )

    assert costs_off == []            # BA never runs when disabled
    assert len(costs_on) >= 2, costs_on   # ran on several promotions
    assert all(np.isfinite(c) for c in costs_on)

    gt = _gt_positions(len(frames), step)
    err_off = np.sqrt(np.mean(np.sum((poses_off[:, :3, 3] - gt) ** 2, axis=1)))
    err_on = np.sqrt(np.mean(np.sum((poses_on[:, :3, 3] - gt) ** 2, axis=1)))
    assert np.isfinite(err_on) and np.isfinite(err_off)
    # BA must not blow up the trajectory; with noisy depth it should help.
    assert err_on <= err_off * 1.10, (err_on, err_off)

    # Refined poses actually flow: some keyframe pose differs between runs.
    assert not np.allclose(poses_on, poses_off)


def test_refresh_head_and_write_back(rng):
    """Ring-maintenance helpers used by the BA hook: refresh_head puts the
    ref keyframe's current maps into its slot; write_back lands refined
    xi/depth at the window slots."""
    import dataclasses as dc

    from dvo_tpu.models.frame import build_frame_with_depth, with_depth
    from dvo_tpu.models.history import (
        KeyframeHistory, push, refresh_head, write_back,
    )
    from dvo_tpu.models.ba import window_slots

    h, w = 16, 24
    K = jnp.asarray([[30.0, 0, 12], [0, 30.0, 8], [0, 0, 1]], jnp.float32)

    def mk(fid, fill):
        return build_frame_with_depth(
            jnp.full((h, w), 0.5, jnp.float32), jnp.ones((h, w), bool),
            jnp.full((h, w), fill, jnp.float32), jnp.full((h, w), 0.1, jnp.float32),
            K, levels=1, culls=0, frame_id=fid,
        )

    hist = KeyframeHistory.create(4, h, w)
    for i in range(3):
        hist = push(hist, mk(i, 1.0 + i))

    # Evolve keyframe 2's depth after its push, then refresh.
    evolved = with_depth(mk(2, 3.0), jnp.full((h, w), 9.0, jnp.float32))
    evolved = dc.replace(evolved, xi=jnp.full(6, 0.25, jnp.float32))
    hist2 = refresh_head(hist, evolved)
    head = int(np.asarray(hist2.head))
    np.testing.assert_allclose(np.asarray(hist2.depth[head]), 9.0)
    np.testing.assert_allclose(np.asarray(hist2.xi[head]), 0.25)
    # Other slots untouched.
    np.testing.assert_allclose(np.asarray(hist2.depth[(head - 1) % 4]), 2.0)

    # write_back lands at window_slots (oldest-first).
    slots = window_slots(hist2, 2)
    xi_new = jnp.stack([jnp.full(6, 0.5), jnp.full(6, 0.75)]).astype(jnp.float32)
    d_new = jnp.stack([
        jnp.full((h, w), 11.0, jnp.float32), jnp.full((h, w), 12.0, jnp.float32)
    ])
    hist3 = write_back(hist2, slots, xi_new, d_new)
    np.testing.assert_allclose(np.asarray(hist3.xi[slots[1]]), 0.75)   # newest
    np.testing.assert_allclose(np.asarray(hist3.depth[slots[0]]), 11.0)  # older
    np.testing.assert_allclose(np.asarray(hist3.depth[(head - 2) % 4]), 1.0)
