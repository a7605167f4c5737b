"""Checkpoint/resume + metrics tests: VO state round-trips bit-exact through
.npz and a resumed run continues identically to an uninterrupted one."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu.config import DVOConfig
from dvo_tpu.models.odometry import monocular_init, monocular_step
from dvo_tpu.utils.checkpoint import load_state, save_state
from dvo_tpu.utils.metrics import MetricsLogger, Timer

from test_image_ops import smooth_image


def _run(state, frames, K, cfg):
    results = []
    for g in frames:
        state, res = monocular_step(state, g, jnp.ones(g.shape, bool), K, cfg)
        results.append(np.asarray(res.T_world))
    return state, results


def _setup(rng, n=5, h=48, w=64):
    base = smooth_image(rng, h, w)
    frames = [jnp.asarray(np.roll(base, i, axis=1).astype(np.float32)) for i in range(n)]
    K = jnp.asarray([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]], jnp.float32)
    cfg = DVOConfig.monocular()
    import dataclasses

    cfg = dataclasses.replace(cfg, pyramid=dataclasses.replace(cfg.pyramid, culls=0, levels=2))
    return frames, K, cfg


def test_checkpoint_roundtrip(rng, tmp_path):
    frames, K, cfg = _setup(rng)
    state = monocular_init(frames[0], jnp.ones(frames[0].shape, bool), K,
                           jax.random.PRNGKey(0), cfg)
    state, _ = _run(state, frames[1:3], K, cfg)

    path = str(tmp_path / "vo.npz")
    save_state(path, state)
    template = monocular_init(frames[0], jnp.ones(frames[0].shape, bool), K,
                              jax.random.PRNGKey(0), cfg)
    loaded = load_state(path, template)

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(state)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))


def test_resume_continues_identically(rng, tmp_path):
    frames, K, cfg = _setup(rng, n=6)
    mask = jnp.ones(frames[0].shape, bool)
    s0 = monocular_init(frames[0], mask, K, jax.random.PRNGKey(0), cfg)

    # Uninterrupted run.
    s_full, res_full = _run(s0, frames[1:], K, cfg)

    # Run 2 frames, checkpoint, reload, run the rest.
    s_half, res_a = _run(s0, frames[1:3], K, cfg)
    path = str(tmp_path / "vo.npz")
    save_state(path, s_half)
    s_resumed = load_state(path, s0)
    _, res_b = _run(s_resumed, frames[3:], K, cfg)

    for a, b in zip(res_full, res_a + res_b):
        np.testing.assert_array_equal(a, b)


def test_metrics_jsonl(rng, tmp_path):
    frames, K, cfg = _setup(rng, n=4)
    mask = jnp.ones(frames[0].shape, bool)
    state = monocular_init(frames[0], mask, K, jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "metrics.jsonl")
    logger = MetricsLogger(path)
    for i, g in enumerate(frames[1:]):
        with Timer() as t:
            state, res = monocular_step(state, g, mask, K, cfg)
        logger.log_frame(res, t.ms / 1e3, float(i))
    logger.close()

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    for rec in lines:
        assert set(rec) >= {
            "frame", "ms", "keyframe", "xi", "gn_iters",
            "map_observed", "map_accepted", "map_rejected",
        }
        assert len(rec["xi"]) == 6
        assert all(i >= 0 for i in rec["gn_iters"])


def test_metrics_noop():
    logger = MetricsLogger(None)
    logger.log(a=1)
    logger.close()
