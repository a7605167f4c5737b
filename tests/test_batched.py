"""Multi-stream throughput mode: monocular_run_batched must reproduce each
stream's independent monocular_run exactly (streams share nothing but the
compiled program)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu.config import DVOConfig, MapperConfig, PyramidConfig
from dvo_tpu.models.odometry import (
    monocular_init,
    monocular_init_batched,
    monocular_run,
    monocular_run_batched,
)

from test_odometry import render_sequence


def test_batched_matches_per_stream(rng):
    h, w, n, b = 48, 64, 4, 3
    cfg = DVOConfig(
        pyramid=PyramidConfig(levels=2, culls=0),
        mapper=MapperConfig(crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=16),
    )
    K = None
    seqs = []
    for s in range(b):
        step = np.array([0.01 + 0.002 * s, 0, -0.004, 0, 0.001, 0], np.float32)
        frames, depth0, K = render_sequence(rng, n + 1, h, w, step)
        seqs.append(np.stack([f[0] for f in frames]))
    grays = jnp.asarray(np.stack(seqs))                      # (B, N+1, H, W)
    masks = jnp.ones_like(grays, bool)
    Kd = jnp.asarray(K)
    key = jax.random.PRNGKey(7)

    states = monocular_init_batched(grays[:, 0], masks[:, 0], Kd, key, cfg)
    _, res_b = monocular_run_batched(states, grays[:, 1:], masks[:, 1:], Kd, cfg)
    T_b = np.asarray(res_b.T_world)                          # (B, N, 4, 4)
    assert T_b.shape == (b, n, 4, 4)

    keys = jax.random.split(key, b)
    for s in range(b):
        st = monocular_init(grays[s, 0], masks[s, 0], Kd, keys[s], cfg)
        _, res = monocular_run(st, grays[s, 1:], masks[s, 1:], Kd, cfg)
        np.testing.assert_allclose(
            T_b[s], np.asarray(res.T_world), rtol=1e-5, atol=1e-6
        )


def test_batched_per_stream_intrinsics(rng):
    """A (B, 3, 3) K batches per-stream camera intrinsics."""
    h, w, b = 48, 64, 2
    cfg = DVOConfig(
        pyramid=PyramidConfig(levels=2, culls=0),
        mapper=MapperConfig(crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=16),
    )
    step = np.array([0.01, 0, 0, 0, 0, 0], np.float32)
    frames, depth0, K = render_sequence(rng, 3, h, w, step)
    grays = jnp.asarray(np.stack([np.stack([f[0] for f in frames])] * b))
    masks = jnp.ones_like(grays, bool)
    Ks = jnp.asarray(np.stack([K, K * np.array([[1.1], [1.1], [1.0]], np.float32)]))
    states = monocular_init_batched(grays[:, 0], masks[:, 0], Ks, jax.random.PRNGKey(0), cfg)
    _, res = monocular_run_batched(states, grays[:, 1:], masks[:, 1:], Ks, cfg)
    T = np.asarray(res.T_world)
    assert T.shape == (b, 2, 4, 4) and np.isfinite(T).all()
    # Different intrinsics -> different recovered motion.
    assert not np.allclose(T[0], T[1])
