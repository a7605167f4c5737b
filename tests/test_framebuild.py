"""Parity tests for the fused Pallas frame-build kernel
(ops/pallas/framebuild.py) against the XLA build it replaces
(models.frame._pyramid / ops.image) — run in interpret mode on the CPU
mesh, exact equality expected (one-hot HIGHEST contractions are copies)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvo_tpu.ops.image import cull_image, gradients
from dvo_tpu.ops.pallas.framebuild import (
    build_pyramid_planes,
    cull_pyramid_one,
    cull_pyramid_pair,
)


@pytest.fixture
def planes_rng():
    return np.random.default_rng(7)


def _inputs(rng, h, w, holes=True):
    gray = rng.random((h, w), np.float32)
    mask = np.ones((h, w), bool)
    if holes:
        mask[rng.random((h, w)) < 0.07] = False
    depth = (rng.random((h, w), np.float32) * 3 + 0.3).astype(np.float32)
    sigma = (rng.random((h, w), np.float32) * 0.4 + 0.05).astype(np.float32)
    return gray, mask, depth, sigma


@pytest.mark.parametrize("h,w,levels", [(120, 160, 3), (212, 256, 4),
                                        (53, 61, 2)])
def test_fused_build_matches_xla(planes_rng, h, w, levels):
    gray, mask, depth, sigma = _inputs(planes_rng, h, w)
    out = build_pyramid_planes(
        jnp.asarray(gray), jnp.asarray(mask), jnp.asarray(depth),
        jnp.asarray(sigma), levels, interpret=True,
    )
    assert len(out) == levels
    for i, p in enumerate(out):
        t = levels - 1 - i
        g_ref = cull_image(jnp.asarray(gray), t)
        m_ref = cull_image(jnp.asarray(mask), t)
        d_ref = cull_image(jnp.asarray(depth), t)
        s_ref = cull_image(jnp.asarray(sigma), t)
        gx_ref, gy_ref, mx, my = gradients(g_ref, m_ref)
        np.testing.assert_array_equal(np.asarray(p["gray"]), np.asarray(g_ref))
        np.testing.assert_array_equal(np.asarray(p["mask"]), np.asarray(m_ref))
        np.testing.assert_array_equal(np.asarray(p["depth"]), np.asarray(d_ref))
        np.testing.assert_array_equal(np.asarray(p["sigma"]), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(p["gx"]), np.asarray(gx_ref))
        np.testing.assert_array_equal(np.asarray(p["gy"]), np.asarray(gy_ref))
        np.testing.assert_array_equal(
            np.asarray(p["gmask"]), np.asarray(mx & my)
        )


def test_fused_cull_pair_matches_xla(planes_rng):
    _, _, depth, sigma = _inputs(planes_rng, 120, 160)
    pairs = cull_pyramid_pair(
        jnp.asarray(depth), jnp.asarray(sigma), 3, interpret=True
    )
    for i, (d, s) in enumerate(pairs):
        t = 3 - 1 - i
        np.testing.assert_array_equal(
            np.asarray(d), np.asarray(cull_image(jnp.asarray(depth), t))
        )
        np.testing.assert_array_equal(
            np.asarray(s), np.asarray(cull_image(jnp.asarray(sigma), t))
        )


def test_fused_cull_one_matches_xla(planes_rng):
    _, _, depth, _ = _inputs(planes_rng, 106, 128)
    outs = cull_pyramid_one(jnp.asarray(depth), 4, interpret=True)
    for i, d in enumerate(outs):
        t = 4 - 1 - i
        np.testing.assert_array_equal(
            np.asarray(d), np.asarray(cull_image(jnp.asarray(depth), t))
        )
