"""Mapping backend tests: keyframe policy, propagate (deterministic
scatter), regularizer, and the epipolar depth update — parity vs the scalar
oracle plus the reference's own statistical-convergence scenario
(test/update.cpp: replace true depth with noise, run epipolar updates with a
known twist, verify convergence toward ground truth — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu.config import MapperConfig
from dvo_tpu.models.frame import build_frame_with_depth
from dvo_tpu.models.history import KeyframeHistory, born_slot, push
from dvo_tpu.models.mapper import (
    depth_update,
    need_new_keyframe,
    propagate,
    regularize,
)
from dvo_tpu.ops.warp import warp_image
from dvo_tpu.utils import oracle

from test_image_ops import smooth_image


def test_keyframe_policy():
    cfg = MapperConfig()
    small = jnp.asarray([0.01, 0.0, 0.0, 0, 0, 0], jnp.float32)
    big = jnp.asarray([0.03, 0.0, 0.0, 0, 0, 0], jnp.float32)
    assert not bool(need_new_keyframe(small, 3, 0, cfg))
    assert bool(need_new_keyframe(big, 1, 0, cfg))
    assert bool(need_new_keyframe(small, 6, 0, cfg))  # MAXIMUM_FORWARD


def test_regularize_matches_oracle(rng):
    h, w = 12, 16
    depth = (1.0 + rng.random((h, w))).astype(np.float32)
    sigma = (0.1 + 0.4 * rng.random((h, w))).astype(np.float32)
    ours = np.asarray(regularize(jnp.asarray(depth), jnp.asarray(sigma)))
    ref = oracle.regularize(depth.astype(np.float64), sigma.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_regularize_smooths_outlier(rng):
    """test/regularize.cpp scenario: an outlier pixel in a smooth field is
    pulled toward its neighbours by repeated regularization.  (The outlier
    must sit inside the compatibility gate — gaussian.cpp:19-21 — to be
    fused at all; far outliers are deliberately left alone.)"""
    h, w = 20, 20
    depth = np.full((h, w), 2.0, np.float32)
    depth[10, 10] = 2.25
    sigma = np.full((h, w), 0.5, np.float32)
    d = jnp.asarray(depth)
    for _ in range(5):
        d = regularize(d, jnp.asarray(sigma))
    assert abs(float(d[10, 10]) - 2.0) < 0.25 * 0.5


def test_propagate_matches_oracle_no_collision(rng):
    """Pure-z-ish small motion: compare against the scalar oracle wherever
    exactly one source wrote (collision-free pixels)."""
    h, w = 24, 32
    depth = (1.0 + 0.5 * smooth_image(rng, h, w)).astype(np.float32)
    sigma = (0.2 + 0.1 * smooth_image(rng, h, w)).astype(np.float32)
    age = rng.integers(0, 3, (h, w)).astype(np.int32)
    K = np.array([[25.0, 0, w / 2], [0, 25.0, h / 2], [0, 0, 1]], np.float32)
    xi = np.array([0.01, -0.01, 0.02, 0, 0, 0], np.float32)

    d_j, s_j, a_j = propagate(
        jnp.asarray(depth), jnp.asarray(sigma), jnp.asarray(age), jnp.asarray(xi), jnp.asarray(K)
    )
    d_o, s_o, a_o = oracle.propagate(depth, sigma, age.astype(np.float32), xi, K.astype(np.float64))

    # Count writers per destination to find collision-free pixels.
    writers = np.zeros((h, w), np.int32)
    for yy in range(h):
        for xx in range(w):
            if abs(depth[yy, xx]) < 1e-6:
                continue
            wx, wy = oracle.warp_point(xi, xx, yy, depth[yy, xx], K.astype(np.float64))
            ix, iy = int(np.rint(wx)), int(np.rint(wy))
            if 0 <= ix < w and 0 <= iy < h:
                writers[iy, ix] += 1
    free = writers <= 1
    np.testing.assert_allclose(np.asarray(d_j)[free], d_o[free], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_j)[free], s_o[free], rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a_j)[free], a_o[free].astype(np.int32))


def test_propagate_deterministic_zbuffer(rng):
    """Collisions resolve to the nearest (min-depth) source, bit-identically
    across runs — the reference's parallel scatter cannot guarantee either
    (implement.cpp:233-252 races, SURVEY.md §5)."""
    h, w = 16, 16
    depth = (1.0 + rng.random((h, w))).astype(np.float32)
    sigma = np.full((h, w), 0.2, np.float32)
    age = np.zeros((h, w), np.int32)
    K = np.array([[4.0, 0, w / 2], [0, 4.0, h / 2], [0, 0, 1]], np.float32)  # wide: many collisions
    xi = np.array([0.05, 0.02, 0.1, 0, 0, 0], np.float32)
    args = (jnp.asarray(depth), jnp.asarray(sigma), jnp.asarray(age), jnp.asarray(xi), jnp.asarray(K))
    d1, s1, a1 = propagate(*args)
    d2, s2, a2 = propagate(*args)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def sharp_image(rng, h, w):
    """High-frequency texture: the sigma model (implement.cpp:73-104) gates
    out weak-gradient pixels, so epipolar tests need strong gradients —
    exactly the semi-dense selection the reference performs on real scenes."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(8):
        fx, fy = rng.uniform(0.3, 0.9, 2)
        ph = rng.uniform(0, 6.28, 2)
        img += rng.uniform(0.5, 1.0) * np.sin(fx * xs + ph[0]) * np.sin(fy * ys + ph[1])
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def _single_kf_setup(rng, h=60, w=80, xi_true=(-0.1, 0.0, 0.0, 0.0, 0.0, 0.0)):
    """Obj frame rendered from a textured reference with known twist; the
    born keyframe ring holds only the reference (age 0 everywhere)."""
    ref_img = sharp_image(rng, h, w)
    true_depth = (1.4 + 0.4 * smooth_image(rng, h, w)).astype(np.float32)
    K = np.array([[2.0 * w, 0, w / 2], [0, 2.0 * w, h / 2], [0, 0, 1]], np.float32)
    xi = np.asarray(xi_true, np.float32)
    obj_img, obj_mask = warp_image(
        jnp.asarray(xi), jnp.asarray(ref_img), jnp.ones((h, w), bool),
        jnp.asarray(true_depth), jnp.asarray(K),
    )
    mk = lambda img, m, d, s, fid: build_frame_with_depth(
        jnp.asarray(img), jnp.asarray(m), jnp.asarray(d), jnp.asarray(s),
        jnp.asarray(K), levels=1, culls=0, frame_id=fid,
    )
    return ref_img, true_depth, K, xi, np.asarray(obj_img), np.asarray(obj_mask), mk


def test_depth_update_converges_to_truth(rng):
    """test/update.cpp made assertable: start from noisy depth, run the
    epipolar update with the known relative pose, and require the depth
    error to shrink substantially in the observed region."""
    h, w = 60, 80
    ref_img, true_depth, K, xi, obj_img, obj_mask, mk = _single_kf_setup(rng, h, w)

    ref_frame = mk(ref_img, np.ones((h, w), bool), true_depth, np.full((h, w), 0.5, np.float32), 0)
    history = push(KeyframeHistory.create(4, h, w), ref_frame)

    noisy = np.clip(rng.normal(1.7, 0.4, (h, w)), 0.5, None).astype(np.float32)
    sigma0 = np.full((h, w), 0.5, np.float32)
    obj_frame = mk(obj_img, obj_mask, true_depth, sigma0, 1)

    # Mapper crop is specified in absolute 160x120 pixels; rescale for this
    # smaller test image.  The Engel13 sigma model with the reference
    # constants admits only strong-gradient pixels (semi-dense selection);
    # loosen the model sigmas to widen the observable set for this
    # statistical test (the parity test below runs the faithful constants).
    cfg = MapperConfig(
        crop_x=(8, 72), crop_y=(6, 54), luminance_sigma=0.25, epipolar_sigma=0.25
    )
    depth = jnp.asarray(noisy)
    sigma = jnp.asarray(sigma0)
    age = jnp.zeros((h, w), jnp.int32)
    key = jax.random.PRNGKey(0)
    obs_count = []
    for it in range(8):
        key, sub = jax.random.split(key)
        depth, sigma, age, stats = depth_update(
            obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
            depth, sigma, age, history, sub, cfg,
        )
        obs_count.append(int(stats.observed))
    assert obs_count[0] > 200, obs_count

    # Convergence is promised only where observations fused: pixels whose
    # posterior sigma dropped below the 0.5 prior.
    sigma_np = np.asarray(sigma)
    observed = sigma_np < 0.35
    assert observed.sum() > 100, observed.sum()
    err0 = np.abs(noisy - true_depth)[observed]
    errN = np.abs(np.asarray(depth) - true_depth)[observed]
    # The 1-px epipolar march quantizes depth at ~d^2/(fx*b) ~ 0.18 m here
    # (same granularity as the reference's marching, implement.cpp:120-144),
    # so full convergence saturates near that floor.
    assert np.median(errN) < 0.65 * np.median(err0), (np.median(err0), np.median(errN))
    assert np.median(errN) < 0.2, np.median(errN)


def test_depth_update_matches_oracle_samples(rng):
    """Spot-check the vectorized epipolar observation against the scalar
    oracle on a grid of pixels (same single-keyframe setup)."""
    h, w = 48, 64
    ref_img, true_depth, K, xi, obj_img, obj_mask, mk = _single_kf_setup(rng, h, w)
    ref_frame = mk(ref_img, np.ones((h, w), bool), true_depth, np.full((h, w), 0.5, np.float32), 0)
    history = push(KeyframeHistory.create(4, h, w), ref_frame)

    prior_depth = (1.6 + 0.2 * smooth_image(rng, h, w)).astype(np.float32)
    sigma0 = np.full((h, w), 0.4, np.float32)
    obj_frame = mk(obj_img, obj_mask, true_depth, sigma0, 1)
    # Loosened model sigmas so a usable share of pixels passes the gates on
    # synthetic texture; both paths use the same values.
    ls = es = 0.25
    cfg = MapperConfig(
        crop_x=(6, 58), crop_y=(6, 42), luminance_sigma=ls, epipolar_sigma=es
    )

    # Instrument: run the update and compare *fused outputs* only where the
    # oracle also accepts; mismatched gating on borderline pixels is allowed
    # at a small rate.
    key = jax.random.PRNGKey(1)
    d_out, s_out, age_out, stats = depth_update(
        obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
        jnp.asarray(prior_depth), jnp.asarray(sigma0), jnp.zeros((h, w), jnp.int32),
        history, key, cfg,
    )
    d_out = np.asarray(d_out)

    gx = oracle.gradiate(ref_img, True)
    gy = oracle.gradiate(ref_img, False)
    obj_inv = obj_img.copy()
    obj_inv[~obj_mask] = oracle.INVALID
    tz = float(xi[2])

    checked = agreed = 0
    for yy in range(8, h - 8, 2):
        for xx in range(8, w - 8, 2):
            if not (cfg.crop_x[0] <= xx <= cfg.crop_x[1] and cfg.crop_y[0] <= yy <= cfg.crop_y[1]):
                continue
            d = prior_depth[yy, xx]
            wx, wy = oracle.warp_point(xi, xx, yy, d, K.astype(np.float64))
            ox, oy = int(np.rint(wx)), int(np.rint(wy))
            if not (0 <= ox < w and 0 <= oy < h):
                continue
            # r_xi = compose(obj_xi, -born_xi); born pose is identity here.
            nd, ns = oracle.epipolar_update(
                obj_inv, ref_img, gx, gy, np.asarray(xi, np.float64), K.astype(np.float64),
                (ox, oy), d - tz, sigma0[yy, xx],
                luminance_sigma=ls, epipolar_sigma=es,
            )
            ok = 0.2 < nd < 6.0 and 0.0 < ns < 0.5
            if not ok:
                continue
            mu, sg, acc = oracle.gaussian_fuse(d - tz, sigma0[yy, xx], nd, ns)
            checked += 1
            if acc and abs(d_out[yy, xx] - mu) < 0.05:
                agreed += 1
            elif not acc:
                checked -= 1  # reset path draws random depth; skip
    assert checked >= 20, checked
    assert agreed / checked > 0.85, (agreed, checked)
