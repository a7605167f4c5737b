"""Photometric GN tracking tests.

Covers: one linearization vs the scalar oracle (the reference's
``Track::optimize``), full coarse-to-fine convergence to a known twist on
synthetic frames (the behavioral spec of test/track.cpp, SURVEY.md §3.5),
and determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dvo_tpu.config import TrackerConfig
from dvo_tpu.models.frame import build_frame_with_depth
from dvo_tpu.models.tracker import gn_normal_equations, gn_solve, track
from dvo_tpu.ops.warp import warp_image
from dvo_tpu.utils import oracle

from test_image_ops import smooth_image


def make_pair(rng, h=60, w=80, xi_true=(0.02, -0.01, 0.015, 0.002, -0.003, 0.004)):
    """Reference frame + observed frame rendered by inverse-warping the
    reference with the known twist: the GN optimum is exactly xi_true."""
    ref_img = smooth_image(rng, h, w)
    depth = 1.5 + 0.3 * smooth_image(rng, h, w)
    sigma = np.full((h, w), 0.1, np.float32)
    K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]], np.float32)
    xi = jnp.asarray(np.asarray(xi_true, np.float32))
    obj_img, obj_mask = warp_image(
        xi, jnp.asarray(ref_img), jnp.ones((h, w), bool), jnp.asarray(depth), jnp.asarray(K)
    )
    obj_img = np.asarray(obj_img)
    obj_mask = np.asarray(obj_mask)
    # Fill unobserved pixels with the reference image so masks stay dense
    # (the oracle marks them INVALID; both paths then gate identically).
    return ref_img, depth, sigma, K, obj_img, obj_mask, np.asarray(xi_true, np.float32)


def test_gn_step_matches_oracle(rng):
    ref_img, depth, sigma, K, obj_img, obj_mask, xi_true = make_pair(rng, 40, 52)
    frame_kwargs = dict(levels=1, culls=0, frame_id=0)
    obj = build_frame_with_depth(
        jnp.asarray(obj_img), jnp.asarray(obj_mask), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), **frame_kwargs
    ).scenes[0]
    ref = build_frame_with_depth(
        jnp.asarray(ref_img), jnp.ones_like(jnp.asarray(ref_img), bool),
        jnp.asarray(depth), jnp.asarray(sigma), jnp.asarray(K), **frame_kwargs
    ).scenes[0]

    # compat mode: reproduce the reference's B-only weighting exactly
    cfg = TrackerConfig(damping=0.0, compat_weight_b_only=True)
    xi0 = jnp.zeros(6)
    Hm, g, rsum, count = gn_normal_equations(obj, ref, xi0, level_index=0, cfg=cfg)
    delta = np.asarray(gn_solve(Hm, g, count, damping=1e-8))

    # Oracle: full (N, 6) lstsq solve of the same system.
    obj_inv = obj_img.copy()
    obj_inv[~obj_mask] = oracle.INVALID
    gx = oracle.gradiate(ref_img, True)
    gy = oracle.gradiate(ref_img, False)
    upd_ref, res_ref, n_ref = oracle.optimize(
        obj_inv, ref_img, depth, sigma, gx, gy, np.zeros(6), K.astype(np.float64), level=0
    )

    assert abs(int(count) - n_ref) <= max(3, 0.01 * n_ref)  # border-pixel ties
    mean_res = float(rsum) / max(int(count), 1)
    np.testing.assert_allclose(mean_res, res_ref, rtol=0.02)
    # Same normal equations => same update direction (lstsq == normal eqs
    # for full-rank J); tolerance absorbs f32 accumulation + border pixels.
    np.testing.assert_allclose(delta, upd_ref, rtol=0.05, atol=2e-4)


def test_track_converges_to_known_xi(rng):
    h, w = 120, 160
    ref_img, depth, sigma, K, obj_img, obj_mask, xi_true = make_pair(rng, h, w)
    obj = build_frame_with_depth(
        jnp.asarray(obj_img), jnp.asarray(obj_mask), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=3, culls=0, frame_id=1
    )
    ref = build_frame_with_depth(
        jnp.asarray(ref_img), jnp.ones((h, w), bool), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=3, culls=0, frame_id=0
    )
    # A perfectly-rendered pair reaches the reference's 5e-3 mean-residual
    # stop after a single iteration while still ~10% off; disable that stop
    # here to test full convergence (real images never hit it this early).
    cfg = TrackerConfig(min_residual=0.0)
    result = jax.jit(track, static_argnames="cfg")(obj, ref, cfg)
    xi = np.asarray(result.xi)
    err_t = np.linalg.norm(xi[:3] - xi_true[:3])
    err_r = np.linalg.norm(xi[3:] - xi_true[3:])
    assert err_t < 5e-4, (xi, xi_true)
    assert err_r < 5e-4, (xi, xi_true)


def test_track_identity_pair(rng):
    """Tracking a frame against itself must return ~zero twist."""
    h, w = 60, 80
    img = smooth_image(rng, h, w)
    depth = np.full((h, w), 2.0, np.float32)
    sigma = np.full((h, w), 0.1, np.float32)
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]], np.float32)
    f = build_frame_with_depth(
        jnp.asarray(img), jnp.ones((h, w), bool), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=2, culls=0, frame_id=0
    )
    res = track(f, f, TrackerConfig())
    assert np.linalg.norm(np.asarray(res.xi)) < 1e-5


def test_track_deterministic(rng):
    """Same inputs => bit-identical twist (the reference cannot pass this:
    its forEach accumulation races, SURVEY.md §5)."""
    ref_img, depth, sigma, K, obj_img, obj_mask, _ = make_pair(rng, 48, 64)
    mk = lambda img, mask, fid: build_frame_with_depth(
        jnp.asarray(img), jnp.asarray(mask), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=2, culls=0, frame_id=fid
    )
    obj = mk(obj_img, obj_mask, 1)
    ref = mk(ref_img, np.ones_like(obj_mask), 0)
    a = np.asarray(track(obj, ref).xi)
    b = np.asarray(track(obj, ref).xi)
    np.testing.assert_array_equal(a, b)


def test_early_exit_matches_masked_scan(rng):
    """The while_loop early-exit driver and the fixed-length masked scan are
    the same algorithm: identical xi, per-iteration stats, iteration counts."""
    h, w = 60, 80
    ref_img, depth, sigma, K, obj_img, obj_mask, _ = make_pair(rng, h, w)
    obj = build_frame_with_depth(
        jnp.asarray(obj_img), jnp.asarray(obj_mask), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=2, culls=0, frame_id=1
    )
    ref = build_frame_with_depth(
        jnp.asarray(ref_img), jnp.ones((h, w), bool), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=2, culls=0, frame_id=0
    )
    r_we = jax.jit(lambda o, r: track(o, r, TrackerConfig(early_exit=True)))(obj, ref)
    r_ms = jax.jit(lambda o, r: track(o, r, TrackerConfig(early_exit=False)))(obj, ref)
    np.testing.assert_allclose(np.asarray(r_we.xi), np.asarray(r_ms.xi), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(r_we.iterations), np.asarray(r_ms.iterations))
    np.testing.assert_allclose(
        np.asarray(r_we.residuals), np.asarray(r_ms.residuals), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(r_we.valid_counts), np.asarray(r_ms.valid_counts))
    # And some iterations must actually have been skipped for the early exit
    # to be worth anything on this easy pair.
    assert int(np.asarray(r_we.iterations).sum()) < 2 * TrackerConfig().max_iterations


def test_early_exit_vmaps(rng):
    """vmap of the while_loop driver (the batched multi-stream mode) runs to
    the slowest lane but must produce each lane's own converged xi."""
    h, w = 48, 64
    frames = []
    for s in range(2):
        xi_true = (0.01 + 0.01 * s, -0.005, 0.0, 0.0, 0.002, 0.0)
        ref_img, depth, sigma, K, obj_img, obj_mask, _ = make_pair(rng, h, w, xi_true)
        obj = build_frame_with_depth(
            jnp.asarray(obj_img), jnp.asarray(obj_mask), jnp.asarray(depth),
            jnp.asarray(sigma), jnp.asarray(K), levels=2, culls=0, frame_id=1
        )
        ref = build_frame_with_depth(
            jnp.asarray(ref_img), jnp.ones((h, w), bool), jnp.asarray(depth),
            jnp.asarray(sigma), jnp.asarray(K), levels=2, culls=0, frame_id=0
        )
        frames.append((obj, ref))
    objs = jax.tree.map(lambda *xs: jnp.stack(xs), *[f[0] for f in frames])
    refs = jax.tree.map(lambda *xs: jnp.stack(xs), *[f[1] for f in frames])
    cfg = TrackerConfig(early_exit=True)
    xi_b = jax.jit(jax.vmap(lambda o, r: track(o, r, cfg).xi))(objs, refs)
    for s, (obj, ref) in enumerate(frames):
        xi_s = track(obj, ref, cfg).xi
        np.testing.assert_allclose(
            np.asarray(xi_b[s]), np.asarray(xi_s), rtol=1e-5, atol=1e-6
        )
