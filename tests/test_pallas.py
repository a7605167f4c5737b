"""Pallas GN kernel parity tests (interpret mode on the CPU mesh; the real
TPU run is exercised by the verify drive and bench)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvo_tpu import lie
from dvo_tpu.config import TrackerConfig
from dvo_tpu.models.frame import build_frame_with_depth
from dvo_tpu.models.tracker import gn_normal_equations, track
from dvo_tpu.ops.pallas.gn import gn_terms_pallas

from test_image_ops import smooth_image


def _scenes(rng, h=24, w=32):
    img = smooth_image(rng, h, w)
    depth = (1.5 + 0.3 * smooth_image(rng, h, w)).astype(np.float32)
    sigma = np.full((h, w), 0.1, np.float32)
    K = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]], np.float32)
    mk = lambda im, fid: build_frame_with_depth(
        jnp.asarray(im), jnp.ones((h, w), bool), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=1, culls=0, frame_id=fid,
    )
    return mk(np.roll(img, 1, axis=1), 1).scenes[0], mk(img, 0).scenes[0]


def test_pallas_gn_matches_xla(rng):
    obj, ref = _scenes(rng)
    cfg = TrackerConfig(pallas_precision="f32")  # exact-parity mode
    xi = jnp.asarray([0.004, -0.002, 0.001, 0.001, -0.0005, 0.0015], jnp.float32)
    H1, g1, r1, c1 = gn_normal_equations(obj, ref, xi, 0, cfg)
    H2, g2, r2, c2 = gn_terms_pallas(
        obj.gray, obj.mask, ref.depth, ref.sigma,
        ref.gray, ref.mask, ref.gx, ref.gy, ref.gmask,
        ref.K, lie.se3_exp(-xi), 0, cfg, interpret=True,
    )
    # Interior masks are dense here, so the clamp-vs-fallback border
    # difference cannot bite: counts must agree exactly.
    assert int(c1) == int(c2)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(r2), float(r1), rtol=1e-5)


def test_pallas_gn_bf16_close_to_f32(rng):
    """Precision-mode contract: "high" (the default — a manual bf16x3
    split, 3 MXU passes: hi.hi + hi.lo + lo.hi with f32 accumulate) keeps
    ~2^-16 relative sample accuracy, so its GN step tracks the exact f32
    mode to ~1e-3; "bf16" (one pass over quantized inputs, ~2^-9 samples)
    stays within a few percent on a single GN step — the measured
    quantization bias that makes it opt-in rather than the default
    (config.py note)."""
    from dvo_tpu.models.tracker import gn_solve

    obj, ref = _scenes(rng)
    xi = jnp.asarray([0.004, -0.002, 0.001, 0.001, -0.0005, 0.0015], jnp.float32)
    out = {}
    for prec in ("f32", "high", "bf16"):
        cfg = TrackerConfig(pallas_precision=prec)
        H, g, r, c = gn_terms_pallas(
            obj.gray, obj.mask, ref.depth, ref.sigma,
            ref.gray, ref.mask, ref.gx, ref.gy, ref.gmask,
            ref.K, lie.se3_exp(-xi), 0, cfg, interpret=True,
        )
        out[prec] = (np.asarray(H), np.asarray(g),
                     np.asarray(gn_solve(H, g, c, cfg.damping)), int(c))
    assert out["f32"][3] == out["high"][3] == out["bf16"][3]
    step_f32 = out["f32"][2]
    # "high": bf16x3 split — ~2^-16 relative per sampled intensity; the
    # 6x6 solve amplifies by the system's conditioning.
    np.testing.assert_allclose(out["high"][0], out["f32"][0], rtol=1e-4)
    np.testing.assert_allclose(out["high"][2], step_f32, rtol=2e-3, atol=1e-7)
    # "bf16": quantized inputs — bounded but visible step deviation.
    np.testing.assert_allclose(out["bf16"][0], out["f32"][0], rtol=2e-2)
    assert np.linalg.norm(out["bf16"][2] - step_f32) < 0.08 * np.linalg.norm(step_f32) + 1e-6


def test_pallas_gn_windowed_gather_matches_exact(rng):
    """gather_window=32 at a 64-row image: with a small warp every point's
    corners fall inside the mean-centred window, so the windowed gather
    must reproduce the exact full-image gather bit-for-bit."""
    obj, ref = _scenes(rng, h=64, w=32)
    xi = jnp.asarray([0.004, -0.002, 0.001, 0.001, -0.0005, 0.0015], jnp.float32)
    out = {}
    for gw in (0, 32):
        cfg = TrackerConfig(pallas_precision="f32", gather_window=gw)
        out[gw] = gn_terms_pallas(
            obj.gray, obj.mask, ref.depth, ref.sigma,
            ref.gray, ref.mask, ref.gx, ref.gy, ref.gmask,
            ref.K, lie.se3_exp(-xi), 0, cfg, interpret=True,
        )
    assert int(out[0][3]) == int(out[32][3])
    np.testing.assert_allclose(np.asarray(out[32][0]), np.asarray(out[0][0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[32][1]), np.asarray(out[0][1]),
                               rtol=1e-6)


def test_pallas_epipolar_matches_xla(rng):
    """depth_update vs depth_update_pallas (interpret mode): identical
    depth/sigma/age maps and stats given the same PRNG key.  Uses the
    proven single-keyframe epipolar setup (wide -0.1 m baseline, sharp
    texture) so a substantial pixel set passes every gate; a reduced march
    (max_steps=40) keeps the interpret-mode fori tractable."""
    import jax as _jax

    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update, depth_update_pallas

    from test_mapper import _single_kf_setup

    h, w = 48, 64
    ref_img, true_depth, K, xi, obj_img, obj_mask, mk = _single_kf_setup(rng, h, w)
    ref_frame = mk(ref_img, np.ones((h, w), bool), true_depth,
                   np.full((h, w), 0.5, np.float32), 0)
    history = push(KeyframeHistory.create(4, h, w), ref_frame)

    noisy = np.clip(rng.normal(1.7, 0.4, (h, w)), 0.5, None).astype(np.float32)
    sigma0 = np.full((h, w), 0.5, np.float32)
    obj_frame = mk(obj_img, obj_mask, true_depth, sigma0, 1)
    cfg = MapperConfig(
        crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=40,
        luminance_sigma=0.25, epipolar_sigma=0.25,
        pallas_precision="f32",  # exact-parity mode; bf16 tested separately
    )
    age = jnp.zeros((h, w), jnp.int32)
    key = _jax.random.PRNGKey(5)
    args = (
        obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
        jnp.asarray(noisy), jnp.asarray(sigma0), age, history, key, cfg,
    )
    d1, s1, a1, st1 = depth_update(*args)
    d2, s2, a2, st2 = depth_update_pallas(*args, interpret=True)

    assert int(st1.observed) == int(st2.observed)
    assert int(st1.accepted) == int(st2.accepted)
    assert int(st1.rejected) == int(st2.rejected)
    assert int(st1.aged_out) == int(st2.aged_out)
    assert int(st1.observed) > 100  # the comparison is not vacuous
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a1))

    # bf16 fast mode (the TPU default): same gate decisions for ~all pixels,
    # fused depths close wherever both observe.
    cfg16 = dataclasses.replace(cfg, pallas_precision="bf16")
    d3, s3, a3, st3 = depth_update_pallas(*args[:-1], cfg16, interpret=True)
    n_obs = int(st1.observed)
    assert abs(int(st3.observed) - n_obs) <= max(3, n_obs // 20), (int(st3.observed), n_obs)
    both = (np.asarray(d2) != np.asarray(noisy)) & (np.asarray(d3) != np.asarray(noisy))
    # Depth errors from bf16-quantized intensities stay small where the
    # subpixel match landed on the same step.
    close = np.isclose(np.asarray(d3)[both], np.asarray(d2)[both], rtol=0.08, atol=0.02)
    assert close.mean() > 0.9, close.mean()


def test_pallas_epipolar_windowed_gather_matches_exact(rng):
    """MapperConfig.gather_window=48 at a 64-row image: the lateral-motion
    epipolar segments fit the per-row window, so the windowed march must
    match the exact full-image gather."""
    import jax as _jax

    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update_pallas

    from test_mapper import _single_kf_setup

    h, w = 64, 64
    ref_img, true_depth, K, xi, obj_img, obj_mask, mk = _single_kf_setup(rng, h, w)
    ref_frame = mk(ref_img, np.ones((h, w), bool), true_depth,
                   np.full((h, w), 0.5, np.float32), 0)
    history = push(KeyframeHistory.create(4, h, w), ref_frame)
    noisy = np.clip(rng.normal(1.7, 0.4, (h, w)), 0.5, None).astype(np.float32)
    sigma0 = np.full((h, w), 0.5, np.float32)
    obj_frame = mk(obj_img, obj_mask, true_depth, sigma0, 1)
    age = jnp.zeros((h, w), jnp.int32)
    key = _jax.random.PRNGKey(5)
    out = {}
    for gw in (0, 48):
        cfg = MapperConfig(
            crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=40,
            luminance_sigma=0.25, epipolar_sigma=0.25,
            pallas_precision="f32", gather_window=gw,
        )
        out[gw] = depth_update_pallas(
            obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
            jnp.asarray(noisy), jnp.asarray(sigma0), age, history, key, cfg,
            interpret=True,
        )
    d0, s0, a0, st0 = out[0]
    d1, s1, a1, st1 = out[48]
    assert int(st0.observed) == int(st1.observed) > 100
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5)


@pytest.mark.slow
def test_pallas_gn_window_large_rotation(rng):
    """Adversarial gather_window test (VERDICT round-3 item 6): a 20-degree
    in-plane roll at the reference's 160x120 operating point makes a
    block's warped rows span ~55 > 32 window rows — the window excludes
    ~27%% of finest-level pixels (measured 7102 vs 9794 valid) — yet
    tracking must converge to the same pose as the exact gather.

    Measured robustness boundary (documented in config.py): at roll 0.35
    rad both modes converge to ~1e-4; at 0.4 rad BOTH modes diverge
    identically — the coarse-to-fine photometric basin, not the window, is
    the binding constraint, so the window never shrinks the convergence
    basin."""
    from test_tracker import make_pair

    h, w = 120, 160
    xi_true = (0.01, -0.02, 0.0, 0.0, 0.0, 0.35)
    ref_img, depth, sigma, K, obj_img, obj_mask, xt = make_pair(rng, h, w, xi_true)
    obj = build_frame_with_depth(
        jnp.asarray(obj_img), jnp.asarray(obj_mask), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=3, culls=0, frame_id=1,
    )
    ref = build_frame_with_depth(
        jnp.asarray(ref_img), jnp.ones((h, w), bool), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=3, culls=0, frame_id=0,
    )
    out = {}
    for gw in (32, 0):
        cfg = TrackerConfig(min_residual=0.0, backend="pallas", gather_window=gw)
        out[gw] = jax.jit(track, static_argnames="cfg")(obj, ref, cfg)
    xi_win = np.asarray(out[32].xi)
    xi_exact = np.asarray(out[0].xi)
    for xi in (xi_win, xi_exact):
        assert np.linalg.norm(xi[:3] - xt[:3]) < 2e-3, (xi, xt)
        assert np.linalg.norm(xi[3:] - xt[3:]) < 2e-3, (xi, xt)
    # The window did bite (fewer valid pixels at the finest level) and
    # still converged to the same optimum.
    cnt_win = int(np.asarray(out[32].valid_counts)[-1].max())
    cnt_exact = int(np.asarray(out[0].valid_counts)[-1].max())
    assert cnt_win < 0.85 * cnt_exact, (cnt_win, cnt_exact)
    np.testing.assert_allclose(xi_win, xi_exact, atol=5e-4)


@pytest.mark.slow
def test_pallas_epipolar_window_large_vertical_motion(rng):
    """Adversarial epipolar gather_window test (round-3 ADVICE item 2): a
    large vertical baseline with a wide depth prior (sigma 1.0, near clamp
    0.10 m) makes segments span ~60 rows > the 48-row window, so the
    window drops deep search hypotheses.  Measured per-block accuracy
    boundary (documented in config.py): observation counts stay within
    15%% of exact (1969 vs 1815 here — the window can also ACCEPT an
    in-window match where exact found a deeper, threshold-failing
    minimum), >90%% of commonly-observed pixels take identical depths, and
    the median error vs ground truth is unchanged."""
    import jax as _jax

    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update_pallas

    from test_mapper import _single_kf_setup

    h, w = 72, 64
    ref_img, true_depth, K, xi, obj_img, obj_mask, mk = _single_kf_setup(
        rng, h, w, xi_true=(0.0, -0.08, 0.0, 0.0, 0.0, 0.0)
    )
    ref_frame = mk(ref_img, np.ones((h, w), bool), true_depth,
                   np.full((h, w), 0.5, np.float32), 0)
    history = push(KeyframeHistory.create(4, h, w), ref_frame)
    prior = np.full((h, w), 1.0, np.float32)
    sigma0 = np.full((h, w), 1.0, np.float32)
    obj_frame = mk(obj_img, obj_mask, true_depth, sigma0, 1)
    age = jnp.zeros((h, w), jnp.int32)
    key = _jax.random.PRNGKey(5)
    res = {}
    for gw in (0, 48):
        cfg = MapperConfig(
            crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=100,
            luminance_sigma=0.25, epipolar_sigma=0.25,
            pallas_precision="f32", gather_window=gw,
        )
        res[gw] = depth_update_pallas(
            obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
            jnp.asarray(prior), jnp.asarray(sigma0), age, history, key, cfg,
            interpret=True,
        )
    d0 = np.asarray(res[0][0])
    d1 = np.asarray(res[48][0])
    n0, n1 = int(res[0][3].observed), int(res[48][3].observed)
    assert n0 > 1000  # the march is really overflowing a real pixel set
    assert abs(n1 - n0) <= 0.15 * n0, (n1, n0)
    both = (d0 != prior) & (d1 != prior)
    assert both.sum() > 0.8 * n0
    assert float(np.mean(np.abs(d0[both] - d1[both]) < 1e-3)) > 0.9
    truth = true_depth + xi[2]  # obj-frame prior convention (d - tz, tz<0 here)
    e0 = np.median(np.abs(d0[d0 != prior] - truth[d0 != prior]))
    e1 = np.median(np.abs(d1[d1 != prior] - truth[d1 != prior]))
    assert e1 <= 1.1 * e0, (e1, e0)


def test_pallas_backend_track(rng):
    """Full coarse-to-fine track with backend='pallas' converges to the same
    twist as the XLA backend."""
    h, w = 32, 48
    img = smooth_image(rng, h, w)
    depth = np.full((h, w), 1.8, np.float32)
    sigma = np.full((h, w), 0.1, np.float32)
    K = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]], np.float32)
    from dvo_tpu.ops.warp import warp_image

    xi_true = np.asarray([0.01, -0.006, 0.004, 0, 0, 0], np.float32)
    obj_img, obj_mask = warp_image(
        jnp.asarray(xi_true), jnp.asarray(img), jnp.ones((h, w), bool),
        jnp.asarray(depth), jnp.asarray(K),
    )
    mk = lambda im, m, fid: build_frame_with_depth(
        jnp.asarray(im), jnp.asarray(m), jnp.asarray(depth), jnp.asarray(sigma),
        jnp.asarray(K), levels=2, culls=0, frame_id=fid,
    )
    obj = mk(obj_img, obj_mask, 1)
    ref = mk(img, np.ones((h, w), bool), 0)
    xi_x = np.asarray(track(obj, ref, TrackerConfig(min_residual=0.0)).xi)
    xi_p = np.asarray(track(obj, ref, TrackerConfig(min_residual=0.0, backend="pallas")).xi)
    np.testing.assert_allclose(xi_p, xi_true, atol=1e-3)
    np.testing.assert_allclose(xi_p, xi_x, atol=5e-4)


def test_pallas_regularize_matches_xla(rng):
    """regularize_pallas vs models.mapper.regularize: identical depth maps
    (same sequential 4-neighbour gated fusion + clamp)."""
    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.mapper import regularize
    from dvo_tpu.ops.pallas.regularize import regularize_pallas

    h, w = 24, 32
    depth = (1.0 + 4.0 * rng.random((h, w))).astype(np.float32)
    depth[3, 5] = 7.5  # above the 6 m clamp
    sigma = (0.05 + 0.5 * rng.random((h, w))).astype(np.float32)
    cfg = MapperConfig()
    d1 = np.asarray(regularize(jnp.asarray(depth), jnp.asarray(sigma), cfg))
    d2 = np.asarray(
        regularize_pallas(jnp.asarray(depth), jnp.asarray(sigma), cfg, interpret=True)
    )
    np.testing.assert_allclose(d2, d1, rtol=1e-6, atol=1e-6)
    assert d2.max() <= 6.0


def test_mapper_backend_pallas_step(rng):
    """Full monocular_step with MapperConfig.backend='pallas' (interpret):
    the fused epipolar + regularizer kernels run inside the jitted step and
    produce a finite, keyframe-consistent state."""
    from dvo_tpu.config import DVOConfig, MapperConfig, PyramidConfig
    from dvo_tpu.models.odometry import monocular_init_with_depth, monocular_step

    from test_odometry import render_sequence

    h, w = 48, 64
    step = np.array([0.012, 0, 0, 0, 0, 0], np.float32)
    frames, depth0, K = render_sequence(rng, 4, h, w, step)
    cfg = DVOConfig(
        pyramid=PyramidConfig(levels=2, culls=0),
        mapper=MapperConfig(
            crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=16, backend="pallas"
        ),
    )
    sigma = np.full((h, w), 0.4, np.float32)
    state = monocular_init_with_depth(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
        jnp.asarray(depth0), jnp.asarray(sigma), jnp.asarray(K),
        jax.random.PRNGKey(0), cfg,
    )
    for k in range(1, 4):
        state, res = monocular_step(
            state, jnp.asarray(frames[k][0]), jnp.asarray(frames[k][1]),
            jnp.asarray(K), cfg,
        )
        assert np.isfinite(np.asarray(res.T_world)).all()
    assert np.isfinite(np.asarray(state.ref.base.depth)).all()
    assert int(state.frame_count) == 4


def test_pallas_epipolar_gather_slots(rng):
    """MapperConfig.gather_slots: with every pixel born within the newest-G
    keyframes, the newest-first G-slot gather must reproduce the exact
    full-ring gather bit-for-bit; with older pixels present, the clamped
    path still observes a comparable pixel set (ages clamp to G-1 — the
    same approximation the ring applies at capacity overflow)."""
    import jax as _jax

    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.frame import with_pose
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update_pallas

    from test_mapper import _single_kf_setup

    h, w = 48, 64
    ref_img, true_depth, K, xi, obj_img, obj_mask, mk = _single_kf_setup(rng, h, w)
    # Ring with 3 keyframes at slightly different poses (head = newest).
    hist = KeyframeHistory.create(8, h, w)
    for i, shift in enumerate((0.02, 0.01, 0.0)):
        fr = mk(ref_img, np.ones((h, w), bool), true_depth,
                np.full((h, w), 0.5, np.float32), i)
        fr = with_pose(fr, jnp.asarray([shift, 0, 0, 0, 0, 0], jnp.float32),
                       jnp.zeros(6))
        hist = push(hist, fr)

    noisy = np.clip(rng.normal(1.7, 0.4, (h, w)), 0.5, None).astype(np.float32)
    sigma0 = np.full((h, w), 0.5, np.float32)
    obj_frame = mk(obj_img, obj_mask, true_depth, sigma0, 3)
    # Ages 0..2: every born keyframe is within the newest-4 stack.
    age = (np.arange(h * w).reshape(h, w) % 3).astype(np.int32)
    key = _jax.random.PRNGKey(5)
    out = {}
    for gs in (0, 4):
        cfg = MapperConfig(
            crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=40,
            luminance_sigma=0.25, epipolar_sigma=0.25,
            pallas_precision="f32", gather_slots=gs,
        )
        out[gs] = depth_update_pallas(
            obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
            jnp.asarray(noisy), jnp.asarray(sigma0), jnp.asarray(age),
            hist, key, cfg, interpret=True,
        )
    d0, s0, a0, st0 = out[0]
    d4, s4, a4, st4 = out[4]
    assert int(st0.observed) == int(st4.observed) > 50
    np.testing.assert_allclose(np.asarray(d4), np.asarray(d0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s4), np.asarray(s0), rtol=1e-5)

    # Ages up to 5 with gather_slots=2: the clamped path matches against
    # nearer keyframes; it must still observe a comparable set and stay
    # finite.
    age_old = (np.arange(h * w).reshape(h, w) % 6).astype(np.int32)
    outs = {}
    for gs in (0, 2):
        cfg = MapperConfig(
            crop_x=(6, w - 8), crop_y=(5, h - 6), max_steps=40,
            luminance_sigma=0.25, epipolar_sigma=0.25,
            pallas_precision="f32", gather_slots=gs,
        )
        outs[gs] = depth_update_pallas(
            obj_frame.scenes[0], jnp.asarray(xi), jnp.asarray(xi),
            jnp.asarray(noisy), jnp.asarray(sigma0), jnp.asarray(age_old),
            hist, key, cfg, interpret=True,
        )
    n_exact = int(outs[0][3].observed)
    n_clamp = int(outs[2][3].observed)
    assert n_exact > 50
    assert n_clamp > 0.5 * n_exact, (n_clamp, n_exact)
    assert np.all(np.isfinite(np.asarray(outs[2][0])))
