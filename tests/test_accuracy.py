"""Known-motion accuracy tests on the reference's controlled fixtures
(VERDICT round-1 item 2; SURVEY.md §4 fixtures).

The reference ships two rig-controlled RGB-D sequences —
``data/KINECT_50MM`` (nominal 50 mm translation per frame) and
``data/KINECT_1DEG`` (nominal 1 degree rotation per frame) — that it only
ever inspected visually (test/sequence.cpp, test/track.cpp).  Here they
become quantitative accuracy gates on the frame-to-frame RGB-D tracking
mode.

Empirical context for the tolerances (measured on this implementation with
the nominal Kinect v2 factory calibration — the reference's per-device
calibration YAML lives in an absent submodule):

  * KINECT_1DEG: median rotation 1.01 deg/frame, median translation
    1.2 mm/frame — the rig motion is recovered almost exactly.
  * KINECT_50MM: median translation ~33 mm/frame with a ~2.6 deg/frame
    rotation leak: on this near-planar scene a translation/rotation gauge
    trade-off (plus nominal-calibration error) absorbs part of the motion.
    The reference's own README admits the same class of weakness
    (README.md:4-5 "rotation tracking was unreliable").

Convergence thresholds are disabled (min_residual=0) for these tests: the
reference's 5e-3 mean-residual early-stop fires prematurely on the smooth
coarse levels of these scenes and hides ~20%% of the motion.
"""

import os

import numpy as np
import pytest

from dvo_tpu.config import DVOConfig, PyramidConfig, TrackerConfig

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(DATA, "KINECT_50MM")),
    reason="reference fixtures absent",
)


def _cfg():
    return DVOConfig(
        pyramid=PyramidConfig(levels=4, culls=1),
        tracker=TrackerConfig(min_residual=0.0, min_update_norm=1e-5),
    )


_RUN_CACHE = {}


def _run(name, max_frames=None):
    # The three gates below share full-sequence runs; cache per (name,
    # max_frames) so each sequence is tracked once per session.
    key = (name, max_frames)
    if key in _RUN_CACHE:
        return _RUN_CACHE[key]
    from dvo_tpu.utils.datasets import InfoSequence, KinectCalibration
    from dvo_tpu.utils.runner import run_kinect

    seq = InfoSequence(os.path.join(DATA, name, "info.txt"))
    ts, poses, secs = run_kinect(
        seq, KinectCalibration.kinect_v2(), cfg=_cfg(), mode="rgbd",
        max_frames=max_frames, undistort=True,
    )
    steps_t, steps_r = [], []
    for i in range(1, len(poses)):
        rel = np.linalg.inv(poses[i - 1]) @ poses[i]
        steps_t.append(np.linalg.norm(rel[:3, 3]) * 1000.0)  # mm
        cosang = np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)
        steps_r.append(np.degrees(np.arccos(cosang)))
    out = (poses, np.asarray(steps_t), np.asarray(steps_r))
    _RUN_CACHE[key] = out
    return out


def test_kinect_1deg_known_rotation():
    """Nominal 1 deg/frame rotation rig: recovered per-frame rotation must
    match within 15%% at the median, with near-zero translation."""
    # 40 of the 65 frames: the per-frame medians stabilise well before the
    # full sequence and the suite stays fast (VERDICT round-1 item 9).
    poses, steps_t, steps_r = _run("KINECT_1DEG", max_frames=40)
    assert np.all(np.isfinite(poses))
    med_r = float(np.median(steps_r))
    med_t = float(np.median(steps_t))
    assert 0.85 <= med_r <= 1.15, (med_r, steps_r)
    assert med_t < 5.0, (med_t, steps_t)
    # Every frame stays in a sane band — no divergence anywhere.
    assert steps_r.max() < 2.0 and steps_r.min() > 0.4, steps_r


def test_kinect_50mm_known_translation():
    """Nominal 50 mm/frame translation rig: recovered per-frame translation
    must land in the empirically-achievable band (the nominal factory
    calibration trades part of the translation into rotation on this
    scene — see module docstring)."""
    poses, steps_t, steps_r = _run("KINECT_50MM")
    assert np.all(np.isfinite(poses))
    med_t = float(np.median(steps_t))
    assert 20.0 <= med_t <= 65.0, (med_t, steps_t)
    # The rotation leak stays bounded.
    assert float(np.median(steps_r)) < 4.0, steps_r
    # Motion direction is consistent: the dominant translation axis carries
    # most of the accumulated motion (a straight-line rig move).
    total = poses[-1][:3, 3] - poses[0][:3, 3]
    assert np.abs(total).max() > 0.6 * np.linalg.norm(total), total


def _register_seq(name, n, stride=1, undistort=False):
    """Real RGB-D frames registered to the 512x424 depth camera (the
    run_kinect data path: map_depth_to_gray with the nominal factory
    extrinsics).  ``undistort=True`` additionally applies the per-camera
    undistortion remaps first — the full production prep."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dvo_tpu.ops.warp import map_depth_to_gray
    from dvo_tpu.utils.datasets import (
        InfoSequence,
        KinectCalibration,
        build_undistort_map,
        remap_nearest,
    )

    seq = list(InfoSequence(os.path.join(DATA, name, "info.txt")))[::stride][:n]
    kcal = KinectCalibration.kinect_v2()
    rgb_K = jnp.asarray(kcal.rgb.K)
    depth_K = jnp.asarray(kcal.depth.K)
    invT = jnp.asarray(kcal.invT)
    rgb_map = depth_map = None
    if undistort:
        if kcal.rgb.distortion is not None:
            rgb_map = build_undistort_map(kcal.rgb)
        if kcal.depth.distortion is not None:
            depth_map = build_undistort_map(kcal.depth)

    @jax.jit
    def register(g, gm, d):
        return map_depth_to_gray(d, g, gm, rgb_K, depth_K, invT)

    out = []
    for it in seq:
        g = np.asarray(Image.open(it.gray_path).convert("L"), np.float32) / 255.0
        d = np.asarray(Image.open(it.depth_path), np.float32) / 5000.0
        if rgb_map is not None:
            g, gm = remap_nearest(g, rgb_map, border=0.0)
        else:
            gm = np.ones_like(g, bool)
        if depth_map is not None:
            d, _ = remap_nearest(d, depth_map, border=0.0)
        mg, m, sg = register(
            jnp.asarray(g.astype(np.float32)), jnp.asarray(gm),
            jnp.asarray(d.astype(np.float32)),
        )
        out.append((np.asarray(mg), np.asarray(m), d.astype(np.float32), np.asarray(sg)))
    return out, np.asarray(kcal.depth.K)


@pytest.mark.slow
def test_kinectv2_full_mono_pipeline_real():
    """VERDICT round-2 item 7: the FULL monocular pipeline (tracking +
    epipolar mapper + regularizer in the loop) on real free-motion imagery
    (the reference's own kinectv2_01, used by test/kinect-vo.cpp:21),
    seeded with the first frame's measured depth (kinect-vo mode).

    Gates: finite poses, per-frame steps bounded (handheld 30 Hz motion is
    mm-to-cm scale), a depth-observation accept-rate floor on the update
    frames, and no runaway step (smoothness)."""
    import jax
    import jax.numpy as jnp

    from dvo_tpu.models.odometry import monocular_init_with_depth, monocular_step

    frames, K = _register_seq("kinectv2_01", 30)
    Kd = jnp.asarray(K)
    cfg = DVOConfig.monocular()
    mg, m, d0, sg = frames[0]
    state = monocular_init_with_depth(
        jnp.asarray(mg), jnp.asarray(m), jnp.asarray(d0), jnp.asarray(sg),
        Kd, jax.random.PRNGKey(0), cfg,
    )
    steps, observed, accepted = [], 0, 0
    for mg, m, _d, _sg in frames[1:]:
        state, res = monocular_step(state, jnp.asarray(mg), jnp.asarray(m), Kd, cfg)
        T = np.asarray(res.T_world)
        assert np.all(np.isfinite(T))
        steps.append(float(np.linalg.norm(np.asarray(res.relative_xi)[:3])))
        observed += int(res.mapping.observed)
        accepted += int(res.mapping.accepted)
    steps = np.asarray(steps)
    # Handheld inter-frame motion: mm to a few cm; nothing explodes.
    assert steps.max() < 0.06, steps
    assert float(np.median(steps)) < 0.03, steps
    # The mapper produces real observations and most pass the depth filter
    # (measured on this sequence: ~1500 observed, ~85% accepted).
    assert observed > 800, observed
    assert accepted > 0.5 * observed, (accepted, observed)


@pytest.mark.slow
def test_kinect50mm_epipolar_observations_vs_measured_depth():
    """VERDICT round-2 item 7: quantitative depth-convergence gate for HOT
    LOOP #2 on real pixels — epipolar observations on a KINECT_50MM pair
    (3-frame ~150 mm baseline) against the sensor's measured depth.

    The observation lives in the OBJ frame (the reference's prior = d - tz
    quirk, mapper.cpp:104), so truth is ``measured - tz``.  Thresholds
    reflect the measured state with the nominal factory calibration and the
    tracked (rotation-leaky — see module docstring) pose: median |err|
    0.107 m, signed median -0.03 m, 48% within 10 cm, ~4.5k observations.
    A geometry/kernel regression blows these bounds immediately."""
    import jax
    import jax.numpy as jnp

    import dvo_tpu.models.mapper as mapper_mod
    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.frame import build_frame_with_depth
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.tracker import track

    frames, K = _register_seq("KINECT_50MM", 4)
    s = 2
    Kc = K.copy() / s
    Kc[2, 2] = 1.0

    def mk(fr, fid):
        mg, m, d, sg = fr
        return build_frame_with_depth(
            jnp.asarray(mg[::s, ::s]), jnp.asarray(m[::s, ::s]),
            jnp.asarray(d[::s, ::s]), jnp.asarray(sg[::s, ::s]),
            jnp.asarray(Kc), 3, 0, fid,
        )

    f0, f1 = mk(frames[0], 0), mk(frames[3], 1)
    xi = track(f1, f0).xi
    tz = float(xi[2])
    meas = frames[0][2][::s, ::s]

    # Bypass the Gaussian fusion so the raw observation is returned.
    orig = mapper_mod.gaussian_update_with_reset
    mapper_mod.gaussian_update_with_reset = (
        lambda key, mu, sg_, d, s_, obs_valid, cfg: (d, s_, jnp.ones_like(mu, bool))
    )
    try:
        mc = MapperConfig(crop_x=(16, 240), crop_y=(12, 200))
        hist = push(KeyframeHistory.create(8, *meas.shape), f0)
        prior = np.where(meas > 0, meas, 1.5).astype(np.float32)
        prior_s = np.full(meas.shape, 0.2, np.float32)
        nd, ns, _na, stats = mapper_mod.depth_update(
            f1.base, xi, xi, jnp.asarray(prior), jnp.asarray(prior_s),
            jnp.zeros(meas.shape, jnp.int32), hist, jax.random.PRNGKey(0), mc,
        )
    finally:
        mapper_mod.gaussian_update_with_reset = orig
    nd = np.asarray(nd)
    truth = meas - tz
    cmp = (np.abs(nd - prior) > 1e-6) & (meas > 0.5) & (meas < 4.0)
    assert int(cmp.sum()) > 3000, int(cmp.sum())
    err = (nd - truth)[cmp]
    assert float(np.median(np.abs(err))) < 0.20, float(np.median(np.abs(err)))
    assert abs(float(np.median(err))) < 0.10, float(np.median(err))
    assert float(np.mean(np.abs(err) < 0.1)) > 0.35, float(np.mean(np.abs(err) < 0.1))


def test_mono_bootstrap_rotation_1deg_real():
    """Reference mode 1 on real pixels, rotation leg: the PURE monocular
    pipeline — depth bootstrapped from N(1.5, 0.5) noise (frame.hpp:12-22),
    no sensor depth ever entering the VO state — over the 1 deg/frame
    rotation rig.  Rotation tracking is nearly depth-independent, so even
    with pure-noise depth the recovered per-frame rotation must match the
    rig (measured: median 1.013 deg/frame, nominal 1.0) while translation
    stays parked (measured: 3-8 mm total wander)."""
    import jax
    import jax.numpy as jnp

    from dvo_tpu.models.odometry import monocular_init, monocular_step

    frames, K = _register_seq("KINECT_1DEG", 21, undistort=True)
    Kd = jnp.asarray(K)
    cfg = DVOConfig.monocular()
    mg, m, _d, _sg = frames[0]
    state = monocular_init(
        jnp.asarray(mg), jnp.asarray(m), Kd, jax.random.PRNGKey(0), cfg
    )
    poses = [np.eye(4, dtype=np.float32)]
    for mg, m, _d, _sg in frames[1:]:
        state, res = monocular_step(state, jnp.asarray(mg), jnp.asarray(m), Kd, cfg)
        poses.append(np.asarray(res.T_world))
    poses = np.stack(poses)
    assert np.all(np.isfinite(poses))
    rots = []
    for i in range(1, len(poses)):
        rel = np.linalg.inv(poses[i - 1]) @ poses[i]
        cosang = np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)
        rots.append(np.degrees(np.arccos(cosang)))
    med_r = float(np.median(rots))
    assert 0.85 <= med_r <= 1.15, (med_r, rots)
    # Translation stays parked (the rig only rotates); the monocular scale
    # is arbitrary but noise-depth tracking must not hallucinate motion.
    assert float(np.linalg.norm(poses[-1][:3, 3])) < 0.03, poses[-1][:3, 3]


@pytest.mark.slow
def test_mono_bootstrap_depth_convergence_real():
    """Reference mode 1 on real pixels, mapping leg (VERDICT round-3 item 3
    — the semi-dense-VO party trick): the full monocular pipeline with
    NOISE-bootstrapped depth over free-motion kinectv2_01 must CONVERGE its
    depth field toward the (registered, never-fed-to-VO) sensor depth.

    Gates, from the measured run (57 frames): epipolar accept counts ramp
    from single digits to hundreds per update frame; the converged-pixel
    set (sigma < 0.3) grows from 0 to ~300+; the scale-aligned median
    relative depth error over converged pixels dips to ~6-8% mid-run; the
    trajectory stays rotation-sane (median 0.65 deg/frame handheld)."""
    import jax
    import jax.numpy as jnp

    from dvo_tpu.models.odometry import monocular_init, monocular_step
    from dvo_tpu.ops.image import cull_image

    n = 50
    frames, K = _register_seq("kinectv2_01", n, undistort=True)
    Kd = jnp.asarray(K)
    cfg = DVOConfig.monocular()
    culls = cfg.pyramid.culls
    mg, m, d0, _sg = frames[0]
    state = monocular_init(
        jnp.asarray(mg), jnp.asarray(m), Kd, jax.random.PRNGKey(0), cfg
    )

    def cull_np(a):
        return np.asarray(cull_image(jnp.asarray(a), culls))

    sensor = cull_np(d0)
    accepts, conv_px, rel_errs, rots = [], [], [], []
    prev_T = np.eye(4)
    for fi in range(1, n):
        mg, m, d, _sg = frames[fi]
        state, res = monocular_step(state, jnp.asarray(mg), jnp.asarray(m), Kd, cfg)
        if bool(res.is_keyframe):
            sensor = cull_np(d)
        accepts.append(int(np.asarray(res.mapping.accepted)))
        est = np.asarray(state.ref.base.depth)
        sig = np.asarray(state.ref.base.sigma)
        ok = (sensor > 0.3) & (sensor < 6.0) & (est > 0.05) & (sig < 0.3)
        conv_px.append(int(ok.sum()))
        if ok.sum() >= 50:
            s = np.median(sensor[ok] / est[ok])
            rel_errs.append(
                float(np.median(np.abs(est[ok] * s - sensor[ok]) / sensor[ok]))
            )
        T = np.asarray(res.T_world)
        rel = np.linalg.inv(prev_T) @ T
        prev_T = T
        cosang = np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)
        rots.append(np.degrees(np.arccos(cosang)))

    accepts = np.asarray(accepts)
    third = len(accepts) // 3
    # Accept-rate ramp: the depth filter admits more observations as the
    # priors tighten (measured: first third ~tens, last third ~thousands).
    assert accepts[-third:].sum() > 3 * max(accepts[:third].sum(), 1), accepts
    # The converged set grows from zero to hundreds of pixels (measured:
    # 131-170 over frames 42-49, ~330 by frame 57; promotions transiently
    # dip the count, so gate the recent maximum).
    assert max(conv_px[-8:]) >= 110, conv_px
    assert conv_px[-1] > 10 * max(conv_px[2], 1), conv_px
    # Scale-aligned depth error against the sensor reaches <= 15% at the
    # median (measured best ~6-8%).
    assert rel_errs and min(rel_errs) <= 0.15, rel_errs
    # Trajectory sanity: handheld rotation rate, no spin-outs.
    assert float(np.median(rots)) < 2.0, rots


@pytest.mark.slow
def test_posegraph_live_refinement_real_50mm():
    """Round-3 VERDICT item 4 on real pixels: pose-graph refinement must
    EARN its flag on a real sequence, during the run.  Mono-with-depth over
    the KINECT_50MM rail with BA enabled, periodic refinement every 4
    promotions writing corrections into the live ring, plus the final
    global pass.

    Measured (committed) numbers this test locks in: 6 keyframe nodes,
    27 edges (odometry + ALL-PAIRS BA-window + 1 re-tracked closure),
    1 live refinement, final-pass cost 0.62 -> 0.38, max translation
    change 58 mm, rail line-fit RMS 0.0327 (raw) -> 0.0310 (refined) —
    the refinement moves a real trajectory and does NOT degrade the rig's
    known straight-line geometry."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from dvo_tpu.models.odometry import monocular_init_with_depth, monocular_step
    from dvo_tpu.models.posegraph import PoseGraphHarvester

    frames, K = _register_seq("KINECT_50MM", 17, undistort=True)
    Kd = jnp.asarray(K)
    cfg = DVOConfig.monocular()
    cfg = dc.replace(cfg, ba=dc.replace(cfg.ba, enabled=True, window=4))
    mg, m, d0, sg = frames[0]
    state = monocular_init_with_depth(
        jnp.asarray(mg), jnp.asarray(m), jnp.asarray(d0), jnp.asarray(sg),
        Kd, jax.random.PRNGKey(0), cfg,
    )
    harv = PoseGraphHarvester(cfg, K, refine_every=4)
    poses = [np.eye(4, dtype=np.float32)]
    for fi in range(1, len(frames)):
        mg, m, _d, _sg = frames[fi]
        state, res = monocular_step(state, jnp.asarray(mg), jnp.asarray(m), Kd, cfg)
        poses.append(np.asarray(res.T_world))
        state = harv.on_frame(fi, res, state, mg, m) or state
    raw = np.stack(poses)
    refined, costs = harv.finalize(np.arange(float(len(poses))), raw.copy(), state)

    # The periodic mechanism fired and wrote into the live ring.
    assert harv.live_refinements >= 1
    # The graph is over-constrained without closures (all-pairs BA edges);
    # the final optimization strictly reduces its cost.
    assert len(harv.e_w) > 2 * (len(harv.nodes) - 1), (len(harv.e_w), len(harv.nodes))
    assert costs.size and float(costs[-1]) < float(costs[0])
    # Refinement moved the trajectory materially...
    assert np.abs(refined[:, :3, 3] - raw[:, :3, 3]).max() > 1e-3
    assert np.all(np.isfinite(refined))

    def line_rms(P):
        c = P[:, :3, 3]
        x = c - c.mean(axis=0)
        _, _s, vt = np.linalg.svd(x, full_matrices=False)
        resid = x - np.outer(x @ vt[0], vt[0])
        return float(np.sqrt((resid ** 2).sum(axis=1).mean()))

    # ...and did not degrade the rig's known straight-line geometry.
    assert line_rms(refined) <= 1.1 * line_rms(raw) + 1e-3, (
        line_rms(refined), line_rms(raw)
    )
    # Depth-consistency bound (round-4 weak #5): the NON-RIGID part of the
    # live write-back — the change in relative pose between consecutive
    # ring keyframes, the only quantity that can invalidate ring depth
    # (depth is per-keyframe local, exactly invariant under rigid moves;
    # posegraph._refine_nodes docstring) — measures 21.7 mm / 3.04 deg on
    # this run: same order as the epipolar observation gates the depth
    # filter already absorbs (accept_sigma up to 0.5 m), so ring depth
    # needs no re-scale at these magnitudes.  Gate locks the measured
    # envelope.
    assert 0.0 < harv.max_rel_corr_t < 0.05, harv.max_rel_corr_t
    assert harv.max_rel_corr_r < 5.0, harv.max_rel_corr_r


def test_kinect_50mm_straightness():
    """The 50MM rig moves on a straight rail: the recovered camera centers
    must fit a 3-D line to within a few cm RMS."""
    poses, steps_t, _ = _run("KINECT_50MM")
    centers = poses[:, :3, 3]
    c0 = centers.mean(axis=0)
    x = centers - c0
    # Principal direction via SVD; residual = distance to the line.
    _, s, vt = np.linalg.svd(x, full_matrices=False)
    resid = x - np.outer(x @ vt[0], vt[0])
    rms = float(np.sqrt((resid ** 2).sum(axis=1).mean()))
    assert rms < 0.05, (rms, centers)


@pytest.mark.slow
def test_ba_accuracy_verdict_real_rigs():
    """Round-4 VERDICT item 5: BA's accuracy story on real pixels, not
    just its cost curve.  Kinect mono pipeline (measured-depth seed, full
    mapping + chunked driver) over both known-motion rigs, --ba on vs off.

    Measured (committed) verdict this test locks in:
      KINECT_50MM  line-fit RMS 58.8 -> 36.5 mm   (38%% straighter w/ BA)
      KINECT_1DEG  median rotation 1.113 -> 1.048 deg/frame (nominal 1.0)
                   translation wander 10.8 -> 7.2 mm/frame
    (50MM's rotation leak rises 1.79 -> 2.39 deg/frame — the planar scene
    trades translation into rotation either way; the rig's ground-truth
    geometry, straightness, is what improves.)  BA stays default-off for
    reference-parity throughput; --ba is the documented accuracy knob."""
    import dataclasses as dc

    from dvo_tpu.utils.datasets import InfoSequence, KinectCalibration
    from dvo_tpu.utils.runner import run_kinect

    def run(rig, n, ba):
        cfg = DVOConfig.monocular()
        if ba:
            cfg = dc.replace(cfg, ba=dc.replace(cfg.ba, enabled=True, window=4))
        seq = InfoSequence(os.path.join(DATA, rig, "info.txt"))
        _, poses, _ = run_kinect(
            seq, KinectCalibration.kinect_v2(), cfg=cfg, mode="mono",
            max_frames=n, chunk=6,
        )
        return poses

    def line_rms(P):
        c = P[:, :3, 3]
        x = c - c.mean(axis=0)
        _, _s, vt = np.linalg.svd(x, full_matrices=False)
        resid = x - np.outer(x @ vt[0], vt[0])
        return float(np.sqrt((resid ** 2).sum(axis=1).mean()))

    def med_rot(P):
        rots = []
        for i in range(1, len(P)):
            rel = np.linalg.inv(P[i - 1]) @ P[i]
            cosang = np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1)
            rots.append(np.degrees(np.arccos(cosang)))
        return float(np.median(rots))

    p_off = run("KINECT_50MM", 40, ba=False)
    p_on = run("KINECT_50MM", 40, ba=True)
    assert np.all(np.isfinite(p_on)) and np.all(np.isfinite(p_off))
    # BA makes the rail trajectory measurably straighter.
    assert line_rms(p_on) < 0.9 * line_rms(p_off), (
        line_rms(p_on), line_rms(p_off)
    )

    r_off = run("KINECT_1DEG", 30, ba=False)
    r_on = run("KINECT_1DEG", 30, ba=True)
    # BA's rotation estimate is at least as close to the rig's nominal
    # 1 deg/frame as the raw pipeline's.
    assert abs(med_rot(r_on) - 1.0) <= abs(med_rot(r_off) - 1.0) + 0.02, (
        med_rot(r_on), med_rot(r_off)
    )
