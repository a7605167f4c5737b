"""Per-kernel timing harness: settle the GN backend question with data.

Times, on the current JAX backend (real TPU under axon; --cpu to force CPU):

  * one GN linearization (hot loop #1) — XLA twin vs Pallas kernel — at the
    reference's two operating points: monocular 160x120 (system.hpp:47) and
    RGB-D 256x212 base level (system.hpp:30,82);
  * the epipolar depth update (hot loop #2) — XLA twin vs Pallas kernel —
    at the monocular mapping resolution;
  * the full jitted monocular step, from which GN iters/s is derived.

Prints one JSON object per measurement plus a summary recommending the
faster GN backend.  ``bench.py`` (the driver's headline bench) stays the
single-line full-pipeline number; this harness is the engineering view.

Usage:  python bench_kernels.py [--cpu] [--reps 50]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from dvo_tpu.utils.metrics import device_sync


def _timeit(fn, reps):
    import jax

    fn()  # warmup/compile
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    device_sync(out)
    return (time.perf_counter() - t0) / reps


def synthetic_scene(h, w, seed=0):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(8):
        fx, fy = rng.uniform(0.05, 0.6, 2)
        ph = rng.uniform(0, 6.28, 2)
        img += rng.uniform(0.3, 1.0) * np.sin(fx * xs + ph[0]) * np.sin(fy * ys + ph[1])
    img = (img - img.min()) / (img.max() - img.min())
    depth = (1.5 + 0.3 * np.sin(0.1 * xs) * np.cos(0.12 * ys)).astype(np.float32)
    K = np.array([[1.0 * w, 0, w / 2], [0, 1.0 * w, h / 2], [0, 0, 1]], np.float32)
    return img, depth, K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dvo_tpu import lie
    from dvo_tpu.config import DVOConfig, MapperConfig, TrackerConfig
    from dvo_tpu.models.frame import build_frame_with_depth
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update
    from dvo_tpu.models.odometry import monocular_init, monocular_step
    from dvo_tpu.models.tracker import gn_normal_equations
    from dvo_tpu.ops.pallas.gn import gn_terms_pallas

    backend = jax.default_backend()
    interpret = backend != "tpu"
    results = []

    def report(name, seconds, **extra):
        rec = {"name": name, "ms": round(seconds * 1e3, 4), **extra}
        results.append(rec)
        print(json.dumps(rec))

    # ---- GN linearization at the two reference operating points ----
    xi = jnp.asarray([0.01, -0.005, 0.008, 0.002, -0.001, 0.003], jnp.float32)
    gn_ms = {}
    for tag, (h, w) in (("mono_160x120", (120, 160)), ("rgbd_256x212", (212, 256))):
        img, depth, K = synthetic_scene(h, w)
        sigma = np.full((h, w), 0.1, np.float32)
        frame = build_frame_with_depth(
            jnp.asarray(img), jnp.ones((h, w), bool), jnp.asarray(depth),
            jnp.asarray(sigma), jnp.asarray(K), levels=1, culls=0, frame_id=0,
        )
        s = frame.base
        cfg = TrackerConfig()

        xla_fn = jax.jit(
            lambda obj, ref, x: gn_normal_equations(obj, ref, x, 0, cfg)
        )
        t_xla = _timeit(lambda: xla_fn(s, s, xi), args.reps)
        report(f"gn_xla_{tag}", t_xla, backend=backend)

        T_inv = lie.se3_exp(-xi)

        def pallas_call():
            return gn_terms_pallas(
                s.gray, s.mask, s.depth, s.sigma,
                s.gray, s.mask, s.gx, s.gy, s.gmask,
                s.K, T_inv, 0, cfg, interpret=interpret,
            )

        t_pal = _timeit(pallas_call, args.reps if not interpret else 2)
        report(f"gn_pallas_{tag}", t_pal, backend=backend,
               interpret=interpret)
        gn_ms[tag] = {"xla": t_xla * 1e3, "pallas": t_pal * 1e3}

    # ---- full coarse-to-fine track per backend (the decision metric:
    # one jitted program, dispatch overhead amortized) ----
    from dvo_tpu.models.tracker import track

    track_ms = {}
    for tag, (h, w, levels) in (
        ("mono_160x120", (120, 160, 3)),
        ("rgbd_256x212", (212, 256, 4)),
    ):
        img, depth, K = synthetic_scene(h, w)
        sigma = np.full((h, w), 0.1, np.float32)
        obj = build_frame_with_depth(
            jnp.asarray(np.roll(img, 1, axis=1)), jnp.ones((h, w), bool),
            jnp.asarray(depth), jnp.asarray(sigma), jnp.asarray(K),
            levels=levels, culls=0, frame_id=1,
        )
        ref = build_frame_with_depth(
            jnp.asarray(img), jnp.ones((h, w), bool), jnp.asarray(depth),
            jnp.asarray(sigma), jnp.asarray(K), levels=levels, culls=0, frame_id=0,
        )
        track_ms[tag] = {}
        for be in ("xla", "pallas"):
            if be == "pallas" and interpret:
                continue
            cfg_b = TrackerConfig(backend=be)
            fn = jax.jit(
                lambda o, r: (track(o, r, cfg_b).xi,
                              jnp.sum(track(o, r, cfg_b).iterations))
            )
            t = _timeit(lambda: fn(obj, ref)[0], args.reps)
            # Executed iterations (early-exit aware), not the static cap.
            iters = int(fn(obj, ref)[1])
            report(f"track_{be}_{tag}", t, backend=backend,
                   gn_iters_per_s=round(iters / t, 1))
            track_ms[tag][be] = t * 1e3

    # ---- epipolar depth update (hot loop #2) at mapping resolution ----
    h, w = 120, 160
    img, depth, K = synthetic_scene(h, w)
    sigma = np.full((h, w), 0.3, np.float32)
    frame = build_frame_with_depth(
        jnp.asarray(img), jnp.ones((h, w), bool), jnp.asarray(depth),
        jnp.asarray(sigma), jnp.asarray(K), levels=1, culls=0, frame_id=0,
    )
    hist = push(KeyframeHistory.create(8, h, w), frame)
    m_cfg = MapperConfig()
    rel = jnp.asarray([0.01, 0, 0, 0, 0, 0], jnp.float32)
    key = jax.random.PRNGKey(0)

    du = jax.jit(
        lambda s, x, rd, rs, ra, hi, k: depth_update(s, x, x, rd, rs, ra, hi, k, m_cfg)
    )
    age = jnp.zeros((h, w), jnp.int32)
    t_du = _timeit(
        lambda: du(frame.base, rel, frame.base.depth, frame.base.sigma, age, hist, key),
        args.reps,
    )
    report("depth_update_xla_120x160", t_du, backend=backend)

    try:
        from dvo_tpu.ops.pallas.epipolar import epipolar_update_pallas  # noqa: F401

        from dvo_tpu.models.mapper import depth_update_pallas

        dup = jax.jit(
            lambda s, x, rd, rs, ra, hi, k: depth_update_pallas(
                s, x, x, rd, rs, ra, hi, k, m_cfg, interpret=interpret
            )
        )
        t_dup = _timeit(
            lambda: dup(frame.base, rel, frame.base.depth, frame.base.sigma, age, hist, key),
            args.reps if not interpret else 2,
        )
        report("depth_update_pallas_120x160", t_dup, backend=backend,
               interpret=interpret)
    except ImportError:
        pass

    # ---- regularizer (companion depth-filter kernel) ----
    from dvo_tpu.models.mapper import regularize
    from dvo_tpu.ops.pallas.regularize import regularize_pallas

    reg_x = jax.jit(lambda d, s: regularize(d, s, m_cfg))
    t_rx = _timeit(lambda: reg_x(frame.base.depth, frame.base.sigma), args.reps)
    report("regularize_xla_120x160", t_rx, backend=backend)
    if not interpret:
        reg_p = jax.jit(lambda d, s: regularize_pallas(d, s, m_cfg))
        t_rp = _timeit(lambda: reg_p(frame.base.depth, frame.base.sigma), args.reps)
        report("regularize_pallas_120x160", t_rp, backend=backend)

    # ---- full monocular step + GN iters/s ----
    img640, _, K640 = synthetic_scene(480, 640, seed=1)
    cfg = DVOConfig.monocular()
    state = monocular_init(
        jnp.asarray(img640), jnp.ones((480, 640), bool), jnp.asarray(K640),
        jax.random.PRNGKey(0), cfg,
    )
    img2 = np.roll(img640, 2, axis=1)
    mask = jnp.ones((480, 640), bool)

    def step():
        _, res = monocular_step(state, jnp.asarray(img2), mask, jnp.asarray(K640), cfg)
        return res.T_world

    t_step = _timeit(step, args.reps)
    # Executed GN iterations per step (the tracker's while_loop exits at
    # convergence; round 2 multiplied by the static cap here, overcounting).
    _, res0 = monocular_step(state, jnp.asarray(img2), mask, jnp.asarray(K640), cfg)
    iters = int(np.asarray(res0.tracking.iterations).sum())
    report("monocular_step_640x480", t_step, backend=backend,
           gn_iters_per_s=round(iters / t_step, 1))

    best = {
        tag: ("pallas" if v.get("pallas", 1e9) < v["xla"] else "xla")
        for tag, v in track_ms.items()
        if "xla" in v
    }
    print(json.dumps({"summary": {"track_backend_winner": best,
                                  "backend": backend}}))


if __name__ == "__main__":
    main()
