"""Weak-scaling benchmark for the mesh-sharded mapping and BA layers.

BASELINE.json north star: >= 70% weak-scaling efficiency for mapping/BA at
2 hosts.  This harness holds per-device work constant (rows of the depth map
for mapping; host keyframes for BA) while growing the device count, and
reports efficiency = t(1) / t(N) per configuration.

On a TPU pod run it measures real ICI scaling; locally it runs on the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates the sharding program but NOT interconnect performance.

Usage: python bench_scaling.py [--devices 1 2 4 8] [--rows-per-device 64]
Prints one JSON line per (layer, n_devices) plus a summary line.
"""

import argparse
import json
import os
import time

if "--cpu" in os.sys.argv or os.environ.get("JAX_PLATFORMS") in (None, "", "axon"):
    # Default to the virtual CPU mesh unless real multi-chip TPU is present.
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

from dvo_tpu.utils.metrics import device_sync


def _timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--rows-per-device", type=int, default=64)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--kf-per-device", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from dvo_tpu.config import BAConfig, MapperConfig, TrackerConfig
    from dvo_tpu.models.frame import build_frame_with_depth
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.parallel.ba import bundle_adjust_sharded
    from dvo_tpu.parallel.mapping import sharded_depth_update
    from dvo_tpu.parallel.mesh import make_mesh
    from dvo_tpu.parallel.tracking import sharded_gn_normal_equations
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_ba import _make_window  # reuse the exact-geometry window

    n_avail = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8) if n <= n_avail]
    w = args.width
    rng = np.random.default_rng(0)
    results = {"tracking": {}, "mapping": {}, "ba": {}}

    for n in counts:
        mesh = make_mesh((n,), ("tile",), jax.devices()[:n])
        h = args.rows_per_device * n

        # --- tracking linearization (per-iteration unit of the frontend) ---
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.sin(0.2 * xs) * np.cos(0.15 * ys) * 0.5 + 0.5
        K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
        depth = np.full((h, w), 1.5, np.float32)
        sigma = np.full((h, w), 0.2, np.float32)
        mk = lambda im, fid: build_frame_with_depth(
            jnp.asarray(im), jnp.ones((h, w), bool), jnp.asarray(depth),
            jnp.asarray(sigma), jnp.asarray(K), levels=1, culls=0, frame_id=fid)
        obj, ref = mk(np.roll(img, 1, 1), 1), mk(img, 0)
        xi = jnp.asarray([0.01, 0, 0, 0, 0, 0], jnp.float32)
        t_cfg = TrackerConfig()
        fn = jax.jit(lambda o, r, x: sharded_gn_normal_equations(
            o.scenes[0], r.scenes[0], x, 0, t_cfg, mesh))
        results["tracking"][n] = _timeit(fn, obj, ref, xi)

        # --- mapping: epipolar depth update, rows sharded ---
        hist = push(KeyframeHistory.create(4, h, w), ref)
        m_cfg = MapperConfig(crop_x=(2, w - 3), crop_y=(2, h - 3))
        key = jax.random.PRNGKey(0)
        age = jnp.zeros((h, w), jnp.int32)
        fn_m = jax.jit(lambda o, x, d, s: sharded_depth_update(
            o.scenes[0], x, x, d, s, age, hist, key, m_cfg, mesh))
        results["mapping"][n] = _timeit(
            fn_m, obj, xi, jnp.asarray(depth), jnp.asarray(sigma))

        # --- BA: fixed window, keyframes sharded (STRONG scaling — the
        # photometric pair count is O(M^2), so growing M with devices would
        # grow per-device work; a production BA window is fixed size) ---
        m_kf = max(args.kf_per_device * max(counts), 4)
        window, _ = _make_window(rng, m=m_kf, h=48, w=64, pose_noise=0.003)
        if m_kf % n == 0:
            kf_mesh = make_mesh((n,), ("kf",), jax.devices()[:n])
            ba_cfg = BAConfig(iterations=2)
            fn_b = jax.jit(lambda win: bundle_adjust_sharded(win, ba_cfg, kf_mesh))
            results["ba"][n] = _timeit(fn_b, window, reps=3)

    base = counts[0]
    for layer, times in results.items():
        for n, t in times.items():
            if layer == "ba":
                eff = times[base] / (t * n / base)  # strong: ideal t1/n
                metric = "strong_scaling_ba"
            else:
                eff = times[base] / t               # weak: ideal constant t
                metric = f"weak_scaling_{layer}"
            print(json.dumps({
                "metric": metric,
                "devices": n,
                "seconds": round(t, 5),
                "efficiency_vs_1dev": round(eff, 3),
            }))
    nmax = counts[-1]
    print(json.dumps({
        "metric": "scaling_efficiency_min",
        "value": round(min(
            (results[l][base] / results[l][nmax]) / (nmax / base if l == "ba" else 1.0)
            for l in results if nmax in results[l]
        ), 3),
        "unit": f"x{nmax}dev_vs_x{base}dev",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
