"""Loop-amortized TPU phase probe — the honest successor to bench_probe.py.

Round-2's probe timed single dispatches, but the axon tunnel has a ~27 ms
round-trip floor (measured: a trivial jitted op + 1-element fetch), so every
sub-30ms op measured as "~28 ms" regardless of its real device cost, and
full-array np.asarray fetches turned throughput numbers into tunnel-bandwidth
numbers (~44 MB/s).

Fix: every op here is repeated K times INSIDE one device program (lax.scan
with a value dependency so nothing folds away), the program returns a single
scalar, and per-iteration time = (total - rtt) / K.  That isolates on-device
execution from tunnel RTT and fetch bandwidth.

Usage: python bench_probe2.py [section ...]
Sections: rtt mxu track map reg prop pipeline batched (default: all).
Writes PROBE_r05_probe2.json with every measurement (earlier artifacts:
PROBE_r03.json, PROBE_r04.json — committed immutable).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache (shared with bench.py): repeat probe runs
# skip the tunnel's slow AOT compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax import lax

RESULTS = {}
_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("DVO_PROBE_BUDGET_S", "480"))


class BudgetExceeded(Exception):
    pass


def _watchdog():
    """Last-resort self-exit if a single compile parks past the budget
    (tunnel wedge): still better than an external SIGKILL, and it flushes
    the partial results file first."""
    import threading

    def run():
        time.sleep(_BUDGET_S + 120)
        try:
            _write_results()
        except Exception:
            pass
        print("watchdog: wedged past budget — self-exiting", flush=True)
        os._exit(3)

    threading.Thread(target=run, daemon=True).start()


def _write_results():
    merged = {}
    try:
        with open("PROBE_r05_probe2.json") as f:
            merged = json.load(f)
    except Exception:
        pass
    merged.update(RESULTS)
    with open("PROBE_r05_probe2.json", "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote PROBE_r05_probe2.json", flush=True)


def _check_budget():
    """Exit cleanly before any external timeout can SIGKILL us — an
    abruptly killed client wedges the tunnel's compile service for every
    later process (observed repeatedly this round)."""
    if time.perf_counter() - _T0 > _BUDGET_S:
        raise BudgetExceeded()


def _fetch_scalar(r):
    # Reduce whatever comes back to one element BEFORE fetching: the fetch
    # must be O(1) bytes or we time the tunnel, not the device.
    leaf = jax.tree.leaves(r)[0]
    return float(np.asarray(leaf.ravel()[0] if leaf.ndim else leaf))


def timed(tag, f, *a, n=3):
    _check_budget()
    t0 = time.perf_counter()
    _fetch_scalar(f(*a))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _fetch_scalar(f(*a))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{tag}: median {med:.2f}ms (compile {compile_s:.1f}s, all "
          f"{[f'{t*1e3:.1f}' for t in ts]})", flush=True)
    RESULTS[tag] = med
    return med


def loop_timed(tag, step, x0, K):
    """Time K chained applications of ``step`` inside ONE program.
    ``step``: x -> x (same pytree structure)."""

    @jax.jit
    def prog(x):
        return lax.fori_loop(0, K, lambda i, c: step(c), x)

    def scalarize(x):
        return jax.tree.leaves(prog(x))[0]

    total = timed(f"{tag} (K={K} total)", scalarize, x0)
    rtt = RESULTS.get("rtt-floor", 0.0)
    per = (total - rtt) / K
    print(f"{tag}: {per*1e3:.1f} us/iter  ({per:.3f} ms)", flush=True)
    RESULTS[tag] = per
    return per


def sec_rtt():
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: (a @ a)[0, 0])
    timed("rtt-floor", f, x, n=5)


def sec_mxu():
    a = jnp.ones((2048, 2048), jnp.bfloat16)
    K = 200

    @jax.jit
    def prog(a):
        return lax.fori_loop(0, K, lambda i, x: x @ a, a)[0, 0]

    t = timed(f"mm-2048-bf16-x{K}", prog, a)
    rtt = RESULTS.get("rtt-floor", 0.0)
    tf = (2 * 2048**3 * K) / max(t - rtt, 1e-3) / 1e9
    print(f"  -> {tf:.1f} TFLOP/s bf16", flush=True)
    RESULTS["mxu_tflops_bf16"] = tf


def _track_step(cfg_kwargs, obj, ref):
    from dvo_tpu.config import TrackerConfig
    from dvo_tpu.models.tracker import track

    cfg = TrackerConfig(**cfg_kwargs)

    def step(g):
        import dataclasses as dc
        o = obj
        # dependency: perturb obj gray by carried scalar (0 in practice)
        sc = dc.replace(o.scenes[-1], gray=o.scenes[-1].gray + g[0, 0] * 0.0)
        o = dc.replace(o, scenes=tuple(o.scenes[:-1]) + (sc,))
        xi = track(o, ref, cfg).xi
        return g + xi[0] * 0.0

    return step


def sec_track():
    """Variants filtered by DVO_PROBE_FILTER (comma-separated substrings)
    so one probe invocation fits a bounded wall-clock window."""
    import os

    import __graft_entry__ as g

    filt = [f for f in os.environ.get("DVO_PROBE_FILTER", "").split(",") if f]
    for (h, w, lv, tag) in [(120, 160, 3, "160x120"), (212, 256, 4, "256x212")]:
        obj, ref = g._synthetic_frames(h, w, levels=lv)
        x0 = jnp.zeros((8, 128), jnp.float32)
        for backend in ("xla", "pallas"):
            for ee in (True, False):
                name = f"track-{tag}-{backend}-ee{int(ee)}"
                if filt and not any(f in name for f in filt):
                    continue
                loop_timed(
                    name,
                    _track_step(dict(backend=backend, early_exit=ee), obj, ref),
                    x0, K=30,
                )


def sec_map():
    import __graft_entry__ as g
    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update, depth_update_pallas

    for (h, w, tag) in [(120, 160, "160x120"), (212, 256, "256x212")]:
        obj, ref = g._synthetic_frames(h, w, levels=3)
        hist = push(KeyframeHistory.create(8, h, w), ref)
        key = jax.random.PRNGKey(0)
        xi = jnp.asarray([0.02, 0, 0, 0, 0, 0], jnp.float32)
        age = jnp.zeros((h, w), jnp.int32)
        mc = MapperConfig()
        base = ref.base

        def mk(fn):
            def step(d_s):
                d, s = d_s
                nd, ns, _, _ = fn(
                    obj.base, xi, xi, d, s, age, hist, key, mc
                )
                return (nd, ns)
            return step

        x0 = (base.depth, base.sigma)
        loop_timed(f"depthupd-{tag}-xla", mk(depth_update), x0, K=20)
        loop_timed(f"depthupd-{tag}-pallas", mk(depth_update_pallas), x0, K=20)


def sec_reg():
    from dvo_tpu.config import MapperConfig
    from dvo_tpu.models.mapper import regularize, propagate
    from dvo_tpu.ops.pallas.regularize import regularize_pallas

    mc = MapperConfig()
    h, w = 120, 160
    key = jax.random.PRNGKey(0)
    d = jax.random.uniform(key, (h, w), minval=0.5, maxval=3.0)
    s = jnp.full((h, w), 0.3)
    loop_timed("regularize-160x120-xla",
               lambda ds: (regularize(ds[0], ds[1], mc), ds[1]), (d, s), K=50)
    loop_timed("regularize-160x120-pallas",
               lambda ds: (regularize_pallas(ds[0], ds[1], mc), ds[1]), (d, s), K=50)

    from dvo_tpu.config import InitConfig
    xi = jnp.asarray([0.02, 0, 0, 0, 0, 0], jnp.float32)
    K3 = jnp.asarray([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]], jnp.float32)
    age = jnp.zeros((h, w), jnp.int32)

    def prop_step(ds):
        nd, ns, _ = propagate(ds[0], ds[1], age, xi, K3, mc, InitConfig())
        return (nd, ns)

    loop_timed("propagate-160x120", prop_step, (d, s), K=50)


def sec_framebuild():
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.frame import build_frame

    cfg = DVOConfig.monocular()
    g0 = jnp.ones((480, 640), jnp.float32) * 0.5
    m0 = jnp.ones((480, 640), bool)
    K = jnp.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], jnp.float32)
    key = jax.random.PRNGKey(0)

    def step(g):
        fr = build_frame(g, m0, K, cfg.pyramid.levels, cfg.pyramid.culls,
                         key, 0, cfg.init)
        return g + fr.base.gray[0, 0] * 0.0

    loop_timed("framebuild-640x480", step, g0, K=50)


def sec_pipeline():
    import bench
    from dvo_tpu.config import DVOConfig
    import dataclasses as dc
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    frames, K = bench._load_frames(97)
    H, W = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    rtt = RESULTS.get("rtt-floor", 0.0)

    variants = {
        "full": DVOConfig.monocular(),
        "ee0": dc.replace(DVOConfig.monocular(),
                          tracker=dc.replace(DVOConfig.monocular().tracker,
                                             early_exit=False)),
        "xla": dc.replace(
            DVOConfig.monocular(),
            tracker=dc.replace(DVOConfig.monocular().tracker, backend="xla"),
            mapper=dc.replace(DVOConfig.monocular().mapper, backend="xla"),
        ),
    }
    for name, cfg in variants.items():
        n = 96
        masks = jnp.ones((n, H, W), bool)
        state = monocular_init(jnp.asarray(frames[0]), mask, Kd,
                               jax.random.PRNGKey(0), cfg)
        dev = jnp.asarray(np.stack(frames[1:n + 1]))

        def prog(s, d):
            _, res = monocular_run(s, d, masks, Kd, cfg)
            return jnp.sum(res.T_world)

        t = timed(f"mono-run-96f-{name}", jax.jit(prog), state, dev)
        per = (t - rtt) / n
        print(f"  -> {per:.2f} ms/frame = {1e3/per:.1f} fps", flush=True)
        RESULTS[f"mono_ms_per_frame_{name}"] = per


def sec_batched():
    """B-scaling curve of the vmapped multi-stream mode, plus the
    early-exit-vs-masked-scan question under vmap.  Expected shape: the
    Pallas kernels batch as a leading grid dimension, and grid steps run
    sequentially on the v5e's single TensorCore — so kernel time scales
    ~B while the XLA overhead amortizes; the curve locates how much of the
    frame is which."""
    import dataclasses as dc

    import bench
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import (
        monocular_init_batched, monocular_run_batched,
    )

    chunk = 24
    frames, K = bench._load_frames(chunk + 1)
    h, w = frames[0].shape
    base_arr = np.stack(frames)
    Kd = jnp.asarray(K)
    rtt = RESULTS.get("rtt-floor", 0.0)
    cfg_ee = DVOConfig.monocular()
    cfg_scan = dc.replace(
        cfg_ee, tracker=dc.replace(cfg_ee.tracker, early_exit=False)
    )

    for tag, cfg, bs in (
        ("ee", cfg_ee, (1, 2, 4, 8)),
        ("scan", cfg_scan, (8,)),
    ):
        for b in bs:
            grays = np.stack(
                [np.roll(base_arr, 3 * s, axis=2) for s in range(b)]
            )
            masks = jnp.ones((b, chunk, h, w), bool)
            dev = jnp.asarray(grays[:, 1:])
            states = monocular_init_batched(
                jnp.asarray(grays[:, 0]), masks[:, 0], Kd,
                jax.random.PRNGKey(0), cfg,
            )

            def prog(s, d):
                _, res = monocular_run_batched(s, d, masks, Kd, cfg)
                return jnp.sum(res.T_world)

            t = timed(f"batched-{tag}-B{b}-{chunk}f", jax.jit(prog),
                      states, dev)
            agg = b * chunk / max(t - rtt, 1e-6) * 1e3
            print(f"  -> {agg:.1f} aggregate fps", flush=True)
            RESULTS[f"batched_{tag}_b{b}_agg_fps"] = agg


def sec_phases():
    """Locate the per-frame device time by differential config degradation:
    full pipeline vs crippled-tracker (max_iterations=1) vs crippled-march
    (max_steps=4) vs both.  full - crippled_tracker ~ GN compute;
    full - crippled_march ~ epipolar march compute; both-crippled ~ fixed
    overhead (frame build, propagate, regularize, scan/cond dispatch)."""
    import dataclasses as dc

    import bench
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    frames, K = bench._load_frames(97)
    H, W = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    rtt = RESULTS.get("rtt-floor", 0.0)
    base = DVOConfig.monocular()

    variants = {
        "full": base,
        "iter1": dc.replace(base, tracker=dc.replace(base.tracker, max_iterations=1)),
        "march4": dc.replace(base, mapper=dc.replace(base.mapper, max_steps=4)),
        "iter1march4": dc.replace(
            base,
            tracker=dc.replace(base.tracker, max_iterations=1),
            mapper=dc.replace(base.mapper, max_steps=4),
        ),
    }
    n = 96
    masks = jnp.ones((n, H, W), bool)
    dev = jax.device_put(np.stack(frames[1:n + 1]))
    jax.block_until_ready(dev)
    for name, cfg in variants.items():
        state = monocular_init(jnp.asarray(frames[0]), mask, Kd,
                               jax.random.PRNGKey(0), cfg)

        def prog(s, d):
            _, res = monocular_run(s, d, masks, Kd, cfg)
            return jnp.sum(res.T_world)

        t = timed(f"phase-{name}-96f", jax.jit(prog), state, dev)
        per = (t - rtt) / n
        print(f"  -> {per:.3f} ms/frame", flush=True)
        RESULTS[f"phase_ms_per_frame_{name}"] = per


def sec_phases2():
    """Round-4 finer attribution of the ~1.9 ms/frame orchestration share
    (round-3 VERDICT items 2/7).  All loop-amortized over a 96-frame
    on-device chunk:

      full          - the shipping pipeline (deferred grads; warm start
                      is OFF in the monocular preset — config.py note)
      warm          - warm_start ON: the constant-velocity prior's cost
      update_only   - keyframe policy never fires: no propagate/push/ring
      promote_only  - promotes every frame: no epipolar update
      build_scan    - lax.scan that ONLY builds frames (no track, no map):
                      frame build + scan glue in isolation
      build_nograd  - same without gradient planes: the deferred-gradient
                      saving inside the scan
    """
    import dataclasses as dc

    import bench
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.frame import build_frame
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    frames, K = bench._load_frames(97)
    H, W = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    rtt = RESULTS.get("rtt-floor", 0.0)
    base = DVOConfig.monocular()
    n = 96
    masks = jnp.ones((n, H, W), bool)
    dev = jax.device_put(np.stack(frames[1:n + 1]))
    jax.block_until_ready(dev)

    variants = {
        "full": base,
        "warm": dc.replace(
            base, tracker=dc.replace(base.tracker, warm_start=True)
        ),
        "update_only": dc.replace(
            base, mapper=dc.replace(base.mapper, min_movement=1e9,
                                    max_forward=10 ** 8),
        ),
        "promote_only": dc.replace(
            base, mapper=dc.replace(base.mapper, max_forward=1),
        ),
    }
    for name, cfg in variants.items():
        state = monocular_init(jnp.asarray(frames[0]), mask, Kd,
                               jax.random.PRNGKey(0), cfg)

        def prog(s, d):
            _, res = monocular_run(s, d, masks, Kd, cfg)
            return jnp.sum(res.T_world)

        t = timed(f"phase2-{name}-96f", jax.jit(prog), state, dev)
        per = (t - rtt) / n
        print(f"  -> {per:.3f} ms/frame", flush=True)
        RESULTS[f"phase2_ms_per_frame_{name}"] = per

    key = jax.random.PRNGKey(0)
    for grads in (True, False):

        def build_prog(_z, d, _g=grads):
            def step(carry, g):
                fr = build_frame(
                    g, mask, Kd, base.pyramid.levels, base.pyramid.culls,
                    key, 0, base.init, with_grads=_g,
                )
                # Reduce EVERY produced plane at every level: a scalar
                # slice lets XLA dead-code-eliminate the whole build
                # (observed: the first version measured ~0 ms/frame).
                acc = carry
                for s in fr.scenes:
                    acc = acc + jnp.sum(s.gray) + jnp.sum(s.depth)
                    if _g:
                        acc = acc + jnp.sum(s.gx) + jnp.sum(s.gy)
                return acc, None

            out, _ = lax.scan(step, jnp.float32(0), d)
            return out

        tag = "build_scan" if grads else "build_nograd"
        t = timed(f"phase2-{tag}-96f", jax.jit(build_prog), jnp.float32(0), dev)
        per = (t - rtt) / n
        print(f"  -> {per:.3f} ms/frame", flush=True)
        RESULTS[f"phase2_ms_per_frame_{tag}"] = per


def sec_rgbd_phases():
    """RGB-D phase breakdown at the real 512x424 kinect operating point
    (round-3 VERDICT item 7: 8.2 ms/frame had >= 4 ms unattributed).
    full vs iter1 (GN iterations beyond the first) vs a build-only scan
    (frame build + scan glue)."""
    import dataclasses as dc

    import bench
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.frame import build_frame_with_depth
    from dvo_tpu.models.odometry import rgbd_init, rgbd_run

    grays, depths, sigmas, K = bench._kinect_frames(17)
    H, W = grays[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    rtt = RESULTS.get("rtt-floor", 0.0)
    base = DVOConfig.rgbd()
    n = 16
    masks = jnp.ones((n, H, W), bool)
    g_d, d_d, s_d = (
        jax.device_put(np.stack(x[1:n + 1])) for x in (grays, depths, sigmas)
    )
    jax.block_until_ready((g_d, d_d, s_d))

    variants = {
        "full": base,
        "no_warm": dc.replace(
            base, tracker=dc.replace(base.tracker, warm_start=False)
        ),
        "iter1": dc.replace(
            base, tracker=dc.replace(base.tracker, max_iterations=1)
        ),
    }
    state0 = rgbd_init(jnp.asarray(grays[0]), mask, jnp.asarray(depths[0]),
                       jnp.asarray(sigmas[0]), Kd, base)
    for name, cfg in variants.items():

        def prog(s, g, d, sg):
            _, res = rgbd_run(s, g, masks, d, sg, Kd, cfg)
            return jnp.sum(res.T_world)

        t = timed(f"rgbd-phase-{name}-16f", jax.jit(prog), state0, g_d, d_d, s_d)
        per = (t - rtt) / n
        print(f"  -> {per:.3f} ms/frame", flush=True)
        RESULTS[f"rgbd_phase_ms_per_frame_{name}"] = per

    def build_prog(_z, g, d, sg):
        def step(carry, inp):
            gg, dd, ss = inp
            fr = build_frame_with_depth(
                gg, mask, dd, ss, Kd, base.pyramid.levels,
                base.pyramid.culls, 0,
            )
            acc = carry
            for s in fr.scenes:   # full materialization (no DCE) — see
                acc = acc + jnp.sum(s.gray) + jnp.sum(s.depth)  # phases2
                acc = acc + jnp.sum(s.gx) + jnp.sum(s.gy)
            return acc, None

        out, _ = lax.scan(step, jnp.float32(0), (g, d, sg))
        return out

    t = timed("rgbd-phase-build-16f", jax.jit(build_prog), jnp.float32(0),
              g_d, d_d, s_d)
    per = (t - rtt) / n
    print(f"  -> {per:.3f} ms/frame", flush=True)
    RESULTS["rgbd_phase_ms_per_frame_build_scan"] = per


def main():
    sections = sys.argv[1:] or ["rtt", "mxu", "track", "map", "reg",
                                "framebuild", "pipeline"]
    _watchdog()
    print("devices:", jax.devices(), flush=True)
    fns = {
        "rtt": sec_rtt, "mxu": sec_mxu, "track": sec_track, "map": sec_map,
        "reg": sec_reg, "framebuild": sec_framebuild, "pipeline": sec_pipeline,
        "phases": sec_phases, "batched": sec_batched,
        "phases2": sec_phases2, "rgbdphases": sec_rgbd_phases,
    }
    try:
        if "rtt" not in sections:
            sec_rtt()  # always need the floor
        for s in sections:
            fns[s]()
    except BudgetExceeded:
        print(f"budget {_BUDGET_S:.0f}s exceeded — exiting cleanly with "
              "partial results", flush=True)
    _write_results()


if __name__ == "__main__":
    main()
