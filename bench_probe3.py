"""Round-5 measurement probes -> PROBE_r05.json.

Findings these probes established (full story in BASELINE.md):

1. THE r4 "FRAME BUILD" ATTRIBUTION WAS A MISATTRIBUTION.  The dominant
   hidden cost of the *_run drivers was per-frame processing of
   full-resolution HBM-resident chunk stacks inside the scan; hoisting
   the 2**culls decimation out of the scan (models/odometry._cull_chunk,
   bit-identical) took RGB-D 5.32 -> 2.9-3.0 ms/frame and mono
   2.34 -> 1.87-1.94 — reproduced across sessions.  (The slice+sum scan
   microbench here is session-sensitive — 2.2 vs 0.27 ms/frame observed
   — the pipeline delta is the evidence.)

2. THE FUSED BUILD KERNEL IS EXACT AND 2x FASTER STANDALONE,
   NEUTRAL-TO-SLIGHTLY-SLOWER IN-PIPELINE (five A/Bs): the pipeline
   default is the XLA build; DVO_FUSED_BUILD=1 opts into the kernel
   (models/frame._use_fused_build).

3. Mosaic CANNOT lower strided slices, uint8->f32 casts, or lane-split
   reshapes in kernels (probed; compiler errors), and one-hot f32
   matmuls are NOT exact at default precision (bf16 single pass,
   ~2e-3 err) — HIGHEST (6-pass) is exact for one-hot/+-1 operands.

4. sync discipline: jax.block_until_ready returns early on the axon
   backend — every number here fetch-syncs one element
   (utils.metrics.device_sync); a session measured with bare
   block_until_ready reported rtt 0.1 ms and 9099 "TFLOP/s".
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dvo_tpu.utils.metrics import device_sync

RESULTS = {}


def timed_ms(fn, *args, n=3):
    device_sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import bench
    import dvo_tpu.models.frame as frame_mod
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import (
        monocular_init,
        monocular_run,
        rgbd_init,
        rgbd_run,
    )

    print("backend:", jax.default_backend(), flush=True)
    rtt = timed_ms(jax.jit(lambda v: v + 1), jnp.zeros((1,)))
    RESULTS["rtt_ms"] = round(rtt, 2)
    print(f"rtt {rtt:.1f} ms", flush=True)

    # --- scan-slicing baseline (finding 1) ---
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.random((16, 424, 512), np.float32))

    def scan_base(z, st):
        def step(carry, g):
            return carry + jnp.sum(g[::2, ::2]), None
        out, _ = lax.scan(step, z, st)
        return out

    t = timed_ms(jax.jit(scan_base), jnp.float32(0), stack)
    RESULTS["scan_slice_sum_ms_per_frame_424x512"] = round((t - rtt) / 16, 3)
    print(f"scan slice+sum baseline: {RESULTS['scan_slice_sum_ms_per_frame_424x512']} ms/frame",
          flush=True)

    # --- full pipelines, fused-vs-XLA build A/B (finding 2) ---
    grays, depths, sigmas, K = bench._kinect_frames(17)
    H, W = grays[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    rcfg = DVOConfig.rgbd()
    g_d, d_d, s_d = (
        jax.device_put(np.stack(v[1:17])) for v in (grays, depths, sigmas)
    )
    state0 = rgbd_init(jnp.asarray(grays[0]), mask, jnp.asarray(depths[0]),
                       jnp.asarray(sigmas[0]), Kd, rcfg)

    frames, K2 = bench._load_frames(97)
    H2, W2 = frames[0].shape
    K2d = jnp.asarray(K2)
    mask2 = jnp.ones((H2, W2), bool)
    mcfg = DVOConfig.monocular()
    mdev = jax.device_put(np.stack(frames[1:97]))
    mstate0 = monocular_init(jnp.asarray(frames[0]), mask2, K2d,
                             jax.random.PRNGKey(0), mcfg)

    orig_use_fused = frame_mod._use_fused_build
    for fused in (False, True):
        frame_mod._use_fused_build = (lambda v: (lambda: v))(fused)
        tag = "fused" if fused else "xla"

        def rprog(s, g, d, sg):
            _, res = rgbd_run(s, g, mask, d, sg, Kd, rcfg)
            return jnp.sum(res.T_world)

        t = timed_ms(jax.jit(rprog), state0, g_d, d_d, s_d)
        RESULTS[f"rgbd_run_ms_per_frame_{tag}"] = round((t - rtt) / 16, 3)

        def mprog(s, g):
            _, res = monocular_run(s, g, mask2, K2d, mcfg)
            return jnp.sum(res.T_world)

        t = timed_ms(jax.jit(mprog), mstate0, mdev)
        RESULTS[f"mono_run_ms_per_frame_{tag}"] = round((t - rtt) / 96, 3)
        print(f"{tag}: rgbd {RESULTS[f'rgbd_run_ms_per_frame_{tag}']} ms, "
              f"mono {RESULTS[f'mono_run_ms_per_frame_{tag}']} ms", flush=True)
    frame_mod._use_fused_build = orig_use_fused

    # --- fused kernel standalone (finding 2) ---
    from dvo_tpu.ops.pallas.framebuild import build_pyramid_planes

    bh, bw = 212, 256
    bx = jnp.asarray(rng.random((bh, bw), np.float32))
    bm = jnp.ones((bh, bw), bool)
    bd = jnp.asarray(rng.random((bh, bw), np.float32) + 0.5)
    bs = jnp.full((bh, bw), 0.1, jnp.float32)

    def floop(g, m, d, s):
        def body(i, carry):
            acc, gg = carry
            planes = build_pyramid_planes(gg, m, d, s, 4)
            delta = sum(jnp.sum(p["gray"]) + jnp.sum(p["gx"]) + jnp.sum(p["gy"])
                        + jnp.sum(p["depth"]) + jnp.sum(p["sigma"])
                        for p in planes)
            return acc + delta, gg + delta * 1e-30
        acc, _ = lax.fori_loop(0, 50, body, (jnp.float32(0), g))
        return acc

    t = timed_ms(jax.jit(floop), bx, bm, bd, bs)
    RESULTS["framebuild_kernel_ms_amortized"] = round(t / 50, 4)

    frame_mod._use_fused_build = lambda: False
    from dvo_tpu.models.frame import _pyramid

    def xloop(g, m, d, s):
        K3 = jnp.eye(3)

        def body(i, carry):
            acc, gg = carry
            scenes = _pyramid(gg, m, d, s, K3, 4)
            delta = sum(jnp.sum(p.gray) + jnp.sum(p.gx) + jnp.sum(p.gy)
                        + jnp.sum(p.depth) + jnp.sum(p.sigma)
                        for p in scenes)
            return acc + delta, gg + delta * 1e-30
        acc, _ = lax.fori_loop(0, 50, body, (jnp.float32(0), g))
        return acc

    t = timed_ms(jax.jit(xloop), bx, bm, bd, bs)
    RESULTS["framebuild_xla_ms_amortized"] = round(t / 50, 4)
    frame_mod._use_fused_build = orig_use_fused
    print(f"framebuild standalone: kernel "
          f"{RESULTS['framebuild_kernel_ms_amortized']} ms vs xla "
          f"{RESULTS['framebuild_xla_ms_amortized']} ms", flush=True)

    try:
        with open("PROBE_r05.json") as f:
            merged = json.load(f)
    except Exception:
        merged = {}
    merged.update(RESULTS)
    with open("PROBE_r05.json", "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
