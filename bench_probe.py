"""One-off TPU probe: honest (fetch-synced) timings for each pipeline phase.

The axon tunnel's ``block_until_ready`` has been observed returning before
remote execution completes, so every timing here forces a small
device->host fetch of one output element — the only sync that provably
round-trips.  Results print as they land (the tunnel's compile path can be
minutes-slow; run under a long timeout).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

# NB: do NOT enable the persistent compilation cache here — the axon
# remote-compile path has been observed hanging when it is on.


def timed(tag, f, *a, n=5):
    t0 = time.perf_counter()
    r = f(*a)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*a)
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{tag}: median {med:.2f}ms  (all: {[f'{t*1e3:.1f}' for t in ts]})", flush=True)
    return med


def main():
    print("devices:", jax.devices(), flush=True)

    # RTT floor
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a @ a)
    rtt = timed("tiny-rtt", f, x)

    # MXU sanity: 10 chained 2048^3 bf16 matmuls in one program
    a = jnp.ones((2048, 2048), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(0, 10, lambda i, x: x @ a, a))
    t = timed("mm10-2048-bf16", mm, a)
    print(f"  -> {(2 * 2048**3 * 10) / max(t - rtt, 1e-3) / 1e9:.1f} TFLOP/s", flush=True)

    import __graft_entry__ as g
    from dvo_tpu.config import TrackerConfig, MapperConfig
    from dvo_tpu.models.tracker import track

    obj, ref = g._synthetic_frames(120, 160, levels=3)
    tr_x = jax.jit(lambda o, r: track(o, r, TrackerConfig(backend="xla")).xi)
    tr_p = jax.jit(lambda o, r: track(o, r, TrackerConfig(backend="pallas")).xi)
    timed("track-160x120-xla", tr_x, obj, ref)
    timed("track-160x120-pallas", tr_p, obj, ref)

    # RGB-D operating point
    obj4, ref4 = g._synthetic_frames(212, 256, levels=4)
    tr_x4 = jax.jit(lambda o, r: track(o, r, TrackerConfig(backend="xla")).xi)
    tr_p4 = jax.jit(lambda o, r: track(o, r, TrackerConfig(backend="pallas")).xi)
    timed("track-256x212-xla", tr_x4, obj4, ref4)
    timed("track-256x212-pallas", tr_p4, obj4, ref4)

    # mapper: depth update at 160x120
    from dvo_tpu.models.history import KeyframeHistory, push
    from dvo_tpu.models.mapper import depth_update, depth_update_pallas

    h, w = 120, 160
    hist = KeyframeHistory.create(8, h, w)
    hist = push(hist, ref)
    key = jax.random.PRNGKey(0)
    xi = jnp.asarray([0.02, 0, 0, 0, 0, 0], jnp.float32)
    age = jnp.zeros((h, w), jnp.int32)
    mc = MapperConfig()

    du_x = jax.jit(
        lambda o, x, d, s, a, hh, k: depth_update(o, x, x, d, s, a, hh, k, mc)
    )
    du_p = jax.jit(
        lambda o, x, d, s, a, hh, k: depth_update_pallas(
            o, x, x, d, s, a, hh, k, mc, interpret=False
        )
    )
    base = ref.base
    timed("depthupd-160x120-xla", du_x, obj.base, xi, base.depth, base.sigma, age, hist, key)
    timed("depthupd-160x120-pallas", du_p, obj.base, xi, base.depth, base.sigma, age, hist, key)

    # full monocular chunk (24 frames, 640x480 input)
    import bench
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    cfg = DVOConfig.monocular()
    frames, K = bench._load_frames(25)
    H, W = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    masks = jnp.ones((24, H, W), bool)
    state = monocular_init(jnp.asarray(frames[0]), mask, Kd, jax.random.PRNGKey(0), cfg)
    dev = jnp.asarray(np.stack(frames[1:25]))
    t = timed("mono-run-24f-xla", lambda s, d: monocular_run(s, d, masks, Kd, cfg)[1].T_world, state, dev, n=3)
    print(f"  -> {24 / (t / 1e3):.1f} fps", flush=True)


if __name__ == "__main__":
    main()
