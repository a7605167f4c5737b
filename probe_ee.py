"""One-off TPU probe: early-exit while_loop tracker vs masked scan, in the
full monocular pipeline (fetch-synced timing; see bench_probe.py)."""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(tag, f, *a, n=4):
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
    import bench
    from dvo_tpu.config import DVOConfig, TrackerConfig
    from dvo_tpu.models.odometry import monocular_init, monocular_run

    frames, K = bench._load_frames(25)
    H, W = frames[0].shape
    Kd = jnp.asarray(K)
    mask = jnp.ones((H, W), bool)
    masks = jnp.ones((24, H, W), bool)
    dev = jnp.asarray(np.stack(frames[1:25]))

    for ee in (True, False):
        cfg = DVOConfig.monocular()
        cfg = dataclasses.replace(cfg, tracker=dataclasses.replace(cfg.tracker, early_exit=ee))
        state = monocular_init(jnp.asarray(frames[0]), mask, Kd, jax.random.PRNGKey(0), cfg)
        t = timed(
            f"mono-24f-ee={ee}",
            lambda s, d: monocular_run(s, d, masks, Kd, cfg)[1].T_world,
            state, dev,
        )
        print(f"  -> {24 / (t / 1e3):.1f} fps", flush=True)


if __name__ == "__main__":
    main()
