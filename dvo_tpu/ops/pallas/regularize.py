"""Depth regularizer as a single-block Pallas kernel — the companion
elementwise depth-filter kernel (reference Implement::regularize,
src/map/implement.cpp:156-180).

Sequentially fuses the left/right/down/up neighbours into each pixel with
the compatibility-gated Gaussian (no reset, gaussian.cpp:33-50), reading
neighbour values from the ORIGINAL maps (the running mean/sigma only evolve
in the accumulator), then clamps to the 6 m cap (implement.cpp:178).

The whole image lives in VMEM (a 512x424 f32 map is < 1 MB); neighbour
access is a ``pltpu.roll`` with an iota boundary mask, and the four gated
fusions + clamp run as one fused register pipeline — nothing intermediate
touches HBM.  The XLA twin is ``models.mapper.regularize``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvo_tpu.config import MapperConfig


def _regularize_kernel(depth_ref, sigma_ref, out_ref, *, cfg: MapperConfig):
    h, w = depth_ref.shape
    depth = depth_ref[:]
    sigma = sigma_ref[:]
    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dcfg = cfg.depth_filter

    mu, sg = depth, sigma
    # Neighbour order: left, right, down, up (implement.cpp:160).  The value
    # of the neighbour at (x+dx, y+dy) is roll(img, (-dy, -dx)); rolled
    # wrap-around values are gated off by the boundary mask.
    for dx, dy in ((-1, 0), (1, 0), (0, 1), (0, -1)):
        # pltpu.roll takes non-negative shifts; -k == size-k (wrap-around
        # values are gated off by the boundary mask below).
        sy, sx2 = (-dy) % h, (-dx) % w
        nd = pltpu.roll(pltpu.roll(depth, sy, 0), sx2, 1)
        ns = pltpu.roll(pltpu.roll(sigma, sy, 0), sx2, 1)
        ok = (
            (xs + dx >= 0) & (xs + dx < w) & (ys + dy >= 0) & (ys + dy < h)
        )
        # Gated Gaussian fusion (ops/depth_filter.gaussian_fuse semantics).
        diff = jnp.abs(nd - mu)
        m = jnp.minimum(nd, diff)
        gain = jnp.where(m < dcfg.gain_ramp, 0.5 + m / dcfg.gain_ramp * 0.5, 1.0)
        ok &= diff <= gain * jnp.maximum(sg, ns)
        v1 = sg * sg
        v2 = ns * ns
        v = v1 + v2
        safe_v = jnp.where(v < 1e-12, 1.0, v)
        mu_new = (v2 * mu + v1 * nd) / safe_v
        sg_new = jnp.sqrt(v1 * v2 / safe_v)
        mu = jnp.where(ok, mu_new, mu)
        sg = jnp.where(ok, sg_new, sg)
    out_ref[:] = jnp.minimum(mu, cfg.max_depth)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def regularize_pallas(
    depth,
    sigma,
    cfg: MapperConfig = MapperConfig(),
    interpret: bool = False,
):
    """Pallas twin of ``models.mapper.regularize`` (whole image, depth out)."""
    h, w = depth.shape
    return pl.pallas_call(
        functools.partial(_regularize_kernel, cfg=cfg),
        in_specs=[
            pl.BlockSpec((h, w), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=interpret,
    )(depth, sigma)
