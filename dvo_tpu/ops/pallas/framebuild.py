"""Fused frame-build kernel: the whole image pyramid — every level's
gray/depth/sigma planes, validity masks, and central-difference gradients —
in ONE Pallas launch.

Reference being replaced: the per-level ``cullImage`` + ``gradiate`` chain
(src/core/convert.cpp:7-75 via src/system/frame.cpp:30-37).

Measured boundary (round 5, PROBE_r05.json): 2x faster than the XLA build
STANDALONE (0.54 vs 1.05 ms amortized at the 212x256 4-level RGB-D
operating point) but neutral-to-1-3%-slower inside the full jitted
pipeline, where XLA fuses the build into neighbouring ops — round 4's
1.67 ms "build" attribution turned out to be the in-scan full-resolution
input slicing, fixed by ``models/odometry._cull_chunk``.  The pipeline
therefore defaults to the XLA build; this kernel is the opt-in
(``DVO_FUSED_BUILD=1``) fallback that bounds the build cost should that
fusion regress, and the standalone fast path (closure re-tracking,
probes).

TPU shape of the math (Mosaic cannot lower strided slices — probed, round
5 — so point-sample decimation becomes MXU work):

* decimation by ``2**t`` = two one-hot selection matmuls,
  ``plane_t = R_t @ plane @ C_t`` with R_t (Ht, H0), C_t (W0, Wt) —
  EXACT under ``Precision.HIGHEST`` (the 6-pass bf16 expansion represents
  every f32 operand exactly, and a one-hot contraction is a pure copy);
* central differences (NOT halved, convert.cpp:48) = two ``pltpu.roll``
  VPU shifts per level with border/validity masking via iota masks;
* masks ride the same selection matmuls as 0/1 f32 and exit as bool.

Everything stays in VMEM: at the 256x212 RGB-D base the inputs + all 28
output planes + selection matrices total ~2.5 MB of the 16 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_pyramid_planes", "cull_pyramid_one", "cull_pyramid_pair"]


def _sizes(h0: int, w0: int, t: int):
    """Output size of a 2**t point-sample decimation: ceil(n / 2**t)."""
    r = 2 ** t
    return -(-h0 // r), -(-w0 // r)


@functools.lru_cache(maxsize=None)
def _selectors(h0: int, w0: int, t: int):
    """One-hot (Ht, H0) row / (W0, Wt) column selection matrices for a
    2**t stride (reference cullImage samples src[y*r, x*r],
    convert.cpp:16)."""
    r = 2 ** t
    ht, wt = _sizes(h0, w0, t)
    R = np.zeros((ht, h0), np.float32)
    R[np.arange(ht), np.arange(ht) * r] = 1.0
    C = np.zeros((w0, wt), np.float32)
    C[np.arange(wt) * r, np.arange(wt)] = 1.0
    return R, C


def _decimate(plane, R, C):
    """plane (H0, W0) -> (Ht, Wt) by one-hot selection matmuls (exact)."""
    rows = jnp.dot(R, plane, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(rows, C, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _gradients(gray, maskf):
    """Central differences + validity at one level (convert.cpp:41-75):
    gx = I[x+1] - I[x-1] (un-halved); a gradient pixel is valid iff both
    neighbours are in-bounds and valid."""
    h, w = gray.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    in_x = (xs >= 1) & (xs <= w - 2)
    in_y = (ys >= 1) & (ys <= h - 2)
    # pltpu.roll requires non-negative shifts: shift w-1 along lanes is the
    # circular equivalent of -1 (the wrapped values land only on border
    # pixels, which the in_x/in_y masks zero out below).
    gx = pltpu.roll(gray, w - 1, 1) - pltpu.roll(gray, 1, 1)
    gy = pltpu.roll(gray, h - 1, 0) - pltpu.roll(gray, 1, 0)
    # Validity needs both NEIGHBOURS valid (centre validity is not part of
    # the reference's gradiate gate, convert.cpp:52-66 — ops/image.gradients
    # matches; stay bit-identical to it).
    mx = pltpu.roll(maskf, w - 1, 1) > 0.5
    mx &= pltpu.roll(maskf, 1, 1) > 0.5
    my = pltpu.roll(maskf, h - 1, 0) > 0.5
    my &= pltpu.roll(maskf, 1, 0) > 0.5
    gmask = mx & my & in_x & in_y
    zero = jnp.float32(0)
    gx = jnp.where(in_x, gx, zero)
    gy = jnp.where(in_y, gy, zero)
    return gx, gy, gmask


def _build_kernel(levels, h0, w0, value_refs, mask_ref, sel_refs, out_refs):
    """Kernel body shared by every entry point: value planes decimated per
    level via the R/C selector refs; the mask (if present) rides as 0/1 f32
    and triggers mask + gradient outputs for plane 0 (gray)."""
    oi = 0
    for i in range(levels):
        t = levels - 1 - i   # coarsest-first (frame.cpp:30-37)
        if t == 0:
            planes = [ref[:] for ref in value_refs]
            maskf = mask_ref[:] if mask_ref is not None else None
        else:
            Rr, Cr = sel_refs[t]
            planes = [_decimate(ref[:], Rr[:], Cr[:]) for ref in value_refs]
            maskf = (_decimate(mask_ref[:], Rr[:], Cr[:])
                     if mask_ref is not None else None)
        for p in planes:
            out_refs[oi][:] = p
            oi += 1
        if maskf is not None:
            out_refs[oi][:] = maskf > 0.5
            oi += 1
            gx, gy, gmask = _gradients(planes[0], maskf)
            out_refs[oi][:] = gx
            out_refs[oi + 1][:] = gy
            out_refs[oi + 2][:] = gmask
            oi += 3


@functools.lru_cache(maxsize=None)
def _pyramid_call(levels: int, h0: int, w0: int, n_val: int,
                  with_mask: bool, interpret: bool):
    """Cached pallas_call for one (shape, plane-count) configuration.
    Returns fn(*value_planes[, maskf]) -> flat tuple of per-level outputs;
    the one-hot selector matrices are appended as trailing inputs (Pallas
    kernels cannot capture constants)."""
    n_in = n_val + (1 if with_mask else 0)
    sel_np = {t: _selectors(h0, w0, t) for t in range(1, levels)}
    n_sel = 2 * len(sel_np)

    def kernel(*refs):
        ins = refs[:n_in]
        sel_flat = refs[n_in:n_in + n_sel]
        outs = refs[n_in + n_sel:]
        sel_refs = {
            t: (sel_flat[2 * k], sel_flat[2 * k + 1])
            for k, t in enumerate(sorted(sel_np))
        }
        mask_ref = ins[n_val] if with_mask else None
        _build_kernel(levels, h0, w0, ins[:n_val], mask_ref, sel_refs, outs)

    out_shapes = []
    for i in range(levels):
        t = levels - 1 - i
        ht, wt = _sizes(h0, w0, t)
        for _ in range(n_val):
            out_shapes.append(jax.ShapeDtypeStruct((ht, wt), jnp.float32))
        if with_mask:
            out_shapes.append(jax.ShapeDtypeStruct((ht, wt), jnp.bool_))
            out_shapes.append(jax.ShapeDtypeStruct((ht, wt), jnp.float32))
            out_shapes.append(jax.ShapeDtypeStruct((ht, wt), jnp.float32))
            out_shapes.append(jax.ShapeDtypeStruct((ht, wt), jnp.bool_))

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_in + n_sel),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        interpret=interpret,
    )
    # Keep the selectors as NumPy: the factory is lru_cached across jit
    # traces, and a jnp constant materialized inside one trace leaks into
    # the next (UnexpectedTracerError); NumPy operands become per-trace
    # constants.
    sel_args = tuple(m for t in sorted(sel_np) for m in sel_np[t])

    def run(*planes):
        return call(*planes, *sel_args)

    return run


def build_pyramid_planes(gray, mask, depth, sigma, levels: int,
                         interpret: bool = False):
    """All pyramid planes in one launch.  Inputs are BASE-level (post-cull)
    (H0, W0): gray f32 [0,1], mask bool, depth/sigma f32.  Returns a list
    of per-level dicts (coarsest first) with keys
    gray/depth/sigma/mask/gx/gy/gmask — exactly the planes
    ``models.frame._pyramid`` derives (ops/image.cull_image + gradients),
    bit-identical to the XLA build (tests/test_pallas.py)."""
    h0, w0 = gray.shape
    call = _pyramid_call(levels, h0, w0, 3, True, interpret)
    flat = call(gray, depth, sigma, mask.astype(jnp.float32))
    out, k = [], 0
    for _ in range(levels):
        g, d, s, m, gx, gy, gm = flat[k:k + 7]
        out.append(dict(gray=g, depth=d, sigma=s, mask=m,
                        gx=gx, gy=gy, gmask=gm))
        k += 7
    return out


def cull_pyramid_one(plane, levels: int, interpret: bool = False):
    """Single-plane pyramid re-derivation (``with_depth`` with sigma kept):
    one launch, list of per-level planes, coarsest first."""
    h0, w0 = plane.shape
    call = _pyramid_call(levels, h0, w0, 1, False, interpret)
    return list(call(plane))


def cull_pyramid_pair(depth, sigma, levels: int, interpret: bool = False):
    """Depth/sigma-only pyramid re-derivation (reference
    Frame::updateDepthSigma, frame.cpp:39-61) in one launch — used by
    ``models.frame.with_depth`` after every mapping/regularize write.
    Returns list of (depth_t, sigma_t), coarsest first."""
    h0, w0 = depth.shape
    call = _pyramid_call(levels, h0, w0, 2, False, interpret)
    flat = call(depth, sigma)
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(levels)]
