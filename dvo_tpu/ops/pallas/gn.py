"""Fused photometric GN linearization as a single Pallas TPU kernel.

The flagship kernel (reference HOT LOOP #1, src/track/optimize.cpp:28-97;
SURVEY.md §2 #14): per-pixel warp -> bilinear sample -> residual -> 1x6
Jacobian -> 6x6 normal-equation accumulation, all in one VMEM-resident pass.
The XLA twin (models/tracker.gn_terms) materializes ~10 intermediate (H, W)
arrays in HBM between fused sub-kernels; here the whole linearization runs
out of VMEM and only 44 floats leave the core per row-block.

Sampling strategy: TPU has no per-lane VMEM gather, so bilinear
interpolation is computed with *transposed* one-hot contractions that stay
reshape-free (Mosaic supports no layout-changing reshapes):

  the 8 rows of a block are lane-packed into (1, 8W);
  Wx (Wimg, 8W) one-hot of x-corners -> X = ref_window (C*win, Wimg) @ Wx
  Wy (win, 8W)  one-hot of y-corners -> out_c = sum_sublanes(Wy * X_c)

i.e. ONE MXU matmul per GN iteration per block gathers+x-interpolates all
C channels for all 8 rows of points, and a masked sublane reduction
finishes the y-interpolation.

Semantics vs the reference: clamp-to-edge at the outermost fractional
row/col instead of the base-corner fallback (convert.cpp:88-101), and a
sample is valid only if every contributing corner is valid (no cyclic
corner fill, convert.cpp:158).  Both differences touch only mask-boundary
pixels; the `gather` sampler keeps exact reference semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvo_tpu.config import TrackerConfig

_OUT_W = 128  # padded accumulator row: 36 (H) + 6 (g) + 1 (r^2) + 1 (count)
_BLOCK_H = 8


def _gn_kernel(
    params_ref,      # SMEM (1, 24): T_inv (16) | fx fy cx cy | step | pad
    obj_ref,         # VMEM (1, 8, BW=8*W): the block's 8 rows lane-packed;
                     # planes 0..3 = obj gray | obj mask | ref depth |
                     # ref sigma (4 zero pad planes for sublane tiling)
    ref_stack_ref,   # VMEM (5*h_pad, W): gray | mask | gx | gy | gmask
    out_ref,         # VMEM (1, 8, _OUT_W)
    win_ref,         # VMEM scratch (5*win, W) gather window (dummy if exact)
    *,
    full_h: int,
    full_w: int,
    min_depth: float,
    sigma_lo: float,
    sigma_hi: float,
    weight_b_only: bool,
    crop: tuple | None,
    precision_mode: str,
    win: int,        # y-window rows gathered per block (== h_pad: exact)
    h_pad: int,      # per-channel row stride in ref_stack (full_h rounded
                     # up to 8 so every channel's static offset is
                     # sublane-aligned for Mosaic; pad rows are zero)
):
    # Lane-packed execution (round 3): the block's 8 rows are ONE (1, 8W)
    # vector program — the bilinear gather is a single
    # (5*win, Wimg) x (Wimg, 8W) MXU matmul per GN iteration per block
    # instead of a fori_loop of 8 narrow ones, and the Jacobian/residual/
    # normal-equation tail vectorizes over all 8W lanes.
    bi = pl.program_id(0)
    w = full_w
    bw = _BLOCK_H * w
    # cfg.pallas_precision: "bf16" -> inputs cast to bf16 by the wrapper,
    # one MXU pass; "high" -> f32 inputs, manual 3-pass bf16x3 split
    # (hi.hi + hi.lo + lo.hi, f32 accumulate — Mosaic's dot lowering has no
    # Precision.HIGH, so the split is spelled out); "f32" -> HIGHEST,
    # 6 passes, exact-parity mode.
    mm_dtype = ref_stack_ref.dtype
    _dims = (((1,), (0,)), ((), ()))

    if precision_mode == "high":

        def mm_dot(a, b):
            a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
            a_hi = a32.astype(jnp.bfloat16)
            b_hi = b32.astype(jnp.bfloat16)
            a_lo = (a32 - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def dot(x, y):
                return lax.dot_general(
                    x, y, _dims, precision=lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )

            return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)

    else:
        _prec = (
            lax.Precision.DEFAULT if precision_mode == "bf16"
            else lax.Precision.HIGHEST
        )

        def mm_dot(a, b):
            return lax.dot_general(
                a, b, _dims, precision=_prec,
                preferred_element_type=jnp.float32,
            )
    # Interpolation weights round at ~1e-3 in bf16; the all-corners-valid
    # test must leave room for that.
    mask_thresh = 0.99 if mm_dtype == jnp.bfloat16 else 1.0 - 1e-4

    T = [[params_ref[0, 4 * r + c] for c in range(4)] for r in range(4)]
    fx, fy = params_ref[0, 16], params_ref[0, 17]
    cx, cy = params_ref[0, 18], params_ref[0, 19]
    step = params_ref[0, 20]

    lane = lax.broadcasted_iota(jnp.int32, (1, bw), 1)
    ys = (lane // w + bi * _BLOCK_H).astype(jnp.float32)   # image row
    xs = (lane % w).astype(jnp.float32)                    # image col

    obj_gray = obj_ref[0, pl.ds(0, 1), :]                  # (1, BW)
    obj_mask = obj_ref[0, pl.ds(1, 1), :]
    depth = obj_ref[0, pl.ds(2, 1), :]
    sigma = obj_ref[0, pl.ds(3, 1), :]
    X = depth * (xs - cx) / fx        # back-project (transform.cpp:25-28)
    Y = depth * (ys - cy) / fy
    Z = depth
    Xj = T[0][0] * X + T[0][1] * Y + T[0][2] * Z + T[0][3]
    Yj = T[1][0] * X + T[1][1] * Y + T[1][2] * Z + T[1][3]
    Zj = T[2][0] * X + T[2][1] * Y + T[2][2] * Z + T[2][3]
    in_front = Zj > 1e-6
    safe_zj = jnp.where(jnp.abs(Zj) < 1e-6, 1e-6, Zj)
    wx = fx * Xj / safe_zj + cx
    wy = fy * Yj / safe_zj + cy

    ww_sub = lax.broadcasted_iota(jnp.int32, (full_w, bw), 0)  # img-x / sublane
    hh_sub = lax.broadcasted_iota(jnp.int32, (win, bw), 0)     # window-y / sublane

    # --- y-window selection (win < h_pad): the one-hot gather matmul costs
    # O(rows_gathered * Wimg) MACs, and a block's warped points cluster
    # vertically (inter-frame motion is small once coarser levels have
    # aligned), so gathering a `win`-row window around their mean instead
    # of the full image cuts the dominant matmul by full_h / win.  Points
    # outside the window sample a zero mask channel and are invalidated —
    # identical results, slightly fewer valid pixels for extreme warps
    # (win == h_pad is exact). ---
    if win < h_pad:
        geo_ok = (
            (depth >= min_depth) & in_front
            & (wx >= 0) & (wx < full_w) & (wy >= 0) & (wy < full_h)
        ).astype(jnp.float32)
        wy_cl = jnp.clip(wy, 0.0, full_h - 1.0)
        denom = jnp.maximum(jnp.sum(geo_ok), 1.0)
        y_mean = jnp.sum(wy_cl * geo_ok) / denom
        y0_blk = jnp.clip(
            jnp.round(y_mean).astype(jnp.int32) - win // 2, 0, full_h - win
        )
        # Mosaic requires dynamic sublane offsets provably 8-aligned; round
        # down (window shifts <= 7 rows; out-of-window samples are already
        # invalidated by the validity gate below).
        y0_blk = pl.multiple_of((y0_blk // 8) * 8, 8)
        for c in range(5):
            win_ref[c * win : (c + 1) * win, :] = ref_stack_ref[
                pl.ds(c * h_pad + y0_blk, win), :
            ]
        gather_src = win_ref
    else:
        y0_blk = jnp.int32(0)
        gather_src = ref_stack_ref

    # One matmul x-interpolates all 5 channels for all 8 rows; a masked
    # sublane reduction per channel y-interpolates.
    x0f = jnp.floor(wx)
    y0f = jnp.floor(wy)
    fxr = wx - x0f
    fyr = wy - y0f
    x0r = jnp.clip(x0f.astype(jnp.int32), 0, full_w - 1)
    x1r = jnp.clip(x0f.astype(jnp.int32) + 1, 0, full_w - 1)
    y0r = jnp.clip(y0f.astype(jnp.int32), 0, full_h - 1)
    y1r = jnp.clip(y0f.astype(jnp.int32) + 1, 0, full_h - 1)
    wx_mat = jnp.where(ww_sub == x0r, 1.0 - fxr, 0.0) + jnp.where(
        ww_sub == x1r, fxr, 0.0
    )                                                          # (Wimg, BW)
    Xs = mm_dot(gather_src[:], wx_mat.astype(mm_dtype))        # (5*win, BW)
    # y one-hots in window coordinates (y0_blk == 0 when win == h_pad).
    y0w = y0r - y0_blk
    y1w = y1r - y0_blk
    wy_mat = jnp.where(hh_sub == y0w, 1.0 - fyr, 0.0) + jnp.where(
        hh_sub == y1w, fyr, 0.0
    )                                                          # (win, BW)

    def ysum(c):
        return jnp.sum(wy_mat * Xs[c * win : (c + 1) * win], axis=0,
                       keepdims=True)                          # (1, BW)

    i2, m2, gx, gy, gm = ysum(0), ysum(1), ysum(2), ysum(3), ysum(4)

    # ---- validity (optimize.cpp:33-63) ----
    valid = (depth >= min_depth) & in_front
    valid &= obj_mask > 0.5
    valid &= (wx >= 0) & (wx < full_w) & (wy >= 0) & (wy < full_h)
    if win < h_pad:
        # Both y corners must sit inside the gathered window (a partially
        # covered sample could sneak past the mask threshold at tiny fy).
        y0b = jnp.clip(jnp.floor(wy).astype(jnp.int32), 0, full_h - 1)
        valid &= (y0b >= y0_blk) & (y0b + 1 <= y0_blk + win - 1)
    valid &= (m2 > mask_thresh) & (gm > mask_thresh)
    if crop is not None:
        cx0, cx1, cy0, cy1 = crop
        valid &= (xs >= cx0) & (xs <= cx1) & (ys >= cy0) & (ys <= cy1)
    vf = valid.astype(jnp.float32)

    # ---- Jacobian + residual (optimize.cpp:67-89) ----
    zsafe = jnp.where(jnp.abs(Z) < 1e-6, 1e-6, Z)
    fgx = fx * gx
    fgy = fy * gy
    xz = X / zsafe
    yz = Y / zsafe
    J = [
        fgx / zsafe,
        fgy / zsafe,
        -(fgx * X + fgy * Y) / (zsafe * zsafe),
        -fgx * xz * yz - fgy * (1.0 + yz * yz),
        fgx * (1.0 + xz * xz) + fgy * xz * yz,
        -fgx * yz + fgy * xz,
    ]
    r = i2 - obj_gray
    weight = step / jnp.clip(sigma, sigma_lo, sigma_hi)

    # 6x6 + 6 accumulators as masked reductions (a (N, 6) matrix would need
    # a layout-changing reshape Mosaic doesn't do).
    hw = vf if weight_b_only else vf * weight   # weight on H (fixed mode)
    gw = vf * weight                            # weight on g (both modes)
    cells = []
    for a in range(6):
        for b in range(6):
            cells.append(jnp.sum(J[a] * J[b] * hw).reshape(1, 1))
    for a in range(6):
        cells.append(jnp.sum(J[a] * r * gw).reshape(1, 1))
    cells.append(jnp.sum(r * r * vf).reshape(1, 1))
    cells.append(jnp.sum(vf).reshape(1, 1))
    row_acc = jnp.concatenate(
        cells + [jnp.zeros((1, _OUT_W - 44), jnp.float32)], axis=1
    )
    out_ref[:] = jnp.concatenate(
        [row_acc, jnp.zeros((7, _OUT_W), jnp.float32)], axis=0
    ).reshape(1, 8, _OUT_W)


@functools.partial(jax.jit, static_argnames=("level_index", "cfg", "interpret"))
def gn_terms_pallas(
    obj_gray, obj_mask,
    ref_depth, ref_sigma,
    ref_gray, ref_mask, ref_gx, ref_gy, ref_gmask,
    K, T_inv,
    level_index: int,
    cfg: TrackerConfig,
    interpret: bool = False,
):
    """Pallas twin of models.tracker.gn_terms (whole image).  Takes the
    precomputed T_inv = se3_exp(-xi) so the Lie exponential stays outside
    the kernel.  Returns (H (6,6), g (6,), residual_sum, count)."""
    h, w = obj_gray.shape
    # Pad rows to a block multiple; padded rows are invalid (mask 0, depth 0
    # fails the min-depth gate).
    pad = (-h) % _BLOCK_H
    if pad:
        rows = ((0, pad), (0, 0))
        obj_gray = jnp.pad(obj_gray, rows)
        obj_mask = jnp.pad(obj_mask, rows)
        ref_depth = jnp.pad(ref_depth, rows)
        ref_sigma = jnp.pad(ref_sigma, rows, constant_values=1.0)
    n_blocks = (h + pad) // _BLOCK_H
    # Lane-pack each 8-row block: (H, W) -> (nb, 8W) is a contiguous
    # reshape (lane l of a block row <-> image row l // W, x = l % W); the
    # kernel runs each block as one (1, 8W) vector program.  The four
    # per-pixel planes stack on a middle sublane axis padded to 8 (Mosaic
    # requires the block's second-to-last dim divisible by 8).
    bw = _BLOCK_H * w
    obj_stack = jnp.stack(
        [
            obj_gray.reshape(n_blocks, bw),
            obj_mask.astype(jnp.float32).reshape(n_blocks, bw),
            ref_depth.reshape(n_blocks, bw),
            ref_sigma.reshape(n_blocks, bw),
        ],
        axis=1,
    )
    obj_stack = jnp.pad(obj_stack, ((0, 0), (0, 4), (0, 0)))

    # Per-channel rows round up to 8 (h8) so every channel's static offset
    # in the stack is sublane-aligned for Mosaic's dynamic window slice;
    # pad rows are zero in every channel, so a sample touching them fails
    # the mask-validity gate.
    h8 = h + ((-h) % 8)
    rpad = ((0, h8 - h), (0, 0))

    def _pc(a):
        return jnp.pad(a, rpad) if h8 != h else a

    ref_stack = jnp.concatenate(
        [
            _pc(ref_gray),
            _pc(ref_mask.astype(jnp.float32)),
            _pc(ref_gx),
            _pc(ref_gy),
            _pc(ref_gmask.astype(jnp.float32)),
        ],
        axis=0,
    )
    if cfg.pallas_precision == "bf16":
        # Single-pass MXU sampling contractions (config.py note); the f32
        # mode exists for exact-parity tests against the XLA twin.
        ref_stack = ref_stack.astype(jnp.bfloat16)

    step = cfg.level_steps[min(level_index, len(cfg.level_steps) - 1)]
    params = jnp.concatenate([
        T_inv.reshape(16),
        jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2], step, 0, 0, 0], jnp.float32),
    ]).reshape(1, 24)

    crop = None
    if level_index == cfg.crop_level:
        crop = (float(cfg.crop_x[0]), float(cfg.crop_x[1]),
                float(cfg.crop_y[0]), float(cfg.crop_y[1]))

    # y-window size for the gather matmul (kernel docstring): exact full-H
    # gather when disabled or when the image is already small.  The window
    # rounds up to a multiple of 8 so the scratch copy destinations stay
    # sublane-aligned.
    if 0 < cfg.gather_window < h:
        win = cfg.gather_window + ((-cfg.gather_window) % 8)
        if win >= h8:
            win = h8
    else:
        win = h8

    kernel = functools.partial(
        _gn_kernel,
        full_h=h,
        full_w=w,
        min_depth=cfg.min_depth,
        sigma_lo=cfg.sigma_clamp[0],
        sigma_hi=cfg.sigma_clamp[1],
        weight_b_only=cfg.compat_weight_b_only,
        crop=crop,
        precision_mode=cfg.pallas_precision,
        win=win,
        h_pad=h8,
    )

    row_block = pl.BlockSpec((1, 8, bw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    full_stack = pl.BlockSpec((5 * h8, w), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_block,
            full_stack,
        ],
        out_specs=pl.BlockSpec(
            (1, 8, _OUT_W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, _OUT_W), jnp.float32),
        scratch_shapes=[
            # Gather-window scratch; token-sized when the exact full-H
            # gather is in use (win == h8) and the kernel reads ref_stack
            # directly.
            pltpu.VMEM((5 * win if win < h8 else 8, w), ref_stack.dtype),
        ],
        # The replicated ref stack (5H x W) is double-buffered by the
        # pipeline; at Kinect resolution that plus the one-hot temporaries
        # exceeds the default 16 MB scoped budget — raise it (v5e has
        # headroom above the conservative default).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(params, obj_stack, ref_stack)
    acc = jnp.sum(out[:, 0], axis=0)
    Hmat = acc[:36].reshape(6, 6)
    g = acc[36:42]
    return Hmat, g, acc[42], acc[43].astype(jnp.int32)
