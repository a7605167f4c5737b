"""Fused epipolar depth observation as a Pallas TPU kernel (HOT LOOP #2).

Reference: src/map/implement.cpp:106-152 (doMatching march), :49-71
(depthEstimate), :73-104 (sigmaEstimate), fused with the Gaussian
depth-filter update src/math/gaussian.cpp:12-31 (mapper.cpp:122-131 gates +
fusion) — the whole per-pixel tail of ``Mapper::update`` runs in one
VMEM-resident pass; only the final depth/sigma/age maps and three stat
scalars leave the core.

Execution model: grid over 8-row blocks, each block lane-packed into ONE
(1, 8W) vector program; a ``fori_loop`` marches the S-step epipolar
segments of all 8 rows together.  TPU has no per-lane gather, so each
step's bilinear sample over every born keyframe is one MXU matmul against
the (C*win, Wimg) stacked ring-buffer window (x-interpolation for all C
slots and 8 rows at once) followed by a masked sublane reduction that
fuses the y-interpolation with the per-pixel ring-slot selection.  The
SSD window, argmin, match gates, triangulation, Engel13 sigma model, and
the compatibility-gated Gaussian fusion (with PRNG reset drawn outside)
are vector ops over the block's 8W lanes.

The geometry planes that depend only on the *prior* (segment endpoints,
triangulation coefficients) are precomputed by XLA in
``models.mapper.depth_update_pallas`` — they are cheap dense math; the
kernel owns the gather-bound march.

Performance status (round 3, device-side measurement): this kernel IS the
TPU default (config.resolve_backend).  Round 2 left two contradictory
claims in the repo because its timings were taken per-dispatch through a
tunnel with a ~29 ms RTT floor — worthless for ops this small.  The
round-3 probe (bench_probe2.py / PROBE_r03.json, loop-amortized) puts the
XLA twin's 120x160 depth update at ~102 ms on device — its per-pixel
gathers lower to scalar-core loops — while this fused lane-packed kernel
runs the same update in **0.61 ms** (2.79 ms at 256x212).  A per-slot
predicated march variant measured slower (0.97 ms: M=48 sub-matmuls tile
poorly on the 128-wide MXU) and was dropped.  The XLA twin remains the
exact-reference-semantics oracle for parity tests and the CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvo_tpu.config import MapperConfig

_BLOCK_H = 8
_STATS_W = 128

# Field-plane indices of the stacked per-pixel input (F, H, W).
(
    F_START_X, F_START_Y, F_DIR_X, F_DIR_Y, F_LENGTH, F_OBJ_VAL, F_SLOT,
    F_PRIOR_D, F_PRIOR_S, F_DMIN, F_DMAX,
    F_R3Q, F_KRQ0, F_KRQ1, F_KRQ2, F_TTZ, F_KT0, F_KT1, F_KT2,
    F_REF_DEPTH, F_REF_SIGMA, F_REF_AGE, F_BASE_OK, F_RESET_D,
) = range(24)
N_FIELDS = 24


def _epipolar_kernel(
    fields_ref,     # VMEM (1, F, BW=8*W): the block's 8 image rows packed
                    # along lanes (lane l -> row l // W, x = l % W)
    born_ref,       # VMEM (4*C*h_pad, W): gray | gx | gy | gmask stacks
    maps_out,       # VMEM (1, 8, BW): plane 0 depth | 1 sigma | 2 age
    stats_out,      # VMEM (1, 8, _STATS_W); row 0: observed|accepted|rejected
    win_ref,        # VMEM scratch (4*C*win, W); dummy when win == h_pad
    *,
    capacity: int,
    full_h: int,
    full_w: int,
    steps: int,     # S: window count (match offsets 1..S; S+2 samples)
    win: int,       # y-window rows gathered per block (== h_pad: exact)
    h_pad: int,     # per-slot row stride in born_ref (full_h rounded up to
                    # 8 so every slot's static offset is sublane-aligned
                    # for Mosaic; pad rows are zero => gmask invalid)
    cfg: MapperConfig,
):
    # Lane-packed execution (round 3): the 8 rows of a block are processed
    # as ONE (1, 8W) vector program instead of a fori_loop of (1, W) rows.
    # Every march step is a single (C*win, Wimg) x (Wimg, 8W) MXU matmul —
    # 8x fewer matmul invocations at 8x the N dimension (far better MXU
    # tiling), the y-window gather copy runs once per block instead of once
    # per row, and the whole triangulation/sigma/fusion tail vectorizes
    # over 8W lanes.  The cost: the y-window and march trip count are
    # per-block (union of 8 rows) instead of per-row.
    bw = _BLOCK_H * full_w
    ch = capacity * h_pad
    cwin = capacity * win
    big = jnp.float32(2.0 * cfg.ssd_window)
    # Matmul mode follows the born stack's dtype (set by the wrapper from
    # cfg.pallas_precision): bf16 = one MXU pass per contraction, f32 =
    # HIGHEST (6 passes) for exact parity with the XLA twin.
    mm_dtype = born_ref.dtype
    mm_precision = (
        lax.Precision.DEFAULT if mm_dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    )

    ww_sub = lax.broadcasted_iota(jnp.int32, (full_w, bw), 0)  # img-x / sublane
    hw_sub = lax.broadcasted_iota(jnp.int32, (cwin, bw), 0)
    yw_sub = hw_sub % win                                      # window-y in slot
    c_sub = hw_sub // win                                      # ring slot id

    f = lambda k: fields_ref[0, pl.ds(k, 1), :]                # (1, BW)
    sx, sy = f(F_START_X), f(F_START_Y)
    dx, dy = f(F_DIR_X), f(F_DIR_Y)
    length = f(F_LENGTH)
    obj_v = f(F_OBJ_VAL)
    slot = f(F_SLOT).astype(jnp.int32)
    slot_mask = (c_sub == slot).astype(jnp.float32)            # (C*win, BW)

    # ---- y-window for the block's segments (config.py gather_window):
    # cover [min endpoint y - 1, ...] over all 8 rows' valid segments;
    # samples past the window top are invalidated (only unusually steep
    # segments' deepest hypotheses).  win == h_pad: y0 = 0, exact. ----
    base_ok = f(F_BASE_OK) > 0.5
    if win < h_pad:
        ey = sy + length * dy
        seg_ymin = jnp.min(
            jnp.where(base_ok, jnp.minimum(sy, ey), jnp.float32(full_h))
        )
        y0_row = jnp.clip(
            jnp.floor(seg_ymin).astype(jnp.int32) - 1, 0, full_h - win
        )
        # Mosaic requires dynamic sublane offsets provably 8-aligned;
        # round down (window start only moves earlier, and samples past
        # the window top are gated invalid below).
        y0_row = pl.multiple_of((y0_row // 8) * 8, 8)
        for k in range(4):
            for c in range(capacity):
                win_ref[
                    pl.ds((k * capacity + c) * win, win), :
                ] = born_ref[pl.ds(k * ch + c * h_pad + y0_row, win), :]
        gray_src = win_ref.at[pl.ds(0, cwin), :]
        grad_src = win_ref.at[pl.ds(cwin, 3 * cwin), :]
    else:
        y0_row = jnp.int32(0)
        gray_src = born_ref.at[pl.ds(0, ch), :]
        grad_src = born_ref.at[pl.ds(ch, 3 * ch), :]

    def sample_gray(px, py):
        """Bilinear sample of the per-pixel born image (XLA twin
        semantics: clamped corners fall back onto the base corner,
        valid iff the floor corner is in bounds — and, in windowed
        mode, inside the gathered y-window)."""
        x0f = jnp.floor(px)
        y0f = jnp.floor(py)
        fx = px - x0f
        fy = py - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        ok = (x0 >= 0) & (x0 < full_w) & (y0 >= 0) & (y0 < full_h)
        if win < h_pad:
            ok &= (y0 >= y0_row) & (y0 + 1 <= y0_row + win - 1)
        x0c = jnp.clip(x0, 0, full_w - 1)
        x1c = jnp.clip(x0 + 1, 0, full_w - 1)
        y0c = jnp.clip(y0, 0, full_h - 1) - y0_row              # window-rel
        y1c = jnp.clip(y0 + 1, 0, full_h - 1) - y0_row
        wx = jnp.where(ww_sub == x0c, 1.0 - fx, 0.0) + jnp.where(
            ww_sub == x1c, fx, 0.0
        )                                                       # (Wimg, BW)
        xs = lax.dot_general(
            gray_src[...], wx.astype(mm_dtype), (((1,), (0,)), ((), ())),
            precision=mm_precision,
            preferred_element_type=jnp.float32,
        )                                                       # (C*win, BW)
        wy = (
            jnp.where(yw_sub == y0c, 1.0 - fy, 0.0)
            + jnp.where(yw_sub == y1c, fy, 0.0)
        ) * slot_mask
        v = jnp.sum(wy * xs, axis=0, keepdims=True)             # (1, BW)
        return v, ok

    # ---- S-step masked SSD march (implement.cpp:106-152) ----
    w0, w1, w2 = 1.0 / 3.0, 2.0 / 3.0, 1.0

    def march(o, mc):
        d2p2, d2p1, okp2, okp1, min_ssd, best_s = mc
        of = jnp.float32(o)
        v, ok = sample_gray(sx + of * dx, sy + of * dy)
        d2 = (v - obj_v) ** 2
        okf = ok.astype(jnp.float32)
        # Window s = o-1 completes at o >= 2; march gate (s-1) < length.
        ssd = w0 * d2p2 + w1 * d2p1 + w2 * d2
        win_ok = (
            (okp2 * okp1 * okf) > 0.5
        ) & ((of - 2.0) < length) & (o >= 2)
        ssd = jnp.where(win_ok, ssd, big)
        better = ssd < min_ssd
        min_ssd = jnp.where(better, ssd, min_ssd)
        # Window index i = o-2 (offsets i, i+1, i+2; match at i+1).
        best_s = jnp.where(better, of - 2.0, best_s)
        return d2p1, d2, okp1, okf, min_ssd, best_s

    zero = sx * 0.0  # data-dependent zero (replicated-layout workaround)
    init = (zero, zero, zero, zero, zero + big, zero)
    # Dynamic trip count: offsets past (length + 2) are masked out of
    # every SSD window by win_ok, so skipping them is exact — the
    # reference's own march runs `while t < length` (implement.cpp:141).
    # Per-block: the longest valid segment among the 8 rows bounds the
    # march for all of them (shorter rows' extra offsets are masked).
    row_len = jnp.max(jnp.where(base_ok, length, 0.0))
    n_off = jnp.minimum(
        jnp.ceil(row_len).astype(jnp.int32) + 4, steps + 2
    )
    _, _, _, _, min_ssd, best_s = lax.fori_loop(0, n_off, march, init)

    match_ok = min_ssd <= cfg.ssd_window * cfg.matching_threshold_ratio
    best_o = best_s + 1.0
    mx = sx + best_o * dx
    my = sy + best_o * dy
    # Reference bounds gate on the match (implement.cpp:186-190, incl.).
    match_ok &= (mx >= 0) & (my >= 0) & (mx <= full_w) & (my <= full_h)

    # ---- gradient samples at the match: nearest, clamped ----
    bxi = jnp.rint(mx).astype(jnp.int32)
    byi = jnp.rint(my).astype(jnp.int32)
    g_in = (bxi >= 0) & (bxi < full_w) & (byi >= 0) & (byi < full_h)
    if win < h_pad:
        g_in &= (byi >= y0_row) & (byi <= y0_row + win - 1)
    bxc = jnp.clip(bxi, 0, full_w - 1)
    byc = jnp.clip(byi, 0, full_h - 1) - y0_row                 # window-rel
    wxg = jnp.where(ww_sub == bxc, 1.0, 0.0)                   # (Wimg, BW)
    xg = lax.dot_general(
        grad_src[...], wxg.astype(mm_dtype), (((1,), (0,)), ((), ())),
        precision=mm_precision,
        preferred_element_type=jnp.float32,
    )                                                           # (3*C*win, BW)
    wyg = jnp.where(yw_sub == byc, 1.0, 0.0) * slot_mask
    gxv = jnp.sum(wyg * xg[0:cwin], axis=0, keepdims=True)
    gyv = jnp.sum(wyg * xg[cwin : 2 * cwin], axis=0, keepdims=True)
    gmv = jnp.sum(wyg * xg[2 * cwin : 3 * cwin], axis=0, keepdims=True)
    g_ok = g_in & (gmv > 0.5)

    # ---- triangulation (implement.cpp:49-71; coefficients precomputed) ----
    r3q = f(F_R3Q)
    a0 = r3q * mx - f(F_KRQ0)
    a1 = r3q * my - f(F_KRQ1)
    a2 = r3q - f(F_KRQ2)
    ttz = f(F_TTZ)
    b0 = ttz * mx - f(F_KT0)
    b1 = ttz * my - f(F_KT1)
    b2 = ttz - f(F_KT2)
    a_dot_a = a0 * a0 + a1 * a1 + a2 * a2
    a_dot_b = a0 * b0 + a1 * b1 + a2 * b2
    new_depth = -a_dot_b / jnp.where(a_dot_a < 1e-20, 1.0, a_dot_a)

    # ---- sigma model (implement.cpp:73-104) ----
    eps = 1e-6
    g_dot_l = jnp.abs(gxv * (-dx) + gyv * (-dy))
    gp2 = g_dot_l / length
    epi = cfg.epipolar_sigma ** 2 / jnp.maximum(g_dot_l * g_dot_l, eps)
    lum = 2.0 * cfg.luminance_sigma ** 2 / jnp.maximum(gp2, eps)
    alpha = (f(F_DMAX) - f(F_DMIN)) / length
    new_sigma = alpha * jnp.sqrt(epi + lum)

    # ---- observation gates (mapper.cpp:122) ----
    obs_ok = base_ok & match_ok & g_ok
    obs_ok &= (new_depth > cfg.accept_depth[0]) & (new_depth < cfg.accept_depth[1])
    obs_ok &= (new_sigma > cfg.accept_sigma[0]) & (new_sigma < cfg.accept_sigma[1])

    # ---- fused Gaussian update with reset (gaussian.cpp:12-31) ----
    dcfg = cfg.depth_filter
    mu = f(F_PRIOR_D)
    sg = f(F_PRIOR_S)
    diff = jnp.abs(new_depth - mu)
    m = jnp.minimum(new_depth, diff)
    gain = jnp.where(m < dcfg.gain_ramp, 0.5 + m / dcfg.gain_ramp * 0.5, 1.0)
    gate_ok = diff <= gain * jnp.maximum(sg, new_sigma)
    ok = gate_ok & obs_ok
    rejected = (~gate_ok) & obs_ok
    v1 = sg * sg
    v2 = new_sigma * new_sigma
    v = v1 + v2
    safe_v = jnp.where(v < 1e-12, 1.0, v)
    mu_new = (v2 * mu + v1 * new_depth) / safe_v
    sigma_new = jnp.sqrt(v1 * v2 / safe_v)
    fused_d = jnp.where(ok, mu_new, jnp.where(rejected, f(F_RESET_D), mu))
    fused_s = jnp.where(
        ok, sigma_new, jnp.where(rejected, dcfg.reset_sigma, sg)
    )

    maps_out[:] = jnp.concatenate(
        [
            jnp.where(obs_ok, fused_d, f(F_REF_DEPTH)),
            jnp.where(obs_ok, fused_s, f(F_REF_SIGMA)),
            jnp.where(rejected, 0.0, f(F_REF_AGE)),
            jnp.zeros((5, bw), jnp.float32),
        ],
        axis=0,
    ).reshape(1, 8, bw)

    cells = [
        jnp.sum(obs_ok.astype(jnp.float32)).reshape(1, 1),
        jnp.sum(ok.astype(jnp.float32)).reshape(1, 1),
        jnp.sum(rejected.astype(jnp.float32)).reshape(1, 1),
    ]
    row = jnp.concatenate(
        cells + [jnp.zeros((1, _STATS_W - 3), jnp.float32)], axis=1
    )
    stats_out[:] = jnp.concatenate(
        [row, jnp.zeros((7, _STATS_W), jnp.float32)], axis=0
    ).reshape(1, 8, _STATS_W)


@functools.partial(jax.jit, static_argnames=("capacity", "cfg", "interpret"))
def epipolar_update_pallas(
    fields,        # (F=24, H, W) f32 stacked per-pixel planes
    born_stack,    # (4*C*H, W) f32: gray | gx | gy | gmask
    capacity: int | None = None,
    cfg: MapperConfig = MapperConfig(),
    interpret: bool = False,
):
    """Run the fused march/triangulate/filter kernel over a whole image.
    Returns (depth (H,W), sigma (H,W), age_f (H,W), stats (3,) f32)."""
    nf, h, w = fields.shape
    assert nf == N_FIELDS, nf
    c = born_stack.shape[0] // (4 * h)
    if capacity is not None:
        assert c == capacity, (c, capacity)

    pad = (-h) % _BLOCK_H
    if pad:
        # Padded rows: base_ok stays 0 (zero fill) so they write ref values
        # of 0 — sliced off below.
        fields = jnp.pad(fields, ((0, 0), (0, pad), (0, 0)))
    n_blocks = (h + pad) // _BLOCK_H
    # Lane-pack each 8-row block: (F, H, W) -> (F, nb, 8W) is a contiguous
    # reshape (lane l of a block row <-> image row l // W, x = l % W), then
    # transpose to (nb, F, 8W) so the per-block slice is a legal Mosaic
    # block (second-to-last dim F = 24, divisible by 8); the kernel runs
    # each block as one (1, 8W) vector program.
    bw = _BLOCK_H * w
    fields = fields.reshape(nf, n_blocks, bw).transpose(1, 0, 2)

    # Per-slot rows round up to 8 (h8) so every slot's static offset in the
    # born stack is sublane-aligned for Mosaic's dynamic window slice; pad
    # rows are zero (gmask invalid), so samples touching them are gated.
    h8 = h + ((-h) % 8)
    if h8 != h:
        born_stack = jnp.pad(
            born_stack.reshape(4 * c, h, w), ((0, 0), (0, h8 - h), (0, 0))
        ).reshape(4 * c * h8, w)

    # y-window for the march's gather matmuls (config.py gather_window),
    # rounded up to a multiple of 8 so scratch copy destinations stay
    # sublane-aligned.
    if 0 < cfg.gather_window < h:
        win = cfg.gather_window + ((-cfg.gather_window) % 8)
        if win >= h8:
            win = h8
    else:
        win = h8

    kernel = functools.partial(
        _epipolar_kernel,
        capacity=c,
        full_h=h,
        full_w=w,
        # March length matches the XLA twin: max_steps + 2 window positions
        # (models/mapper.py depth_update's S), sampled at offsets 0..S+1.
        steps=cfg.max_steps + 2,
        win=win,
        h_pad=h8,
        cfg=cfg,
    )
    maps, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, N_FIELDS, bw), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4 * c * h8, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, bw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, _STATS_W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 8, bw), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 8, _STATS_W), jnp.float32),
        ],
        scratch_shapes=[
            # Gather-window scratch (4 channel groups x C slots x win rows);
            # token-sized in exact mode (win == h8, kernel reads born_ref).
            pltpu.VMEM(
                (4 * c * win if win < h8 else 8, w), born_stack.dtype
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(fields, born_stack)
    depth = maps[:, 0].reshape(h + pad, w)[:h]
    sigma = maps[:, 1].reshape(h + pad, w)[:h]
    age_f = maps[:, 2].reshape(h + pad, w)[:h]
    return depth, sigma, age_f, jnp.sum(stats[:, 0], axis=0)[:3]
