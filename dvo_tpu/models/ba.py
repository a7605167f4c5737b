"""Windowed photometric bundle adjustment with Schur-complement depth
elimination.

A capability beyond the reference (which has no joint optimization at all —
SURVEY.md §2 parallelism note, §7 phase 5; BASELINE.json config 4): jointly
refine the camera poses and per-pixel inverse depths of an M-keyframe
window by minimizing robust photometric residuals over all ordered keyframe
pairs.

Structure (all static shapes, one jitted program):

  * Parameters: right-composed pose increments delta_k in se(3) per
    keyframe (keyframe 0 gauge-fixed) + inverse-depth increments per host
    pixel.
  * Residual r_{kj}(p) = I_j(pi(T_j^-1 T_k backproj(p, 1/rho))) - I_k(p)
    for every pixel p of host keyframe k and target j != k, masked to
    valid/visible pixels, Huber-weighted.
  * Jacobians are analytic (the tracker's direct-method chain extended
    with the target-pose and inverse-depth terms) and evaluated densely.
  * Normal system: camera block H_cc (6M x 6M), diagonal depth block
    H_dd (one scalar per host pixel), coupling H_cd.  The Schur complement
    H_cc - H_cd H_dd^-1 H_dc is accumulated as one einsum over per-pixel
    camera-gradient vectors b_p (H, W, 6M) — no sparse bookkeeping — and
    the reduced 6M x 6M system is solved by Cholesky.  Depths
    back-substitute elementwise.

On a mesh, host keyframes shard over the ``kf`` axis and the reduced system
is psum-reduced over ICI (dvo_tpu.parallel.ba).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dvo_tpu import lie
from dvo_tpu.config import BAConfig
from dvo_tpu.ops.sampling import bilinear_dense, bilinear_masked
from dvo_tpu.ops.warp import pixel_grid

_HI = lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAWindow:
    """M stacked keyframes (base pyramid level)."""

    gray: jax.Array    # (M, H, W)
    mask: jax.Array    # (M, H, W) bool
    gx: jax.Array      # (M, H, W)
    gy: jax.Array      # (M, H, W)
    gmask: jax.Array   # (M, H, W) bool
    depth: jax.Array   # (M, H, W)
    sigma: jax.Array   # (M, H, W)
    xi: jax.Array      # (M, 6) world pose twists (camera-to-world)
    K: jax.Array       # (3, 3)

    @property
    def size(self) -> int:
        return self.gray.shape[0]


def window_slots(history, m: int) -> jax.Array:
    """Ring slots of the newest ``m`` keyframes, oldest-first — the index
    map shared by ``window_from_history`` and the post-BA write-back."""
    from dvo_tpu.models.history import born_slot

    ages = jnp.arange(m - 1, -1, -1)
    return jax.vmap(lambda a: born_slot(history, a))(ages)


def window_from_history(history, K, m: int) -> BAWindow:
    """Materialize the newest ``m`` keyframes (oldest-first) from the ring
    buffer into a dense window."""
    slots = window_slots(history, m)
    take = lambda arr: arr[slots]
    return BAWindow(
        gray=take(history.gray), mask=take(history.mask),
        gx=take(history.gx), gy=take(history.gy), gmask=take(history.gmask),
        depth=take(history.depth), sigma=take(history.sigma),
        xi=history.xi[slots], K=K,
    )


def _pair_terms(window: BAWindow, T_all, k, j, cfg: BAConfig):
    """Dense residual + Jacobian terms for host keyframe k vs target j.

    ``k`` and ``j`` may be traced scalars (the host/target loops are
    ``lax.scan``s — unrolling them made XLA compile time quadratic in the
    window size).  Returns (r, w, Jk (..,6), Jj (..,6), Jrho (..,)) over
    k's pixels.
    """
    m, h, w_px = window.gray.shape
    K = window.K
    fx, fy = K[0, 0], K[1, 1]
    xs, ys = pixel_grid(h, w_px)

    # Relative transform camera_k -> camera_j: T_jk = T_j^-1 T_k.
    T_jk = lie.invert_T(T_all[j]) @ T_all[k]
    R_jk = T_jk[:3, :3]

    depth = window.depth[k]
    safe_d = jnp.maximum(depth, 1e-3)
    rho = 1.0 / safe_d

    # Host camera point and its image in camera j.
    xn = (xs - K[0, 2]) / fx
    yn = (ys - K[1, 2]) / fy
    Xk = jnp.stack([xn * safe_d, yn * safe_d, safe_d], axis=-1)
    Xj = jnp.einsum("ab,hwb->hwa", R_jk, Xk, precision=_HI) + T_jk[:3, 3]
    zj = Xj[..., 2]
    safe_z = jnp.where(jnp.abs(zj) < 1e-6, 1e-6, zj)
    u = fx * Xj[..., 0] / safe_z + K[0, 2]
    v = fy * Xj[..., 1] / safe_z + K[1, 2]

    # Samples from the target keyframe.
    i_j, samp_ok = bilinear_masked(window.gray[j], window.mask[j], u, v)
    gxv, _ = bilinear_dense(window.gx[j], u, v)
    gyv, _ = bilinear_dense(window.gy[j], u, v)
    gmask_f, _ = bilinear_dense(window.gmask[j].astype(jnp.float32), u, v)

    r = i_j - window.gray[k]

    valid = window.mask[k] & (depth > 1e-3) & (zj > 1e-3)
    valid &= samp_ok & (gmask_f > 1.0 - 1e-4)
    valid &= (u >= 0) & (u < w_px) & (v >= 0) & (v < h)
    # Semi-dense host selection: only pixels with usable host gradient carry
    # depth information; others would only blur the pose estimate.
    valid &= window.gmask[k]

    # Huber weight on the residual.
    absr = jnp.abs(r)
    w_huber = jnp.where(absr <= cfg.huber_delta, 1.0, cfg.huber_delta / jnp.maximum(absr, 1e-12))
    w_all = w_huber * valid.astype(jnp.float32)

    # du/dXj (2x3) rows folded directly with the image gradient: J_u = [gx gy].
    gfx = gxv * fx
    gfy = gyv * fy
    # dr/dXj = [gfx/z, gfy/z, -(gfx*x + gfy*y)/z^2]
    dr_dXj = jnp.stack(
        [
            gfx / safe_z,
            gfy / safe_z,
            -(gfx * Xj[..., 0] + gfy * Xj[..., 1]) / (safe_z * safe_z),
        ],
        axis=-1,
    )

    # d Xj / d delta_k = R_jk [I | -hat(Xk)]  (right increment on T_k):
    #   dr/dv_k = dr_dXj R_jk =: a
    #   dr/dw_k = -a^T hat(Xk) = -(a x Xk) = Xk x a
    # (a^T hat(X) = a x X since hat(X) e_i = X x e_i.)
    a = jnp.einsum("hwa,ab->hwb", dr_dXj, R_jk, precision=_HI)  # (H,W,3)
    Jk_v = a
    Jk_w = jnp.cross(Xk, a)

    # d Xj / d delta_j = [-I | hat(Xj)]  (from Xj(d) = exp(-d_j) T_jk ... Xk):
    #   dr/dv_j = -dr_dXj
    #   dr/dw_j = dr_dXj^T hat(Xj) = dr_dXj x Xj
    Jj_v = -dr_dXj
    Jj_w = jnp.cross(dr_dXj, Xj)

    # d Xj / d rho = R_jk dXk/drho = R_jk (-Xk / rho) = -(Xj - t_jk)/rho
    dXj_drho = -(Xj - T_jk[:3, 3]) / rho[..., None]
    Jrho = jnp.einsum("hwa,hwa->hw", dr_dXj, dXj_drho, precision=_HI)

    Jk = jnp.concatenate([Jk_v, Jk_w], axis=-1)
    Jj = jnp.concatenate([Jj_v, Jj_w], axis=-1)
    return r, w_all, Jk, Jj, Jrho


def _current_window(window: BAWindow, deltas, drho) -> Tuple[BAWindow, jax.Array]:
    """Window re-linearized at the current increments: poses right-composed
    with deltas, depths updated by inverse-depth increments."""
    T_all = jax.vmap(lambda x, d: lie.se3_exp(x) @ lie.se3_exp(d))(window.xi, deltas)
    safe_d = jnp.maximum(window.depth, 1e-3)
    new_depth = 1.0 / jnp.maximum(1.0 / safe_d + drho, 1e-4)
    return dataclasses.replace(window, depth=new_depth), T_all


def host_system(window: BAWindow, T_all, k, cfg: BAConfig):
    """Normal-system contribution of host keyframe k (its pixels against
    every target j != k).  ``k`` may be a *traced* index — block placement
    into the 6M-wide camera system uses a one-hot along the keyframe axis,
    which is what lets hosts shard across devices (dvo_tpu.parallel.ba).

    Returns (Hcc (6M,6M), gc (6M,), b_host (H,W,6M), hdd (H,W), gd (H,W),
    cost, count)."""
    m, h, w_px = window.gray.shape
    n = 6 * m
    oh_k = jax.nn.one_hot(k, m, dtype=jnp.float32)           # (M,)
    gauge_k = jnp.where(k == 0, 0.0, 1.0)                     # fix keyframe 0

    def target(carry, j):
        Hcc, gc, b_host, hdd, gd, cost, count = carry
        r, w_all, Jk, Jj, Jrho = _pair_terms(window, T_all, k, j, cfg)
        w_all = w_all * jnp.where(j == k, 0.0, 1.0)           # skip self-pair
        Jk = Jk * gauge_k
        Jj = Jj * jnp.where(j == 0, 0.0, 1.0)                 # gauge target
        # Full-width Jacobian rows: host block via one-hot(k), target block
        # via one-hot(j).
        oh_j = jax.nn.one_hot(j, m, dtype=jnp.float32)
        Jfull = Jk[..., None, :] * oh_k[:, None] + Jj[..., None, :] * oh_j[:, None]
        Jfull = Jfull.reshape(h, w_px, n)                     # (H,W,6M)
        wJ = Jfull * w_all[..., None]
        Hcc = Hcc + jnp.einsum("hwi,hwj->ij", wJ, Jfull, precision=_HI)
        gc = gc + jnp.einsum("hwi,hw->i", wJ, r, precision=_HI)
        b_host = b_host + wJ * Jrho[..., None]
        hdd = hdd + w_all * Jrho * Jrho
        gd = gd + w_all * Jrho * r
        cost = cost + jnp.sum(w_all * r * r)
        count = count + jnp.sum((w_all > 0).astype(jnp.int32))
        return (Hcc, gc, b_host, hdd, gd, cost, count), None

    init = (
        jnp.zeros((n, n), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((h, w_px, n), jnp.float32),
        jnp.zeros((h, w_px), jnp.float32),
        jnp.zeros((h, w_px), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(0, jnp.int32),
    )
    (Hcc, gc, b_host, hdd, gd, cost, count), _ = lax.scan(
        target, init, jnp.arange(m)
    )
    return Hcc, gc, b_host, hdd, gd, cost, count


def build_system(window: BAWindow, deltas, drho, cfg: BAConfig):
    """Accumulate the full BA normal system at the current increments.

    Returns (Hcc (6M,6M), gc (6M,), b (M,H,W,6M) coupling rows, hdd, gd,
    cost, count)."""
    m, h, w_px = window.gray.shape
    window, T_all = _current_window(window, deltas, drho)
    n = 6 * m

    def host(carry, k):
        Hcc, gc, cost, count = carry
        Hk, gk, bk, hddk, gdk, ck, nk = host_system(window, T_all, k, cfg)
        return (Hcc + Hk, gc + gk, cost + ck, count + nk), (bk, hddk, gdk)

    init = (
        jnp.zeros((n, n), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(0, jnp.int32),
    )
    (Hcc, gc, cost, count), (b, hdd, gd) = lax.scan(
        host, init, jnp.arange(m)
    )
    return Hcc, gc, b, hdd, gd, cost, count


def ba_step(window: BAWindow, deltas, drho, cfg: BAConfig):
    """One damped GN step with Schur elimination of the depth block.
    Returns (new_deltas, new_drho, cost, count)."""
    m, h, w_px = window.gray.shape
    n = 6 * m
    Hcc, gc, b, hdd, gd, cost, count = build_system(window, deltas, drho, cfg)

    hdd_inv = 1.0 / (hdd + cfg.depth_damping)
    # Schur complement and reduced gradient over all host pixels at once.
    S = Hcc - jnp.einsum("mhwi,mhwj,mhw->ij", b, b, hdd_inv, precision=_HI)
    g_red = gc - jnp.einsum("mhwi,mhw,mhw->i", b, gd, hdd_inv, precision=_HI)

    S = S + cfg.damping * jnp.eye(n, dtype=S.dtype)
    # Gauge block: keep keyframe 0 pinned via identity rows.
    S = S.at[:6, :6].add(jnp.eye(6, dtype=S.dtype))
    # Sign: residual convention r(delta) with dr/ddelta = J gives the GN
    # step delta = -(S)^-1 g.
    dc = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), g_red)
    # Back-substitute inverse-depth increments.
    d_drho = -(gd + jnp.einsum("mhwi,i->mhw", b, dc, precision=_HI)) * hdd_inv

    new_deltas = jax.vmap(lie.compose)(deltas, dc.reshape(m, 6))
    new_drho = drho + d_drho
    return new_deltas, new_drho, cost, count


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAResult:
    xi: jax.Array       # (M, 6) refined world pose twists
    depth: jax.Array    # (M, H, W) refined depths
    costs: jax.Array    # (iters,) weighted photometric cost per iteration
    counts: jax.Array   # (iters,) active residual count


def bundle_adjust(window: BAWindow, cfg: BAConfig = BAConfig()) -> BAResult:
    """Run ``cfg.iterations`` damped GN steps as a ``lax.scan`` (one
    compiled step body regardless of iteration count)."""
    m, h, w_px = window.gray.shape

    def body(carry, _):
        deltas, drho = carry
        deltas, drho, cost, count = ba_step(window, deltas, drho, cfg)
        return (deltas, drho), (cost, count)

    init = (jnp.zeros((m, 6), jnp.float32), jnp.zeros((m, h, w_px), jnp.float32))
    (deltas, drho), (costs, counts) = lax.scan(
        body, init, None, length=cfg.iterations
    )
    xi = jax.vmap(lambda x, d: lie.se3_log(lie.se3_exp(x) @ lie.se3_exp(d)))(
        window.xi, deltas
    )
    safe_d = jnp.maximum(window.depth, 1e-3)
    depth = 1.0 / jnp.maximum(1.0 / safe_d + drho, 1e-4)
    return BAResult(xi=xi, depth=depth, costs=costs, counts=counts)
