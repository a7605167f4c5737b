"""Pinhole geometry and dense inverse warping.

Reference: src/core/transform.cpp — project/backProject (:20-28), warp
(:30-33), warpImage (:35-51, note the ``-xi``: inverse warping computes, for
every *output* pixel, where it came from in the reference image using the
reference depth, then bilinearly samples), mapDepthtoGray (:53-78).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dvo_tpu import lie
from dvo_tpu.ops.sampling import bilinear_masked

EPSILON = 1e-6


def pixel_grid(h: int, w: int, dtype=jnp.float32):
    """(x, y) coordinate images of shape (H, W)."""
    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype)
    return xs, ys


def project(K: jnp.ndarray, pts: jnp.ndarray):
    """(..., 3) camera points -> (..., 2) pixels.  Reference transform.cpp:20-23.
    Returns (xy, in_front) — the reference divides by z unguarded; points at
    or behind the camera are flagged so callers can mask them."""
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < EPSILON, 1.0, z)
    u = pts[..., 0] * K[0, 0] / safe_z + K[0, 2]
    v = pts[..., 1] * K[1, 1] / safe_z + K[1, 2]
    return jnp.stack([u, v], axis=-1), z > EPSILON


def back_project(K: jnp.ndarray, xy: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) pixels + (...) depth -> (..., 3).  Reference transform.cpp:25-28."""
    x = depth * (xy[..., 0] - K[0, 2]) / K[0, 0]
    y = depth * (xy[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y, depth], axis=-1)


def warp_points(T: jnp.ndarray, xy: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray):
    """project(K, T @ backProject(K, xy, depth)).  Reference transform.cpp:30-33
    (which takes a twist; pass ``lie.se3_exp(xi)`` — hoisting the 4x4 out of
    the per-pixel map is free under jit and saves re-deriving it)."""
    pts = lie.transform(T, back_project(K, xy, depth))
    return project(K, pts)


def warp_image(
    xi: jnp.ndarray,
    gray: jnp.ndarray,
    gray_mask: jnp.ndarray,
    depth: jnp.ndarray,
    K: jnp.ndarray,
):
    """Dense inverse warp.  Reference transform.cpp:35-51: for each output
    pixel with usable reference depth, look up the source location under
    ``exp(-xi)`` and bilinearly sample the reference gray (masked variant).

    Returns (warped, warped_mask)."""
    h, w = gray.shape
    xs, ys = pixel_grid(h, w)
    T_inv = lie.se3_exp(-xi)
    xy = jnp.stack([xs, ys], axis=-1)
    warped_xy, in_front = warp_points(T_inv, xy, depth, K)
    vals, valid = bilinear_masked(gray, gray_mask, warped_xy[..., 0], warped_xy[..., 1])
    depth_ok = jnp.abs(depth) >= EPSILON  # reference isEpsilon skip (:42)
    mask = depth_ok & valid & in_front
    return jnp.where(mask, vals, 0.0), mask


def map_depth_to_gray(
    depth: jnp.ndarray,
    gray: jnp.ndarray,
    gray_mask: jnp.ndarray,
    rgb_K: jnp.ndarray,
    depth_K: jnp.ndarray,
    inv_T: jnp.ndarray,
    sigma_valid: float = 0.1,
    sigma_invalid: float = 1.0,
):
    """Register the depth camera's frame into grayscale via extrinsics.
    Reference transform.cpp:53-78: backProject with depth_K, transform by
    invT, project with rgb_K, sample gray; sigma = 0.1 where a valid sample
    landed, 1.0 elsewhere.

    Returns (mapped_gray, mapped_mask, sigma)."""
    h, w = depth.shape
    xs, ys = pixel_grid(h, w)
    xy = jnp.stack([xs, ys], axis=-1)
    pts = lie.transform(inv_T, back_project(depth_K, xy, depth))
    warped_xy, in_front = project(rgb_K, pts)
    vals, valid = bilinear_masked(gray, gray_mask, warped_xy[..., 0], warped_xy[..., 1])
    depth_ok = jnp.abs(depth) >= EPSILON
    mask = depth_ok & valid & in_front
    sigma = jnp.where(mask, sigma_valid, sigma_invalid)
    return jnp.where(mask, vals, 0.0), mask, sigma
