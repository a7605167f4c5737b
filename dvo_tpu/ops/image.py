"""Image pyramid construction and gradients.

Reference: src/core/convert.cpp (cullImage :7-20, cullIntrinsic :22-29,
gradiate :41-75).  The reference decimates by *point sampling* every
``2**times``-th pixel with no anti-aliasing blur; we preserve that so pyramid
contents match.  Invalidity is an explicit boolean mask here, not the
INVALID=-2 sentinel (SURVEY.md §2 component 3).
"""

from __future__ import annotations

import jax.numpy as jnp


def cull_image(img: jnp.ndarray, times: int) -> jnp.ndarray:
    """Decimate (H, W) by point-sampling every 2**times-th pixel.
    Reference convert.cpp:7-20 samples src[(y*r, x*r)] — a pure stride."""
    if times == 0:
        return img
    r = 2 ** times
    return img[..., ::r, ::r]


def cull_mask(mask: jnp.ndarray, times: int) -> jnp.ndarray:
    """Validity mask follows the same stride (reference getPixel validity
    check inside cullImage, convert.cpp:16)."""
    return cull_image(mask, times)


def cull_intrinsic(K: jnp.ndarray, times: int) -> jnp.ndarray:
    """K / 2**times with K[2,2] restored to 1.  Reference convert.cpp:22-29."""
    if times == 0:
        return K
    K = K / (2.0 ** times)
    return K.at[..., 2, 2].set(1.0)


def gradients(gray: jnp.ndarray, mask: jnp.ndarray):
    """Central-difference gradients (I[p+1] - I[p-1], NOT halved — reference
    convert.cpp:48-73) with border + invalid-neighbor propagation.

    Returns (gx, gy, gmask_x, gmask_y): a gradient pixel is valid iff both
    neighbors are in-bounds and valid.
    """
    gx = jnp.zeros_like(gray)
    gy = jnp.zeros_like(gray)
    gx = gx.at[..., :, 1:-1].set(gray[..., :, 2:] - gray[..., :, :-2])
    gy = gy.at[..., 1:-1, :].set(gray[..., 2:, :] - gray[..., :-2, :])
    mx = jnp.zeros_like(mask)
    my = jnp.zeros_like(mask)
    mx = mx.at[..., :, 1:-1].set(mask[..., :, 2:] & mask[..., :, :-2])
    my = my.at[..., 1:-1, :].set(mask[..., 2:, :] & mask[..., :-2, :])
    return gx, gy, mx, my
