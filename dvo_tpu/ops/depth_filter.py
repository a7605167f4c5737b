"""Gaussian inverse-variance depth filter — elementwise over whole images.

Reference: src/math/gaussian.cpp.  Both entry points share the compatibility
gate (reject an observation whose mean is too far from the prior, with a
distance-dependent gain ramp, gaussian.cpp:19-21) and the fusion
    mu'    = (v2 mu + v1 d) / (v1 + v2)
    sigma' = sqrt(v1 v2 / (v1 + v2))          (gaussian.cpp:27-28)
where v1 = sigma^2 (prior) and v2 = s^2 (observation).

``gaussian_update_with_reset`` additionally *resets* rejected pixels to a
fresh random prior (gaussian.cpp:22-25) — used by the mapper's depth update,
where rejection signals occlusion.  ``gaussian_fuse`` leaves rejected pixels
untouched — used by the regularizer (operator(), gaussian.cpp:33-50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvo_tpu.config import DepthFilterConfig


def _gate(mu, sigma, d, s, cfg: DepthFilterConfig):
    diff = jnp.abs(d - mu)
    m = jnp.minimum(d, diff)
    gain = jnp.where(m < cfg.gain_ramp, 0.5 + m / cfg.gain_ramp * 0.5, 1.0)
    return diff <= gain * jnp.maximum(sigma, s)


def _fuse(mu, sigma, d, s):
    v1 = sigma * sigma
    v2 = s * s
    v = v1 + v2
    safe_v = jnp.where(v < 1e-12, 1.0, v)
    mu_new = (v2 * mu + v1 * d) / safe_v
    sigma_new = jnp.sqrt(v1 * v2 / safe_v)
    return mu_new, sigma_new


def gaussian_fuse(mu, sigma, d, s, obs_valid=None, cfg: DepthFilterConfig = DepthFilterConfig()):
    """operator() semantics: fuse if compatible, else keep prior.
    Returns (mu', sigma', accepted)."""
    ok = _gate(mu, sigma, d, s, cfg)
    if obs_valid is not None:
        ok = ok & obs_valid
    mu_new, sigma_new = _fuse(mu, sigma, d, s)
    return jnp.where(ok, mu_new, mu), jnp.where(ok, sigma_new, sigma), ok


def gaussian_update_with_reset(
    key: jax.Array,
    mu,
    sigma,
    d,
    s,
    obs_valid=None,
    cfg: DepthFilterConfig = DepthFilterConfig(),
):
    """update() semantics: fuse if compatible; on rejection reset the pixel
    to a uniform random depth (capped) and sigma = 0.5 (gaussian.cpp:22-25).
    Pixels with invalid observations are left untouched (no reset — the
    reference only reaches update() for gated-valid observations,
    mapper.cpp:122-124).

    Returns (mu', sigma', accepted)."""
    ok = _gate(mu, sigma, d, s, cfg)
    if obs_valid is not None:
        gate_ok = ok
        ok = ok & obs_valid
        rejected = (~gate_ok) & obs_valid
    else:
        rejected = ~ok
    lo, hi = cfg.reset_depth_range
    rand = jax.random.uniform(key, mu.shape, minval=lo, maxval=hi)
    reset_depth = jnp.minimum(rand, cfg.reset_depth_cap)
    mu_new, sigma_new = _fuse(mu, sigma, d, s)
    mu_out = jnp.where(ok, mu_new, jnp.where(rejected, reset_depth, mu))
    sigma_out = jnp.where(ok, sigma_new, jnp.where(rejected, cfg.reset_sigma, sigma))
    return mu_out, sigma_out, ok
