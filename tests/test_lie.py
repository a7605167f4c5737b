"""SE(3)/SO(3) unit tests: round-trips, oracle parity, batching.

Reference behavior spec: src/math/se3.cpp (tested only visually there,
test/se3.cpp — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvo_tpu import lie
from dvo_tpu.utils import oracle


def random_twists(rng, n, scale=0.5):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_exp_log_roundtrip(rng):
    xi = random_twists(rng, 64)
    out = np.asarray(lie.se3_log(lie.se3_exp(jnp.asarray(xi))))
    np.testing.assert_allclose(out, xi, rtol=1e-3, atol=2e-5)


def test_exp_matches_oracle(rng):
    xi = random_twists(rng, 32)
    ours = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    for i in range(len(xi)):
        ref = oracle.se3_exp(xi[i])
        np.testing.assert_allclose(ours[i], ref, rtol=1e-4, atol=1e-5)


def test_log_matches_oracle(rng):
    xi = random_twists(rng, 32)
    Ts = np.stack([oracle.se3_exp(x) for x in xi]).astype(np.float32)
    ours = np.asarray(lie.se3_log(jnp.asarray(Ts)))
    for i in range(len(xi)):
        ref = oracle.se3_log(Ts[i].astype(np.float64))
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=2e-5)


def test_small_angle_branch(rng):
    """Below the 1e-6 threshold the Taylor branches must stay finite and
    accurate (reference collapses to t = v, se3.cpp:95)."""
    xi = np.zeros((3, 6), np.float32)
    xi[0, :3] = [0.1, -0.2, 0.3]           # pure translation
    xi[1] = [0.1, 0, 0, 1e-8, -1e-8, 1e-8]  # tiny rotation
    T = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    assert np.all(np.isfinite(T))
    np.testing.assert_allclose(T[0][:3, 3], [0.1, -0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(T[0][:3, :3], np.eye(3), atol=1e-6)
    back = np.asarray(lie.se3_log(jnp.asarray(T)))
    np.testing.assert_allclose(back[:, :3], xi[:, :3], atol=1e-6)


def test_compose_matches_oracle(rng):
    a = random_twists(rng, 16, 0.3)
    b = random_twists(rng, 16, 0.3)
    ours = np.asarray(lie.compose(jnp.asarray(a), jnp.asarray(b)))
    for i in range(len(a)):
        ref = oracle.compose(a[i], b[i])
        np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=5e-5)


def test_compose_identity(rng):
    xi = random_twists(rng, 8)
    zero = jnp.zeros_like(jnp.asarray(xi))
    np.testing.assert_allclose(
        np.asarray(lie.compose(jnp.asarray(xi), zero)), xi, rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lie.compose(zero, jnp.asarray(xi))), xi, rtol=1e-4, atol=2e-5
    )


def test_invert_T(rng):
    xi = random_twists(rng, 8)
    T = lie.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ lie.invert_T(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_is_finite_xi():
    good = jnp.zeros((2, 6))
    bad = good.at[1, 3].set(jnp.nan)
    np.testing.assert_array_equal(np.asarray(lie.is_finite_xi(bad)), [True, False])


def test_jit_and_grad():
    """Everything must be jit- and grad-clean (no Python branching on data)."""
    f = jax.jit(lambda x: jnp.sum(lie.se3_exp(x)))
    g = jax.grad(lambda x: jnp.sum(lie.se3_exp(x)))(jnp.ones(6) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.isfinite(float(f(jnp.zeros(6))))
    g0 = jax.grad(lambda x: jnp.sum(lie.se3_exp(x)))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g0)))  # Taylor branch grad-safe
