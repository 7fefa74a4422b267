"""SO(3) quaternion ops: group axioms, exp/log round trips, Jacobians.

Mirrors the reference's test strategy of checking analytic derivatives
against numeric ones on the tangent space (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperslam_tpu.variables import so3


def test_identity_mul(key):
    q = so3.random(key, (32,), jnp.float64)
    e = so3.identity(jnp.float64, (32,))
    np.testing.assert_allclose(so3.mul(e, q), q, atol=1e-12)
    np.testing.assert_allclose(so3.mul(q, e), q, atol=1e-12)


def test_inverse(key):
    q = so3.random(key, (32,), jnp.float64)
    e = so3.mul(q, so3.conj(q))
    np.testing.assert_allclose(e[..., 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(e[..., 1:], 0.0, atol=1e-12)


def test_rotate_matches_matrix(key):
    kq, kv = jax.random.split(key)
    q = so3.random(kq, (32,), jnp.float64)
    v = jax.random.normal(kv, (32, 3), jnp.float64)
    R = so3.to_matrix(q)
    np.testing.assert_allclose(
        so3.rotate(q, v), jnp.einsum("...ij,...j->...i", R, v), atol=1e-12)


def test_rotate_composition(key):
    kq1, kq2, kv = jax.random.split(key, 3)
    q1 = so3.random(kq1, (8,), jnp.float64)
    q2 = so3.random(kq2, (8,), jnp.float64)
    v = jax.random.normal(kv, (8, 3), jnp.float64)
    np.testing.assert_allclose(
        so3.rotate(so3.mul(q1, q2), v), so3.rotate(q1, so3.rotate(q2, v)),
        atol=1e-12)


def test_exp_log_roundtrip(key):
    w = jax.random.normal(key, (64, 3), jnp.float64)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1.0) * 3.0
    np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-10)


def test_exp_log_small_angles():
    for scale in [1e-3, 1e-6, 1e-9, 0.0]:
        w = jnp.asarray([[1.0, -2.0, 0.5]], jnp.float64) * scale
        np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-14)


def test_log_hemisphere(key):
    q = so3.random(key, (16,), jnp.float64)
    np.testing.assert_allclose(so3.log(-q), so3.log(q), atol=1e-12)


def test_from_matrix_roundtrip(key):
    q = so3.random(key, (64,), jnp.float64)
    np.testing.assert_allclose(so3.from_matrix(so3.to_matrix(q)), q, atol=1e-9)


def test_from_matrix_edge_cases():
    # 180-degree rotations stress every branch of from_matrix.
    for axis in np.eye(3):
        q = so3.exp(jnp.asarray(axis * np.pi, jnp.float64)[None])
        R = so3.to_matrix(q)
        q2 = so3.from_matrix(R)
        np.testing.assert_allclose(so3.to_matrix(q2), R, atol=1e-9)


def test_exp_grad_finite_at_zero():
    g = jax.jacfwd(so3.exp)(jnp.zeros(3, jnp.float64))
    assert np.all(np.isfinite(g))
    # d exp/d w at 0 = [0; I/2] (quaternion wxyz rows)
    np.testing.assert_allclose(g[1:, :], 0.5 * np.eye(3), atol=1e-12)
    np.testing.assert_allclose(g[0, :], 0.0, atol=1e-12)


def test_log_grad_finite_at_identity():
    g = jax.jacfwd(so3.log)(so3.identity(jnp.float64))
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g[:, 1:], 2.0 * np.eye(3), atol=1e-9)


def test_left_jacobian_vs_finite_difference(key):
    w = jax.random.normal(key, (3,), jnp.float64)
    Jl = so3.left_jacobian(w)
    eps = 1e-7
    num = np.zeros((3, 3))
    for i in range(3):
        dw = np.zeros(3)
        dw[i] = eps
        # exp(w + dw) ~ exp(Jl dw) exp(w) -> log(exp(w+dw) exp(w)^-1) = Jl dw
        d = so3.log(so3.mul(so3.exp(w + dw), so3.conj(so3.exp(w))))
        num[:, i] = np.asarray(d) / eps
    np.testing.assert_allclose(Jl, num, atol=1e-6)


def test_left_right_jacobian_relation(key):
    w = jax.random.normal(key, (5, 3), jnp.float64)
    np.testing.assert_allclose(
        so3.right_jacobian(w), so3.left_jacobian(-w), atol=1e-12)


def test_hat_vee(key):
    w = jax.random.normal(key, (7, 3), jnp.float64)
    np.testing.assert_allclose(so3.vee(so3.hat(w)), w, atol=1e-12)
    v = jax.random.normal(key, (7, 3), jnp.float64)
    np.testing.assert_allclose(
        jnp.einsum("...ij,...j->...i", so3.hat(w), v), jnp.cross(w, v),
        atol=1e-12)
