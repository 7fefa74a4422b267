"""SE(3) group ops, exp/log, adjoint; S2 retraction; parity with matrices."""

import jax
import jax.numpy as jnp
import numpy as np

from hyperslam_tpu.variables import se3, so3, s2


def test_compose_matches_matrix(key):
    k1, k2 = jax.random.split(key)
    T1 = se3.random(k1, (16,), jnp.float64)
    T2 = se3.random(k2, (16,), jnp.float64)
    M = se3.to_matrix(se3.compose(T1, T2))
    np.testing.assert_allclose(
        M, se3.to_matrix(T1) @ se3.to_matrix(T2), atol=1e-12)


def test_inverse(key):
    T = se3.random(key, (16,), jnp.float64)
    E = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(E[..., 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(E[..., 1:], 0.0, atol=1e-12)


def test_act(key):
    kT, kp = jax.random.split(key)
    T = se3.random(kT, (16,), jnp.float64)
    p = jax.random.normal(kp, (16, 3), jnp.float64)
    ph = jnp.concatenate([p, jnp.ones((16, 1), jnp.float64)], -1)
    np.testing.assert_allclose(
        se3.act(T, p),
        jnp.einsum("...ij,...j->...i", se3.to_matrix(T), ph)[..., :3],
        atol=1e-12)


def test_exp_log_roundtrip(key):
    xi = jax.random.normal(key, (64, 6), jnp.float64)
    xi = xi.at[:, :3].multiply(0.8)  # keep rotation < pi
    np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-9)


def test_exp_log_small(key):
    for scale in [1e-4, 1e-8, 0.0]:
        xi = jnp.asarray([[0.1, -0.2, 0.3, 1.0, 2.0, -3.0]], jnp.float64) * scale
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-12)


def test_exp_pure_translation():
    xi = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.0, 3.0], jnp.float64)
    T = se3.exp(xi)
    np.testing.assert_allclose(se3.translation(T), [1.0, 2.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(se3.rotation(T), [1, 0, 0, 0], atol=1e-12)


def test_exp_grads_finite():
    g = jax.jacfwd(se3.exp)(jnp.zeros(6, jnp.float64))
    assert np.all(np.isfinite(g))
    g2 = jax.jacfwd(se3.log)(se3.identity(jnp.float64))
    assert np.all(np.isfinite(g2))


def test_adjoint(key):
    kT, kx = jax.random.split(key)
    T = se3.random(kT, (8,), jnp.float64)
    xi = jax.random.normal(kx, (8, 6), jnp.float64) * 0.3
    # T exp(xi) T^-1 = exp(Ad_T xi)
    lhs = se3.compose(se3.compose(T, se3.exp(xi)), se3.inverse(T))
    rhs = se3.exp(jnp.einsum("...ij,...j->...i", se3.adjoint(T), xi))
    np.testing.assert_allclose(se3.to_matrix(lhs), se3.to_matrix(rhs), atol=1e-9)


def test_s2_retract_boxminus(key):
    kd, kdel = jax.random.split(key)
    d = s2.normalize(jax.random.normal(kd, (16, 3), jnp.float64))
    delta = jax.random.normal(kdel, (16, 2), jnp.float64) * 0.5
    d1 = s2.retract(d, delta)
    np.testing.assert_allclose(jnp.linalg.norm(d1, axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(s2.boxminus(d1, d), delta, atol=1e-9)


def test_s2_retract_zero(key):
    d = s2.normalize(jax.random.normal(key, (4, 3), jnp.float64))
    np.testing.assert_allclose(s2.retract(d, jnp.zeros((4, 2))), d, atol=1e-12)
    g = jax.jacfwd(lambda dl: s2.retract(d[0], dl))(jnp.zeros(2, jnp.float64))
    assert np.all(np.isfinite(g))


def test_gravity_norm():
    g = s2.default_gravity(jnp.float64)
    np.testing.assert_allclose(jnp.linalg.norm(g), s2.GRAVITY_NORM, atol=1e-12)
    g2 = s2.retract(g, jnp.asarray([0.3, -0.2]), norm=s2.GRAVITY_NORM)
    np.testing.assert_allclose(
        jnp.linalg.norm(g2), s2.GRAVITY_NORM, atol=1e-10)
