"""Parity: numpy host-path math (variables/nplie.py) vs the JAX
implementations it mirrors."""

import jax
import jax.numpy as jnp
import numpy as np

from hyperslam_tpu.models import camera as cam
from hyperslam_tpu.state import bspline
from hyperslam_tpu.variables import nplie, se3, so3


def test_quat_ops(key):
    k1, k2, kv = jax.random.split(key, 3)
    q1 = np.asarray(so3.random(k1, (16,), jnp.float64))
    q2 = np.asarray(so3.random(k2, (16,), jnp.float64))
    v = np.asarray(jax.random.normal(kv, (16, 3), jnp.float64))
    np.testing.assert_allclose(
        nplie.quat_mul(q1, q2), so3.mul(jnp.asarray(q1), jnp.asarray(q2)),
        atol=1e-12)
    np.testing.assert_allclose(
        nplie.quat_rotate(q1, v), so3.rotate(jnp.asarray(q1), jnp.asarray(v)),
        atol=1e-12)


def test_se3_ops(key):
    k1, k2, kp = jax.random.split(key, 3)
    T1 = np.asarray(se3.random(k1, (8,), jnp.float64))
    T2 = np.asarray(se3.random(k2, (8,), jnp.float64))
    p = np.asarray(jax.random.normal(kp, (8, 3), jnp.float64))
    np.testing.assert_allclose(
        nplie.se3_compose(T1, T2),
        se3.compose(jnp.asarray(T1), jnp.asarray(T2)), atol=1e-12)
    np.testing.assert_allclose(
        nplie.se3_inverse(T1), se3.inverse(jnp.asarray(T1)), atol=1e-12)
    np.testing.assert_allclose(
        nplie.se3_act(T1, p), se3.act(jnp.asarray(T1), jnp.asarray(p)),
        atol=1e-12)


def test_exp_log(key):
    xi = np.asarray(jax.random.normal(key, (32, 6), jnp.float64)) * 0.7
    np.testing.assert_allclose(
        nplie.se3_exp(xi), se3.exp(jnp.asarray(xi)), atol=1e-12)
    T = nplie.se3_exp(xi)
    np.testing.assert_allclose(
        nplie.se3_log(T), se3.log(jnp.asarray(T)), atol=1e-10)
    # small angles
    np.testing.assert_allclose(
        nplie.se3_log(nplie.se3_exp(xi * 1e-8)), xi * 1e-8, atol=1e-15)


def test_eval_se3_parity(key):
    N = 10
    knots = np.asarray(se3.random(key, (N,), jnp.float64))
    t = np.linspace(0.0, (N - 3) - 1e-3, 25)
    ours = nplie.eval_se3(knots, t, 0.0, 1.0)
    ref = np.asarray(bspline.eval_se3(jnp.asarray(knots), jnp.asarray(t),
                                      0.0, 1.0))
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_eval_se3_n_valid(key):
    N = 10
    knots = np.asarray(se3.random(key, (N,), jnp.float64))
    # garbage beyond n_valid must not affect the result
    knots2 = knots.copy()
    knots2[7:] = 999.0
    t = np.linspace(0.0, 4.0 - 1e-3, 9)
    np.testing.assert_allclose(
        nplie.eval_se3(knots, t, 0.0, 1.0, n_valid=7),
        nplie.eval_se3(knots2, t, 0.0, 1.0, n_valid=7), atol=1e-12)


def test_pixel_to_bearing_parity():
    intr = np.array([367.215, 248.375, 458.654, 457.296])
    dist = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
    uv = np.array([[300.0, 200.0], [100.0, 400.0], [650.0, 50.0]])
    ours = nplie.pixel_to_bearing(uv, intr, dist)
    ref = np.asarray(cam.pixel_to_bearing(
        jnp.asarray(uv), jnp.asarray(intr), jnp.asarray(dist)))
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_triangulate_parity(key):
    T01 = np.asarray(se3.random(key, (), jnp.float64, trans_scale=0.2))
    p = np.array([0.4, -0.2, 6.0])
    b0 = p / np.linalg.norm(p)
    p1 = nplie.se3_act(nplie.se3_inverse(T01), p)
    b1 = p1 / np.linalg.norm(p1)
    ours = nplie.triangulate_midpoint(T01, b0, b1)
    ref = np.asarray(cam.triangulate_midpoint(
        jnp.asarray(T01), jnp.asarray(b0), jnp.asarray(b1)))
    np.testing.assert_allclose(ours, ref, atol=1e-9)
    np.testing.assert_allclose(ours, p, atol=1e-8)
