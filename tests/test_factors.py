"""Factor residual gradient checks — the reference's core test idea
(numeric vs analytic Jacobians per factor on the manifold tangent space,
``tests/internal/tests/optimizers/evaluators/*.cpp``; SURVEY.md §4), rebuilt
as jax.jacfwd vs central finite differences through the retraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperslam_tpu.factors import residuals as res
from hyperslam_tpu.models import camera as cam
from hyperslam_tpu.variables import s2, se3, so3

# EuRoC-like calibration, mirroring the reference's deterministic mock camera
# (tests/include/tests/sensors/camera.hpp:22-35).
INTR = jnp.asarray([367.215, 248.375, 458.654, 457.296], jnp.float64)  # cx,cy,fx,fy — reference order [cx,cy,fx,fy]
DIST = jnp.asarray([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05],
                   jnp.float64)


def _random_setup(key):
    ks = jax.random.split(key, 8)
    ctrl = se3.random(ks[0], (4,), jnp.float64, trans_scale=0.5)
    u = jnp.asarray(0.37, jnp.float64)
    T_bs = se3.random(ks[1], (), jnp.float64, trans_scale=0.1)
    landmark = jax.random.normal(ks[2], (3,), jnp.float64) * 2.0 + jnp.asarray(
        [0.0, 0.0, 8.0])
    return ctrl, u, T_bs, landmark, ks


def _fd_jac(f, x, eps=1e-7):
    """Central finite differences of f at x (1-D input).  Jits f and batches
    the +/- probes into one vmapped call (eager per-op dispatch is slow)."""
    x = jnp.asarray(x, jnp.float64)
    n = x.size
    probes = jnp.concatenate([x + jnp.eye(n) * eps, x - jnp.eye(n) * eps])
    vals = jax.jit(jax.vmap(f))(probes)
    return np.moveaxis(
        np.asarray(vals[:n] - vals[n:]) / (2 * eps), 0, -1)


def _check_knot_jacobian(residual_of_ctrl, ctrl, atol=1e-6):
    """Compare jacfwd and finite differences through the knot retraction."""
    def g(delta_flat):
        delta = delta_flat.reshape(4, 6)
        return residual_of_ctrl(res.retract_pose_knots(ctrl, delta))

    zero = jnp.zeros(24, jnp.float64)
    J_ad = jax.jit(jax.jacfwd(g))(zero)
    J_fd = _fd_jac(g, zero)
    np.testing.assert_allclose(J_ad, J_fd, atol=atol)
    assert np.any(np.abs(J_ad) > 1e-6), "Jacobian unexpectedly all-zero"


def test_bearing_zero_at_truth(key):
    ctrl, u, T_bs, landmark, ks = _random_setup(key)
    T_ws = se3.compose(res._sensor_pose(ctrl, u, T_bs), se3.identity(jnp.float64))
    p_s = se3.act(se3.inverse(T_ws), landmark)
    meas = p_s / jnp.linalg.norm(p_s)
    r = res.bearing_residual(ctrl, u, T_bs, landmark, meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-10)


def test_bearing_knot_jacobian(key):
    ctrl, u, T_bs, landmark, ks = _random_setup(key)
    meas = s2.normalize(jax.random.normal(ks[3], (3,), jnp.float64))
    _check_knot_jacobian(
        lambda c: res.bearing_residual(c, u, T_bs, landmark, meas), ctrl)


def test_bearing_landmark_jacobian(key):
    ctrl, u, T_bs, landmark, ks = _random_setup(key)
    meas = s2.normalize(jax.random.normal(ks[3], (3,), jnp.float64))
    f = lambda lm: res.bearing_residual(ctrl, u, T_bs, lm, meas)
    np.testing.assert_allclose(
        jax.jit(jax.jacfwd(f))(landmark), _fd_jac(f, landmark), atol=1e-6)


def test_pixel_zero_at_truth(key):
    ctrl, u, T_bs, landmark, ks = _random_setup(key)
    # well-conditioned camera point (moderate angle, z >> 0)
    p_s = jnp.asarray([0.4, -0.25, 5.0], jnp.float64)
    lm = se3.act(res._sensor_pose(ctrl, u, T_bs), p_s)
    meas = cam.project(p_s, INTR, DIST)
    r = res.pixel_residual(ctrl, u, T_bs, INTR, DIST, lm, meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-8)


def test_pixel_jacobians(key):
    ctrl, u, T_bs, landmark, ks = _random_setup(key)
    # put the landmark in front of the camera
    p_s = jnp.asarray([0.3, -0.2, 4.0], jnp.float64)
    lm = se3.act(res._sensor_pose(ctrl, u, T_bs), p_s)
    meas = jnp.asarray([300.0, 200.0], jnp.float64)
    _check_knot_jacobian(
        lambda c: res.pixel_residual(c, u, T_bs, INTR, DIST, lm, meas), ctrl,
        atol=3e-4)
    # intrinsics + distortion Jacobians (self-calibration path)
    f_i = lambda i: res.pixel_residual(ctrl, u, T_bs, i, DIST, lm, meas)
    np.testing.assert_allclose(
        jax.jit(jax.jacfwd(f_i))(INTR), _fd_jac(f_i, INTR), atol=1e-5)
    f_d = lambda dd: res.pixel_residual(ctrl, u, T_bs, INTR, dd, lm, meas)
    np.testing.assert_allclose(
        jax.jit(jax.jacfwd(f_d))(DIST), _fd_jac(f_d, DIST), atol=1e-5)


def test_pose_prior_zero_and_jacobian(key):
    ctrl, u, T_bs, _, ks = _random_setup(key)
    T_meas = res._sensor_pose(ctrl, u, T_bs)
    r = res.pose_prior_residual(ctrl, u, T_bs, T_meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-10)
    T_meas2 = se3.random(ks[4], (), jnp.float64)
    _check_knot_jacobian(
        lambda c: res.pose_prior_residual(c, u, T_bs, T_meas2), ctrl)


def _imu_defaults():
    return dict(
        gyro_intr=jnp.eye(3, dtype=jnp.float64),
        accel_intr=jnp.eye(3, dtype=jnp.float64),
        g_sens=jnp.zeros((3, 3), jnp.float64),
        lever_arm=jnp.zeros(3, jnp.float64),
    )


def test_inertial_knot_jacobian(key):
    ctrl, u, T_bs, _, ks = _random_setup(key)
    dt = 0.1
    gravity = s2.default_gravity(jnp.float64)
    meas = jax.random.normal(ks[5], (6,), jnp.float64)
    bias_g = jax.random.normal(ks[6], (3,), jnp.float64) * 0.01
    bias_a = jax.random.normal(ks[7], (3,), jnp.float64) * 0.05

    def f(c):
        return res.inertial_residual(c, u, dt, bias_g, bias_a, T_bs, gravity,
                                     meas=meas, **_imu_defaults())

    _check_knot_jacobian(f, ctrl, atol=5e-5)


def test_inertial_gravity_and_bias_jacobians(key):
    ctrl, u, T_bs, _, ks = _random_setup(key)
    dt = 0.1
    gravity = s2.default_gravity(jnp.float64)
    meas = jax.random.normal(ks[5], (6,), jnp.float64)
    bias_g = jnp.zeros(3, jnp.float64)
    bias_a = jnp.zeros(3, jnp.float64)

    # gravity on its 2-DoF sphere tangent
    def g(delta):
        gr = s2.retract(gravity, delta, norm=s2.GRAVITY_NORM)
        return res.inertial_residual(ctrl, u, dt, bias_g, bias_a, T_bs, gr,
                                     meas=meas, **_imu_defaults())

    zero2 = jnp.zeros(2, jnp.float64)
    np.testing.assert_allclose(
        jax.jit(jax.jacfwd(g))(zero2), _fd_jac(g, zero2), atol=1e-5)

    def fb(b):
        return res.inertial_residual(ctrl, u, dt, b, bias_a, T_bs, gravity,
                                     meas=meas, **_imu_defaults())
    J = jax.jit(jax.jacfwd(fb))(bias_g)
    np.testing.assert_allclose(J[:3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(J[3:], 0.0, atol=1e-12)


def test_inertial_stationary_reads_gravity():
    """A body at rest with identity pose must measure a = -g, omega = 0."""
    ctrl = jnp.tile(se3.identity(jnp.float64)[None], (4, 1))
    u = jnp.asarray(0.5, jnp.float64)
    T_bs = se3.identity(jnp.float64)
    gravity = jnp.asarray([0.0, 0.0, -s2.GRAVITY_NORM], jnp.float64)
    meas = jnp.zeros(6, jnp.float64)
    r = res.inertial_residual(
        ctrl, u, 0.1, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
        T_bs, gravity, meas=meas, **_imu_defaults())
    np.testing.assert_allclose(r[:3], 0.0, atol=1e-9)
    np.testing.assert_allclose(r[3:], [0.0, 0.0, s2.GRAVITY_NORM], atol=1e-9)


def test_triangulate_midpoint(key):
    kp, kT = jax.random.split(key)
    p = jnp.asarray([0.5, -0.3, 5.0], jnp.float64)
    T_01 = se3.from_parts(
        so3.exp(jnp.asarray([0.02, -0.01, 0.03], jnp.float64)),
        jnp.asarray([0.11, 0.0, 0.0], jnp.float64))  # stereo-like baseline
    b0 = p / jnp.linalg.norm(p)
    p1 = se3.act(se3.inverse(T_01), p)
    b1 = p1 / jnp.linalg.norm(p1)
    rec = cam.triangulate_midpoint(T_01, b0, b1)
    np.testing.assert_allclose(rec, p, atol=1e-8)


def test_camera_projection_roundtrip(key):
    p = jnp.asarray([[0.2, -0.1, 3.0], [-0.4, 0.3, 6.0]], jnp.float64)
    uv = cam.project(p, INTR, DIST)
    b = cam.pixel_to_bearing(uv, INTR, DIST)
    np.testing.assert_allclose(
        b, p / jnp.linalg.norm(p, axis=-1, keepdims=True), atol=1e-8)
