"""Factor residuals — pure, batched, autodiff-ready.

TPU-native equivalents of the reference's evaluators
(``/root/reference/internal/hyper/optimizers/evaluators/{bearing,pixel,manifold,inertial}.cpp``;
SURVEY.md §2.1).  Each residual is a pure function of

  - ``ctrl``: the k=4 SE3 support knots ``(4, 7)`` of the pose spline at the
    measurement stamp (gathered outside, so the same function serves every
    segment),
  - ``u``: the local spline coordinate in [0, 1),
  - sensor calibration (extrinsics ``T_bs``, intrinsics, distortion, IMU
    intrinsic matrices) — passed as inputs so they remain optimizable
    (self-calibration, reference ``ceres/optimizer.cpp:56-69``),
  - the observed quantity.

Jacobians w.r.t. *tangent-space perturbations* of every parameter come from
``jax.jacfwd`` of the retraction-composed function (lift-solve-retract); the
reference's hand-derived Jacobian chains (e.g. ``bearing.cpp:46-75``) are
replaced by XLA-fused forward-mode autodiff, validated against finite
differences in ``tests/test_factors.py``.

Frame conventions (match the reference):
  T_wb = body pose in world (the spline state); T_bs = sensor-in-body
  extrinsics; a world point enters a camera as
  ``p_s = (T_wb(t) * T_bs)^{-1} * p_w`` (``evaluators/bearing.cpp:46-75``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import camera as cam
from ..state import bspline
from ..variables import s2, se3, so3

__all__ = [
    "bearing_residual",
    "pixel_residual",
    "pose_prior_residual",
    "inertial_residual",
    "retract_pose_knots",
    "BEARING_DIM", "PIXEL_DIM", "PRIOR_DIM", "INERTIAL_DIM",
]

BEARING_DIM = 2
PIXEL_DIM = 2
PRIOR_DIM = 6
INERTIAL_DIM = 6


def retract_pose_knots(ctrl, delta):
    """Product-manifold right-retraction of SE3 knots.

    ctrl: (..., 7); delta: (..., 6) = [omega, v].  q' = q * exp(omega),
    t' = t + v — mirrors the reference's Ceres product manifold
    SU2 x R^3 (``ceres/manifolds/variables/se3.cpp:19-24``).
    """
    q = so3.mul(ctrl[..., :4], so3.exp(delta[..., :3]))
    t = ctrl[..., 4:] + delta[..., 3:]
    return jnp.concatenate([q, t], axis=-1)


def _sensor_pose(ctrl, u, T_bs):
    """T_ws(t) = T_wb(t) * T_bs on one spline segment."""
    T_wb = bspline.interp_se3(ctrl, u)
    return se3.compose(T_wb, T_bs)


def bearing_residual(ctrl, u, T_bs, landmark, meas_bearing):
    """Angular residual between predicted and measured bearing, (2,).

    Prediction: p_s = (T_wb(t) T_bs)^{-1} p_w, normalized
    (reference ``evaluators/bearing.cpp:13-79``).  The reference compares
    directions with an AngularMetric; here the residual lives in the 2-D
    tangent plane of the measured bearing (same zero set, full-rank
    Jacobian), weighted by the same Huber loss downstream.
    """
    T_ws = _sensor_pose(ctrl, u, T_bs)
    p_s = se3.act(se3.inverse(T_ws), landmark)
    pred = p_s / jnp.linalg.norm(p_s, axis=-1, keepdims=True)
    return s2.boxminus(pred, meas_bearing)


def pixel_residual(ctrl, u, T_bs, intr, dist, landmark, meas_uv):
    """Reprojection residual in pixels, (2,).

    Full chain project -> distort -> denormalize
    (reference ``evaluators/pixel.cpp:15-146``)."""
    T_ws = _sensor_pose(ctrl, u, T_bs)
    p_s = se3.act(se3.inverse(T_ws), landmark)
    return cam.project(p_s, intr, dist) - meas_uv


def pose_prior_residual(ctrl, u, T_bs, meas_T):
    """Manifold residual log(meas^{-1} * T_ws), (6,).

    Reference ``evaluators/manifold.cpp:11-61`` with ManifoldMetric
    (log of relative pose)."""
    T_ws = _sensor_pose(ctrl, u, T_bs)
    return se3.log(se3.compose(se3.inverse(meas_T), T_ws))


def inertial_residual(ctrl, u, dt, bias_g, bias_a, T_bs, gravity,
                      gyro_intr, accel_intr, g_sens, lever_arm, meas):
    """Direct continuous-time IMU residual, (6,) = [gyro, accel].

    Implements the reference's full IMU measurement model
    (``evaluators/inertial.cpp:52-79``):

      omega_hat = I_g * (R_sb omega_b) + S_g * a_m + b_g(t)
      a_hat     = I_a * a_m + b_a(t)
      a_m       = R_sb ( R_bw (a_w - g_w) + alpha_b x r + omega_b x (omega_b x r) )

    with I_g/I_a the gyro/accel intrinsic (scale/misalignment) matrices,
    S_g the g-sensitivity matrix, r the accelerometer lever arm
    (axes-offset/size-effect term F_a = omega x omega x + alpha x), b_g/b_a
    the bias spline values at t, and g_w the world gravity vector.  Each IMU
    sample is one residual — the "direct" formulation of the reference's
    InertialFrontend (``frontends/inertial/direct.cpp:13-38``); no
    preintegration.

    meas: (6,) = [gyro (rad/s), accel (m/s^2)].
    """
    d = bspline.se3_with_derivatives(ctrl, u, dt)
    q_wb = d["pose"][..., :4]
    R_bs_q = T_bs[..., :4]
    q_sb = so3.conj(R_bs_q)

    omega_b = d["omega_b"]
    alpha_b = d["alpha_b"]
    omega_s = so3.rotate(q_sb, omega_b)

    # Specific force at the sensor origin, in the body frame.
    a_body = so3.rotate(so3.conj(q_wb), d["a_w"] - gravity)
    lever = jnp.cross(alpha_b, lever_arm) + jnp.cross(
        omega_b, jnp.cross(omega_b, lever_arm))
    a_m = so3.rotate(q_sb, a_body + lever)

    omega_hat = (gyro_intr @ omega_s + g_sens @ a_m + bias_g)
    a_hat = accel_intr @ a_m + bias_a
    return jnp.concatenate([omega_hat, a_hat], axis=-1) - meas
