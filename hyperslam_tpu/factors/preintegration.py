"""IMU preintegration — the reference's declared-but-absent INTEGRATING
frontend (``/root/reference/include/hyper/system/components/frontends/inertial/
forward.hpp:9-13`` declares ``InertialFrontendType::INTEGRATING`` but never
implements it; SURVEY.md §2.2).  Built here from the standard on-manifold
preintegration formulation (Forster et al., TRO 2017) adapted to the
continuous-time spline state:

- The **host** accumulates raw IMU samples between keyframe stamps into a
  relative-motion pseudo-measurement (``Preintegrator``, pure NumPy — the host
  path never dispatches device ops) with first-order bias Jacobians and the
  propagated 9x9 covariance, whose inverse square root becomes the factor's
  whitening matrix.
- The **device** residual (``preint_residual``) compares the preintegrated
  (dR, dv, dp) against the spline's pose *and its analytic time-derivative*
  (world velocity) at the two endpoint stamps — one 9-dim factor per
  keyframe interval instead of one 6-dim factor per IMU sample, trading the
  direct formulation's per-sample residuals for a constant-size window.

Frame conventions: samples are expected in the **body frame** (rotate by
R_bs on the host before feeding; the direct frontend keeps the full IMU
intrinsic model, this one assumes neutral intrinsics like every standard
preintegration pipeline).  Gravity is the world vector ``g_w`` with
``a_world = R_wb * a_meas + g_w`` — the same convention as the direct
residual (``factors/residuals.py``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..state import bspline
from ..variables import so3

__all__ = ["Preintegrator", "PreintMeasurement", "preint_residual",
           "PREINT_DIM"]

PREINT_DIM = 9  # [rotation (3), velocity (3), position (3)]


def _hat(w):
    return np.array([[0.0, -w[2], w[1]],
                     [w[2], 0.0, -w[0]],
                     [-w[1], w[0], 0.0]])


def _so3_exp_matrix(w):
    theta = np.linalg.norm(w)
    W = _hat(w)
    if theta < 1e-9:
        return np.eye(3) + W + 0.5 * W @ W
    s, c = np.sin(theta), np.cos(theta)
    return (np.eye(3) + (s / theta) * W
            + ((1.0 - c) / theta**2) * (W @ W))


def _so3_right_jacobian(w):
    theta = np.linalg.norm(w)
    W = _hat(w)
    if theta < 1e-6:
        return np.eye(3) - 0.5 * W + W @ W / 6.0
    t2 = theta * theta
    return (np.eye(3) - (1.0 - np.cos(theta)) / t2 * W
            + (theta - np.sin(theta)) / (t2 * theta) * (W @ W))


def _quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _quat_from_exp(w):
    theta = np.linalg.norm(w)
    half = 0.5 * theta
    if theta < 1e-12:
        return np.array([1.0, 0.5 * w[0], 0.5 * w[1], 0.5 * w[2]])
    s = np.sin(half) / theta
    return np.array([np.cos(half), s * w[0], s * w[1], s * w[2]])


def _quat_to_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


@dataclasses.dataclass
class PreintMeasurement:
    """One closed preintegration interval (the factor's measurement)."""
    t_i: float
    t_j: float
    dt_ij: float
    dq: np.ndarray        # (4,) wxyz: preintegrated rotation dR
    dv: np.ndarray        # (3,)
    dp: np.ndarray        # (3,)
    J_bias: np.ndarray    # (5, 3, 3): [dR/dbg, dv/dbg, dv/dba, dp/dbg, dp/dba]
    bg0: np.ndarray       # (3,) bias linearization point (gyro)
    ba0: np.ndarray       # (3,)
    sqrt_info: np.ndarray  # (9, 9): whitening, sqrt_info.T @ sqrt_info = Cov^-1
    num_samples: int


class Preintegrator:
    """Accumulates IMU samples into (dR, dv, dp) with covariance and bias
    Jacobians.  Reset per keyframe interval.

    sigma_g / sigma_a are continuous-time noise densities
    (rad/s/sqrt(Hz), m/s^2/sqrt(Hz)) — the EuRoC YAML convention
    (reference ``settings.yaml`` gyroscope/accelerometer noise_density).
    """

    def __init__(self, sigma_g: float, sigma_a: float,
                 bg0=None, ba0=None):
        self.sigma_g2 = sigma_g * sigma_g
        self.sigma_a2 = sigma_a * sigma_a
        self.bg0 = np.zeros(3) if bg0 is None else np.asarray(bg0, float)
        self.ba0 = np.zeros(3) if ba0 is None else np.asarray(ba0, float)
        self.reset(0.0)

    def reset(self, t_start: float, bg0=None, ba0=None):
        if bg0 is not None:
            self.bg0 = np.asarray(bg0, float)
        if ba0 is not None:
            self.ba0 = np.asarray(ba0, float)
        self.t_i = t_start
        self.t_last = t_start
        self.dq = np.array([1.0, 0, 0, 0])
        self.dv = np.zeros(3)
        self.dp = np.zeros(3)
        self.cov = np.zeros((9, 9))
        # [dR/dbg, dv/dbg, dv/dba, dp/dbg, dp/dba]
        self.JR_bg = np.zeros((3, 3))
        self.Jv_bg = np.zeros((3, 3))
        self.Jv_ba = np.zeros((3, 3))
        self.Jp_bg = np.zeros((3, 3))
        self.Jp_ba = np.zeros((3, 3))
        self.n = 0
        self._prev = None  # (t, gyro, accel) for midpoint integration

    def add(self, t: float, gyro, accel):
        """Integrate to time t with the midpoint rule (average of the
        previous and current sample over [t_prev, t]) — O(dt^2) accurate,
        like VINS/OKVIS."""
        gyro = np.asarray(gyro, float)
        accel = np.asarray(accel, float)
        if self._prev is None:
            self._prev = (t, gyro, accel)
            self.t_last = t
            return
        tp, gp, ap = self._prev
        dt = t - tp
        self._prev = (t, gyro, accel)
        if dt <= 0.0:
            return
        self._step(dt, 0.5 * (gp + gyro), 0.5 * (ap + accel))
        self.t_last = t

    def _step(self, dt: float, gyro, accel):
        """One discrete propagation step with (gyro, accel) held over dt."""
        w = np.asarray(gyro, float) - self.bg0
        a = np.asarray(accel, float) - self.ba0
        R = _quat_to_matrix(self.dq)
        Ra = R @ a
        Rha = R @ _hat(a)
        dRk = _so3_exp_matrix(w * dt)
        Jr = _so3_right_jacobian(w * dt)

        # Covariance propagation (state order: rotation, velocity, position).
        A = np.eye(9)
        A[0:3, 0:3] = dRk.T
        A[3:6, 0:3] = -Rha * dt
        A[6:9, 0:3] = -0.5 * Rha * dt * dt
        A[6:9, 3:6] = np.eye(3) * dt
        # Noise (density -> discrete: sigma^2 / dt).
        Qg = self.sigma_g2 / dt
        Qa = self.sigma_a2 / dt
        B_R = Jr * dt
        B_v = R * dt
        B_p = 0.5 * R * dt * dt
        cov = A @ self.cov @ A.T
        cov[0:3, 0:3] += Qg * (B_R @ B_R.T)
        cov[3:6, 3:6] += Qa * (B_v @ B_v.T)
        cov[6:9, 6:9] += Qa * (B_p @ B_p.T)
        cov[3:6, 6:9] += Qa * (B_v @ B_p.T)
        cov[6:9, 3:6] += Qa * (B_p @ B_v.T)
        self.cov = cov

        # Bias Jacobians (update order matters: p uses old v/R terms).
        self.Jp_bg += self.Jv_bg * dt - 0.5 * Rha @ self.JR_bg * dt * dt
        self.Jp_ba += self.Jv_ba * dt - 0.5 * R * dt * dt
        self.Jv_bg += -Rha @ self.JR_bg * dt
        self.Jv_ba += -R * dt
        self.JR_bg = dRk.T @ self.JR_bg - Jr * dt

        # State propagation.
        self.dp += self.dv * dt + 0.5 * Ra * dt * dt
        self.dv += Ra * dt
        self.dq = _quat_mul(self.dq, _quat_from_exp(w * dt))
        self.dq /= np.linalg.norm(self.dq)
        self.n += 1

    def finish(self, t_j: float) -> PreintMeasurement:
        """Close the interval at t_j (holding the last sample to t_j if it
        falls short) and emit the measurement."""
        if self._prev is not None and t_j > self.t_last:
            _, gp, ap = self._prev
            self._step(t_j - self.t_last, gp, ap)
            self.t_last = t_j
        dt_ij = t_j - self.t_i
        cov = self.cov + np.eye(9) * 1e-12
        # sqrt_info = L^-1 with cov = L L^T  =>  sqrt_info^T sqrt_info = cov^-1
        Lc = np.linalg.cholesky(cov)
        sqrt_info = np.linalg.solve(Lc, np.eye(9))
        return PreintMeasurement(
            t_i=self.t_i, t_j=t_j, dt_ij=dt_ij,
            dq=self.dq.copy(), dv=self.dv.copy(), dp=self.dp.copy(),
            J_bias=np.stack([self.JR_bg, self.Jv_bg, self.Jv_ba,
                             self.Jp_bg, self.Jp_ba]),
            bg0=self.bg0.copy(), ba0=self.ba0.copy(),
            sqrt_info=sqrt_info, num_samples=self.n)


def preint_residual(ctrl_i, u_i, ctrl_j, u_j, dt, bias_g, bias_a, gravity,
                    dq, dv, dp, dt_ij, J_bias, bg0, ba0):
    """Unwhitened 9-dim preintegration residual on one factor.

    ctrl_i/ctrl_j: (k, 7) pose-spline support knots at the two endpoint
    stamps; u_i/u_j local coordinates; dt knot separation.  bias_g/bias_a
    are the bias-spline values at t_i; (dq, dv, dp, dt_ij, J_bias, bg0,
    ba0) the preintegrated measurement.  Velocities come from the spline's
    analytic time derivative (the continuous-time state replaces the
    discrete velocity variables of the classic formulation).
    """
    di = bspline.se3_with_derivatives(ctrl_i, u_i, dt)
    dj = bspline.se3_with_derivatives(ctrl_j, u_j, dt)
    q_i, p_i, v_i = di["pose"][..., :4], di["pose"][..., 4:], di["v_w"]
    q_j, p_j, v_j = dj["pose"][..., :4], dj["pose"][..., 4:], dj["v_w"]

    dbg = bias_g - bg0
    dba = bias_a - ba0
    JR_bg, Jv_bg, Jv_ba, Jp_bg, Jp_ba = (J_bias[0], J_bias[1], J_bias[2],
                                         J_bias[3], J_bias[4])

    # Bias-corrected preintegrated rotation.
    dq_corr = so3.mul(dq, so3.exp(JR_bg @ dbg))
    q_ij = so3.mul(so3.conj(q_i), q_j)
    r_R = so3.log(so3.mul(so3.conj(dq_corr), q_ij))

    q_iw = so3.conj(q_i)
    r_v = so3.rotate(q_iw, v_j - v_i - gravity * dt_ij) \
        - (dv + Jv_bg @ dbg + Jv_ba @ dba)
    r_p = so3.rotate(q_iw, p_j - p_i - v_i * dt_ij
                     - 0.5 * gravity * dt_ij * dt_ij) \
        - (dp + Jp_bg @ dbg + Jp_ba @ dba)
    return jnp.concatenate([r_R, r_v, r_p], axis=-1)
