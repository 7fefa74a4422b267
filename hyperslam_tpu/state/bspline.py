"""Uniform cumulative B-splines on SE(3) and R^n — the continuous-time state.

TPU-native equivalent of the reference's HyperState layer
(``AbstractState`` + ``BasisInterpolator`` + ``ManifoldPolicy``; API inferred
from ``/root/reference/internal/hyper/optimizers/abstract.cpp:76-137`` and the
evaluator call sites — SURVEY.md §2.3).  Literature basis: Sommer et al. 2020,
"Efficient Derivative Computation for Cumulative B-Splines on Lie Groups".

Design (TPU-first):
- Knots are dense arrays ``(N, 7)`` (SE3, wxyz+t) or ``(N, D)`` (Euclidean,
  e.g. IMU biases), uniformly spaced: knot i sits at ``t0 + i * dt``.
- A query at time t uses the k support knots ``s .. s+k-1`` where
  ``s = floor((t - t0) / dt)``; valid query range is
  ``[t0, t0 + (N - k + 1) * dt)`` (the reference's ``outerPadding``:
  left 0, right k-1).
- Evaluation is a pure function of (support knots, u); time derivatives come
  from nested ``jax.jvp`` w.r.t. t — exact, autodiff-native, and fused by XLA.
  Everything vmaps over query batches; no data-dependent shapes.

SE3 interpolation is *cumulative*:
  ``T(u) = T_s * prod_j exp(lambda_j(u) * log(T_{s+j-1}^{-1} T_{s+j}))``.
Euclidean interpolation uses the ordinary (non-cumulative) basis, which is the
same curve for vector spaces.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..variables import se3, so3

__all__ = [
    "blending_matrix",
    "cumulative_blending_matrix",
    "support_index",
    "gather_support",
    "interp_se3",
    "interp_euclidean",
    "eval_se3",
    "eval_euclidean",
    "se3_with_derivatives",
    "euclidean_with_derivatives",
    "body_velocity",
    "valid_range",
    "num_segments",
]

DEFAULT_ORDER = 4  # cubic, the reference's default BasisInterpolator


@functools.lru_cache(maxsize=None)
def _blending_matrix_np(k: int) -> np.ndarray:
    """Uniform B-spline blending matrix M (k x k), float64.

    Row j holds the polynomial coefficients (in powers of u) of basis b_j(u)
    on a knot segment: b_j(u) = sum_p M[j, p] * u**p.  Built by evaluating
    Cox-de Boor basis functions on integer knots and solving a Vandermonde
    system — exact to fp64 roundoff for the small k used here.
    """
    from scipy.interpolate import BSpline

    d = k - 1  # degree
    # Basis function N_{i,d} over uniform integer knots; the k functions
    # overlapping segment [d, d+1) are i = 0..k-1 with knots shifted so that
    # basis j corresponds to control point j of the segment.
    knots = np.arange(-d, k + d + 1, dtype=np.float64)
    u = np.linspace(0.0, 1.0, k) if k > 1 else np.array([0.0])
    V = np.vander(u, k, increasing=True)  # (k, k): row -> [1, u, u^2, ...]
    B = np.zeros((k, k))
    for j in range(k):
        c = np.zeros(len(knots) - d - 1)
        c[j] = 1.0  # basis N_{j,d} (support [j-d, j+1]) is b_j on [0,1)
        spl = BSpline(knots, c, d, extrapolate=True)
        B[:, j] = spl(u)
    # Solve V @ M.T = B  ->  coefficients per basis function.
    M = np.linalg.solve(V, B).T  # (k_basis, k_powers)
    return M


def blending_matrix(k: int = DEFAULT_ORDER, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_blending_matrix_np(k), dtype=dtype)


@functools.lru_cache(maxsize=None)
def _cumulative_blending_matrix_np(k: int) -> np.ndarray:
    M = _blending_matrix_np(k)
    # Cumulative: Mtilde[j] = sum_{l >= j} M[l]
    return np.flip(np.cumsum(np.flip(M, 0), 0), 0)


def cumulative_blending_matrix(k: int = DEFAULT_ORDER, dtype=jnp.float32):
    return jnp.asarray(_cumulative_blending_matrix_np(k), dtype=dtype)


def num_segments(num_knots: int, order: int = DEFAULT_ORDER) -> int:
    return num_knots - order + 1


def valid_range(t0, dt, num_knots: int, order: int = DEFAULT_ORDER):
    """[lower, upper) query interval supported by the knots.

    Mirrors ``AbstractState::range()`` = knots minus spline padding
    (reference ``main.cpp:71-79``)."""
    return t0, t0 + (num_knots - order + 1) * dt


def support_index(t, t0, dt, num_knots: int, order: int = DEFAULT_ORDER):
    """First support-knot index s and local coordinate u in [0, 1)."""
    x = jnp.asarray((t - t0) / dt)
    s = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, num_knots - order)
    u = x - s.astype(x.dtype)
    return s, u


def gather_support(knots, s, order: int = DEFAULT_ORDER):
    """knots (N, D), s (...,) -> (..., k, D) support knots."""
    idx = s[..., None] + jnp.arange(order)  # (..., k)
    return jnp.take(knots, idx, axis=0)


def _powers(u, k):
    return jnp.stack([u**p for p in range(k)], axis=-1)  # (..., k)


def interp_se3(ctrl, u, order: int = DEFAULT_ORDER):
    """Cumulative SE3 interpolation on one segment.

    ctrl: (..., k, 7) support knots; u: (...,) in [0, 1) -> (..., 7).

    The k-1 relative logs/exps are evaluated **batched** (one fused op set
    instead of a Python loop of Lie chains) — this cuts the HLO graph ~3x,
    which matters because the solver forward-differentiates through this
    function for every factor.
    """
    Mt = cumulative_blending_matrix(order, ctrl.dtype)
    lam = _powers(u, order) @ Mt.T  # (..., k); lam[..., 0] == 1
    rel = se3.compose(se3.inverse(ctrl[..., :-1, :]), ctrl[..., 1:, :])
    omega = se3.log(rel)                               # (..., k-1, 6)
    A = se3.exp(lam[..., 1:, None] * omega)            # (..., k-1, 7)
    T = ctrl[..., 0, :]
    for j in range(order - 1):
        T = se3.compose(T, A[..., j, :])
    return T


def interp_euclidean(ctrl, u, order: int = DEFAULT_ORDER):
    """Ordinary B-spline interpolation for vector-valued knots.

    ctrl: (..., k, D); u: (...,) -> (..., D).
    """
    M = blending_matrix(order, ctrl.dtype)
    b = _powers(u, order) @ M.T  # (..., k)
    return jnp.einsum("...k,...kd->...d", b, ctrl)


def eval_se3(knots, t, t0, dt, order: int = DEFAULT_ORDER):
    """Evaluate the SE3 spline at times t (any batch shape) -> (..., 7)."""
    s, u = support_index(t, t0, dt, knots.shape[0], order)
    ctrl = gather_support(knots, s, order)
    return interp_se3(ctrl, u, order)


def eval_euclidean(knots, t, t0, dt, order: int = DEFAULT_ORDER):
    s, u = support_index(t, t0, dt, knots.shape[0], order)
    ctrl = gather_support(knots, s, order)
    return interp_euclidean(ctrl, u, order)


def body_velocity(q, qdot):
    """Body-frame angular velocity from quaternion derivative: 2 * (q^-1 qdot)."""
    return 2.0 * so3.mul(so3.conj(q), qdot)[..., 1:]


def se3_with_derivatives(ctrl, u, dt, order: int = DEFAULT_ORDER):
    """Pose + body angular rate/accel + world linear vel/accel on one segment.

    ctrl: (..., k, 7); u: (...,); dt: knot separation (scalar).
    Returns dict with:
      pose (..., 7), omega_b (..., 3) [rad/s], alpha_b (..., 3) [rad/s^2],
      v_w (..., 3) [m/s], a_w (..., 3) [m/s^2].
    These are the derivative orders 0..2 the reference's inertial evaluator
    queries from the state (``evaluators/inertial.cpp:52-79``; derivative
    indices value/velocity/acceleration, ``evaluators/abstract.hpp:12-16``).
    """
    f = lambda uu: interp_se3(ctrl, uu, order)
    ones = jnp.ones_like(u)
    T, dT = jax.jvp(f, (u,), (ones,))
    # second derivative via jvp of the jvp
    g = lambda uu: jax.jvp(f, (uu,), (ones,))[1]
    _, ddT = jax.jvp(g, (u,), (ones,))
    q, qd, qdd = T[..., :4], dT[..., :4], ddT[..., :4]
    p_d, p_dd = dT[..., 4:], ddT[..., 4:]
    inv_dt = 1.0 / dt
    omega_b = body_velocity(q, qd) * inv_dt
    # alpha_b = d/dt omega_b = 2*(conj(q) qdd + conj(qd) qd)_vec / dt^2
    alpha_b = 2.0 * (so3.mul(so3.conj(q), qdd)
                     + so3.mul(so3.conj(qd), qd))[..., 1:] * inv_dt**2
    return {
        "pose": T,
        "omega_b": omega_b,
        "alpha_b": alpha_b,
        "v_w": p_d * inv_dt,
        "a_w": p_dd * inv_dt**2,
    }


def euclidean_with_derivatives(ctrl, u, dt, order: int = DEFAULT_ORDER):
    """Value + first derivative of a Euclidean spline on one segment."""
    f = lambda uu: interp_euclidean(ctrl, uu, order)
    val, d1 = jax.jvp(f, (u,), (jnp.ones_like(u),))
    return {"value": val, "d1": d1 / dt}
