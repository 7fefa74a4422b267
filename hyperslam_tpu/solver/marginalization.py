"""Sliding-window marginalization — host-side Schur elimination of state
leaving the window.

The reference does NOT marginalize: knots at/below the window lower bound are
frozen constant and the factors that referenced evicted state are simply
dropped (``/root/reference/internal/hyper/optimizers/ceres/optimizer.cpp:322-382``;
SURVEY.md §2.2 lists marginalization as declared-but-absent).  This module
implements the standard fixed-lag treatment (as in OKVIS/VINS-class systems):
when the window slides, the factors that are about to be evicted — together
with the previous marginal prior — are linearized once at the current
estimate, the departing state (the oldest pose knot and any landmarks whose
last observation leaves the window) is Schur-eliminated, and the remaining
quadratic becomes a new :class:`~hyperslam_tpu.solver.problem.MargPrior`
factor with first-estimate Jacobians.

All of this runs on the **host in float64** (NumPy): the blocks are small
(D0 = K*6 + Kb*6 + 2 ≈ 3e2 columns) and the operation fires once per window
slide (every ``knot_separation`` seconds), so it is latency-trivial next to
the device solve; keeping it off-device avoids polluting the jitted LM loop
with rank-revealing eigendecompositions.

Column convention: the prior covers the non-calibration prefix of the reduced
layout, ``[pose knots K*6 | gyro bias Kb*3 | accel bias Kb*3 | gravity 2]``
(see ``problem.make_layout``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["HostPrior", "marginalize_columns", "sqrt_factor",
           "shift_knot_block", "shift_bias_block", "ACTIVE_TOL"]

# Information below this magnitude is numerical residue of the subtractive
# Schur step, not signal: a residual bundle whose rank is fully attributable
# to the eliminated block (e.g. a single 6-dim pose prior vs the 6 departing
# knot columns) leaves a Schur complement that is *mathematically* zero but
# numerically ~1e-16..1e-10.  Real information enters at the sqrt-info scale
# (>= 1e2 per row), so 1e-6 separates the two regimes by many decades.
ACTIVE_TOL = 1e-6


@dataclasses.dataclass
class HostPrior:
    """Quadratic prior 0.5 dx'H dx + g'dx around linearization point x0."""
    H: np.ndarray          # (D0, D0) f64
    g: np.ndarray          # (D0,) f64
    x0_knots: np.ndarray   # (K, 7)
    x0_bias_g: np.ndarray  # (Kb, 3)
    x0_bias_a: np.ndarray  # (Kb, 3)
    x0_gravity: np.ndarray  # (3,)
    active: bool = False

    @classmethod
    def empty(cls, K: int, Kb: int):
        D0 = K * 6 + Kb * 6 + 2
        knots = np.tile(np.array([1.0, 0, 0, 0, 0, 0, 0]), (K, 1))
        # Same default as the estimator/reference: -kNorm * e0
        # (environment/abstract.cpp:64, variables/s2.py default_gravity).
        return cls(H=np.zeros((D0, D0)), g=np.zeros(D0), x0_knots=knots,
                   x0_bias_g=np.zeros((Kb, 3)), x0_bias_a=np.zeros((Kb, 3)),
                   x0_gravity=np.array([-9.80741, 0.0, 0.0]), active=False)


def marginalize_columns(H: np.ndarray, g: np.ndarray, m_idx: np.ndarray):
    """Schur-eliminate columns ``m_idx``: returns (H', g') over the rest.

    Uses a symmetric pseudo-inverse so rank-deficient marginal blocks (e.g.
    a landmark seen only in one dying stereo pair) degrade gracefully instead
    of injecting spurious information."""
    D = H.shape[0]
    keep = np.setdiff1d(np.arange(D), m_idx)
    Hmm = H[np.ix_(m_idx, m_idx)]
    Hkm = H[np.ix_(keep, m_idx)]
    Hmm_inv = np.linalg.pinv(0.5 * (Hmm + Hmm.T), hermitian=True,
                             rcond=1e-12)
    H_new = H[np.ix_(keep, keep)] - Hkm @ Hmm_inv @ Hkm.T
    g_new = g[keep] - Hkm @ Hmm_inv @ g[m_idx]
    return 0.5 * (H_new + H_new.T), g_new


def sqrt_factor(H: np.ndarray, g: np.ndarray, eps: float = 1e-10):
    """Information square root: rows (sqrt_H, r0) with
    0.5 dx'H dx + g'dx = 0.5 ||sqrt_H dx + r0||^2 + const.

    Eigendecomposition with small/negative eigenvalues clipped to zero (their
    rows vanish), so the result is always a valid PSD factorization even
    after the subtractive Schur step.  Output is padded to (D0, D0)."""
    D = H.shape[0]
    w, U = np.linalg.eigh(0.5 * (H + H.T))
    tol = eps * max(float(w.max(initial=0.0)), 1.0)
    keep = w > tol
    s = np.sqrt(w[keep])
    sqrt_H = np.zeros((D, D))
    r0 = np.zeros(D)
    m = int(keep.sum())
    if m:
        Uk = U[:, keep]
        sqrt_H[:m] = (Uk * s).T                     # rows = S^1/2 U'
        r0[:m] = (Uk / s).T @ g                     # S^-1/2 U' g
    return sqrt_H, r0


def shift_knot_block(H: np.ndarray, g: np.ndarray, K: int):
    """Re-index the prior after the knot ring slides by one slot
    (old knot i+1 -> new slot i); the departing slot-0 columns must already
    have been marginalized out (pass the (D0-6)-sized system).  Returns the
    (D0, D0) system in the new indexing, with the (empty) last slot zero."""
    Dsmall = H.shape[0]
    D0 = Dsmall + 6
    idx = np.concatenate([np.arange(0, (K - 1) * 6),
                          np.arange(K * 6, D0)])
    H_new = np.zeros((D0, D0))
    g_new = np.zeros(D0)
    H_new[np.ix_(idx, idx)] = H
    g_new[idx] = g
    return H_new, g_new


def shift_bias_block(prior: HostPrior, K: int, Kb: int):
    """Re-index the prior when the bias splines slide by one knot (the lazy
    slide in the estimator's ``_ensure_bias_knots``): marginalize the oldest
    gyro/accel bias knot, then shift both bias blocks down by one slot."""
    if not prior.active:
        prior.x0_bias_g[:-1] = prior.x0_bias_g[1:]
        prior.x0_bias_a[:-1] = prior.x0_bias_a[1:]
        return
    D0 = prior.H.shape[0]
    off_bg = K * 6
    off_ba = off_bg + Kb * 3
    m_idx = np.concatenate([off_bg + np.arange(3), off_ba + np.arange(3)])
    H_s, g_s = marginalize_columns(prior.H, prior.g, m_idx)
    # Indices (in the reduced system) of where surviving columns go.
    keep = np.setdiff1d(np.arange(D0), m_idx)
    new_of_old = np.empty(D0, np.int64)
    new_of_old[:] = -1
    for pos_small, old in enumerate(keep):
        if off_bg + 3 <= old < off_ba:            # gyro knots 1..Kb-1
            new_of_old[old] = old - 3
        elif off_ba + 3 <= old < off_ba + Kb * 3:  # accel knots 1..Kb-1
            new_of_old[old] = old - 3
        else:
            new_of_old[old] = old
    dest = new_of_old[keep]
    H_new = np.zeros((D0, D0))
    g_new = np.zeros(D0)
    H_new[np.ix_(dest, dest)] = H_s
    g_new[dest] = g_s
    prior.H, prior.g = H_new, g_new
    prior.x0_bias_g[:-1] = prior.x0_bias_g[1:]
    prior.x0_bias_a[:-1] = prior.x0_bias_a[1:]


def local_diff_np(knots, bias_g, bias_a, gravity, prior: HostPrior):
    """NumPy mirror of ``ba._marg_local_diff`` (for recentering the prior's
    gradient when combining with newly-linearized factors)."""
    from ..variables import nplie
    K = knots.shape[0]
    dx_k = np.zeros((K, 6))
    for i in range(K):
        q0, q1 = prior.x0_knots[i, :4], knots[i, :4]
        dx_k[i, :3] = nplie.so3_log(nplie.quat_mul(nplie.quat_conj(q0), q1))
        dx_k[i, 3:] = knots[i, 4:] - prior.x0_knots[i, 4:]
    dbg = (bias_g - prior.x0_bias_g).reshape(-1)
    dba = (bias_a - prior.x0_bias_a).reshape(-1)
    dgr = _s2_boxminus_np(gravity, prior.x0_gravity)
    return np.concatenate([dx_k.reshape(-1), dbg, dba, dgr])


def _s2_boxminus_np(d1, d0, norm: float = 9.80741):
    u0, u1 = d0 / norm, d1 / norm
    # tangent basis at u0 (same construction as variables/s2.py)
    e = np.zeros(3)
    e[np.argmin(np.abs(u0))] = 1.0
    b1 = np.cross(e, u0)
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(u0, b1)
    c = float(np.clip(np.dot(u0, u1), -1.0, 1.0))
    perp = u1 - c * u0
    n = np.linalg.norm(perp)
    if n < 1e-9:
        v = perp / max(c, 1e-6)
    else:
        v = perp * (np.arctan2(n, c) / n)
    return np.array([np.dot(b1, v), np.dot(b2, v)])
