"""Robust losses as IRLS weights.

The reference attaches Ceres loss functions per observation type
(``/root/reference/internal/hyper/optimizers/ceres/optimizer.cpp:189-274``):
bearing -> Huber(1.6e-3), pixel -> Huber(0.5), inertial -> ScaledLoss(1.6e-5),
pose prior -> none.  In a batched Gauss-Newton solver the same robustification
is applied by reweighting: each residual r with squared norm s = |r|^2 gets a
scalar weight w = rho'(s); multiplying r and J by sqrt(w) reproduces the
robustified normal equations (standard IRLS / Triggs et al.).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["huber_weight", "scaled_weight", "sqrt_weight",
           "BEARING_HUBER", "PIXEL_HUBER", "INERTIAL_SCALE"]

# Reference loss parameters (ceres/optimizer.cpp:189-274).
BEARING_HUBER = 1.6e-3
PIXEL_HUBER = 0.5
INERTIAL_SCALE = 1.6e-5


def huber_weight(sq_norm, delta):
    """rho'(s) for Ceres Huber: rho(s) = s (s<=d^2), 2 d sqrt(s) - d^2 else."""
    safe = jnp.maximum(sq_norm, 1e-24)
    return jnp.where(sq_norm <= delta * delta, 1.0, delta / jnp.sqrt(safe))


def scaled_weight(sq_norm, scale):
    return jnp.full_like(sq_norm, scale)


def sqrt_weight(w):
    return jnp.sqrt(jnp.maximum(w, 0.0))
