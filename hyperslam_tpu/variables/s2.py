"""Unit-sphere variables: Bearing (unit 3-vector) and Gravity (norm-fixed).

TPU-native equivalent of the reference's ``Bearing`` / ``Gravity`` variables
and their Ceres ``SphereManifold<3>`` local parameterization
(``/root/reference/internal/hyper/optimizers/ceres/manifolds/variables/bearing.cpp:11-17``,
``gravity.hpp:10-18``; SURVEY.md §2.1/§2.3).  A point on S² has 2 DoF; the
retraction perturbs in the local tangent basis and renormalizes.

Gravity is a bearing scaled by the fixed gravity norm
(``Traits<Gravity>::kNorm``): the reference initializes the world gravity to
``-kNorm * e0`` (``environment/abstract.cpp:59-65``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRAVITY_NORM = 9.80741  # m/s^2 — reference Traits<Gravity>::kNorm (SURVEY §2.1)

__all__ = ["GRAVITY_NORM", "tangent_basis", "retract", "boxminus",
           "normalize", "default_gravity"]


def normalize(d):
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def tangent_basis(d):
    """Orthonormal basis of the tangent plane at unit vector d: (..., 3, 2).

    Branch-free Householder-style construction (stable for all d).
    """
    d = normalize(d)
    # Pick the axis least aligned with d to build the first tangent.
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    # b1 = normalize(e x d) where e = axis of smallest |component|
    absd = jnp.abs(d)
    e = jax.nn.one_hot(jnp.argmin(absd, axis=-1), 3, dtype=d.dtype)
    b1 = jnp.cross(e, d)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(d, b1)
    return jnp.stack([b1, b2], axis=-1)  # (..., 3, 2)


def retract(d, delta, norm=1.0):
    """Perturb a (scaled) sphere point by a 2-vector in its tangent plane.

    d: (..., 3) with |d| = norm;  delta: (..., 2).  Returns (..., 3) with
    |result| = norm.  Uses the exponential-map retraction (geodesic step).
    """
    u = d / norm
    B = tangent_basis(u)  # (..., 3, 2)
    v = jnp.einsum("...ij,...j->...i", B, delta)  # tangent 3-vector
    # theta^2-based guards keep gradients finite at delta = 0 (|delta| is not
    # differentiable there; the double-where pattern avoids NaN tangents).
    t2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
    small = t2 < 1e-12
    safe = jnp.where(small, jnp.ones_like(t2), t2)
    cos_t = jnp.where(small, 1.0 - t2 * 0.5, jnp.cos(jnp.sqrt(safe)))
    sinc = jnp.where(small, 1.0 - t2 / 6.0,
                     jnp.sin(jnp.sqrt(safe)) / jnp.sqrt(safe))
    out = cos_t * u + sinc * v
    return normalize(out) * norm


def boxminus(d1, d0, norm=1.0):
    """Local coordinates of d1 in the tangent basis at d0 (inverse retraction)."""
    u0, u1 = d0 / norm, d1 / norm
    B = tangent_basis(u0)
    # geodesic log map on the sphere
    c = jnp.clip(jnp.sum(u0 * u1, axis=-1, keepdims=True), -1.0, 1.0)
    perp = u1 - c * u0
    # v = perp * theta/|perp|; guard |perp| -> 0 (theta/|perp| -> 1/c) so the
    # map and its gradient stay finite when d1 == d0.
    n2 = jnp.sum(perp * perp, axis=-1, keepdims=True)
    small = n2 < 1e-12
    n_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
    factor = jnp.where(
        small, 1.0 / jnp.clip(c, 1e-6, None),
        jnp.arctan2(n_safe, c) / n_safe)
    v = perp * factor
    return jnp.einsum("...ji,...j->...i", B, v)


def default_gravity(dtype=jnp.float32):
    """Reference init: -kNorm * e0 (environment/abstract.cpp:64)."""
    return jnp.asarray([-GRAVITY_NORM, 0.0, 0.0], dtype=dtype)
