"""SE(3) rigid transforms — batched (..., 7) arrays [qw qx qy qz tx ty tz].

TPU-native equivalent of the reference's ``SE3`` variable (HyperVariables;
``groupPlus/groupInverse/vectorPlus`` call sites in
``/root/reference/internal/hyper/optimizers/evaluators/bearing.cpp:46-75``,
SURVEY.md §2.3).  Tangent vectors are (..., 6) ordered ``[omega, v]``
(angular first, linear second) to match the reference's
``Tangent::angular()/linear()`` layout.

``exp``/``log`` use the full SE(3) exponential (rotation-coupled V matrix),
which is what a *cumulative B-spline on SE3* interpolates (SURVEY.md §2.3
"BasisInterpolator"; Sommer et al. 2020).  All ops broadcast and are
autodiff-safe near the identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

__all__ = [
    "identity",
    "from_parts",
    "rotation",
    "translation",
    "compose",
    "inverse",
    "act",
    "exp",
    "log",
    "adjoint",
    "to_matrix",
    "random",
    "normalize",
]

_SMALL = 1e-6


def identity(dtype=jnp.float32, batch_shape=()):
    x = jnp.zeros(batch_shape + (7,), dtype=dtype)
    return x.at[..., 0].set(1.0)


def from_parts(q, t):
    return jnp.concatenate([q, t], axis=-1)


def rotation(T):
    return T[..., :4]


def translation(T):
    return T[..., 4:]


def normalize(T):
    return from_parts(so3.normalize(rotation(T)), translation(T))


def compose(T1, T2):
    """T1 * T2 (apply T2 first)."""
    q1, t1 = rotation(T1), translation(T1)
    q2, t2 = rotation(T2), translation(T2)
    return from_parts(so3.mul(q1, q2), t1 + so3.rotate(q1, t2))


def inverse(T):
    q, t = rotation(T), translation(T)
    qi = so3.conj(q)
    return from_parts(qi, -so3.rotate(qi, t))


def act(T, p):
    """Transform point(s) p (..., 3) by T: R p + t."""
    return so3.rotate(rotation(T), p) + translation(T)


def _v_coeffs(theta2, dtype):
    """Coefficients for V = I + a W + b W^2 and its use in exp."""
    a = jnp.where(
        theta2 < _SMALL,
        0.5 - theta2 / 24.0,
        (1.0 - jnp.cos(jnp.sqrt(jnp.where(theta2 < _SMALL, 1.0, theta2))))
        / jnp.where(theta2 < _SMALL, 1.0, theta2),
    )
    b = jnp.where(
        theta2 < _SMALL,
        1.0 / 6.0 - theta2 / 120.0,
        (jnp.sqrt(jnp.where(theta2 < _SMALL, 1.0, theta2))
         - jnp.sin(jnp.sqrt(jnp.where(theta2 < _SMALL, 1.0, theta2))))
        / jnp.where(theta2 < _SMALL, 1.0, theta2) ** 1.5,
    )
    return a, b


def exp(xi):
    """se(3) tangent (..., 6) [omega, v] -> SE3 (..., 7)."""
    w = xi[..., :3]
    v = xi[..., 3:]
    q = so3.exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _v_coeffs(theta2, xi.dtype)
    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    t = v + a[..., None] * wxv + b[..., None] * wxwxv
    return from_parts(q, t)


def log(T):
    """SE3 (..., 7) -> se(3) tangent (..., 6) [omega, v]."""
    q, t = rotation(T), translation(T)
    w = so3.log(q)
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _v_coeffs(theta2, T.dtype)
    # V^{-1} = I - 0.5 W + c W^2 with c = (1 - a/(2b')) style closed form:
    # use c = (1/theta^2)(1 - a/(2*(a-ish)))... standard: V^-1 = I - W/2 + c W^2,
    # c = (1 - theta*cot(theta/2)/2) / theta^2
    c = jnp.where(
        theta2 < _SMALL,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0
         - 0.5 * jnp.sqrt(jnp.where(theta2 < _SMALL, 1.0, theta2))
         * _cot_half(jnp.sqrt(jnp.where(theta2 < _SMALL, 1.0, theta2))))
        / jnp.where(theta2 < _SMALL, 1.0, theta2),
    )
    wxt = jnp.cross(w, t)
    wxwxt = jnp.cross(w, wxt)
    v = t - 0.5 * wxt + c[..., None] * wxwxt
    return jnp.concatenate([w, v], axis=-1)


def _cot_half(theta):
    return jnp.cos(theta * 0.5) / jnp.sin(theta * 0.5)


def adjoint(T):
    """Adjoint matrix (..., 6, 6) for tangent order [omega, v]:
    Ad(T) = [[R, 0], [t^ R, R]]."""
    R = so3.to_matrix(rotation(T))
    tx = so3.hat(translation(T))
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bot = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def to_matrix(T):
    """(..., 7) -> (..., 4, 4) homogeneous matrix."""
    R = so3.to_matrix(rotation(T))
    t = translation(T)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bshape = T.shape[:-1]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), bshape + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def random(key, batch_shape=(), dtype=jnp.float32, trans_scale=1.0):
    kq, kt = jax.random.split(key)
    q = so3.random(kq, batch_shape, dtype)
    t = jax.random.normal(kt, batch_shape + (3,), dtype) * trans_scale
    return from_parts(q, t)
