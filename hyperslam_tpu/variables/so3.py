"""SO(3) as unit quaternions — batched, dtype-polymorphic, autodiff-safe.

TPU-native equivalent of the reference's ``SU2`` variable family
(HyperVariables, inferred from call sites in
``/root/reference/internal/hyper/optimizers/evaluators/*.cpp``; see SURVEY.md
§2.3).  Quaternions are stored ``(..., 4)`` in **wxyz** order.  All functions
broadcast over leading axes and are safe under ``jax.grad``/``jvp`` near the
identity (Taylor-guarded small-angle branches with the double-``where``
pattern, so no NaNs leak through autodiff).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "identity",
    "normalize",
    "mul",
    "conj",
    "rotate",
    "to_matrix",
    "from_matrix",
    "exp",
    "log",
    "left_jacobian",
    "right_jacobian",
    "hat",
    "vee",
    "random",
]

# Small-angle threshold on theta^2; float32 eps ~ 1.2e-7, so 1e-6 keeps the
# polynomial branch well inside the region where the Taylor error < eps.
_SMALL = 1e-6


def identity(dtype=jnp.float32, batch_shape=()):
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mul(q1, q2):
    """Hamilton product (wxyz)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses the 15-mul expansion t = 2 q_v x v;  v' = v + q_w t + q_v x t.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def to_matrix(q):
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(m):
    """(..., 3, 3) -> (..., 4) wxyz.  Shepperd's method, branch-free."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Pick the numerically best branch per element.
    cand = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                      1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(cand, axis=-1)
    t_best = jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
    s = jnp.sqrt(jnp.maximum(t_best, 1e-12))
    half_over_s = (0.5 / s)[..., None]
    qw_v = jnp.stack([t_best, m21 - m12, m02 - m20, m10 - m01], -1)
    qx_v = jnp.stack([m21 - m12, t_best, m01 + m10, m02 + m20], -1)
    qy_v = jnp.stack([m02 - m20, m01 + m10, t_best, m12 + m21], -1)
    qz_v = jnp.stack([m10 - m01, m02 + m20, m12 + m21, t_best], -1)
    stacked = jnp.stack([qw_v, qx_v, qy_v, qz_v], axis=-2)  # (..., 4branch, 4)
    chosen = jnp.take_along_axis(
        stacked, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = chosen * half_over_s
    # Canonicalize sign: w >= 0.
    return normalize(jnp.where(q[..., :1] < 0, -q, q))


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def vee(m):
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _guarded(theta2, exact_of_safe, taylor, small=_SMALL):
    """Double-where: evaluate `exact` at a safe argument so its grad is finite."""
    is_small = theta2 < small
    safe = jnp.where(is_small, jnp.ones_like(theta2), theta2)
    return jnp.where(is_small, taylor(theta2), exact_of_safe(safe))


def exp(w):
    """so(3) tangent (..., 3) -> unit quaternion (..., 4)."""
    theta2 = jnp.sum(w * w, axis=-1)
    # sin(θ/2)/θ and cos(θ/2)
    k = _guarded(
        theta2,
        lambda t2: jnp.sin(jnp.sqrt(t2) * 0.5) / jnp.sqrt(t2),
        lambda t2: 0.5 - t2 / 48.0,
    )
    c = _guarded(
        theta2,
        lambda t2: jnp.cos(jnp.sqrt(t2) * 0.5),
        lambda t2: 1.0 - t2 / 8.0,
    )
    return jnp.concatenate([c[..., None], k[..., None] * w], axis=-1)


def log(q):
    """Unit quaternion (..., 4) -> so(3) tangent (..., 3), |result| <= pi."""
    qw = q[..., 0]
    qv = q[..., 1:]
    # Map to the w>=0 hemisphere so the returned angle is minimal.
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qw = qw * sign
    qv = qv * sign[..., None]
    n2 = jnp.sum(qv * qv, axis=-1)
    # angle θ = 2 atan2(|qv|, qw); factor = θ/|qv| -> 2/qw for small |qv|
    factor = _guarded(
        n2,
        lambda s: 2.0 * jnp.arctan2(jnp.sqrt(s), qw) / jnp.sqrt(s),
        lambda s: 2.0 / jnp.maximum(qw, 1e-12) - 2.0 * s / (3.0 * jnp.maximum(qw, 1e-12) ** 3),
    )
    return factor[..., None] * qv


def left_jacobian(w):
    """Left Jacobian J_l of SO(3): exp(w + dw) ≈ exp(J_l dw) exp(w)."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    W2 = W @ W
    a = _guarded(
        theta2,
        lambda t2: (1.0 - jnp.cos(jnp.sqrt(t2))) / t2,
        lambda t2: 0.5 - t2 / 24.0,
    )
    b = _guarded(
        theta2,
        lambda t2: (jnp.sqrt(t2) - jnp.sin(jnp.sqrt(t2))) / (t2 * jnp.sqrt(t2)),
        lambda t2: 1.0 / 6.0 - t2 / 120.0,
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def right_jacobian(w):
    """Right Jacobian J_r(w) = J_l(-w)."""
    return left_jacobian(-w)


def random(key, batch_shape=(), dtype=jnp.float32):
    """Uniformly distributed random rotations (via normalized Gaussians)."""
    q = jax.random.normal(key, batch_shape + (4,), dtype=dtype)
    q = normalize(q)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
