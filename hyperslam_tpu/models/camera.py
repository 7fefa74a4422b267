"""Pinhole camera model: projection, radial-tangential distortion, bearings,
two-view midpoint triangulation.

TPU-native equivalent of the reference's ``Camera`` sensor (HyperSensors;
call sites ``/root/reference/internal/hyper/optimizers/evaluators/pixel.cpp:15-146``,
``optimizers/abstract.cpp:222-223,249-255``; SURVEY.md §2.3).  Parameter
conventions follow the reference:

- intrinsics (4,): ``[cx, cy, fx, fy]`` (reference ``Intrinsics<S>``; YAML
  ``resources/datasets/euroc/setups/stereo_inertial/settings.yaml``).
- distortion (4,): radial-tangential ``[k1, k2, p1, p2]``
  (``RadialTangentialDistortion<S, 2>``).
- extrinsics: SE3 ``T_bs`` (body-from-sensor), stored as (7,) wxyz+t.

All functions are batched over leading axes and pure (parameters are inputs,
so they remain optimizable for self-calibration like the reference's
constancy-flag machinery, ``ceres/optimizer.cpp:56-69``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..variables import se3, so3

__all__ = [
    "project_to_plane", "distort", "undistort", "denormalize", "normalize_pixel",
    "project", "pixel_to_bearing", "pixels_to_bearings", "triangulate_midpoint",
]


def project_to_plane(p):
    """(..., 3) camera-frame point -> (..., 2) normalized image coords.

    Reference: static ``Camera::ProjectToPlane`` (SURVEY §2.3).
    """
    z = p[..., 2:3]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return p[..., :2] / safe_z


def distort(px, dist):
    """Radial-tangential distortion of normalized coords.

    px: (..., 2); dist: (..., 4) = [k1, k2, p1, p2].
    """
    k1, k2, p1, p2 = jnp.moveaxis(dist, -1, 0)
    x, y = px[..., 0], px[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort(px, dist, iterations=8):
    """Invert `distort` by NEWTON iteration with the analytic 2x2 Jacobian
    (static shape, jit-friendly).

    The plain fixed-point iteration ``u <- px - (distort(u) - u)`` converges
    only linearly at rate ``|1 - d(distort)/du|`` — ~0.5 at EuRoC distortion
    strength near the field edges, leaving a systematic ~0.4 px radial error
    after 8 sweeps (measured; it biased stereo-baseline self-calibration).
    Newton reaches roundoff in <= 6 steps over the whole image."""
    k1, k2, p1, p2 = jnp.moveaxis(dist, -1, 0)

    def body(_, u):
        x, y = u[..., 0], u[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dr = k1 + 2.0 * k2 * r2
        jxx = radial + 2.0 * x * x * dr + 2.0 * p1 * y + 6.0 * p2 * x
        jxy = 2.0 * x * y * dr + 2.0 * p1 * x + 2.0 * p2 * y
        jyy = radial + 2.0 * y * y * dr + 6.0 * p1 * y + 2.0 * p2 * x
        f = distort(u, dist) - px
        det = jxx * jyy - jxy * jxy
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        du = jnp.stack([(jyy * f[..., 0] - jxy * f[..., 1]) / det,
                        (jxx * f[..., 1] - jxy * f[..., 0]) / det], -1)
        return u - du
    return jax.lax.fori_loop(0, iterations, body, px)


def denormalize(px, intr):
    """Normalized coords -> pixels: [fx x + cx, fy y + cy]. intr = [cx,cy,fx,fy]."""
    cx, cy, fx, fy = jnp.moveaxis(intr, -1, 0)
    return jnp.stack([fx * px[..., 0] + cx, fy * px[..., 1] + cy], axis=-1)


def normalize_pixel(uv, intr):
    cx, cy, fx, fy = jnp.moveaxis(intr, -1, 0)
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def project(p_cam, intr, dist):
    """Full chain camera-point -> pixel: project, distort, denormalize.

    Mirrors the reference pixel evaluator chain
    (``evaluators/pixel.cpp:49-63``)."""
    return denormalize(distort(project_to_plane(p_cam), dist), intr)


def pixel_to_bearing(uv, intr, dist):
    """Pixel -> unit bearing vector in the camera frame.

    Reference: ``Camera::convertPixelsToBearings`` (abstract.cpp:222-223)."""
    xn = undistort(normalize_pixel(uv, intr), dist)
    b = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


pixels_to_bearings = pixel_to_bearing  # batched by construction


def triangulate_midpoint(T_01, b0, b1):
    """Two-view midpoint triangulation, expressed in camera-0 frame.

    T_01: SE3 (..., 7), pose of camera 1 in camera 0.  b0, b1: unit bearings
    (..., 3) in their own camera frames.  Returns (..., 3) point in cam 0.

    Reference: static ``Camera::Triangulate`` (midpoint method, used at
    ``optimizers/abstract.cpp:249-255``).  Closed-form least-squares midpoint:
    minimize |o0 + s0 d0 - (o1 + s1 d1)|^2 over (s0, s1).
    """
    d0 = b0
    d1 = so3.rotate(se3.rotation(T_01), b1)
    o1 = se3.translation(T_01)
    # Solve [d0·d0, -d0·d1; d0·d1, -d1·d1] [s0, s1]^T = [d0·o1, d1·o1]^T
    a = jnp.sum(d0 * d0, axis=-1)
    b = jnp.sum(d0 * d1, axis=-1)
    c = jnp.sum(d1 * d1, axis=-1)
    e0 = jnp.sum(d0 * o1, axis=-1)
    e1 = jnp.sum(d1 * o1, axis=-1)
    denom = a * c - b * b
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    s0 = (c * e0 - b * e1) / safe
    s1 = (b * e0 - a * e1) / safe
    p0 = s0[..., None] * d0
    p1 = o1 + s1[..., None] * d1
    return 0.5 * (p0 + p1)
