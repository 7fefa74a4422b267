"""Photometric stereo renderer — real PNG imagery for full-pipeline tests.

The reference is validated end-to-end on EuRoC rosbags (real photographs →
KLT → estimator → evo APE, ``/root/reference/evaluation/run.py:29-57``).  The
bench environment has no rosbags, so this module renders *synthetic
photographs*: a camera flying through a procedurally-textured box room along
a ground-truth SE3 B-spline, projected through the exact EuRoC stereo model
(intrinsics + radial-tangential distortion + extrinsics).  The output is a
EuRoC-ASL-layout dataset of real PNG bytes, so the complete production path —
native C++ PNG decode → pyramidal KLT → triangulation → sliding-window solve
→ TUM export → APE — runs on actual images with known ground truth.

Rendering is ray casting, fully jitted: per pixel, unproject through the
inverse distortion to a camera ray, intersect the axis-aligned box from the
inside, and shade the hit wall with multi-octave value noise (band-limited so
Lucas-Kanade has well-conditioned gradients at the configured patch size).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import camera as cam_model
from ..solver.problem import CameraCalib
from ..state import bspline
from ..variables import s2, se3, so3

__all__ = ["RenderConfig", "render_sequence", "write_euroc_dataset",
           "ideal_imu"]


@dataclasses.dataclass
class RenderConfig:
    duration: float = 6.0
    knot_dt: float = 0.5
    cam_rate: float = 10.0
    imu_rate: float = 100.0
    image_size: Tuple[int, int] = (752, 480)   # (W, H)
    box_center: Tuple[float, float, float] = (0.0, 0.0, 3.0)
    box_half: Tuple[float, float, float] = (6.0, 6.0, 8.0)
    texture_size: int = 256
    rot_scale: float = 0.04      # GT spline smooth-walk scales
    trans_scale: float = 0.12
    seed: int = 0


def _value_noise(tex, u, v, freq):
    """Bilinear-wrapped sample of tex (S, S) at coords (u, v) * freq."""
    S = tex.shape[0]
    x = u * freq
    y = v * freq
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    xi = x0.astype(jnp.int32) % S
    yi = y0.astype(jnp.int32) % S
    xj = (xi + 1) % S
    yj = (yi + 1) % S
    v00 = tex[yi, xi]
    v01 = tex[yi, xj]
    v10 = tex[yj, xi]
    v11 = tex[yj, xj]
    return ((1 - dy) * ((1 - dx) * v00 + dx * v01)
            + dy * ((1 - dx) * v10 + dx * v11))


def _shade(tex, u, v):
    """Multi-octave value noise in [0, 1]; octave frequencies are in
    cycles/metre, chosen so gradients live at the 3-30 px scale for walls a
    few metres away at EuRoC focal lengths."""
    val = (0.50 * _value_noise(tex, u, v, 2.1)
           + 0.33 * _value_noise(tex, u, v, 5.7)
           + 0.17 * _value_noise(tex, u, v, 14.3))
    return val


def _ray_box_exit(o, d, center, half):
    """Smallest positive t where ray o + t d exits the AABB (o inside).
    Returns (t, axis) with axis = index of the wall plane hit."""
    eps = 1e-9
    d_safe = jnp.where(jnp.abs(d) < eps, eps, d)
    bound = center + jnp.sign(d_safe) * half
    ts = (bound - o) / d_safe
    axis = jnp.argmin(ts)
    return ts[axis], axis


def _wall_uv(h, axis, center):
    """2D texture coords of hit point h on the wall orthogonal to `axis`,
    offset per wall so opposite/adjacent walls decorrelate."""
    rel = h - center
    u = jnp.where(axis == 0, rel[1], rel[0])
    v = jnp.where(axis == 2, rel[1], rel[2])
    # wall id in 0..5 for the offset
    side = (jnp.sign(rel[axis]) > 0).astype(jnp.float32)
    wall = axis.astype(jnp.float32) * 2.0 + side
    return u + 17.31 * wall, v + 9.77 * wall


@functools.partial(jax.jit, static_argnames=("W", "H"))
def _render_one(T_wc, intr, dist, tex, center, half, W: int, H: int):
    """Render one camera view -> (H, W) float in [0, 1]."""
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    u, v = jnp.meshgrid(xs, ys)                       # (H, W)
    uv = jnp.stack([u.ravel(), v.ravel()], -1)        # (N, 2)
    rays_c = cam_model.pixel_to_bearing(uv, intr, dist)
    R = so3.to_matrix(se3.rotation(T_wc))
    o = se3.translation(T_wc)
    rays_w = rays_c @ R.T

    def one(d):
        t, axis = _ray_box_exit(o, d, center, half)
        h = o + t * d
        tu, tv = _wall_uv(h, axis, center)
        val = _shade(tex, tu, tv)
        # gentle distance attenuation for realism (keeps contrast)
        return val * (1.0 / (1.0 + 0.02 * t))

    img = jax.vmap(one)(rays_w).reshape(H, W)
    return img


@functools.partial(jax.jit, static_argnames=())
def _imu_ideal(knots, stamps, kdt, gravity_w):
    s, u = bspline.support_index(stamps, 0.0, kdt, knots.shape[0])
    ctrl = bspline.gather_support(knots, s)
    d = bspline.se3_with_derivatives(ctrl, u, kdt)
    accel = so3.rotate(so3.conj(d["pose"][:, :4]), d["a_w"] - gravity_w)
    return d["omega_b"], accel


def ideal_imu(gt_knots, kdt: float, stamps: np.ndarray,
              gravity_w: Optional[np.ndarray] = None):
    """Ideal body-frame IMU samples from spline derivatives (same model as
    frontend/synthetic.py): omega_b, specific force a_b = R_bw (a_w - g)."""
    if gravity_w is None:
        gravity_w = np.array([0.0, 0.0, -s2.GRAVITY_NORM])
    g, a = _imu_ideal(jnp.asarray(gt_knots), jnp.asarray(stamps, jnp.float64),
                      jnp.asarray(kdt, jnp.float64),
                      jnp.asarray(gravity_w, jnp.float64))
    return np.asarray(g), np.asarray(a)


@dataclasses.dataclass
class RenderedSequence:
    calib: CameraCalib
    gt_knots: np.ndarray
    gt_t0: float
    gt_dt: float
    # (stamp, img0 uint8 (H, W), img1 uint8)
    frames: List[tuple]
    # (stamp, gyro (3,), accel (3,))
    imu: List[tuple]

    def gt_pose(self, t):
        from ..variables import nplie
        return nplie.eval_se3(self.gt_knots, t, self.gt_t0, self.gt_dt)


def render_sequence(cfg: RenderConfig, calib: CameraCalib,
                    gt_knots: Optional[np.ndarray] = None) -> RenderedSequence:
    """Render a stereo PNG sequence + ideal IMU along a smooth GT spline."""
    from .synthetic import smooth_trajectory_knots

    W, H = cfg.image_size
    if gt_knots is None:
        n_knots = int(np.ceil(cfg.duration / cfg.knot_dt)) + 4
        gt_knots = np.asarray(smooth_trajectory_knots(
            cfg.seed, n_knots, jnp.float64,
            rot_scale=cfg.rot_scale, trans_scale=cfg.trans_scale))
    kdt = cfg.knot_dt
    lo, hi = bspline.valid_range(0.0, kdt, gt_knots.shape[0])
    duration = min(cfg.duration, hi - 1e-3)
    cam_stamps = np.arange(lo + 1e-3, duration, 1.0 / cfg.cam_rate)
    imu_stamps = np.arange(lo + 1e-3, duration, 1.0 / cfg.imu_rate)

    rng = np.random.default_rng(cfg.seed)
    tex = jnp.asarray(rng.uniform(0.0, 1.0,
                                  (cfg.texture_size, cfg.texture_size)),
                      jnp.float32)
    center = jnp.asarray(cfg.box_center, jnp.float32)
    half = jnp.asarray(cfg.box_half, jnp.float32)

    knots_j = jnp.asarray(gt_knots)
    T_wb_all = np.asarray(bspline.eval_se3(
        knots_j, jnp.asarray(cam_stamps, jnp.float64), 0.0, kdt))

    from ..variables import nplie
    T_bs = np.asarray(calib.T_bs, np.float64)
    intr = jnp.asarray(calib.intrinsics, jnp.float32)
    dist = jnp.asarray(calib.distortion, jnp.float32)

    frames = []
    for ti, t in enumerate(cam_stamps):
        imgs = []
        for c in range(2):
            T_wc = nplie.se3_compose(T_wb_all[ti], T_bs[c])
            img = _render_one(jnp.asarray(T_wc, jnp.float32), intr[c],
                              dist[c], tex, center, half, W, H)
            imgs.append(np.asarray(
                np.clip(np.asarray(img) * 255.0, 0, 255), np.uint8))
        frames.append((float(t), imgs[0], imgs[1]))

    gyro, accel = ideal_imu(gt_knots, kdt, imu_stamps)
    imu = [(float(t), gyro[i], accel[i]) for i, t in enumerate(imu_stamps)]
    return RenderedSequence(calib=calib, gt_knots=gt_knots, gt_t0=0.0,
                            gt_dt=kdt, frames=frames, imu=imu)


def write_euroc_dataset(root: str, seq: RenderedSequence,
                        stamp_offset: float = 0.0) -> str:
    """Write a EuRoC-ASL-layout dataset (mav0/cam{0,1}/data/*.png + data.csv,
    mav0/imu0/data.csv) so the native C++ stream and the Python reader both
    consume it.  Returns the dataset root."""
    from PIL import Image
    mav = os.path.join(root, "mav0")
    for c in range(2):
        os.makedirs(os.path.join(mav, f"cam{c}", "data"), exist_ok=True)
    os.makedirs(os.path.join(mav, "imu0"), exist_ok=True)

    idx = [open(os.path.join(mav, f"cam{c}", "data.csv"), "w")
           for c in range(2)]
    for f in idx:
        f.write("#timestamp [ns],filename\n")
    for (t, img0, img1) in seq.frames:
        ns = int(round((t + stamp_offset) * 1e9))
        name = f"{ns}.png"
        for c, img in ((0, img0), (1, img1)):
            Image.fromarray(img, "L").save(
                os.path.join(mav, f"cam{c}", "data", name))
            idx[c].write(f"{ns},{name}\n")
    for f in idx:
        f.close()

    with open(os.path.join(mav, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
                "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
                "a_RS_S_z [m s^-2]\n")
        for (t, g, a) in seq.imu:
            ns = int(round((t + stamp_offset) * 1e9))
            f.write(f"{ns},{g[0]},{g[1]},{g[2]},{a[0]},{a[1]},{a[2]}\n")
    return root
