"""Synthetic stereo-inertial sequence generator.

Simulates what the reference's frontends produce — stereo feature tracks
(``VisualFrontend``/KLT output: track ids + pixels per camera,
``/root/reference/internal/hyper/system/frontends/visual/klt.cpp``) and raw
IMU samples (``InertialFrontend``, ``direct.cpp``) — from a known
ground-truth continuous-time trajectory.  Used for end-to-end regression
tests and benchmarks: run the full estimator on simulated measurements and
score ATE against the generating trajectory (the role the reference's
evaluation harness + EuRoC rosbags play, SURVEY.md §5.5).

The ground-truth trajectory itself is a cumulative SE3 B-spline, either
procedurally generated (smooth random walk) or fitted to a real ground-truth
file (e.g. EuRoC TUM rows under
``/root/reference/resources/datasets/euroc/sequences/``).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import camera as cam_model
from ..solver.problem import CameraCalib, ImuCalib
from ..state import bspline
from ..variables import s2, se3, so3


@dataclasses.dataclass
class SyntheticConfig:
    duration: float = 10.0
    knot_dt: float = 0.5          # ground-truth spline knot separation
    cam_rate: float = 10.0        # frames/s
    imu_rate: float = 200.0       # samples/s
    num_landmarks: int = 300
    image_size: Tuple[int, int] = (752, 480)
    pixel_noise: float = 0.5      # px std
    gyro_noise: float = 1e-3      # rad/s std per sample
    accel_noise: float = 1e-2     # m/s^2 std
    gyro_bias: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    accel_bias: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    max_tracks_per_frame: int = 150   # reference settings.yaml:118
    seed: int = 0
    # Vertical rolling-shutter line delay [s/row]; 0 = global shutter.
    # When set, each pixel is rendered from the pose at
    # ``t_frame + shutter_delta * row`` (fixed-point in the projection),
    # exercising the estimator's correctShutterStamps analogue.
    shutter_delta: float = 0.0


def euroc_stereo_calib(dtype=jnp.float32) -> CameraCalib:
    """EuRoC-like stereo rig: 11 cm baseline, 752x480, real intrinsics
    (reference mock camera, ``tests/include/tests/sensors/camera.hpp:22-35``,
    and ``settings.yaml`` calibration)."""
    intr = jnp.asarray([[367.215, 248.375, 458.654, 457.296],
                        [379.999, 255.238, 457.587, 456.134]], dtype)
    dist = jnp.asarray([[-0.28340811, 0.07395907, 1.9359e-4, 1.76187114e-5],
                        [-0.28368365, 0.07451284, -1.0847e-4, -3.55590700e-5]],
                       dtype)
    T_b_c0 = se3.identity(dtype)
    T_b_c1 = se3.from_parts(so3.identity(dtype),
                            jnp.asarray([0.110074, 0.0, 0.0], dtype))
    return CameraCalib(T_bs=jnp.stack([T_b_c0, T_b_c1]), intrinsics=intr,
                       distortion=dist)


def smooth_trajectory_knots(key, num_knots: int, dtype=jnp.float64,
                            rot_scale=0.06, trans_scale=0.25):
    """Smooth random-walk SE3 knots (forward-dominant motion).  NumPy host
    math (eager device ops are slow on the axon platform)."""
    from ..variables import nplie
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1)) \
        if hasattr(key, "dtype") else int(key)
    rng = np.random.default_rng(seed)
    steps = rng.normal(0.0, 1.0, (num_knots, 6)) * np.asarray(
        [rot_scale] * 3 + [trans_scale] * 3)
    steps[:, 5] += 0.4 * trans_scale  # drift forward in z
    out = [np.array([1.0, 0, 0, 0, 0, 0, 0])]
    for i in range(1, num_knots):
        out.append(nplie.se3_compose(out[-1], nplie.se3_exp(steps[i])))
    return jnp.asarray(np.stack(out), dtype)


def knots_from_tum(path: str, knot_dt: float, dtype=jnp.float64,
                   max_duration: Optional[float] = None):
    """Fit ground-truth spline knots to a TUM trajectory file.

    Each knot is the AVERAGE of the ground-truth samples in its
    ``+-knot_dt/2`` bucket (quaternions hemisphere-aligned then
    mean-normalized — exact enough for the sub-degree spreads of mocap).
    Using raw nearest samples as knots instead turns mm-level mocap
    position noise into ~0.4 m/s^2 acceleration jitter of the fitted
    spline ((second difference)/knot_dt^2) — a 15-sigma systematic misfit
    for any honestly-weighted synthetic IMU derived from it (measured:
    it wrecked the stereo-inertial EuRoC suite).

    Returns (knots (N, 7), t0, knot_dt) with stamps re-based to 0."""
    from ..evaluation.metrics import load_tum
    stamps, pos, quat = load_tum(path)
    stamps = stamps - stamps[0]
    if max_duration is not None:
        keep = stamps <= max_duration
        stamps, pos, quat = stamps[keep], pos[keep], quat[keep]
    tk = np.arange(0.0, stamps[-1], knot_dt)
    bucket = np.clip(np.round(stamps / knot_dt).astype(np.int64), 0,
                     len(tk) - 1)
    knots = np.zeros((len(tk), 7))
    counts = np.bincount(bucket, minlength=len(tk))
    for c in range(3):
        knots[:, 4 + c] = np.bincount(bucket, weights=pos[:, c],
                                      minlength=len(tk))
    # hemisphere-align quaternions to the first sample before averaging
    qa = quat * np.where((quat @ quat[0])[:, None] < 0, -1.0, 1.0)
    for c in range(4):
        knots[:, c] = np.bincount(bucket, weights=qa[:, c],
                                  minlength=len(tk))
    # empty buckets (gaps): fall back to nearest sample
    empty = counts == 0
    if empty.any():
        idx = np.clip(np.searchsorted(stamps, tk[empty]), 0,
                      len(stamps) - 1)
        knots[empty, :4] = qa[idx]
        knots[empty, 4:] = pos[idx]
        counts = np.where(empty, 1, counts)
    knots /= counts[:, None]
    knots[:, :4] /= np.linalg.norm(knots[:, :4], axis=1, keepdims=True)
    return jnp.asarray(knots, dtype), 0.0, knot_dt


@dataclasses.dataclass
class SyntheticSequence:
    """Generated measurement streams, time-ordered."""
    calib: CameraCalib
    imu_calib: ImuCalib
    gt_knots: np.ndarray      # (N, 7)
    gt_t0: float
    gt_dt: float
    landmarks: np.ndarray     # (L, 3) world points
    # visual frames: list of (stamp, cam_indices, track_ids, pixels)
    frames: List[tuple]
    # imu samples: list of (stamp, gyro (3,), accel (3,))
    imu: List[tuple]

    def gt_pose(self, t):
        from ..variables import nplie
        return nplie.eval_se3(self.gt_knots, t, self.gt_t0, self.gt_dt)


@jax.jit
def _gen_landmarks(knots, t_seed, offsets, kdt):
    """Landmarks anchored along the trajectory."""
    anchors = bspline.eval_se3(knots, t_seed, 0.0, kdt)
    return se3.act(anchors, offsets)


@jax.jit
def _gen_frames_block(knots, lms, stamps, T_bs, intr, dist, kdt):
    """(uv, depth) for one block of frame stamps x cameras x landmarks."""
    T_wb = bspline.eval_se3(knots, stamps, 0.0, kdt)        # (T, 7)
    T_ws = se3.compose(T_wb[:, None, :], T_bs[None, :, :])  # (T, C, 7)
    p_s = se3.act(se3.inverse(T_ws)[:, :, None, :],
                  lms[None, None, :, :])                    # (T, C, L, 3)
    uv = cam_model.project(p_s, intr[None, :, None, :],
                           dist[None, :, None, :])          # (T, C, L, 2)
    return uv, p_s[..., 2]


@jax.jit
def _gen_frames_rs_block(knots, lms, stamps, T_bs, intr, dist, kdt, delta):
    """Rolling-shutter frames: pixel row determines its own exposure time,
    ``t = t_frame + delta * row`` — solved by fixed-point iteration on the
    projection (2 rounds reach sub-1e-3-px for realistic motion)."""
    uv, z = _gen_frames_block(knots, lms, stamps, T_bs, intr, dist, kdt)
    T, C, L = uv.shape[:3]
    for _ in range(2):
        t_obs = stamps[:, None, None] + delta * uv[..., 1]       # (T, C, L)
        T_wb = bspline.eval_se3(knots, t_obs.reshape(-1), 0.0,
                                kdt).reshape(T, C, L, 7)
        T_ws = se3.compose(T_wb, T_bs[None, :, None, :])
        p_s = se3.act(se3.inverse(T_ws), lms[None, None, :, :])
        uv = cam_model.project(p_s, intr[None, :, None, :],
                               dist[None, :, None, :])
        z = p_s[..., 2]
    return uv, z


@jax.jit
def _gen_imu_block(knots, imu_t, kdt):
    """Ideal (gyro, accel) from spline derivatives for one stamp block."""
    s, u = bspline.support_index(imu_t, 0.0, kdt, knots.shape[0])
    ctrl = bspline.gather_support(knots, s)
    d = bspline.se3_with_derivatives(ctrl, u, kdt)
    gvec = jnp.asarray([0.0, 0.0, -s2.GRAVITY_NORM], knots.dtype)
    accel_ideal = so3.rotate(so3.conj(d["pose"][:, :4]), d["a_w"] - gvec)
    return d["omega_b"], accel_ideal


def _chunked(fn, stamps, chunk, *extra):
    """Run a block-jitted fn over stamps in fixed-size chunks (pads the
    last block so every call shares one compiled shape) and concatenate on
    the host.  Long sequences (minutes) would otherwise allocate
    T x C x L-sized device arrays in the tens of GB."""
    outs = None
    n = len(stamps)
    for i in range(0, n, chunk):
        block = stamps[i:i + chunk]
        pad = chunk - len(block)
        if pad:
            block = np.concatenate([block, np.full(pad, block[-1])])
        res = fn(jnp.asarray(block), *extra)
        res = [np.asarray(r)[:chunk - pad if pad else chunk] for r in res]
        if outs is None:
            outs = [[r] for r in res]
        else:
            for acc, r in zip(outs, res):
                acc.append(r)
    return [np.concatenate(acc, 0) for acc in outs]


def generate(cfg: SyntheticConfig, calib: Optional[CameraCalib] = None,
             gt_knots: Optional[jnp.ndarray] = None,
             gt_dt: Optional[float] = None,
             frame_chunk: int = 256,
             imu_chunk: int = 8192) -> SyntheticSequence:
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    dtype = jnp.float64
    if calib is None:
        calib = euroc_stereo_calib(dtype)
    else:
        calib = jax.tree.map(lambda x: jnp.asarray(x, dtype), calib)
    imu_calib = ImuCalib.default(dtype)

    kdt = gt_dt if gt_dt is not None else cfg.knot_dt
    if gt_knots is None:
        n_knots = int(np.ceil(cfg.duration / kdt)) + 4
        gt_knots = smooth_trajectory_knots(key, n_knots, dtype)
    n_knots = gt_knots.shape[0]
    lo, hi = bspline.valid_range(0.0, kdt, n_knots)
    duration = min(cfg.duration, hi - 1e-3)

    W, H = cfg.image_size
    cam_stamps = np.arange(lo + 1e-3, duration, 1.0 / cfg.cam_rate)
    imu_stamps = np.arange(lo + 1e-3, duration, 1.0 / cfg.imu_rate)
    t_seed = rng.uniform(lo, duration, cfg.num_landmarks)
    offsets = rng.normal(0.0, 1.0, (cfg.num_landmarks, 3)) * np.array(
        [4.0, 4.0, 4.0]) + np.array([0.0, 0.0, 8.0])

    # Device math in block-jitted calls (module-level: one compile per
    # shape for the whole process); eager per-op dispatch is prohibitively
    # slow on this host.
    kdt_j = jnp.asarray(kdt, dtype)
    lms_j = _gen_landmarks(gt_knots, jnp.asarray(t_seed, dtype),
                           jnp.asarray(offsets, dtype), kdt_j)
    landmarks = np.asarray(lms_j)
    if cfg.shutter_delta > 0.0:
        delta_j = jnp.asarray(cfg.shutter_delta, dtype)
        gen_block = lambda st, *a: _gen_frames_rs_block(
            gt_knots, lms_j, st, calib.T_bs, calib.intrinsics,
            calib.distortion, kdt_j, delta_j)
    else:
        gen_block = lambda st, *a: _gen_frames_block(
            gt_knots, lms_j, st, calib.T_bs, calib.intrinsics,
            calib.distortion, kdt_j)
    uv, z = _chunked(
        gen_block, cam_stamps, min(frame_chunk, max(len(cam_stamps), 1)))
    gyro_ideal, accel_ideal = _chunked(
        lambda st, *a: _gen_imu_block(gt_knots, st, kdt_j),
        imu_stamps, min(imu_chunk, max(len(imu_stamps), 1))) \
        if len(imu_stamps) else (np.zeros((0, 3)), np.zeros((0, 3)))
    vis = ((z > 0.3) & (uv[..., 0] >= 0) & (uv[..., 0] < W)
           & (uv[..., 1] >= 0) & (uv[..., 1] < H))   # (T, C, L)
    stereo_vis = vis.all(axis=1)                     # (T, L)

    # PERSISTENT track selection, like the reference's KLT frontend
    # (klt.cpp:264-330): a selected feature is tracked until it leaves the
    # view; new features top the set back up to max_tracks_per_frame.
    # (Resampling a random visible subset per frame looks similar per frame
    # but makes the set of track ids alive inside the sliding window ~the
    # whole visible population — measured: landmark-slot exhaustion and
    # divergence on full-length EuRoC runs.)
    frames = []
    L = landmarks.shape[0]
    active: np.ndarray = np.zeros(0, int)
    for ti, t in enumerate(cam_stamps):
        vis_ids = np.nonzero(stereo_vis[ti])[0]
        vis_set = set(vis_ids.tolist())
        active = np.asarray([i for i in active if i in vis_set], int)
        if len(active) < cfg.max_tracks_per_frame:
            fresh = np.setdiff1d(vis_ids, active, assume_unique=False)
            need = cfg.max_tracks_per_frame - len(active)
            if len(fresh) > need:
                fresh = rng.choice(fresh, need, replace=False)
            active = np.concatenate([active, np.sort(fresh)])
        ids = np.sort(active)
        n = len(ids)
        cam_idx = np.concatenate([np.zeros(n, int), np.ones(n, int)])
        tids = np.concatenate([ids, ids])
        px = np.concatenate([uv[ti, 0, ids], uv[ti, 1, ids]])
        px = px + rng.normal(0.0, cfg.pixel_noise, px.shape)
        frames.append((float(t), cam_idx, tids, px))

    # IMU samples: ideal values from the jitted device pass + bias + noise.
    gyro = np.asarray(gyro_ideal)
    accel = np.asarray(accel_ideal)
    gyro = gyro + np.asarray(cfg.gyro_bias) + rng.normal(
        0.0, cfg.gyro_noise, gyro.shape)
    accel = accel + np.asarray(cfg.accel_bias) + rng.normal(
        0.0, cfg.accel_noise, accel.shape)
    imu = [(float(t), gyro[i], accel[i]) for i, t in enumerate(imu_stamps)]

    return SyntheticSequence(
        calib=calib, imu_calib=imu_calib, gt_knots=np.asarray(gt_knots),
        gt_t0=0.0, gt_dt=kdt, landmarks=landmarks, frames=frames, imu=imu)


def conj_np(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def quat_rot_np(q):
    from ..evaluation.metrics import quat_to_matrix_np
    return quat_to_matrix_np(q)
