"""Batched Levenberg-Marquardt with Schur-complement landmark elimination.

This module replaces the reference's entire Ceres backend
(``/root/reference/internal/hyper/optimizers/ceres/optimizer.cpp`` +
``costs/exteroceptive.cpp``; SURVEY.md §3.4) with a TPU-native design:

- Every residual of a type is linearized by one **vmapped forward-mode
  autodiff** evaluation (no virtual evaluators, no per-residual layouts).
- Per-factor Jacobian blocks are scattered into **dense rows** of the reduced
  tangent space, so all normal-equation products are plain matmuls on the MXU.
- Landmarks are eliminated with a **batched 3x3 Schur complement**
  (block-diagonal inverses, one einsum), leaving a small dense reduced system
  solved by Cholesky on-device.
- Robustification (Huber / scaled losses, same constants as the reference)
  enters via IRLS sqrt-weights.
- The LM loop runs a fixed ``max_iterations`` (reference: 5,
  ``ceres/optimizer.cpp:40``) with accept/reject trust-region damping under
  ``lax``-friendly control flow — fully jittable, static shapes throughout.

Frozen parameters (old knots, inactive landmark slots, fixed gravity) are
handled by zeroing their Jacobian columns and placing 1s on the corresponding
normal-equation diagonal — the masked-tensor equivalent of the reference's
``SetParameterBlockConstant`` (``ceres/optimizer.cpp:322-328``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors import losses
from ..factors import preintegration as preint
from ..factors import residuals as res
from ..state import bspline
from ..variables import s2, se3, so3
from .problem import (CameraCalib, Factors, ImuCalib, Layout, Masks, Params,
                      SolverConfig, make_layout)

__all__ = ["linearize", "solve_normal_equations", "apply_delta",
           "compute_cost", "optimize", "batch_optimize", "LinearSystem",
           "SolveStats"]


class LinearSystem(NamedTuple):
    """Stacked weighted rows of the window's linearized problem."""
    J: jnp.ndarray        # (R, D) dense reduced-parameter Jacobian rows
    r: jnp.ndarray        # (R,) weighted residuals
    J_lm: jnp.ndarray     # (R, 3) landmark Jacobian rows
    lm_idx: jnp.ndarray   # (R,) landmark slot per row (0 for non-landmark rows,
                          #      whose J_lm rows are zero)


class SolveStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    lambda_final: jnp.ndarray
    accepted: jnp.ndarray  # (iters,) bool


def _col_mask(masks: Masks, lay: Layout, dtype):
    # Per-knot mask x per-part (rotation/translation) constancy — the
    # reference's SE3 product-manifold constancy flags (backend.cpp:52-55,
    # ceres/manifolds/variables/se3.cpp:19-24).
    km = masks.knots.astype(dtype)
    rot = 1.0 if masks.knots_rot is None else masks.knots_rot
    trans = 1.0 if masks.knots_trans is None else masks.knots_trans
    part = jnp.concatenate([jnp.full((3,), rot, dtype),
                            jnp.full((3,), trans, dtype)])
    parts = [
        (km[:, None] * part[None, :]).reshape(-1),
        jnp.repeat(masks.bias.astype(dtype), 3),
        jnp.repeat(masks.bias.astype(dtype), 3),
        jnp.full((2,), masks.gravity, dtype),
    ]
    # Self-calibration columns (present iff the mask group exists) — the
    # reference's per-sensor-parameter constancy flags
    # (ceres/optimizer.cpp:56-69, manifolds/sensors/*).
    if lay.cext >= 0:
        erot = 1.0 if masks.cam_ext_rot is None else masks.cam_ext_rot
        etrans = 1.0 if masks.cam_ext_trans is None else masks.cam_ext_trans
        epart = jnp.concatenate([jnp.full((3,), erot, dtype),
                                 jnp.full((3,), etrans, dtype)])
        parts.append(
            (masks.cam_ext.astype(dtype)[:, None] * epart[None, :])
            .reshape(-1))
    if lay.cintr >= 0:
        parts.append(jnp.repeat(masks.cam_intr.astype(dtype), 4))
    if lay.cdist >= 0:
        parts.append(jnp.repeat(masks.cam_dist.astype(dtype), 4))
    if lay.iext >= 0:
        erot = 1.0 if masks.cam_ext_rot is None else masks.cam_ext_rot
        etrans = 1.0 if masks.cam_ext_trans is None else masks.cam_ext_trans
        ipart = jnp.concatenate([jnp.full((3,), erot, dtype),
                                 jnp.full((3,), etrans, dtype)])
        parts.append(masks.imu_ext * ipart)
    return jnp.concatenate(parts)


def _dense_row(J_block, cols, D):
    """J_block (m, W), cols (W,) int -> (m, D) dense rows.

    NOTE: lowers to a dynamic scatter — slow on TPU when vmapped over many
    factors.  The per-factor hot paths use :func:`_proj` instead (gather of
    a block-diagonal projection + one matmul, which rides the MXU); this
    helper remains for tiny row counts (calib-prior rows)."""
    m = J_block.shape[0]
    return jnp.zeros((m, D), J_block.dtype).at[:, cols].set(J_block)


@functools.lru_cache(maxsize=None)
def _projection_np(num_blocks: int, width: int, stride: int, offset: int,
                   D: int):
    """(num_blocks, width, D) selector: P[b] places `width` local columns at
    global columns offset + stride*b .. +width."""
    import numpy as np
    P = np.zeros((num_blocks, width, D), np.float32)
    for b in range(num_blocks):
        c0 = offset + stride * b
        P[b, :, c0:c0 + width] = np.eye(width)
    return P


def _proj(num_blocks, width, stride, offset, D, dtype):
    """Projection tensor as a jnp constant (trace-time; folded into the
    executable).  Replaces per-factor dynamic scatters with
    ``J_block @ P[idx]`` — a gather plus an MXU matmul."""
    return jnp.asarray(_projection_np(num_blocks, width, stride, offset, D),
                       dtype)


def _linearize_bearing(params: Params, calib: CameraCalib, f,
                       cfg: SolverConfig, lay: Layout):
    D = lay.D
    dtype = params.knots.dtype
    order = cfg.order
    Pk = _proj(params.num_knots - order + 1, order * 6, 6, 0, D, dtype)
    Pce = _proj(lay.C, 6, 6, lay.cext, D, dtype) if lay.cext >= 0 else None

    def one(s, u, cam_i, lm_i, meas, active):
        ctrl = bspline.gather_support(params.knots, s, order)
        T_bs = calib.T_bs[cam_i]
        lm = params.landmarks[lm_i]

        def g(dk, dl, dce):
            c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
            Tb = res.retract_pose_knots(T_bs, dce)
            return res.bearing_residual(c, u, Tb, lm + dl, meas)

        zk = jnp.zeros(order * 6, dtype)
        zl = jnp.zeros(3, dtype)
        zc = jnp.zeros(6, dtype)
        r_raw = g(zk, zl, zc)
        args = (0, 1, 2) if lay.cext >= 0 else (0, 1)
        jac = jax.jacfwd if cfg.use_jacfwd else jax.jacrev
        Js = jac(g, argnums=args)(zk, zl, zc)
        Jk, Jl = Js[0], Js[1]
        # Robust weight in RAW residual units (the reference's Huber delta is
        # on the metric distance itself, ceres/optimizer.cpp:189-210); the
        # information weight scales residual and Jacobian afterwards.
        w = losses.huber_weight(jnp.sum(r_raw * r_raw), cfg.bearing_huber)
        sw = jnp.sqrt(w) * cfg.bearing_sqrt_info * active
        Jp = Jk @ Pk[s]
        if lay.cext >= 0:
            Jp = Jp + Js[2] @ Pce[cam_i]
        return r_raw * sw, Jp * sw, Jl * sw, lm_i

    r, Jp, Jl, lm_i = jax.vmap(one)(f.s, f.u, f.cam, f.lm, f.meas, f.active)
    m = r.shape[-1]
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1), J_lm=Jl.reshape(-1, 3),
        lm_idx=jnp.repeat(lm_i, m))


def _frame_poses(params: Params, calib: CameraCalib, frames, cfg: SolverConfig,
                 with_cext: bool, with_jac: bool = True):
    """Per-frame sensor pose T_ws = T_wb(t) T_bs and (optionally) its
    Jacobian w.r.t. the 24 support-knot tangents (+ 6 extrinsic tangents).

    The Jacobian is taken through the right-tangent chart at the evaluated
    pose, ``phi(dk) = [log(q0^-1 q(dk)), t(dk) - t0]`` — exact at dk = 0, so
    chaining per-factor Jacobians through it reproduces the per-factor
    autodiff result to roundoff while evaluating the expensive spline chain
    once per FRAME instead of once per OBSERVATION."""
    order = cfg.order
    dtype = params.knots.dtype

    def one(s, u, cam_i):
        ctrl = bspline.gather_support(params.knots, s, order)
        T_bs = calib.T_bs[cam_i]

        def pose_fn(dk, dce):
            c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
            Tb = res.retract_pose_knots(T_bs, dce)
            return se3.compose(bspline.interp_se3(c, u, order), Tb)

        zk = jnp.zeros(order * 6, dtype)
        zc = jnp.zeros(6, dtype)
        T0 = pose_fn(zk, zc)
        if not with_jac:
            z = jnp.zeros((6, 1), dtype)
            return T0, z, z

        def chart(dk, dce):
            T = pose_fn(dk, dce)
            dth = so3.log(so3.mul(so3.conj(T0[:4]), T[:4]))
            return jnp.concatenate([dth, T[4:] - T0[4:]])

        if with_cext:
            Jk, Jce = jax.jacfwd(chart, argnums=(0, 1))(zk, zc)
        else:
            Jk = jax.jacfwd(chart, argnums=0)(zk, zc)
            Jce = jnp.zeros((6, 6), dtype)
        return T0, Jk, Jce

    return jax.vmap(one)(frames.s, frames.u, frames.cam)


def _linearize_bearing_frames(params: Params, calib: CameraCalib, f, frames,
                              cfg: SolverConfig, lay: Layout):
    """Frame-shared bearing linearization (fast path; see FrameTable).

    Identical math to :func:`_linearize_bearing` — r and J agree to
    roundoff (parity-tested) — at ~10x fewer device ops: one spline-chain
    evaluation + 30-tangent jacfwd per FRAME, then per OBSERVATION only a
    tiny analytic/jacrev chain and one (2, 6) @ (6, 24) matmul."""
    D = lay.D
    dtype = params.knots.dtype
    order = cfg.order
    T0, J6k, J6c = _frame_poses(params, calib, frames, cfg, lay.cext >= 0)
    Rm = so3.to_matrix(T0[..., :4])          # (NF, 3, 3)
    t0 = T0[..., 4:]
    # Per-frame dense rows of the pose-tangent Jacobian: (NF, 6, D).  Built
    # once per FRAME (gather + MXU matmul), so the per-factor work below is
    # one (2, 6) @ (6, D) matmul — no dynamic scatters anywhere.
    Pk = _proj(params.num_knots - order + 1, order * 6, 6, 0, D, dtype)
    J6D = jnp.einsum("fij,fjd->fid", J6k, Pk[frames.s])
    if lay.cext >= 0:
        Pce = _proj(lay.C, 6, 6, lay.cext, D, dtype)
        J6D = J6D + jnp.einsum("fij,fjd->fid", J6c, Pce[frames.cam])

    def one(fi, lm_i, meas, active):
        R = Rm[fi]
        p0 = R.T @ (params.landmarks[lm_i] - t0[fi])

        def g(dth, dtr, dl):
            # right rotation perturbation: p = R(q0 exp(dth))^T (lm - t)
            p = p0 - jnp.cross(dth, p0) + R.T @ (dl - dtr)
            pred = p / jnp.linalg.norm(p)
            return s2.boxminus(pred, meas)

        z3 = jnp.zeros(3, dtype)
        r_raw = g(z3, z3, z3)
        Jth, Jtr, Jl = jax.jacrev(g, argnums=(0, 1, 2))(z3, z3, z3)
        Jpose = jnp.concatenate([Jth, Jtr], axis=-1)      # (2, 6)
        w = losses.huber_weight(jnp.sum(r_raw * r_raw), cfg.bearing_huber)
        sw = jnp.sqrt(w) * cfg.bearing_sqrt_info * active * frames.active[fi]
        Jp = Jpose @ J6D[fi]                               # (2, D)
        return r_raw * sw, Jp * sw, Jl * sw, lm_i

    r, Jp, Jl, lm_i = jax.vmap(one)(f.frame, f.lm, f.meas, f.active)
    m = r.shape[-1]
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1), J_lm=Jl.reshape(-1, 3),
        lm_idx=jnp.repeat(lm_i, m))


def _bearing_cost_frames(params: Params, calib: CameraCalib, f, frames,
                         cfg: SolverConfig):
    """Frame-shared robustified bearing cost (mirrors the fast linearizer)."""
    T0, _, _ = _frame_poses(params, calib, frames, cfg, False, with_jac=False)
    Rm = so3.to_matrix(T0[..., :4])
    t0 = T0[..., 4:]

    def one(fi, lm_i, meas, active):
        p = Rm[fi].T @ (params.landmarks[lm_i] - t0[fi])
        pred = p / jnp.linalg.norm(p)
        r = s2.boxminus(pred, meas)
        return jnp.sum(r * r), active * frames.active[fi]

    s2n, act = jax.vmap(one)(f.frame, f.lm, f.meas, f.active)
    return cfg.bearing_sqrt_info ** 2 * jnp.sum(
        _rho_huber(s2n, cfg.bearing_huber) * act)


def _linearize_pixel(params: Params, calib: CameraCalib, f,
                     cfg: SolverConfig, lay: Layout):
    D = lay.D
    dtype = params.knots.dtype
    order = cfg.order
    Pk = _proj(params.num_knots - order + 1, order * 6, 6, 0, D, dtype)
    Pce = _proj(lay.C, 6, 6, lay.cext, D, dtype) if lay.cext >= 0 else None
    Pci = _proj(lay.C, 4, 4, lay.cintr, D, dtype) if lay.cintr >= 0 else None
    Pcd = _proj(lay.C, 4, 4, lay.cdist, D, dtype) if lay.cdist >= 0 else None

    def one(s, u, cam_i, lm_i, meas, active):
        ctrl = bspline.gather_support(params.knots, s, order)
        T_bs = calib.T_bs[cam_i]
        intr = calib.intrinsics[cam_i]
        dist = calib.distortion[cam_i]
        lm = params.landmarks[lm_i]

        def g(dk, dl, dce, dintr, ddist):
            c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
            Tb = res.retract_pose_knots(T_bs, dce)
            return res.pixel_residual(c, u, Tb, intr + dintr, dist + ddist,
                                      lm + dl, meas)

        zk = jnp.zeros(order * 6, dtype)
        zl = jnp.zeros(3, dtype)
        zc = jnp.zeros(6, dtype)
        z4 = jnp.zeros(4, dtype)
        r_raw = g(zk, zl, zc, z4, z4)
        args = [0, 1]
        if lay.cext >= 0:
            args.append(2)
        if lay.cintr >= 0:
            args.append(3)
        if lay.cdist >= 0:
            args.append(4)
        jac = jax.jacfwd if cfg.use_jacfwd else jax.jacrev
        Js = jac(g, argnums=tuple(args))(zk, zl, zc, z4, z4)
        by_arg = dict(zip(args, Js))
        Jk, Jl = by_arg[0], by_arg[1]
        w = losses.huber_weight(jnp.sum(r_raw * r_raw), cfg.pixel_huber)
        sw = jnp.sqrt(w) * cfg.pixel_sqrt_info * active
        Jp = Jk @ Pk[s]
        if lay.cext >= 0:
            Jp = Jp + by_arg[2] @ Pce[cam_i]
        if lay.cintr >= 0:
            Jp = Jp + by_arg[3] @ Pci[cam_i]
        if lay.cdist >= 0:
            Jp = Jp + by_arg[4] @ Pcd[cam_i]
        return r_raw * sw, Jp * sw, Jl * sw, lm_i

    r, Jp, Jl, lm_i = jax.vmap(one)(f.s, f.u, f.cam, f.lm, f.meas, f.active)
    m = r.shape[-1]
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1), J_lm=Jl.reshape(-1, 3),
        lm_idx=jnp.repeat(lm_i, m))


def _linearize_prior(params: Params, f, cfg: SolverConfig, lay: Layout):
    D = lay.D
    dtype = params.knots.dtype
    order = cfg.order
    T_bs_id = jnp.zeros(7, dtype).at[0].set(1.0)
    Pk = _proj(params.num_knots - order + 1, order * 6, 6, 0, D, dtype)

    def one(s, u, meas, active):
        ctrl = bspline.gather_support(params.knots, s, order)

        def g(dk):
            c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
            return res.pose_prior_residual(c, u, T_bs_id, meas)

        zk = jnp.zeros(order * 6, dtype)
        r = g(zk) * cfg.prior_sqrt_info
        Jk = jax.jacfwd(g)(zk)
        sw = active  # no robust loss on priors (reference: no loss)
        Jp = (Jk * cfg.prior_sqrt_info) @ Pk[s]
        return r * sw, Jp * sw

    r, Jp = jax.vmap(one)(f.s, f.u, f.meas, f.active)
    m = r.shape[-1]
    R = r.size
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1),
        J_lm=jnp.zeros((R, 3), dtype), lm_idx=jnp.zeros(R, jnp.int32))


def _linearize_inertial(params: Params, imu: ImuCalib, f, cfg: SolverConfig,
                        lay: Layout, dt, bias_dt):
    D, off_bg, off_ba, off_g = lay.D, lay.bg, lay.ba, lay.grav
    dtype = params.knots.dtype
    order, border = cfg.order, cfg.bias_order
    # Per-axis sqrt-information: [gyro x3, accel x3].
    sinfo = jnp.concatenate([
        jnp.full((3,), cfg.gyro_sqrt_info, dtype),
        jnp.full((3,), cfg.accel_sqrt_info, dtype)])
    sq_scale = jnp.sqrt(jnp.asarray(cfg.inertial_scale, dtype))
    Pk = _proj(params.num_knots - order + 1, order * 6, 6, 0, D, dtype)
    Sb = params.num_bias_knots - border + 1
    Pbg = _proj(Sb, border * 3, 3, off_bg, D, dtype)
    Pba = _proj(Sb, border * 3, 3, off_ba, D, dtype)

    def one(s, u, bs, bu, meas, active):
        ctrl = bspline.gather_support(params.knots, s, order)
        bg_ctrl = bspline.gather_support(params.bias_g, bs, border)
        ba_ctrl = bspline.gather_support(params.bias_a, bs, border)

        def g(dk, dbg, dba, dgr, die):
            c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
            bg = bspline.interp_euclidean(
                bg_ctrl + dbg.reshape(border, 3), bu, border)
            ba = bspline.interp_euclidean(
                ba_ctrl + dba.reshape(border, 3), bu, border)
            grav = s2.retract(params.gravity, dgr, norm=s2.GRAVITY_NORM)
            T_bs = res.retract_pose_knots(imu.T_bs, die)
            return res.inertial_residual(
                c, u, dt, bg, ba, T_bs, grav,
                imu.gyro_intrinsics, imu.accel_intrinsics,
                imu.g_sensitivity, imu.lever_arm, meas) * sinfo

        zk = jnp.zeros(order * 6, dtype)
        zb = jnp.zeros(border * 3, dtype)
        zg = jnp.zeros(2, dtype)
        ze = jnp.zeros(6, dtype)
        r = g(zk, zb, zb, zg, ze)
        args = (0, 1, 2, 3, 4) if lay.iext >= 0 else (0, 1, 2, 3)
        jac = jax.jacfwd if cfg.use_jacfwd else jax.jacrev
        Js = jac(g, argnums=args)(zk, zb, zb, zg, ze)
        Jk, Jbg, Jba, Jg = Js[0], Js[1], Js[2], Js[3]
        # Reference: ScaledLoss(1.6e-5) on inertial residuals.
        sw = sq_scale * active
        Jp = Jk @ Pk[s] + Jbg @ Pbg[bs] + Jba @ Pba[bs]
        Jp = Jp.at[:, off_g:off_g + 2].set(Jg)
        if lay.iext >= 0:
            Jp = Jp.at[:, lay.iext:lay.iext + 6].set(Js[4])
        return r * sw, Jp * sw

    r, Jp = jax.vmap(one)(f.s, f.u, f.bias_s, f.bias_u, f.meas, f.active)
    R = r.size
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1),
        J_lm=jnp.zeros((R, 3), dtype), lm_idx=jnp.zeros(R, jnp.int32))


def _linearize_preint(params: Params, f, cfg: SolverConfig, lay: Layout,
                      dt, bias_dt):
    """Preintegrated-IMU factors (factors/preintegration.py).

    Endpoint stamps may lie on different (possibly overlapping) spline
    segments; the two 24-column Jacobian blocks are scattered with ``add``
    so shared knots accumulate both contributions."""
    D, off_bg, off_ba, off_g = lay.D, lay.bg, lay.ba, lay.grav
    dtype = params.knots.dtype
    order, border = cfg.order, cfg.bias_order
    Pk = _proj(params.num_knots - order + 1, order * 6, 6, 0, D, dtype)
    Sb = params.num_bias_knots - border + 1
    Pbg = _proj(Sb, border * 3, 3, off_bg, D, dtype)
    Pba = _proj(Sb, border * 3, 3, off_ba, D, dtype)

    def one(s_i, u_i, s_j, u_j, bs, bu, dq, dv, dp, dt_ij, Jb, bg0, ba0,
            sqrt_info, active):
        ctrl_i = bspline.gather_support(params.knots, s_i, order)
        ctrl_j = bspline.gather_support(params.knots, s_j, order)
        bg_ctrl = bspline.gather_support(params.bias_g, bs, border)
        ba_ctrl = bspline.gather_support(params.bias_a, bs, border)

        def g(dki, dkj, dbg, dba, dgr):
            ci = res.retract_pose_knots(ctrl_i, dki.reshape(order, 6))
            cj = res.retract_pose_knots(ctrl_j, dkj.reshape(order, 6))
            bg = bspline.interp_euclidean(
                bg_ctrl + dbg.reshape(border, 3), bu, border)
            ba = bspline.interp_euclidean(
                ba_ctrl + dba.reshape(border, 3), bu, border)
            grav = s2.retract(params.gravity, dgr, norm=s2.GRAVITY_NORM)
            return preint.preint_residual(
                ci, u_i, cj, u_j, dt, bg, ba, grav,
                dq, dv, dp, dt_ij, Jb, bg0, ba0)

        zk = jnp.zeros(order * 6, dtype)
        zb = jnp.zeros(border * 3, dtype)
        zg = jnp.zeros(2, dtype)
        r_raw = g(zk, zk, zb, zb, zg)
        Jki, Jkj, Jbg, Jba, Jg = jax.jacfwd(
            g, argnums=(0, 1, 2, 3, 4))(zk, zk, zb, zb, zg)
        # Whiten (per-factor sqrt information from covariance propagation).
        r = sqrt_info @ r_raw
        Jki, Jkj = sqrt_info @ Jki, sqrt_info @ Jkj
        Jbg, Jba, Jg = sqrt_info @ Jbg, sqrt_info @ Jba, sqrt_info @ Jg
        Jp = Jki @ Pk[s_i] + Jkj @ Pk[s_j] + Jbg @ Pbg[bs] + Jba @ Pba[bs]
        Jp = Jp.at[:, off_g:off_g + 2].set(Jg)
        return r * active, Jp * active

    r, Jp = jax.vmap(one)(f.s_i, f.u_i, f.s_j, f.u_j, f.bias_s, f.bias_u,
                          f.dq, f.dv, f.dp, f.dt_ij, f.J_bias, f.bg0, f.ba0,
                          f.sqrt_info, f.active)
    R = r.size
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1),
        J_lm=jnp.zeros((R, 3), dtype), lm_idx=jnp.zeros(R, jnp.int32))


def _linearize_smooth(params: Params, f, cfg: SolverConfig, lay: Layout):
    """Constant-velocity smoothness rows (problem.SmoothFactors):
    r = w * (log(k_{i+1}^-1 k_{i+2}) - log(k_i^-1 k_{i+1})), knots i..i+2."""
    D = lay.D
    dtype = params.knots.dtype
    w = jnp.concatenate([
        jnp.full((3,), cfg.smooth_sqrt_info_rot, dtype),
        jnp.full((3,), cfg.smooth_sqrt_info_trans, dtype)])

    def boxminus(k1, k0):
        # product-manifold tangent: [log(q0^-1 q1), t1 - t0] — same
        # convention as retract_pose_knots / the marg prior local diff
        return jnp.concatenate([
            so3.log(so3.mul(so3.conj(k0[:4]), k1[:4])), k1[4:] - k0[4:]])

    Ps = _proj(max(params.num_knots - 2, 1), 18, 6, 0, D, dtype)

    def one(i, active):
        ctrl = jax.lax.dynamic_slice_in_dim(params.knots, i, 3, axis=0)

        def g(dk):
            c = res.retract_pose_knots(ctrl, dk.reshape(3, 6))
            d1 = boxminus(c[1], c[0])
            d2 = boxminus(c[2], c[1])
            return (d2 - d1) * w

        zk = jnp.zeros(18, dtype)
        r = g(zk)
        Jk = jax.jacfwd(g)(zk)
        sw = active
        Jp = Jk @ Ps[i]
        return r * sw, Jp * sw

    r, Jp = jax.vmap(one)(f.i, f.active)
    R = r.size
    return LinearSystem(
        J=Jp.reshape(-1, D), r=r.reshape(-1),
        J_lm=jnp.zeros((R, 3), dtype), lm_idx=jnp.zeros(R, jnp.int32))


def _bias_prior_np(Kb, off_bg, off_ba, D, cfg):
    """Constant row structure of the bias evolution priors (trace-time)."""
    import numpy as np
    rows = []
    for off, w_rw, w_abs in (
            (off_bg, cfg.bias_rw_sqrt_info_g, cfg.bias_abs_sqrt_info_g),
            (off_ba, cfg.bias_rw_sqrt_info_a, cfg.bias_abs_sqrt_info_a)):
        if w_rw > 0:
            for k in range(Kb - 1):
                for c in range(3):
                    row = np.zeros(D)
                    row[off + 3 * (k + 1) + c] = w_rw
                    row[off + 3 * k + c] = -w_rw
                    rows.append(row)
        if w_abs > 0:
            for k in range(Kb):
                for c in range(3):
                    row = np.zeros(D)
                    row[off + 3 * k + c] = w_abs
                    rows.append(row)
    return np.asarray(rows) if rows else np.zeros((0, D))


def _linearize_bias_prior(params: Params, cfg: SolverConfig, lay: Layout):
    """Bias random-walk + absolute-anchor rows (see SolverConfig
    bias_rw_sqrt_info_*).  Linear rows: r = J x with constant J."""
    dtype = params.knots.dtype
    Kb = params.num_bias_knots
    Jn = _bias_prior_np(Kb, lay.bg, lay.ba, lay.D, cfg)
    if Jn.shape[0] == 0:
        return None
    J = jnp.asarray(Jn, dtype)
    x = jnp.concatenate([
        jnp.zeros((lay.bg,), dtype),
        params.bias_g.reshape(-1), params.bias_a.reshape(-1),
        jnp.zeros((lay.D - lay.grav,), dtype)])
    r = J @ x
    R = J.shape[0]
    return LinearSystem(J=J, r=r, J_lm=jnp.zeros((R, 3), dtype),
                        lm_idx=jnp.zeros(R, jnp.int32))


def _bias_prior_cost(params: Params, cfg: SolverConfig):
    total = jnp.zeros((), params.knots.dtype)
    for b, w_rw, w_abs in (
            (params.bias_g, cfg.bias_rw_sqrt_info_g,
             cfg.bias_abs_sqrt_info_g),
            (params.bias_a, cfg.bias_rw_sqrt_info_a,
             cfg.bias_abs_sqrt_info_a)):
        if w_rw > 0:
            total = total + w_rw ** 2 * jnp.sum((b[1:] - b[:-1]) ** 2)
        if w_abs > 0:
            total = total + w_abs ** 2 * jnp.sum(b * b)
    return total


def _calib_prior_rows(cams: CameraCalib, imu: ImuCalib, f,
                      cfg: SolverConfig, lay: Layout):
    """Extrinsics-anchor rows (see problem.CalibPrior): 6 rows per freed
    camera + 6 for the IMU, residual ``[wr*log(q0^-1 q), wt*(t - t0)]`` with
    the Jacobian in the solver's right-tangent extrinsics chart."""
    D = lay.D
    dtype = cams.T_bs.dtype
    w6 = jnp.concatenate([jnp.full((3,), 1.0, dtype) * f.sqrt_rot,
                          jnp.full((3,), 1.0, dtype) * f.sqrt_trans])

    def rows_for(T, T0, active):
        def g(dce):
            Tc = res.retract_pose_knots(T, dce)
            return jnp.concatenate([
                so3.log(so3.mul(so3.conj(T0[:4]), Tc[:4])),
                Tc[4:] - T0[4:]]) * w6
        z = jnp.zeros(6, dtype)
        r = g(z) * active
        J = jax.jacfwd(g)(z) * active
        return r, J

    rs, Js, cols = [], [], []
    if lay.cext >= 0:
        C = lay.C
        r_c, J_c = jax.vmap(rows_for)(cams.T_bs, f.cam_T_bs0, f.cam_active)
        for c in range(C):
            rs.append(r_c[c])
            Js.append(J_c[c])
            cols.append(lay.cext + 6 * c + jnp.arange(6))
    if lay.iext >= 0:
        r_i, J_i = rows_for(imu.T_bs, f.imu_T_bs0, f.imu_active)
        rs.append(r_i)
        Js.append(J_i)
        cols.append(lay.iext + jnp.arange(6))
    if not rs:
        return None
    R = 6 * len(rs)
    J = jnp.zeros((R, D), dtype)
    for i, (Jb, cl) in enumerate(zip(Js, cols)):
        J = J.at[6 * i:6 * i + 6, cl].set(Jb)
    r = jnp.concatenate(rs)
    return LinearSystem(J=J, r=r, J_lm=jnp.zeros((R, 3), dtype),
                        lm_idx=jnp.zeros(R, jnp.int32))


def _calib_prior_cost(cams: CameraCalib, imu: ImuCalib, f):
    """Cost of the extrinsics anchors (active flags select freed groups)."""
    dtype = cams.T_bs.dtype
    w6 = jnp.concatenate([jnp.full((3,), 1.0, dtype) * f.sqrt_rot,
                          jnp.full((3,), 1.0, dtype) * f.sqrt_trans])

    def res_for(T, T0):
        return jnp.concatenate([
            so3.log(so3.mul(so3.conj(T0[:4]), T[:4])), T[4:] - T0[4:]]) * w6

    r = jax.vmap(res_for)(cams.T_bs, f.cam_T_bs0)
    total = jnp.sum(jnp.sum(r * r, -1) * f.cam_active)
    ri = res_for(imu.T_bs, f.imu_T_bs0)
    return total + jnp.sum(ri * ri) * f.imu_active


def _marg_local_diff(params: Params, f):
    """Local (tangent) coordinates of ``params`` around the prior's
    linearization point x0: ``[knots (K*6) | bias_g | bias_a | gravity (2)]``.
    Knot coordinates use the same product retraction as the solver
    (``res.retract_pose_knots``): omega = log(q0^-1 q), v = t - t0."""
    def knot_diff(x, x0):
        w = so3.log(so3.mul(so3.conj(x0[:4]), x[:4]))
        return jnp.concatenate([w, x[4:] - x0[4:]])

    dx_k = jax.vmap(knot_diff)(params.knots, f.x0_knots).reshape(-1)
    return jnp.concatenate([
        dx_k,
        (params.bias_g - f.x0_bias_g).reshape(-1),
        (params.bias_a - f.x0_bias_a).reshape(-1),
        s2.boxminus(params.gravity, f.x0_gravity, norm=s2.GRAVITY_NORM),
    ])


def _linearize_marg(params: Params, f, cfg: SolverConfig, lay: Layout):
    """Marginalization-prior rows: r = sqrt_H (x [-] x0) + r0, with the
    Jacobian of the local-diff map taken through the solver's retraction."""
    D = lay.D
    dtype = params.knots.dtype
    K, Kb = params.num_knots, params.num_bias_knots
    D0 = K * 6 + Kb * 6 + 2

    def rfun(delta):
        dk = delta[:K * 6].reshape(K, 6)
        dbg = delta[K * 6:K * 6 + Kb * 3].reshape(Kb, 3)
        dba = delta[K * 6 + Kb * 3:K * 6 + Kb * 6].reshape(Kb, 3)
        dgr = delta[-2:]
        p = params.replace(
            knots=res.retract_pose_knots(params.knots, dk),
            bias_g=params.bias_g + dbg,
            bias_a=params.bias_a + dba,
            gravity=s2.retract(params.gravity, dgr, norm=s2.GRAVITY_NORM))
        return f.sqrt_H @ _marg_local_diff(p, f) + f.r0

    z = jnp.zeros(D0, dtype)
    r = rfun(z)
    J0 = jax.jacfwd(rfun)(z)          # (D0, D0)
    sw = f.active
    Jp = jnp.zeros((D0, D), dtype).at[:, :D0].set(J0)
    return LinearSystem(
        J=Jp * sw, r=r * sw, J_lm=jnp.zeros((D0, 3), dtype),
        lm_idx=jnp.zeros(D0, jnp.int32))


def problem_layout(params: Params, cams: CameraCalib, masks: Masks) -> Layout:
    return make_layout(params.num_knots, params.num_bias_knots,
                       cams.T_bs.shape[0], masks)


def dense_prior_reduce(params: Params, cams: CameraCalib, imu: ImuCalib,
                       marg, calib_prior, masks: Masks, cfg: SolverConfig,
                       out_dtype, bias_prior: bool = False):
    """(H, g) contribution of the REPLICATED dense-row factors — the
    marginal prior (dense over the whole window, not banded in time) and
    the calibration anchor.  The sharded solvers (parallel/dist_ba.py,
    parallel/time_ba.py) keep these rows out of the per-chip reduction and
    add this once, outside the shard_map: exact, zero communication, and
    the sharded problem stays the SAME problem as the single-device one
    (VERDICT r3: sharded solves silently dropped the calib prior)."""
    lay = problem_layout(params, cams, masks)
    H = jnp.zeros((lay.D, lay.D), out_dtype)
    g = jnp.zeros((lay.D,), out_dtype)
    cm = None
    if marg is not None:
        msys = _linearize_marg(params, marg, cfg, lay)
        cm = _col_mask(masks, lay, msys.J.dtype)
        J = (msys.J * cm[None, :]).astype(out_dtype)
        r = msys.r.astype(out_dtype)
        H = H + J.T @ J
        g = g + J.T @ r
    if calib_prior is not None:
        sysc = _calib_prior_rows(cams, imu, calib_prior, cfg, lay)
        if sysc is not None:
            if cm is None:
                cm = _col_mask(masks, lay, sysc.J.dtype)
            J = (sysc.J * cm[None, :]).astype(out_dtype)
            r = sysc.r.astype(out_dtype)
            H = H + J.T @ J
            g = g + J.T @ r
    if bias_prior:
        # bias random-walk/anchor rows, counted ONCE here while every
        # shard suppresses them (SolverConfig.include_bias_prior=False)
        sysb = _linearize_bias_prior(params, cfg, lay)
        if sysb is not None:
            if cm is None:
                cm = _col_mask(masks, lay, sysb.J.dtype)
            J = (sysb.J * cm[None, :]).astype(out_dtype)
            r = sysb.r.astype(out_dtype)
            H = H + J.T @ J
            g = g + J.T @ r
    return H, g


def dense_prior_cost(params: Params, cams: CameraCalib, imu: ImuCalib,
                     marg, calib_prior, cfg: SolverConfig = None,
                     bias_prior: bool = False):
    """Cost of the replicated dense-row factors (see dense_prior_reduce)."""
    cost = jnp.zeros((), _solve_dtype(params.knots.dtype))
    if marg is not None:
        rm = marg.sqrt_H @ _marg_local_diff(params, marg) + marg.r0
        cost = cost + 0.5 * marg.active * jnp.sum(rm * rm)
    if calib_prior is not None:
        cost = cost + 0.5 * _calib_prior_cost(cams, imu, calib_prior)
    if bias_prior:
        cost = cost + 0.5 * _bias_prior_cost(params, cfg)
    return cost


def linearize(params: Params, cams: CameraCalib, imu: ImuCalib,
              factors: Factors, masks: Masks, cfg: SolverConfig,
              dt, bias_dt) -> LinearSystem:
    """Linearize every factor type and stack into one weighted row system."""
    dtype = params.knots.dtype
    lay = problem_layout(params, cams, masks)
    systems = [s for s, _ in _family_systems(
        params, cams, imu, factors, masks, cfg, dt, bias_dt, lay)]
    J = jnp.concatenate([s.J for s in systems], 0)
    r = jnp.concatenate([s.r for s in systems], 0)
    J_lm = jnp.concatenate([s.J_lm for s in systems], 0)
    lm_idx = jnp.concatenate([s.lm_idx for s in systems], 0)
    # Freeze columns (old knots / fixed gravity / fixed biases / fixed calib).
    cm = _col_mask(masks, lay, dtype)
    J = J * cm[None, :]
    J_lm = J_lm * masks.landmarks.astype(dtype)[lm_idx][:, None]
    return LinearSystem(J=J, r=r, J_lm=J_lm, lm_idx=lm_idx)


def _family_systems(params: Params, cams: CameraCalib, imu: ImuCalib,
                    factors: Factors, masks: Masks, cfg: SolverConfig,
                    dt, bias_dt, lay: Layout):
    """Per-family linearized row systems as (system, has_landmarks)."""
    systems = []
    if factors.bearing.s.shape[0]:
        if factors.frames is not None and factors.bearing.frame is not None:
            systems.append((_linearize_bearing_frames(
                params, cams, factors.bearing, factors.frames, cfg, lay),
                True))
        else:
            systems.append((_linearize_bearing(
                params, cams, factors.bearing, cfg, lay), True))
    if factors.pixel.s.shape[0]:
        systems.append(
            (_linearize_pixel(params, cams, factors.pixel, cfg, lay), True))
    if factors.inertial.s.shape[0]:
        systems.append((_linearize_inertial(
            params, imu, factors.inertial, cfg, lay, dt, bias_dt), False))
    if factors.prior.s.shape[0]:
        systems.append(
            (_linearize_prior(params, factors.prior, cfg, lay), False))
    if factors.preint is not None and factors.preint.s_i.shape[0]:
        systems.append((_linearize_preint(
            params, factors.preint, cfg, lay, dt, bias_dt), False))
    if factors.smooth is not None and factors.smooth.i.shape[0]:
        systems.append(
            (_linearize_smooth(params, factors.smooth, cfg, lay), False))
    if factors.marg is not None:
        systems.append(
            (_linearize_marg(params, factors.marg, cfg, lay), False))
    if factors.calib_prior is not None:
        sysc = _calib_prior_rows(cams, imu, factors.calib_prior, cfg, lay)
        if sysc is not None:
            systems.append((sysc, False))
    # bias evolution priors whenever IMU factors are in play (sharded
    # callers suppress them here and add them once outside the psum —
    # see SolverConfig.include_bias_prior)
    if cfg.include_bias_prior and (
            factors.inertial.s.shape[0] or
            (factors.preint is not None and factors.preint.s_i.shape[0])):
        sysb = _linearize_bias_prior(params, cfg, lay)
        if sysb is not None:
            systems.append((sysb, False))
    return systems


def linearize_reduce(params: Params, cams: CameraCalib, imu: ImuCalib,
                     factors: Factors, masks: Masks, cfg: SolverConfig,
                     dt, bias_dt):
    """Fused linearize + normal-equation assembly (the solver's hot path).

    Reduces each factor family's rows straight into (H, g, Hll, gl, W) and
    sums the blocks — the (R, D) row matrix is never concatenated or
    re-read, and the freeze masks apply to the small reduced blocks
    instead of a full pass over the rows:
    ``(J cm)^T (J cm) = cm cm^T  o  J^T J``.  Exactly equivalent to
    ``reduce_system(linearize(...))`` (parity-tested), at roughly half the
    HBM traffic per LM iteration."""
    dtype = params.knots.dtype
    lay = problem_layout(params, cams, masks)
    L = params.num_landmarks
    H = g = Hll = gl = W = None
    for s, has_lm in _family_systems(params, cams, imu, factors, masks, cfg,
                                     dt, bias_dt, lay):
        if has_lm:
            Hb, gb, Hllb, glb, Wb = reduce_system(s, L)
            Hll = Hllb if Hll is None else Hll + Hllb
            gl = glb if gl is None else gl + glb
            W = Wb if W is None else W + Wb
        else:
            J = s.J.astype(jnp.promote_types(s.J.dtype, jnp.float32))
            Hb = J.T @ J
            gb = J.T @ s.r.astype(J.dtype)
        H = Hb if H is None else H + Hb
        g = gb if g is None else g + gb
    if Hll is None:
        sdt = H.dtype
        Hll = jnp.zeros((L, 3, 3), sdt)
        gl = jnp.zeros((L, 3), sdt)
        W = jnp.zeros((L, lay.D, 3), sdt)
    cm = _col_mask(masks, lay, H.dtype)
    lm = masks.landmarks.astype(H.dtype)
    H = H * cm[:, None] * cm[None, :]
    g = g * cm
    Hll = Hll * lm[:, None, None]
    gl = gl * lm[:, None]
    W = W * (lm[:, None, None] * cm[None, :, None])
    return H, g, Hll, gl, W


def _solve_dtype(dtype):
    """Normal equations square the condition number, which overwhelms f32;
    accumulate and solve in f64 when x64 is available (on TPU the few extra
    f64 ops on the small reduced system are nearly free — measured <25%
    on the (8000, 256) reduction).  Falls back silently to f32 when x64 is
    disabled."""
    return jnp.promote_types(dtype, jnp.float64) \
        if jax.config.jax_enable_x64 else dtype


def reduce_system(sys: LinearSystem, num_landmarks: int):
    """Normal-equation blocks from weighted rows: (H, g, Hll, gl, W).

    All five are plain sums over rows, so a factor-sharded multi-chip solve
    computes them locally and ``psum``s the results (parallel/dist_ba.py).

    TPU mapping: every reduction is expressed as a MATMUL (including the
    per-landmark sums, via a one-hot row->landmark matrix) so the MXU does
    the work — ``segment_sum`` lowers to scatter-adds, which are an order of
    magnitude slower on TPU (measured 4.9 ms -> sub-ms for the bench
    window).  Products accumulate in the row dtype (f32 on TPU; matmul
    accumulation error ~ sqrt(R) * eps ~ 1e-5 relative, far below
    measurement noise); only the small reduced blocks are promoted to the
    f64 solve dtype for the Schur arithmetic downstream.
    """
    J, r, Jl, li = sys
    L = num_landmarks
    # f64 problems (CPU tests) keep f64 end to end; f32 problems (TPU
    # production) reduce in f32 and rely on mixed-precision refinement in
    # the final solve (solve_reduced).
    dt = J.dtype if jax.devices()[0].platform == "tpu" \
        else _solve_dtype(J.dtype)
    J = J.astype(dt)
    r = r.astype(dt)
    Jl = Jl.astype(dt)
    H = J.T @ J                       # (D, D) — MXU matmul
    g = J.T @ r
    # one-hot row->landmark (R, L): all landmark reductions become matmuls
    onehot = (li[:, None] == jnp.arange(L, dtype=li.dtype)[None, :]) \
        .astype(dt)
    JlJl = (Jl[:, :, None] * Jl[:, None, :]).reshape(Jl.shape[0], 9)
    Hll = (onehot.T @ JlJl).reshape(L, 3, 3)
    gl = onehot.T @ (Jl * r[:, None])
    W = jnp.stack(
        [(onehot * Jl[:, i:i + 1]).T @ J for i in range(3)],
        axis=-1)                      # (L, D, 3)
    return H, g, Hll, gl, W


def _inv3x3(m):
    """Closed-form batched 3x3 inverse (adjugate/determinant).

    TPU's LU decomposition lacks an f64 kernel; the blocks here are tiny
    SPD matrices, for which the adjugate form is both faster (pure VPU
    elementwise math, no lapack call) and dtype-agnostic."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g_, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g_)
    C = d * h - e * g_
    D = -(b * i - c * h)
    E = a * i - c * g_
    F = -(a * h - b * g_)
    G = b * f - c * e
    Hc = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A, D, G], -1),
        jnp.stack([B, E, Hc], -1),
        jnp.stack([C, F, I], -1),
    ], -2)
    return adj / det[..., None, None]


def solve_reduced(H, g, Hll, gl, W, masks: Masks, lam, cfg: SolverConfig):
    """Schur-eliminate landmarks from assembled blocks and solve.

    Returns (delta_p (D,), delta_lm (L, 3))."""
    dtype = H.dtype
    lmfree = masks.landmarks.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    # LM damping applies to the landmark blocks too (same lam * diag rule as
    # the reduced system): otherwise landmark steps are raw Gauss-Newton —
    # outside the trust region — and weakly-observed landmarks amplify
    # roundoff unboundedly (measured: O(1) landmark step differences from
    # 1e-15 reduction-order noise at lam = 1e4).
    dHll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    Hll = (Hll + lam * dHll[..., None] * eye3
           + (cfg.landmark_jitter + (1.0 - lmfree))[:, None, None] * eye3)
    Hll_inv = _inv3x3(Hll)

    if cfg.schur_pallas:
        # Strict-f32 fused Pallas elimination kernel (ops/schur.py).  The
        # default einsum path lets XLA use default-precision MXU matmuls
        # (bf16 operands, f32 accumulation) — measured ~150x faster at the
        # bench envelope and accurate to ~1e-3 relative, absorbed by LM
        # damping + the refined solve below; the kernel is the choice when
        # bitwise-f32 Schur arithmetic is required.
        from ..ops.schur import schur_reduce as _pallas_schur
        S, gs = _pallas_schur(
            H, g, W, Hll_inv, gl,
            interpret=jax.devices()[0].platform != "tpu")
    else:
        S = H - jnp.einsum("ldi,lij,lej->de", W, Hll_inv, W)
        gs = g - jnp.einsum("ldi,lij,lj->d", W, Hll_inv, gl)

    # Damping + frozen-column identity, then dense Cholesky.
    cm = jnp.clip(jnp.diagonal(H), 0.0, None) > 0.0
    diag = jnp.diagonal(S)
    S = S + jnp.diag(lam * diag + 1e-8 + (1.0 - cm.astype(dtype)))
    # Jacobi scaling for f32 conditioning.
    d = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(S), 1e-12, None))
    Ss = S * d[:, None] * d[None, :]
    b = d * gs
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and jax.config.jax_enable_x64:
        # TPU has no native f64 Cholesky — the lowered kernel costs ~19 ms
        # for D=254 (measured, ~30x the f32 one).  Mixed-precision iterative
        # refinement gets f64-grade solutions at f32-factorization cost:
        # factor the Jacobi-scaled (unit-diagonal, damped) matrix once in
        # f32, then correct with f64 residuals (for f32-reduced problems the
        # f64 matrix is the exact cast — refinement then solves the f32
        # system to full accuracy).  Converges at rate cond(Ss) * eps_f32
        # per sweep; the Jacobi-scaled, LM-damped matrix has unit diagonal
        # and modest condition, so ONE sweep reaches ~1e-8 relative — far
        # below measurement noise (two sweeps only buy ~1e-12 at +15%
        # solve time; measured 3.36 vs 3.92 ms per 5-iteration solve).
        S64 = Ss.astype(jnp.float64)
        b64 = b.astype(jnp.float64)
        c32, lower = jax.scipy.linalg.cho_factor(
            Ss.astype(jnp.float32), lower=True)

        def refine(x, _):
            r = b64 - S64 @ x                   # f64 residual
            dx = jax.scipy.linalg.cho_solve(
                (c32, lower), r.astype(jnp.float32)).astype(jnp.float64)
            return x + dx, None

        x0 = jax.scipy.linalg.cho_solve(
            (c32, lower), b.astype(jnp.float32)).astype(jnp.float64)
        x, _ = jax.lax.scan(refine, x0, None, length=1)
        dp = (-d.astype(jnp.float64) * x).astype(dtype)
    else:
        c, lower = jax.scipy.linalg.cho_factor(Ss, lower=True)
        dp = -d * jax.scipy.linalg.cho_solve((c, lower), b)

    dl = -jnp.einsum("lij,lj->li", Hll_inv,
                     gl + jnp.einsum("ldi,d->li", W, dp))
    return dp, dl


def solve_normal_equations(sys: LinearSystem, masks: Masks, lam,
                           num_landmarks: int, cfg: SolverConfig):
    """Single-chip path: reduce rows, Schur-eliminate, solve."""
    H, g, Hll, gl, W = reduce_system(sys, num_landmarks)
    return solve_reduced(H, g, Hll, gl, W, masks, lam, cfg)


def apply_delta(params: Params, cams: CameraCalib, imu: ImuCalib,
                dp, dl, masks: Masks, cfg: SolverConfig):
    """Retract the solved tangent step onto (state, camera calib, IMU calib).

    Frozen groups receive an exactly-zero delta (their Jacobian columns are
    zeroed and the identity placed on the normal-equation diagonal), so
    calibration only moves when its mask frees it."""
    K, Kb = params.num_knots, params.num_bias_knots
    lay = problem_layout(params, cams, masks)
    off_bg, off_ba, off_g = lay.bg, lay.ba, lay.grav
    dtype = params.knots.dtype
    dp = dp.astype(dtype)   # solve may run in f64 (see _solve_dtype)
    dl = dl.astype(dtype)
    dk = dp[: K * 6].reshape(K, 6)
    dbg = dp[off_bg:off_ba].reshape(Kb, 3)
    dba = dp[off_ba:off_g].reshape(Kb, 3)
    dgr = dp[off_g:off_g + 2]
    params = params.replace(
        knots=res.retract_pose_knots(params.knots, dk),
        bias_g=params.bias_g + dbg,
        bias_a=params.bias_a + dba,
        gravity=s2.retract(params.gravity, dgr, norm=s2.GRAVITY_NORM),
        landmarks=params.landmarks + dl * masks.landmarks.astype(dtype)[:, None],
    )
    C = lay.C
    if lay.cext >= 0:
        dce = dp[lay.cext:lay.cext + 6 * C].reshape(C, 6)
        cams = cams.replace(T_bs=res.retract_pose_knots(cams.T_bs, dce))
    if lay.cintr >= 0:
        di = dp[lay.cintr:lay.cintr + 4 * C].reshape(C, 4)
        cams = cams.replace(intrinsics=cams.intrinsics + di)
    if lay.cdist >= 0:
        dd = dp[lay.cdist:lay.cdist + 4 * C].reshape(C, 4)
        cams = cams.replace(distortion=cams.distortion + dd)
    if lay.iext >= 0:
        die = dp[lay.iext:lay.iext + 6]
        imu = imu.replace(T_bs=res.retract_pose_knots(imu.T_bs, die))
    return params, cams, imu


def _rho_huber(s, delta):
    return jnp.where(s <= delta * delta, s, 2.0 * delta * jnp.sqrt(
        jnp.maximum(s, 1e-24)) - delta * delta)


def compute_cost(params: Params, cams: CameraCalib, imu: ImuCalib,
                 factors: Factors, cfg: SolverConfig, dt, bias_dt):
    """Total robustified cost — cheap (no Jacobians), used for LM accept."""
    order, border = cfg.order, cfg.bias_order
    dtype = params.knots.dtype
    total = jnp.zeros((), _solve_dtype(dtype))

    if factors.bearing.s.shape[0]:
        f = factors.bearing
        if factors.frames is not None and f.frame is not None:
            total += _bearing_cost_frames(params, cams, f, factors.frames,
                                          cfg)
        else:
            def rb(s, u, c, l, m):
                ctrl = bspline.gather_support(params.knots, s, order)
                return res.bearing_residual(
                    ctrl, u, cams.T_bs[c], params.landmarks[l], m)
            r = jax.vmap(rb)(f.s, f.u, f.cam, f.lm, f.meas)
            s2n = jnp.sum(r * r, -1)
            total += cfg.bearing_sqrt_info ** 2 * jnp.sum(
                _rho_huber(s2n, cfg.bearing_huber) * f.active)

    if factors.pixel.s.shape[0]:
        f = factors.pixel
        def rp(s, u, c, l, m):
            ctrl = bspline.gather_support(params.knots, s, order)
            return res.pixel_residual(
                ctrl, u, cams.T_bs[c], cams.intrinsics[c], cams.distortion[c],
                params.landmarks[l], m)
        r = jax.vmap(rp)(f.s, f.u, f.cam, f.lm, f.meas)
        s2n = jnp.sum(r * r, -1)
        total += cfg.pixel_sqrt_info ** 2 * jnp.sum(
            _rho_huber(s2n, cfg.pixel_huber) * f.active)

    if factors.inertial.s.shape[0]:
        f = factors.inertial
        sinfo = jnp.concatenate([
            jnp.full((3,), cfg.gyro_sqrt_info, dtype),
            jnp.full((3,), cfg.accel_sqrt_info, dtype)])
        def ri(s, u, bs, bu, m):
            ctrl = bspline.gather_support(params.knots, s, order)
            bg = bspline.interp_euclidean(
                bspline.gather_support(params.bias_g, bs, border), bu, border)
            ba = bspline.interp_euclidean(
                bspline.gather_support(params.bias_a, bs, border), bu, border)
            return res.inertial_residual(
                ctrl, u, dt, bg, ba, imu.T_bs, params.gravity,
                imu.gyro_intrinsics, imu.accel_intrinsics, imu.g_sensitivity,
                imu.lever_arm, m) * sinfo
        r = jax.vmap(ri)(f.s, f.u, f.bias_s, f.bias_u, f.meas)
        total += cfg.inertial_scale * jnp.sum(jnp.sum(r * r, -1) * f.active)

    if factors.prior.s.shape[0]:
        f = factors.prior
        T_bs_id = jnp.zeros(7, dtype).at[0].set(1.0)
        def rr(s, u, m):
            ctrl = bspline.gather_support(params.knots, s, order)
            return res.pose_prior_residual(ctrl, u, T_bs_id, m)
        r = jax.vmap(rr)(f.s, f.u, f.meas) * cfg.prior_sqrt_info
        total += jnp.sum(jnp.sum(r * r, -1) * f.active)

    if factors.preint is not None and factors.preint.s_i.shape[0]:
        f = factors.preint
        def rq(s_i, u_i, s_j, u_j, bs, bu, dq, dv, dp, dt_ij, Jb, bg0, ba0,
               sqrt_info):
            ctrl_i = bspline.gather_support(params.knots, s_i, order)
            ctrl_j = bspline.gather_support(params.knots, s_j, order)
            bg = bspline.interp_euclidean(
                bspline.gather_support(params.bias_g, bs, border), bu, border)
            ba = bspline.interp_euclidean(
                bspline.gather_support(params.bias_a, bs, border), bu, border)
            return sqrt_info @ preint.preint_residual(
                ctrl_i, u_i, ctrl_j, u_j, dt, bg, ba, params.gravity,
                dq, dv, dp, dt_ij, Jb, bg0, ba0)
        r = jax.vmap(rq)(f.s_i, f.u_i, f.s_j, f.u_j, f.bias_s, f.bias_u,
                         f.dq, f.dv, f.dp, f.dt_ij, f.J_bias, f.bg0, f.ba0,
                         f.sqrt_info)
        total += jnp.sum(jnp.sum(r * r, -1) * f.active)

    if factors.smooth is not None and factors.smooth.i.shape[0]:
        f = factors.smooth
        w = jnp.concatenate([
            jnp.full((3,), cfg.smooth_sqrt_info_rot, dtype),
            jnp.full((3,), cfg.smooth_sqrt_info_trans, dtype)])

        def rs(i):
            c = jax.lax.dynamic_slice_in_dim(params.knots, i, 3, axis=0)
            def bm(k1, k0):
                return jnp.concatenate([
                    so3.log(so3.mul(so3.conj(k0[:4]), k1[:4])),
                    k1[4:] - k0[4:]])
            return (bm(c[2], c[1]) - bm(c[1], c[0])) * w
        r = jax.vmap(rs)(f.i)
        total += jnp.sum(jnp.sum(r * r, -1) * f.active)

    if factors.marg is not None:
        f = factors.marg
        rm = f.sqrt_H @ _marg_local_diff(params, f) + f.r0
        total += f.active * jnp.sum(rm * rm)

    if factors.calib_prior is not None:
        total += _calib_prior_cost(cams, imu, factors.calib_prior)

    if cfg.include_bias_prior and (
            factors.inertial.s.shape[0] or
            (factors.preint is not None and factors.preint.s_i.shape[0])):
        total += _bias_prior_cost(params, cfg)

    return 0.5 * total


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize(params: Params, cams: CameraCalib, imu: ImuCalib,
             factors: Factors, masks: Masks, cfg: SolverConfig,
             dt, bias_dt, lam0=None):
    """Run the fixed-iteration LM loop.  Jittable; shapes never change.

    Returns ``(params, cams, imu, stats)`` — calibration is part of the
    optimized state (frozen by default via ``masks``, see ``Masks``).
    ``lam0`` (traced scalar) warm-starts the damping: the online estimator
    passes the previous solve's final lambda — restarting every solve at
    ``cfg.init_lambda`` rejects the first 1-3 steps under motion stress
    (measured: every MH_03 solve opened with two rejections) and the
    under-damped accepted step is what compounds into runaways.

    Reference analogue: ``Optimizer<CERES>::optimize`` with max 5 LM
    iterations (``ceres/optimizer.cpp:276-279``)."""
    L = params.num_landmarks
    dtype = params.knots.dtype
    cost0 = compute_cost(params, cams, imu, factors, cfg, dt, bias_dt)

    def body(carry, _):
        p, c, i, lam, cost = carry
        H, g, Hll, gl, W = linearize_reduce(p, c, i, factors, masks, cfg,
                                            dt, bias_dt)
        dp, dl = solve_reduced(H, g, Hll, gl, W, masks, lam, cfg)
        tp, tc, ti = apply_delta(p, c, i, dp, dl, masks, cfg)
        trial_cost = compute_cost(tp, tc, ti, factors, cfg, dt, bias_dt)
        accept = trial_cost < cost
        sel = lambda a, b: jnp.where(accept, a, b)
        p_next = jax.tree.map(sel, tp, p)
        c_next = jax.tree.map(sel, tc, c)
        i_next = jax.tree.map(sel, ti, i)
        cost_next = jnp.where(accept, trial_cost, cost)
        lam_next = jnp.where(accept, lam * cfg.lambda_down,
                             lam * cfg.lambda_up)
        lam_next = jnp.clip(lam_next, 1e-10, 1e6)
        return (p_next, c_next, i_next, lam_next, cost_next), accept

    lam_init = jnp.asarray(cfg.init_lambda, dtype) if lam0 is None \
        else jnp.asarray(lam0, dtype)
    init = (params, cams, imu, lam_init, cost0)
    (p_fin, c_fin, i_fin, lam_fin, cost_fin), accepted = jax.lax.scan(
        body, init, None, length=cfg.max_iterations)
    return p_fin, c_fin, i_fin, SolveStats(
        initial_cost=cost0, final_cost=cost_fin, lambda_final=lam_fin,
        accepted=accepted)


def flat_layout(K, L, Kb, C, iters):
    """(offsets dict, total length) of the packed optimize_flat output."""
    sizes = [("knots", K * 7), ("landmarks", L * 3), ("gravity", 3),
             ("bias_g", Kb * 3), ("bias_a", Kb * 3), ("cam_T_bs", C * 7),
             ("cam_intr", C * 4), ("cam_dist", C * 4), ("imu_T_bs", 7),
             ("stats", 3), ("accepted", iters)]
    off, total = {}, 0
    for name, n in sizes:
        off[name] = (total, total + n)
        total += n
    return off, total


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize_flat(params: Params, cams: CameraCalib, imu: ImuCalib,
                  factors: Factors, masks: Masks, cfg: SolverConfig,
                  dt, bias_dt, lam0=None):
    """:func:`optimize` with the results packed into ONE flat vector
    (layout :func:`flat_layout`).

    On remote-attached devices every device->host fetch pays a full round
    trip (~30-45 ms on the axon tunnel; measured); the estimator pulls
    ~10 arrays per solve, which dominated the full-pipeline frame rate
    (550 ms/solve -> ~40 ms with one packed fetch).  On locally-attached
    TPU hosts the packing is still strictly fewer, larger transfers."""
    p, c, i, st = optimize(params, cams, imu, factors, masks, cfg, dt,
                           bias_dt, lam0)
    odt = _solve_dtype(p.knots.dtype)
    parts = [p.knots, p.landmarks, p.gravity, p.bias_g, p.bias_a,
             c.T_bs, c.intrinsics, c.distortion, i.T_bs,
             jnp.stack([st.initial_cost.astype(odt),
                        st.final_cost.astype(odt),
                        st.lambda_final.astype(odt)]),
             st.accepted]
    return jnp.concatenate([jnp.asarray(x, odt).ravel() for x in parts])


@functools.partial(jax.jit, static_argnames=("cfg",))
def batch_optimize(params: Params, cams: CameraCalib, imu: ImuCalib,
                   factors: Factors, masks: Masks, cfg: SolverConfig,
                   dt, bias_dt):
    """Solve B independent windows in one device program (vmap over the full
    LM loop).

    The single-window solve is occupancy-bound on a TPU chip (PROFILE.md:
    <=3% of FLOP peak at the reference envelope), so batching windows is
    near-free parallelism: B windows cost far less than B sequential solves.
    Production uses: multi-session/multi-robot serving (the reference's
    ``Cluster`` of Systems, ``apps/hyperslam/main.cpp:25-36``), parameter
    sweeps, and offline mapping over many trajectory segments.

    All leading axes of ``params``/``factors``/``masks`` are the batch
    dimension B; ``cams``/``imu`` are shared (one rig).  Returns the same
    structure as :func:`optimize`, batched."""
    def one(p, f, m):
        return optimize(p, cams, imu, f, m, cfg, dt, bias_dt)
    return jax.vmap(one)(params, factors, masks)
