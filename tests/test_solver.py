"""Batched LM + Schur solver: convergence on synthetic windowed problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperslam_tpu.factors import residuals as res
from hyperslam_tpu.models import camera as cam
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import (CameraCalib, Factors, ImuCalib,
                                          InertialFactors, Masks, Params,
                                          PriorFactors, SolverConfig,
                                          VisualFactors)
from hyperslam_tpu.state import bspline
from hyperslam_tpu.variables import s2, se3, so3

DT = 0.5


def _smooth_knots(key, K, dtype=jnp.float64):
    """Random but smooth trajectory knots (small increments)."""
    xs = jax.random.normal(key, (K, 6), dtype) * jnp.asarray(
        [0.08, 0.08, 0.08, 0.25, 0.25, 0.25], dtype)
    T = se3.identity(dtype)
    knots = [T]
    for i in range(1, K):
        T = se3.compose(knots[-1], se3.exp(xs[i]))
        knots.append(T)
    return jnp.stack(knots)


def _stereo_calib(dtype=jnp.float64):
    intr = jnp.asarray([[376.0, 240.0, 458.0, 458.0]] * 2, dtype)
    dist = jnp.zeros((2, 4), dtype)
    T_b_c0 = se3.identity(dtype)
    T_b_c1 = se3.from_parts(
        so3.identity(dtype), jnp.asarray([0.11, 0.0, 0.0], dtype))
    return CameraCalib(T_bs=jnp.stack([T_b_c0, T_b_c1]),
                       intrinsics=intr, distortion=dist)


def _make_visual_problem(key, K=8, L=40, obs_per_frame=None, dtype=jnp.float64):
    """Ground-truth spline + landmarks; bearing observations from both
    cameras at several times; returns (gt_params, factors, calib)."""
    ks = jax.random.split(key, 4)
    knots = _smooth_knots(ks[0], K, dtype)
    lms = jax.random.normal(ks[1], (L, 3), dtype) * jnp.asarray(
        [3.0, 3.0, 2.0], dtype) + jnp.asarray([0.0, 0.0, 8.0], dtype)
    calib = _stereo_calib(dtype)

    n_t = K - 3  # segments
    times = jnp.linspace(0.05, (K - 3) * 1.0 - 0.05, 3 * n_t)
    s_list, u_list, cam_list, lm_list, meas_list = [], [], [], [], []
    for t in times:
        s, u = bspline.support_index(t, 0.0, 1.0, K)
        ctrl = bspline.gather_support(knots, s)
        T_wb = bspline.interp_se3(ctrl, u)
        for c in range(2):
            T_ws = se3.compose(T_wb, calib.T_bs[c])
            p_s = jax.vmap(lambda p: se3.act(se3.inverse(T_ws), p))(lms)
            b = p_s / jnp.linalg.norm(p_s, axis=-1, keepdims=True)
            for l in range(L):
                if p_s[l, 2] > 0.5:  # in front
                    s_list.append(int(s))
                    u_list.append(float(u))
                    cam_list.append(c)
                    lm_list.append(l)
                    meas_list.append(np.asarray(b[l]))
    F = len(s_list)
    bearing = VisualFactors(
        s=jnp.asarray(s_list, jnp.int32), u=jnp.asarray(u_list, dtype),
        cam=jnp.asarray(cam_list, jnp.int32), lm=jnp.asarray(lm_list, jnp.int32),
        meas=jnp.asarray(np.stack(meas_list), dtype),
        active=jnp.ones(F, dtype))
    factors = Factors(
        bearing=bearing,
        pixel=VisualFactors.empty(0, 2, dtype),
        inertial=InertialFactors.empty(0, dtype),
        prior=PriorFactors.empty(0, dtype))
    Kb = 4
    gt = Params(knots=knots, landmarks=lms,
                gravity=s2.default_gravity(dtype),
                bias_g=jnp.zeros((Kb, 3), dtype),
                bias_a=jnp.zeros((Kb, 3), dtype))
    return gt, factors, calib


def test_visual_ba_converges_from_perturbation(key):
    dtype = jnp.float64
    gt, factors, calib = _make_visual_problem(key, K=8, L=40, dtype=dtype)
    K = gt.num_knots
    kp = jax.random.split(key, 3)
    # Perturb knots (except the first two, kept as gauge anchor) and landmarks.
    dknots = jax.random.normal(kp[0], (K, 6), dtype) * 0.03
    dknots = dknots.at[:2].set(0.0)
    params0 = gt.replace(
        knots=res.retract_pose_knots(gt.knots, dknots),
        landmarks=gt.landmarks + jax.random.normal(kp[1], gt.landmarks.shape,
                                                   dtype) * 0.2)
    masks = Masks.all_free(K, gt.num_landmarks, gt.num_bias_knots,
                           gravity_free=False)
    masks = masks.replace(knots=masks.knots.at[:2].set(0.0),
                          bias=masks.bias * 0.0)
    cfg = SolverConfig(max_iterations=10, bearing_sqrt_info=1.0,
                       bearing_huber=1e9)  # no robust cutoff for this test
    imu = ImuCalib.default(dtype)
    p_fin, _, _, stats = ba.optimize(params0, calib, imu, factors, masks, cfg,
                               jnp.asarray(DT, dtype), jnp.asarray(1.0, dtype))
    assert float(stats.final_cost) < 1e-10, stats
    # Frozen knots unchanged
    np.testing.assert_allclose(p_fin.knots[:2], gt.knots[:2], atol=1e-12)
    # Free knots recovered (up to the gauge fixed by the two anchors)
    np.testing.assert_allclose(p_fin.knots, gt.knots, atol=1e-5)
    np.testing.assert_allclose(p_fin.landmarks, gt.landmarks, atol=1e-4)


def test_cost_decreases_monotonically(key):
    dtype = jnp.float64
    gt, factors, calib = _make_visual_problem(key, K=6, L=25, dtype=dtype)
    K = gt.num_knots
    dknots = jax.random.normal(key, (K, 6), dtype) * 0.05
    dknots = dknots.at[:2].set(0.0)
    params0 = gt.replace(knots=res.retract_pose_knots(gt.knots, dknots))
    masks = Masks.all_free(K, gt.num_landmarks, gt.num_bias_knots,
                           gravity_free=False)
    masks = masks.replace(knots=masks.knots.at[:2].set(0.0),
                          bias=masks.bias * 0.0, landmarks=masks.landmarks * 0.0)
    cfg = SolverConfig(max_iterations=6)
    imu = ImuCalib.default(dtype)
    p_fin, _, _, stats = ba.optimize(params0, calib, imu, factors, masks, cfg,
                               jnp.asarray(DT, dtype), jnp.asarray(1.0, dtype))
    assert float(stats.final_cost) <= float(stats.initial_cost)
    # landmark mask respected
    np.testing.assert_allclose(p_fin.landmarks, gt.landmarks, atol=1e-12)


def test_inactive_factors_ignored(key):
    dtype = jnp.float64
    gt, factors, calib = _make_visual_problem(key, K=6, L=25, dtype=dtype)
    # Deactivate everything: solver must leave parameters untouched.
    factors = factors.replace(
        bearing=factors.bearing.replace(
            active=jnp.zeros_like(factors.bearing.active)))
    masks = Masks.all_free(gt.num_knots, gt.num_landmarks, gt.num_bias_knots,
                           gravity_free=False)
    cfg = SolverConfig(max_iterations=3)
    imu = ImuCalib.default(dtype)
    p_fin, _, _, stats = ba.optimize(gt, calib, imu, factors, masks, cfg,
                               jnp.asarray(DT, dtype), jnp.asarray(1.0, dtype))
    assert float(stats.initial_cost) == 0.0
    np.testing.assert_allclose(p_fin.knots, gt.knots, atol=1e-9)


def test_inertial_only_gravity_recovery(key):
    """Static trajectory + accel measurements determine gravity direction."""
    dtype = jnp.float64
    K, Kb = 6, 4
    knots = jnp.tile(se3.identity(dtype)[None], (K, 1))
    g_true = s2.retract(jnp.asarray([0.0, 0.0, -s2.GRAVITY_NORM], dtype),
                        jnp.asarray([0.05, -0.03], dtype),
                        norm=s2.GRAVITY_NORM)
    F = 20
    ts = np.linspace(0.05, (K - 3) * 1.0 - 0.05, F)
    s = np.clip(np.floor(ts).astype(np.int32), 0, K - 4)
    u = ts - s
    meas = np.tile(np.concatenate([np.zeros(3), -np.asarray(g_true)]), (F, 1))
    inertial = InertialFactors(
        s=jnp.asarray(s), u=jnp.asarray(u, dtype),
        bias_s=jnp.zeros(F, jnp.int32), bias_u=jnp.asarray(u * 0.3, dtype),
        meas=jnp.asarray(meas, dtype), active=jnp.ones(F, dtype))
    factors = Factors(
        bearing=VisualFactors.empty(0, 3, dtype),
        pixel=VisualFactors.empty(0, 2, dtype),
        inertial=inertial, prior=PriorFactors.empty(0, dtype))
    params0 = Params(
        knots=knots, landmarks=jnp.zeros((1, 3), dtype),
        gravity=jnp.asarray([0.0, 0.0, -s2.GRAVITY_NORM], dtype),
        bias_g=jnp.zeros((Kb, 3), dtype), bias_a=jnp.zeros((Kb, 3), dtype))
    masks = Masks.all_free(K, 1, Kb)
    # only gravity free: knots, biases, landmarks all fixed
    masks = masks.replace(knots=masks.knots * 0.0, bias=masks.bias * 0.0,
                          landmarks=masks.landmarks * 0.0)
    cfg = SolverConfig(max_iterations=8, gyro_sqrt_info=1.0,
                       accel_sqrt_info=1.0, inertial_scale=1.0)
    p_fin, _, _, stats = ba.optimize(
        params0, _stereo_calib(dtype), ImuCalib.default(dtype), factors,
        masks, cfg, jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype))
    np.testing.assert_allclose(p_fin.gravity, g_true, atol=1e-6)
    np.testing.assert_allclose(
        jnp.linalg.norm(p_fin.gravity), s2.GRAVITY_NORM, atol=1e-9)


def test_optimize_jits_once(key):
    """Same capacities -> no retrace (static-shape design requirement)."""
    dtype = jnp.float64
    gt, factors, calib = _make_visual_problem(key, K=6, L=25, dtype=dtype)
    masks = Masks.all_free(gt.num_knots, gt.num_landmarks, gt.num_bias_knots,
                           gravity_free=False)
    cfg = SolverConfig(max_iterations=2)
    imu = ImuCalib.default(dtype)
    dt = jnp.asarray(DT, dtype)
    bdt = jnp.asarray(1.0, dtype)
    ba.optimize(gt, calib, imu, factors, masks, cfg, dt, bdt)
    n0 = ba.optimize._cache_size()
    ba.optimize(gt.replace(knots=gt.knots * 1.0), calib, imu, factors, masks,
                cfg, dt, bdt)
    assert ba.optimize._cache_size() == n0


def test_frame_shared_bearing_parity(key):
    """The frame-shared fast path (FrameTable + chart chain rule) must
    reproduce the per-factor linearization to roundoff: same rows, same
    Jacobians, same cost."""
    import __graft_entry__ as ge
    from hyperslam_tpu.solver.problem import ImuCalib as IC

    params, cams, imu, factors, masks = ge._build_problem(
        K=12, L=32, FB=256, FI=1, FP=2, Kb=5, NF=24, dtype=jnp.float64,
        seed=5)
    cfg = SolverConfig(max_iterations=2, bearing_sqrt_info=100.0)
    dt = jnp.asarray(0.1, jnp.float64)
    legacy = factors.replace(
        frames=None, bearing=factors.bearing.replace(frame=None))

    s_fast = ba.linearize(params, cams, imu, factors, masks, cfg, dt, dt)
    s_leg = ba.linearize(params, cams, imu, legacy, masks, cfg, dt, dt)
    np.testing.assert_allclose(np.asarray(s_fast.r), np.asarray(s_leg.r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(s_fast.J), np.asarray(s_leg.J),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_fast.J_lm),
                               np.asarray(s_leg.J_lm), atol=1e-10)

    c_fast = ba.compute_cost(params, cams, imu, factors, cfg, dt, dt)
    c_leg = ba.compute_cost(params, cams, imu, legacy, cfg, dt, dt)
    np.testing.assert_allclose(float(c_fast), float(c_leg), rtol=1e-12)

    # with freed cam extrinsics (self-calibration columns)
    masks2 = masks.replace(cam_ext=jnp.asarray([0.0, 1.0]))
    s_fast2 = ba.linearize(params, cams, imu, factors, masks2, cfg, dt, dt)
    s_leg2 = ba.linearize(params, cams, imu, legacy, masks2, cfg, dt, dt)
    np.testing.assert_allclose(np.asarray(s_fast2.J), np.asarray(s_leg2.J),
                               atol=1e-9)


def test_linearize_reduce_matches_row_reduction(key):
    """The fused per-family reduction (ba.linearize_reduce) must equal
    reduce_system(linearize(...)) — same H, g, Hll, gl, W."""
    import __graft_entry__ as ge

    params, cams, imu, factors, masks = ge._build_problem(
        K=12, L=32, FB=256, FI=64, FP=4, Kb=5, NF=24, dtype=jnp.float64,
        seed=2)
    # exercise masks: freeze two knots and one landmark
    masks = masks.replace(knots=masks.knots.at[:2].set(0.0),
                          landmarks=masks.landmarks.at[5].set(0.0))
    cfg = SolverConfig(max_iterations=2, bearing_sqrt_info=100.0)
    dt = jnp.asarray(0.1, jnp.float64)

    sys0 = ba.linearize(params, cams, imu, factors, masks, cfg, dt, dt)
    ref = ba.reduce_system(sys0, params.num_landmarks)
    fused = ba.linearize_reduce(params, cams, imu, factors, masks, cfg,
                                dt, dt)
    for name, a, b in zip("H g Hll gl W".split(), ref, fused):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-12 * scale, err_msg=name)
