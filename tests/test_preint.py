"""IMU preintegration factor tests — the INTEGRATING frontend the reference
declares but never implements (``frontends/inertial/forward.hpp:9-13``).

Strategy mirrors the reference's evaluator test pattern (SURVEY.md §4):
generate a smooth ground-truth spline, synthesize perfect IMU from its
derivatives, preintegrate, and check (a) the residual vanishes on the true
state, (b) first-order bias correction matches re-preintegration, (c) the
solver recovers a perturbed trajectory, (d) Jacobians used by the linearizer
are finite-difference clean.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperslam_tpu.factors import preintegration as pre
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import (CameraCalib, Factors, ImuCalib,
                                          InertialFactors, Masks, Params,
                                          PreintFactors, PriorFactors,
                                          SolverConfig, VisualFactors)
from hyperslam_tpu.state import bspline
from hyperslam_tpu.variables import nplie, so3

DT = 0.5          # knot separation
ORDER = 4
G_W = np.array([0.0, 0.0, -9.80741])


def _smooth_knots(n, rng):
    """Gentle random SE3 knots (smooth enough for stable IMU synthesis)."""
    knots = np.zeros((n, 7))
    q = np.array([1.0, 0, 0, 0])
    p = np.zeros(3)
    v = rng.normal(0, 0.3, 3)
    for i in range(n):
        knots[i, :4] = q
        knots[i, 4:] = p
        q = nplie.quat_mul(q, nplie.so3_exp(rng.normal(0, 0.08, 3)))
        q /= np.linalg.norm(q)
        v += rng.normal(0, 0.1, 3)
        p = p + v * DT
    return knots


def _imu_from_spline(knots, ts):
    """Perfect body-frame IMU (gyro, specific force) from spline derivatives."""
    ctrl_all = jnp.asarray(knots)

    def one(t):
        s, u = bspline.support_index(t, 0.0, DT, knots.shape[0], ORDER)
        ctrl = bspline.gather_support(ctrl_all, s, ORDER)
        d = bspline.se3_with_derivatives(ctrl, u, DT, ORDER)
        q = d["pose"][:4]
        gyro = d["omega_b"]
        accel = so3.rotate(so3.conj(q), d["a_w"] - jnp.asarray(G_W))
        return gyro, accel

    gyro, accel = jax.vmap(one)(jnp.asarray(ts))
    return np.asarray(gyro), np.asarray(accel)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    knots = _smooth_knots(10, rng)
    t_i, t_j = 1.1, 1.9
    ts = np.arange(t_i, t_j + 1e-9, 0.005)  # 200 Hz
    gyro, accel = _imu_from_spline(knots, ts)
    return knots, t_i, t_j, ts, gyro, accel


def _preintegrate(ts, gyro, accel, bg0=None, ba0=None):
    p = pre.Preintegrator(1e-4, 1e-3, bg0=bg0, ba0=ba0)
    p.reset(ts[0], p.bg0, p.ba0)
    for k in range(len(ts)):
        p.add(ts[k], gyro[k], accel[k])
    return p.finish(ts[-1])


def _residual_args(knots, t_i, t_j, meas, bias_g=None, bias_a=None,
                   gravity=G_W):
    kj = jnp.asarray(knots)
    s_i, u_i = bspline.support_index(t_i, 0.0, DT, knots.shape[0], ORDER)
    s_j, u_j = bspline.support_index(t_j, 0.0, DT, knots.shape[0], ORDER)
    ctrl_i = bspline.gather_support(kj, s_i, ORDER)
    ctrl_j = bspline.gather_support(kj, s_j, ORDER)
    bg = jnp.zeros(3) if bias_g is None else jnp.asarray(bias_g)
    ba = jnp.zeros(3) if bias_a is None else jnp.asarray(bias_a)
    return (ctrl_i, u_i, ctrl_j, u_j, jnp.asarray(DT), bg, ba,
            jnp.asarray(gravity), jnp.asarray(meas.dq), jnp.asarray(meas.dv),
            jnp.asarray(meas.dp), jnp.asarray(meas.dt_ij),
            jnp.asarray(meas.J_bias), jnp.asarray(meas.bg0),
            jnp.asarray(meas.ba0))


def test_zero_residual_on_true_state(scene):
    knots, t_i, t_j, ts, gyro, accel = scene
    meas = _preintegrate(ts, gyro, accel)
    r = pre.preint_residual(*_residual_args(knots, t_i, t_j, meas))
    # 200 Hz zero-order-hold integration over 0.8 s: residual ~ O(dt^2).
    assert np.all(np.abs(np.asarray(r)) < 2e-3), np.asarray(r)


def test_bias_jacobian_first_order(scene):
    """Residual with spline-bias delta == re-preintegration at shifted bias."""
    knots, t_i, t_j, ts, gyro, accel = scene
    dbg = np.array([0.004, -0.003, 0.002])
    dba = np.array([0.03, 0.02, -0.04])
    # Simulate a biased IMU (meas = true + bias), preintegrated at bias
    # linearization point 0; the residual's first-order Jacobian correction
    # must then remove the bias given the spline-bias value dbg/dba:
    meas0 = _preintegrate(ts, gyro + dbg, accel + dba)
    r = pre.preint_residual(*_residual_args(
        knots, t_i, t_j, meas0, bias_g=dbg, bias_a=dba))
    # Preintegrating the same biased samples WITH the exact linearization
    # point removes the bias exactly:
    meas1 = _preintegrate(ts, gyro + dbg, accel + dba, bg0=dbg, ba0=dba)
    r1 = pre.preint_residual(*_residual_args(
        knots, t_i, t_j, meas1, bias_g=dbg, bias_a=dba))
    # r uses first-order bias correction of meas0; r1 is exact: they agree
    # to second order in the bias delta.
    assert np.all(np.abs(np.asarray(r) - np.asarray(r1)) < 5e-4)


def test_residual_jacobian_finite_difference(scene):
    knots, t_i, t_j, ts, gyro, accel = scene
    meas = _preintegrate(ts, gyro, accel)
    args = _residual_args(knots, t_i, t_j, meas)
    ctrl_i = args[0]

    from hyperslam_tpu.factors.residuals import retract_pose_knots

    def f(dki):
        ci = retract_pose_knots(ctrl_i, dki.reshape(ORDER, 6))
        return pre.preint_residual(ci, *args[1:])

    z = jnp.zeros(ORDER * 6)
    J = jax.jacfwd(f)(z)
    eps = 1e-6
    for c in range(0, ORDER * 6, 5):
        e = np.zeros(ORDER * 6)
        e[c] = eps
        fd = (np.asarray(f(jnp.asarray(e))) - np.asarray(f(z))) / eps
        np.testing.assert_allclose(np.asarray(J)[:, c], fd, atol=2e-4)


def test_covariance_and_sqrt_info(scene):
    knots, t_i, t_j, ts, gyro, accel = scene
    meas = _preintegrate(ts, gyro, accel)
    # sqrt_info^T sqrt_info == cov^-1 (covariance is SPD)
    cov = np.linalg.inv(meas.sqrt_info.T @ meas.sqrt_info)
    assert np.all(np.linalg.eigvalsh(cov) > 0)
    # rotation uncertainty grows ~ sigma_g * sqrt(T): 1e-4 * sqrt(0.8)
    sig_R = np.sqrt(np.diag(cov)[:3])
    assert np.all(sig_R < 1e-3) and np.all(sig_R > 1e-6)


def _solver_inputs(knots, factors_preint, dtype=jnp.float64):
    K = knots.shape[0]
    Kb = 8
    params = Params(
        knots=jnp.asarray(knots, dtype),
        landmarks=jnp.zeros((1, 3), dtype),
        gravity=jnp.asarray(G_W, dtype),
        bias_g=jnp.zeros((Kb, 3), dtype),
        bias_a=jnp.zeros((Kb, 3), dtype))
    cams = CameraCalib(
        T_bs=jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], dtype), (1, 1)),
        intrinsics=jnp.zeros((1, 4), dtype),
        distortion=jnp.zeros((1, 4), dtype))
    imu = ImuCalib.default(dtype)
    masks = Masks.all_free(K, 1, Kb, gravity_free=False)
    masks = masks.replace(landmarks=jnp.zeros(1),
                          bias=jnp.zeros(Kb))
    return params, cams, imu, masks


def test_solver_recovers_perturbed_trajectory(scene):
    """Preintegrated factors + endpoint pose priors pull a perturbed spline
    back toward the truth (relative-motion observability check)."""
    knots, t_i, t_j, ts, gyro, accel = scene
    rng = np.random.default_rng(5)
    dtype = jnp.float64

    # several intervals across the spline
    metas = []
    for (a, b) in [(0.6, 1.0), (1.0, 1.4), (1.4, 1.8), (1.8, 2.2),
                   (2.2, 2.6)]:
        tt = np.arange(a, b + 1e-9, 0.005)
        gg, aa = _imu_from_spline(knots, tt)
        metas.append(((a, b), _preintegrate(tt, gg, aa)))

    cap = len(metas)
    cols = PreintFactors.empty(cap, dtype)
    s_i, u_i = [], []
    s_j, u_j = [], []
    for (a, b), m in metas:
        si, ui = bspline.support_index(a, 0.0, DT, knots.shape[0], ORDER)
        sj, uj = bspline.support_index(b, 0.0, DT, knots.shape[0], ORDER)
        s_i.append(int(si)); u_i.append(float(ui))
        s_j.append(int(sj)); u_j.append(float(uj))
    f = cols.replace(
        s_i=jnp.asarray(s_i, jnp.int32), u_i=jnp.asarray(u_i, dtype),
        s_j=jnp.asarray(s_j, jnp.int32), u_j=jnp.asarray(u_j, dtype),
        dq=jnp.asarray(np.stack([m.dq for _, m in metas]), dtype),
        dv=jnp.asarray(np.stack([m.dv for _, m in metas]), dtype),
        dp=jnp.asarray(np.stack([m.dp for _, m in metas]), dtype),
        dt_ij=jnp.asarray([m.dt_ij for _, m in metas], dtype),
        J_bias=jnp.asarray(np.stack([m.J_bias for _, m in metas]), dtype),
        sqrt_info=jnp.asarray(np.stack([m.sqrt_info for _, m in metas]),
                              dtype),
        active=jnp.ones(cap, dtype))

    # pose priors on first/last knots region (gauge)
    prior = PriorFactors.empty(2, dtype).replace(
        s=jnp.asarray([0, 0], jnp.int32),
        u=jnp.asarray([0.0, 0.5], dtype),
        meas=jnp.asarray(np.stack([
            nplie.eval_se3(knots, 0.0, 0.0, DT),
            nplie.eval_se3(knots, 0.5 * DT, 0.0, DT)]), dtype),
        active=jnp.ones(2, dtype))

    factors = Factors(
        bearing=VisualFactors.empty(0, 3, dtype),
        pixel=VisualFactors.empty(0, 2, dtype),
        inertial=InertialFactors.empty(0, dtype),
        prior=prior, preint=f)

    # perturb the knots
    bad = knots.copy()
    for i in range(2, knots.shape[0]):
        bad[i, :4] = nplie.quat_mul(
            bad[i, :4], nplie.so3_exp(rng.normal(0, 0.01, 3)))
        bad[i, :4] /= np.linalg.norm(bad[i, :4])
        bad[i, 4:] += rng.normal(0, 0.05, 3)

    params, cams, imu, masks = _solver_inputs(bad, f)
    cfg = SolverConfig(max_iterations=10, prior_sqrt_info=100.0)
    p_out, _, _, stats = ba.optimize(
        params, cams, imu, factors, masks, cfg,
        jnp.asarray(DT, dtype), jnp.asarray(1.0, dtype))
    assert float(stats.final_cost) < 0.2 * float(stats.initial_cost)


def test_estimator_preintegrated_mode_runs():
    """SlidingWindowEstimator in inertial_mode='preintegrated' ingests IMU +
    priors and produces a finite trajectory (wiring smoke test)."""
    from hyperslam_tpu.window.estimator import (SlidingWindowEstimator,
                                                WindowConfig)
    rng = np.random.default_rng(7)
    knots = _smooth_knots(12, rng)
    w = WindowConfig(
        knot_separation=DT, max_window=3.0, max_knots=12, max_landmarks=4,
        max_bearing=8, max_inertial=8, max_prior=16, max_preint=16,
        inertial_mode="preintegrated", dtype=jnp.float64,
        bias_separation=2.0, max_bias_knots=8)
    cams = CameraCalib(
        T_bs=jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float64),
                      (2, 1)),
        intrinsics=jnp.tile(jnp.asarray([376.0, 240.0, 458.0, 457.0],
                                        jnp.float64), (2, 1)),
        distortion=jnp.zeros((2, 4), jnp.float64))
    est = SlidingWindowEstimator(w, cams)

    ts_imu = np.arange(0.0, 3.0, 0.01)
    gyro, accel = _imu_from_spline(knots, ts_imu)
    kf_ts = np.arange(0.0, 3.0, 0.25)
    ki = 0
    for k, t in enumerate(ts_imu):
        while ki < len(kf_ts) and kf_ts[ki] <= t:
            est.add_pose_prior(float(kf_ts[ki]),
                               nplie.eval_se3(knots, kf_ts[ki], 0.0, DT))
            # keyframe event: close the preintegration interval
            est._close_preint_interval(est._local(float(kf_ts[ki])))
            ki += 1
        est.add_imu(float(t), gyro[k], accel[k])
    est.optimize()
    stamps, poses = est.export_trajectory(20.0)
    assert np.all(np.isfinite(poses))
    assert len(est._preint_meas) > 3
