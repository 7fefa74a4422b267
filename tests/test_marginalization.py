"""Fixed-lag marginalization tests (solver/marginalization.py + the
MargPrior factor in solver/ba.py).

The reference has NO marginalization (SURVEY.md §2.2 — old knots are frozen
and evicted factors dropped, ``ceres/optimizer.cpp:322-382``), so there is no
reference test to mirror; the strategy here is mathematical: (a) Schur
elimination of a linear-Gaussian system must reproduce the full solution on
the kept variables exactly, (b) the square-root factorization must reproduce
the quadratic, (c) the device-side MargPrior rows must match the host prior,
(d) the estimator with marginalization enabled must track a synthetic
sequence at least as well as freeze-only."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver import marginalization as marg
from hyperslam_tpu.solver.problem import (CameraCalib, Factors, ImuCalib,
                                          MargPrior, Masks, Params,
                                          SolverConfig)


def test_marginalize_columns_matches_full_solve(rng):
    """For a linear-Gaussian problem, eliminating variables and solving the
    reduced system gives exactly the kept block of the full solution."""
    D, M = 12, 4
    J = rng.normal(size=(40, D))
    r = rng.normal(size=40)
    H = J.T @ J
    g = J.T @ r
    full = np.linalg.solve(H, -g)
    m_idx = np.array([0, 3, 7, 11])
    keep = np.setdiff1d(np.arange(D), m_idx)
    H_red, g_red = marg.marginalize_columns(H, g, m_idx)
    red = np.linalg.solve(H_red, -g_red)
    np.testing.assert_allclose(red, full[keep], rtol=1e-8, atol=1e-10)


def test_sqrt_factor_reproduces_quadratic(rng):
    D = 10
    A = rng.normal(size=(6, D))          # rank-deficient H (rank 6)
    H = A.T @ A
    g = A.T @ rng.normal(size=6)         # g in the row space of H
    sqrt_H, r0 = marg.sqrt_factor(H, g)
    np.testing.assert_allclose(sqrt_H.T @ sqrt_H, H, atol=1e-9)
    np.testing.assert_allclose(sqrt_H.T @ r0, g, atol=1e-9)


def _tiny_problem(rng, K=6, Kb=4, dtype=jnp.float64):
    params = Params(
        knots=jnp.asarray(np.concatenate(
            [np.tile([1.0, 0, 0, 0], (K, 1)),
             rng.normal(0, 0.1, (K, 3))], 1), dtype),
        landmarks=jnp.asarray(rng.normal(0, 1, (8, 3)) + [0, 0, 5], dtype),
        gravity=jnp.asarray([0.0, 0.0, -9.80741], dtype),
        bias_g=jnp.asarray(rng.normal(0, 0.01, (Kb, 3)), dtype),
        bias_a=jnp.asarray(rng.normal(0, 0.05, (Kb, 3)), dtype))
    cams = CameraCalib(
        T_bs=jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]], dtype),
        intrinsics=jnp.asarray([[376.0, 240.0, 458.0, 458.0]], dtype),
        distortion=jnp.zeros((1, 4), dtype))
    imu = ImuCalib.default(dtype)
    masks = Masks.all_free(K, 8, Kb)
    return params, cams, imu, masks


def _random_host_prior(rng, K, Kb, params):
    hp = marg.HostPrior.empty(K, Kb)
    D0 = hp.H.shape[0]
    A = rng.normal(size=(D0, D0)) * 0.3
    hp.H = A.T @ A
    hp.g = rng.normal(size=D0) * 0.1
    hp.x0_knots = np.asarray(params.knots, np.float64).copy()
    hp.x0_bias_g = np.asarray(params.bias_g, np.float64).copy()
    hp.x0_bias_a = np.asarray(params.bias_a, np.float64).copy()
    hp.x0_gravity = np.asarray(params.gravity, np.float64).copy()
    hp.active = True
    return hp


def test_device_marg_rows_match_host(rng):
    """At x = x0 the device rows are exactly (sqrt_H, r0); away from x0 the
    device cost matches the host quadratic to second order."""
    K, Kb = 6, 4
    params, cams, imu, masks = _tiny_problem(rng, K, Kb)
    hp = _random_host_prior(rng, K, Kb, params)
    sqrt_H, r0 = marg.sqrt_factor(hp.H, hp.g)
    D0 = hp.H.shape[0]
    mp = MargPrior(
        sqrt_H=jnp.asarray(sqrt_H), r0=jnp.asarray(r0),
        x0_knots=jnp.asarray(hp.x0_knots),
        x0_bias_g=jnp.asarray(hp.x0_bias_g),
        x0_bias_a=jnp.asarray(hp.x0_bias_a),
        x0_gravity=jnp.asarray(hp.x0_gravity),
        active=jnp.asarray(1.0, jnp.float64))
    factors = Factors.empty(dtype=jnp.float64).replace(marg=mp)
    cfg = SolverConfig()
    dt = jnp.asarray(0.1, jnp.float64)

    sys = ba.linearize(params, cams, imu, factors, masks, cfg, dt, dt)
    np.testing.assert_allclose(np.asarray(sys.r), r0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sys.J)[:, :D0], sqrt_H, atol=1e-9)

    # Perturb the state: cost(x) - cost(x0) == g'dx + 0.5 dx'H dx
    delta_k = rng.normal(0, 1e-3, (K, 6))
    from hyperslam_tpu.factors.residuals import retract_pose_knots
    params2 = params.replace(
        knots=retract_pose_knots(params.knots, jnp.asarray(delta_k)),
        bias_g=params.bias_g + 1e-3,
        bias_a=params.bias_a - 1e-3)
    c0 = float(ba.compute_cost(params, cams, imu, factors, cfg, dt, dt))
    c1 = float(ba.compute_cost(params2, cams, imu, factors, cfg, dt, dt))
    dx = marg.local_diff_np(np.asarray(params2.knots, np.float64),
                            np.asarray(params2.bias_g, np.float64),
                            np.asarray(params2.bias_a, np.float64),
                            np.asarray(params2.gravity, np.float64), hp)
    expected = float(hp.g @ dx + 0.5 * dx @ hp.H @ dx)
    assert abs((c1 - c0) - expected) < 1e-8, (c1 - c0, expected)


def test_shift_knot_block_reindexes(rng):
    K, Kb = 5, 3
    D0 = K * 6 + Kb * 6 + 2
    A = rng.normal(size=(D0 - 6, D0 - 6))
    H = A.T @ A
    g = rng.normal(size=D0 - 6)
    H_new, g_new = marg.shift_knot_block(H, g, K)
    assert H_new.shape == (D0, D0)
    # old knot block i+1 (rows 0.. of the small system) landed at knot i
    np.testing.assert_allclose(H_new[:6 * (K - 1), :6 * (K - 1)],
                               H[:6 * (K - 1), :6 * (K - 1)])
    # last knot slot is empty
    assert not np.any(H_new[6 * (K - 1):6 * K])
    # bias/gravity block kept
    np.testing.assert_allclose(H_new[6 * K:, 6 * K:],
                               H[6 * (K - 1):, 6 * (K - 1):])
    np.testing.assert_allclose(g_new[6 * K:], g[6 * (K - 1):])


@pytest.mark.slow
def test_estimator_marginalization_e2e():
    """Synthetic stereo-INERTIAL sequence with marginalization ON: the window
    slides many times; the marginal prior must accumulate real information
    and keep the trajectory consistent (ATE at least as good as the
    freeze-only run on the same data).

    Why inertial: in a vision-only run with long-lived tracks, each slide's
    departing information (a single 6-dim pose prior, or a few bearing rows
    on a fully-dying track) is low-rank and *exactly* absorbed by the
    eliminated knot/landmark columns — the Schur complement is mathematically
    zero, so there is legitimately nothing to retain.  Dying IMU-sample
    bundles (many 6-dim residuals across the same knot span) are high-rank
    and leave genuine cross-knot information behind."""
    from hyperslam_tpu.evaluation import metrics
    from hyperslam_tpu.frontend import synthetic
    from hyperslam_tpu.window.estimator import (SlidingWindowEstimator,
                                                WindowConfig)
    from tests.test_e2e import _run_estimator

    cfg = synthetic.SyntheticConfig(
        duration=6.0, knot_dt=0.5, cam_rate=10.0, imu_rate=50.0,
        num_landmarks=120, pixel_noise=0.3, gyro_noise=2e-3,
        accel_noise=2e-2, gyro_bias=(0.002, -0.001, 0.003),
        accel_bias=(0.05, -0.02, 0.03), seed=5)
    seq = synthetic.generate(cfg)

    def run(enable):
        window = WindowConfig(
            knot_separation=0.25, max_window=1.5, max_knots=12,
            max_landmarks=160, max_bearing=4096, max_inertial=512,
            max_prior=16, bias_separation=2.0, max_bias_knots=8,
            dtype=jnp.float64, enable_marginalization=enable)
        solver = SolverConfig(
            max_iterations=4, bearing_sqrt_info=458 / 0.3,
            gyro_sqrt_info=1 / 2e-3, accel_sqrt_info=1 / 2e-2,
            inertial_scale=1.0)
        est = _run_estimator(seq, window, solver, use_imu=True,
                             prior_every=0.35)
        stamps, poses = est.export_trajectory(rate_hz=20.0)
        gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
        out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                          stamps, gt[:, 4:], gt[:, :4], align=True)
        return est, out

    est_m, ape_m = run(True)
    # the window slid and the prior accumulated genuine information
    assert est_m._marg_ever_active
    assert est_m._marg_prior.active
    assert ape_m["trans_rmse"] < 0.05, ape_m
    assert ape_m["rot_rmse_deg"] < 2.0, ape_m

    _, ape_f = run(False)
    # Marginalization keeps evicted information: it must not be worse than
    # freeze-only by more than noise (and is typically better).
    assert ape_m["trans_rmse"] <= ape_f["trans_rmse"] * 1.25 + 1e-4, \
        (ape_m, ape_f)
