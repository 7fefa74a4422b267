"""End-to-end: synthetic stereo(+inertial) sequence -> sliding-window
estimator -> trajectory -> ATE gate.  This is the CI-sized analogue of the
reference's dataset-level evaluation harness (SURVEY.md §5.5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperslam_tpu.evaluation import metrics
from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.window.estimator import SlidingWindowEstimator, WindowConfig


def _run_estimator(seq, window, solver, use_imu=False, prior_every=None):
    est = SlidingWindowEstimator(window, seq.calib, imu=seq.imu_calib,
                                 solver=solver)
    events = []
    for f in seq.frames:
        events.append((f[0], 1, ("frame", f)))
    if use_imu:
        for s in seq.imu:
            events.append((s[0], 0, ("imu", s)))
    events.sort(key=lambda e: (e[0], e[1]))
    # anchor the gauge: pose priors on the first few frames from ground truth
    t_first = events[0][0]
    for t, _, (kind, payload) in events:
        if kind == "frame":
            stamp, cam_idx, tids, px = payload
            if prior_every is not None and stamp - t_first < prior_every:
                T_gt = np.asarray(seq.gt_pose(stamp))
                est.add_pose_prior(stamp, T_gt)
            est.add_visual_tracks(stamp, cam_idx, tids, px)
        else:
            stamp, gyro, accel = payload
            est.add_imu(stamp, gyro, accel)
    est.optimize()
    return est


import jax  # noqa: E402


@pytest.mark.slow
def test_stereo_inertial_ate():
    """Full stereo + direct-IMU fusion, biases + gravity estimated online.

    The tightest capability gate: the reference's released code could not
    run this path (bias-spline management was CHECK(false),
    ceres/optimizer.cpp:384-386)."""
    cfg = synthetic.SyntheticConfig(
        duration=4.0, knot_dt=0.5, cam_rate=10.0, imu_rate=100.0,
        num_landmarks=120, pixel_noise=0.5, gyro_noise=2e-3,
        accel_noise=2e-2, gyro_bias=(0.002, -0.001, 0.003),
        accel_bias=(0.05, -0.02, 0.03), seed=3)
    seq = synthetic.generate(cfg)
    window = WindowConfig(
        knot_separation=0.25, max_window=2.0, max_knots=24,
        max_landmarks=160, max_bearing=4096, max_inertial=512, max_prior=16,
        bias_separation=2.0, max_bias_knots=8, dtype=jnp.float64)
    solver = SolverConfig(max_iterations=4, bearing_sqrt_info=458 / 0.5,
                          gyro_sqrt_info=1 / 2e-3, accel_sqrt_info=1 / 2e-2,
                          inertial_scale=1.0)
    est = _run_estimator(seq, window, solver, use_imu=True, prior_every=0.35)

    stamps, poses = est.export_trajectory(rate_hz=20.0)
    gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
    out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                      stamps, gt[:, 4:], gt[:, :4], align=True)
    # IMU fusion should beat visual-only by a wide margin (measured ~3 mm).
    assert out["trans_rmse"] < 0.02, out
    assert out["rot_rmse_deg"] < 2.0, out
    # gravity norm is preserved by the S2 parameterization
    np.testing.assert_allclose(np.linalg.norm(est.gravity), 9.80741,
                               atol=1e-5)


@pytest.mark.slow
def test_stereo_vo_ate():
    cfg = synthetic.SyntheticConfig(
        duration=4.0, knot_dt=0.5, cam_rate=10.0, num_landmarks=120,
        pixel_noise=0.3, seed=1)
    seq = synthetic.generate(cfg)
    assert len(seq.frames) > 20

    window = WindowConfig(
        knot_separation=0.25, max_window=2.0, max_knots=24,
        max_landmarks=160, max_bearing=4096, max_inertial=0, max_prior=16,
        dtype=jnp.float64)
    solver = SolverConfig(max_iterations=4, bearing_sqrt_info=500.0)
    est = _run_estimator(seq, window, solver, use_imu=False, prior_every=0.35)

    stamps, poses = est.export_trajectory(rate_hz=20.0)
    assert len(stamps) > 30
    gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
    out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                      stamps, gt[:, 4:], gt[:, :4], align=True)
    # Synthetic stereo VO with 0.3 px noise should stay well under 5 cm ATE.
    assert out["trans_rmse"] < 0.05, out
    assert out["rot_rmse_deg"] < 2.0, out


@pytest.mark.slow
def test_stereo_vo_pixel_mode_ate():
    """Pixel-observation mode end-to-end: raw pixels enter as full
    projection-chain residuals (VERDICT r4 item 10; the reference declares
    this path but ships it commented out in favor of bearings,
    abstract.cpp:225-241 + ceres/optimizer.cpp:212-232)."""
    cfg = synthetic.SyntheticConfig(
        duration=4.0, knot_dt=0.5, cam_rate=10.0, num_landmarks=120,
        pixel_noise=0.3, seed=1)
    seq = synthetic.generate(cfg)

    window = WindowConfig(
        knot_separation=0.25, max_window=2.0, max_knots=24,
        max_landmarks=160, max_bearing=0, max_pixel=4096, max_inertial=0,
        max_prior=16, visual_mode="pixel", dtype=jnp.float64)
    solver = SolverConfig(max_iterations=4, pixel_sqrt_info=1.0 / 0.3,
                          pixel_huber=3.0, prior_sqrt_info=500.0)
    est = _run_estimator(seq, window, solver, use_imu=False,
                         prior_every=0.35)
    assert len(est._pixel) > 0 and len(est._bearing) == 0

    stamps, poses = est.export_trajectory(rate_hz=20.0)
    gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
    out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                      stamps, gt[:, 4:], gt[:, :4], align=True)
    assert out["trans_rmse"] < 0.05, out
    assert out["rot_rmse_deg"] < 2.0, out
