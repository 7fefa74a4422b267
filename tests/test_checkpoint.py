"""Checkpoint/resume: a restored estimator must continue bit-identically."""

import numpy as np
import jax.numpy as jnp

from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.window.checkpoint import load_checkpoint, save_checkpoint
from hyperslam_tpu.window.estimator import SlidingWindowEstimator, WindowConfig


def _window():
    return WindowConfig(knot_separation=0.25, max_window=2.0, max_knots=24,
                        max_landmarks=160, max_bearing=4096, max_inertial=0,
                        max_prior=16, dtype=jnp.float64)


def _solver():
    return SolverConfig(max_iterations=4, bearing_sqrt_info=500.0)


def test_checkpoint_roundtrip_and_continuation(tmp_path):
    cfg = synthetic.SyntheticConfig(duration=4.0, knot_dt=0.5, cam_rate=10.0,
                                    num_landmarks=120, pixel_noise=0.3,
                                    seed=1)
    seq = synthetic.generate(cfg)
    t_first = seq.frames[0][0]

    def feed(est, frames):
        for (stamp, cam_idx, tids, px) in frames:
            if stamp - t_first < 0.35:
                est.add_pose_prior(stamp, seq.gt_pose(stamp))
            est.add_visual_tracks(stamp, cam_idx, tids, px)

    half = len(seq.frames) // 2

    # run A: all frames in one go
    est_a = SlidingWindowEstimator(_window(), seq.calib, imu=seq.imu_calib,
                                   solver=_solver())
    feed(est_a, seq.frames[:half])

    # checkpoint mid-run, restore into a fresh estimator
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(est_a, ckpt)
    est_b = SlidingWindowEstimator(_window(), seq.calib, imu=seq.imu_calib,
                                   solver=_solver())
    load_checkpoint(est_b, ckpt)

    np.testing.assert_array_equal(est_a.knots, est_b.knots)
    np.testing.assert_array_equal(est_a.landmarks, est_b.landmarks)
    assert est_a.tracks.keys() == est_b.tracks.keys()
    assert est_a.num_knots == est_b.num_knots

    # both continue on the second half -> identical trajectories
    feed(est_a, seq.frames[half:])
    feed(est_b, seq.frames[half:])
    est_a.optimize()
    est_b.optimize()
    sa, pa = est_a.export_trajectory(20.0)
    sb, pb = est_b.export_trajectory(20.0)
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_allclose(pa, pb, atol=1e-12)


def test_checkpoint_capacity_mismatch_rejected(tmp_path):
    est = SlidingWindowEstimator(_window(), synthetic.euroc_stereo_calib(
        jnp.float64))
    est._bootstrap(0.0)
    ckpt = str(tmp_path / "s.npz")
    save_checkpoint(est, ckpt)
    w2 = _window()
    w2.max_knots = 30
    est2 = SlidingWindowEstimator(w2, synthetic.euroc_stereo_calib(
        jnp.float64))
    try:
        load_checkpoint(est2, ckpt)
        assert False, "expected capacity mismatch error"
    except ValueError as e:
        assert "capacities" in str(e)
