"""Rolling-shutter stamp correction (the reference declares the hook and
ships it commented out: ``C.correctShutterStamps(stamp, PX)``,
``/root/reference/internal/hyper/optimizers/abstract.cpp:217-219``; the YAML
carries a per-camera ``shutter:`` field, ``settings.yaml:28``).

In a continuous-time spline model the correction is free — each observation
just queries the spline at ``t_frame + delta * row`` — which is exactly why
the reference architecture reserved the hook.  Tests:

1. staging: corrected per-observation stamps land in the factor (s, u)
   exactly as computed (banded and exact modes);
2. end-to-end: on a rolling-shutter sequence with brisk rotation, enabling
   the correction must cut the ATE by a wide margin vs. ignoring it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperslam_tpu.evaluation import metrics
from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.window.estimator import SlidingWindowEstimator, WindowConfig


DELTA = 6.0e-5   # line delay [s/row]: 480 rows -> 28.8 ms frame readout


def _estimator(shutter=None, bands=8):
    window = WindowConfig(
        knot_separation=0.25, max_window=2.0, max_knots=24,
        max_landmarks=160, max_bearing=4096, max_inertial=0, max_prior=16,
        shutter_deltas=shutter, shutter_bands=bands,
        shutter_rows=(480, 480) if shutter else None,
        max_frames=2048, dtype=jnp.float64)
    solver = SolverConfig(max_iterations=4, bearing_sqrt_info=500.0)
    return SlidingWindowEstimator(window, synthetic.euroc_stereo_calib(
        jnp.float64), solver=solver)


def test_shutter_staging_banded():
    """Observation stamps = t + delta * band_center(row), shared per band."""
    est = _estimator(shutter=(DELTA, DELTA), bands=8)
    px = np.array([[100.0, 10.0], [100.0, 470.0], [200.0, 250.0]])
    est.add_visual_tracks(10.0, [0, 0, 1], [1, 2, 3], px)
    t0 = est._local(10.0)
    stamps = np.array([b[0] for b in est._bearing]) - t0
    bw = 480.0 / 8
    exp = DELTA * (np.floor(px[:, 1] / bw) + 0.5) * bw
    np.testing.assert_allclose(stamps, exp, atol=1e-12)
    # rows 10 and 470 are in different bands; distinct stamps
    assert stamps[0] != stamps[1]


def test_shutter_staging_exact():
    """bands=0: exact per-row stamps."""
    est = _estimator(shutter=(DELTA, 0.0), bands=0)
    px = np.array([[100.0, 10.0], [100.0, 470.0], [200.0, 250.0]])
    est.add_visual_tracks(10.0, [0, 0, 1], [1, 2, 3], px)
    t0 = est._local(10.0)
    stamps = np.array([b[0] for b in est._bearing]) - t0
    exp = np.array([DELTA * 10.0, DELTA * 470.0, 0.0])  # cam1 delta = 0
    np.testing.assert_allclose(stamps, exp, atol=1e-12)


def test_shutter_disabled_is_noop():
    est = _estimator(shutter=None)
    px = np.array([[100.0, 10.0], [100.0, 470.0]])
    est.add_visual_tracks(10.0, [0, 0], [1, 2], px)
    t0 = est._local(10.0)
    stamps = np.array([b[0] for b in est._bearing]) - t0
    np.testing.assert_allclose(stamps, 0.0, atol=1e-12)


@pytest.mark.slow
def test_rolling_shutter_e2e_correction_wins():
    """Brisk-rotation RS sequence: the uncorrected run eats the skew as
    reprojection error; the corrected run recovers the global-shutter-level
    ATE (the continuous-time model's headline capability)."""
    import jax
    key = jax.random.PRNGKey(7)
    gt = synthetic.smooth_trajectory_knots(key, 12, rot_scale=0.15,
                                           trans_scale=0.2)
    cfg = synthetic.SyntheticConfig(
        duration=4.0, knot_dt=0.5, cam_rate=10.0, num_landmarks=120,
        pixel_noise=0.3, seed=1, shutter_delta=DELTA)
    seq = synthetic.generate(cfg, gt_knots=gt, gt_dt=0.5)

    def run(est):
        t_first = seq.frames[0][0]
        for stamp, cam_idx, tids, px in seq.frames:
            if stamp - t_first < 0.35:
                est.add_pose_prior(stamp, np.asarray(seq.gt_pose(stamp)))
            est.add_visual_tracks(stamp, cam_idx, tids, px)
        est.optimize()
        stamps, poses = est.export_trajectory(rate_hz=20.0)
        g = np.asarray(seq.gt_pose(stamps - est.root_stamp))
        return metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                           stamps, g[:, 4:], g[:, :4], align=True)

    ape_off = run(_estimator(shutter=None))
    ape_on = run(_estimator(shutter=(DELTA, DELTA), bands=8))
    # correction must recover a large fraction of the skew-induced error
    assert ape_on["trans_rmse"] < 0.6 * ape_off["trans_rmse"], \
        (ape_on, ape_off)
    assert ape_on["trans_rmse"] < 0.05, ape_on
    assert ape_on["rot_rmse_deg"] < 2.0, ape_on
