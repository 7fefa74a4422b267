"""Per-parameter constancy + online self-calibration.

Reference semantics under test:
- per-part SE3 knot constancy flags ``rotation_constant`` /
  ``translation_constant`` (``backend.cpp:52-55``,
  ``ceres/manifolds/variables/se3.cpp:19-24``) — frozen parts must not move
  in the solve;
- online sensor self-calibration: sensor parameters are registered,
  optionally-constant blocks (``ceres/optimizer.cpp:56-69``,
  ``manifolds/sensors/*``) — freeing cam1 extrinsics from a perturbed value
  must converge back to truth.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperslam_tpu.factors import residuals as res
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import ImuCalib, Masks, SolverConfig
from hyperslam_tpu.variables import nplie

from tests.test_solver import _make_visual_problem, DT


def _part_constancy_case(key, freeze_rot):
    dtype = jnp.float64
    gt, factors, calib = _make_visual_problem(key, K=8, L=40, dtype=dtype)
    K = gt.num_knots
    kp = jax.random.split(key, 2)
    d = jax.random.normal(kp[0], (K, 6), dtype) * 0.02
    d = d.at[:2].set(0.0)
    if freeze_rot:
        d = d.at[:, :3].set(0.0)   # only translations perturbed
    else:
        d = d.at[:, 3:].set(0.0)   # only rotations perturbed
    params0 = gt.replace(knots=res.retract_pose_knots(gt.knots, d))
    masks = Masks.all_free(K, gt.num_landmarks, gt.num_bias_knots,
                           gravity_free=False)
    masks = masks.replace(
        knots=masks.knots.at[:2].set(0.0), bias=masks.bias * 0.0,
        knots_rot=jnp.asarray(0.0, dtype) if freeze_rot else None,
        knots_trans=None if freeze_rot else jnp.asarray(0.0, dtype))
    cfg = SolverConfig(max_iterations=8, bearing_sqrt_info=1.0,
                       bearing_huber=1e9)
    imu = ImuCalib.default(dtype)
    p_fin, _, _, stats = ba.optimize(
        params0, calib, imu, factors, masks, cfg,
        jnp.asarray(DT, dtype), jnp.asarray(1.0, dtype))
    return gt, params0, p_fin, stats


def test_knot_rotation_constant(key):
    """rotation_constant: rotations bit-stable, translations recovered."""
    gt, p0, p_fin, stats = _part_constancy_case(key, freeze_rot=True)
    np.testing.assert_array_equal(np.asarray(p_fin.knots[:, :4]),
                                  np.asarray(p0.knots[:, :4]))
    np.testing.assert_allclose(p_fin.knots[:, 4:], gt.knots[:, 4:],
                               atol=1e-5)


def test_knot_translation_constant(key):
    """translation_constant: translations bit-stable, rotations recovered."""
    gt, p0, p_fin, stats = _part_constancy_case(key, freeze_rot=False)
    np.testing.assert_array_equal(np.asarray(p_fin.knots[:, 4:]),
                                  np.asarray(p0.knots[:, 4:]))
    np.testing.assert_allclose(p_fin.knots[:, :4], gt.knots[:, :4],
                               atol=1e-5)


def test_config_knot_constancy_flows_to_masks(tmp_path):
    """YAML rotation_constant/translation_constant reach the solver masks."""
    import yaml
    from hyperslam_tpu.system import config as cfgmod
    from hyperslam_tpu.window.estimator import SlidingWindowEstimator
    from hyperslam_tpu.frontend.synthetic import euroc_stereo_calib

    doc = {
        "System": {
            "name": "S", "modules": [{"name": "M"}],
            "sensors": [{
                "type": "CAMERA", "name": "cam0", "module": "M",
                "frontend": "F", "topic": "/c0",
                "transformation": [0, 0, 0, 1, 0, 0, 0],
                "intrinsics": [376, 240, 458, 458],
                "distortion": {"parameters": [0, 0, 0, 0]},
            }],
            "frontends": [{"type": "VISUAL", "name": "F", "backend": "B"}],
            "backends": [{
                "name": "B", "separation": 0.25, "max_window": 1.0,
                "rotation_constant": True, "translation_constant": False,
            }],
        }
    }
    p = tmp_path / "s.yaml"
    p.write_text(yaml.safe_dump(doc))
    spec = cfgmod.load_system_spec(str(p))
    w = cfgmod.window_config_from_spec(spec, dtype=jnp.float64)
    assert w.knot_rotation_constant and not w.knot_translation_constant
    est = SlidingWindowEstimator(w, euroc_stereo_calib(jnp.float64))
    est._bootstrap(0.0)
    masks = est._build_masks()
    assert masks.knots_rot is not None and float(masks.knots_rot) == 0.0
    assert masks.knots_trans is None


def _run_self_calib_scenario(perturb: bool):
    """Shared harness for the online self-calibration scenarios.

    Returns (rot_err [rad], trans_err [m], est, T_true) after feeding a 4 s
    synthetic stereo sequence with GT pose priors over the first 0.35 s.
    The priors are mocap-grade (they ARE the generating trajectory), so
    they carry their honest weight (sigma 2 mm -> prior_sqrt_info 500):
    that pins the trajectory scale, which is what makes the stereo-baseline
    scale direction observable at all — with the default unit weight the
    priors carry no information and baseline scale is gauge (measured,
    tools/diag_calib_e2e.py)."""
    from hyperslam_tpu.frontend import synthetic
    from hyperslam_tpu.window.estimator import (SlidingWindowEstimator,
                                                WindowConfig)

    cfg = synthetic.SyntheticConfig(
        duration=4.0, knot_dt=0.5, cam_rate=10.0, num_landmarks=150,
        pixel_noise=0.2, seed=7)
    seq = synthetic.generate(cfg)

    T_true = np.asarray(seq.calib.T_bs, np.float64)
    if perturb:
        # Perturb cam1 extrinsics: ~0.3 deg rotation + 4 mm translation.
        d = np.asarray([2e-3, -3e-3, 4e-3, 2e-3, -3e-3, 2e-3])
        T1_init = nplie.se3_compose(T_true[1], nplie.se3_exp(d))
    else:
        T1_init = T_true[1]
    calib0 = seq.calib.replace(
        T_bs=jnp.asarray(np.stack([T_true[0], T1_init]), jnp.float64))

    # warm_lambda off: it exists for long-run stability under motion
    # stress; in this short, anchored scenario the cold-started (more
    # aggressive) per-solve convergence recovers calibration faster.
    window = WindowConfig(
        knot_separation=0.25, max_window=2.0, max_knots=24,
        max_landmarks=200, max_bearing=8192, max_inertial=0, max_prior=16,
        dtype=jnp.float64, calibrate_cam_extrinsics=True,
        warm_lambda=False)
    solver = SolverConfig(max_iterations=5, bearing_sqrt_info=458 / 0.2,
                          prior_sqrt_info=500.0)
    est = SlidingWindowEstimator(window, calib0, imu=seq.imu_calib,
                                 solver=solver)
    t_first = seq.frames[0][0]
    for stamp, cam_idx, tids, px in seq.frames:
        if stamp - t_first < 0.35:
            est.add_pose_prior(stamp, np.asarray(seq.gt_pose(stamp)))
        est.add_visual_tracks(stamp, cam_idx, tids, px)
    est.optimize()

    T1_est = est.cams_np["T_bs"][1]
    dT = nplie.se3_compose(nplie.se3_inverse(T_true[1]), T1_est)
    return (np.linalg.norm(nplie.so3_log(dT[:4])),
            np.linalg.norm(dT[4:]), est, T_true, T1_init)


@pytest.mark.slow
def test_self_calibration_cam1_extrinsics():
    """Free cam1 extrinsics from a perturbed initial value and converge back
    toward truth while tracking (reference self-calibration mode:
    ceres/optimizer.cpp:56-69 with the constancy flags off).  Exercises the
    staged rotation-then-translation calibration release
    (WindowConfig.calib_warmup/calib_trans_delay)."""
    rot1, tr1, est, T_true, T1_bad = _run_self_calib_scenario(perturb=True)
    dT0 = nplie.se3_compose(nplie.se3_inverse(T_true[1]), T1_bad)
    rot0 = np.linalg.norm(nplie.so3_log(dT0[:4]))
    tr0 = np.linalg.norm(dT0[4:])
    # Perturbation reduced by at least 3x in both parts.
    assert rot1 < rot0 / 3.0, (rot0, rot1)
    assert tr1 < tr0 / 3.0, (tr0, tr1)
    # cam0 stayed pinned (gauge)
    np.testing.assert_allclose(est.cams_np["T_bs"][0], T_true[0], atol=1e-12)


@pytest.mark.slow
def test_self_calibration_no_collapse():
    """Freed extrinsics starting at TRUTH must stay there: the baseline
    scale direction is the near-degenerate one — without the staged release
    + anchor it collapsed 20-50% (measured; VERDICT r3 'weak' item 2).
    Pass = the true calibration is a stable point of the full pipeline."""
    rot1, tr1, est, T_true, _ = _run_self_calib_scenario(perturb=False)
    assert rot1 < np.radians(0.02), rot1
    # collapse regime (pre-fix) was 18-60 mm; residual noise-level drift of
    # the freed baseline sits at ~1.7 mm on this sequence
    assert tr1 < 3e-3, tr1
    np.testing.assert_allclose(est.cams_np["T_bs"][0], T_true[0], atol=1e-12)
