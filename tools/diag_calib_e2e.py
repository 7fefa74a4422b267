"""Trace cam1-extrinsics error through the self-calibration e2e scenario."""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.variables import nplie
from hyperslam_tpu.window.estimator import SlidingWindowEstimator, WindowConfig

cfg = synthetic.SyntheticConfig(
    duration=4.0, knot_dt=0.5, cam_rate=10.0, num_landmarks=150,
    pixel_noise=0.2, seed=7)
seq = synthetic.generate(cfg)

T_true = np.asarray(seq.calib.T_bs, np.float64)
d = np.asarray([2e-3, -3e-3, 4e-3, 2e-3, -3e-3, 2e-3])
T1_bad = nplie.se3_compose(T_true[1], nplie.se3_exp(d))
calib_bad = seq.calib.replace(
    T_bs=jnp.asarray(np.stack([T_true[0], T1_bad]), jnp.float64))

sig_t = float(sys.argv[1]) if len(sys.argv) > 1 else 6e-3
sig_r = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
perturb = len(sys.argv) <= 3 or sys.argv[3] != "noperturb"
if not perturb:
    calib_bad = seq.calib
    T1_bad = T_true[1]
smooth_w = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0 / 0.15
window = WindowConfig(
    knot_separation=0.25, max_window=2.0, max_knots=24,
    max_landmarks=200, max_bearing=8192, max_inertial=0, max_prior=16,
    dtype=jnp.float64, calibrate_cam_extrinsics=True,
    calib_prior_sigma_trans=sig_t, calib_prior_sigma_rot=sig_r,
    enable_smoothness=smooth_w > 0)
use_fwd = os.environ.get("DIAG_JACFWD", "0") == "1"
window.calib_warmup = os.environ.get("DIAG_WARMUP", "1") == "1"
prior_w = float(os.environ.get("DIAG_PRIOR_W", "1.0"))
solver = SolverConfig(max_iterations=5, bearing_sqrt_info=458 / 0.2,
                      smooth_sqrt_info_rot=max(smooth_w, 1e-9),
                      smooth_sqrt_info_trans=max(smooth_w, 1e-9),
                      prior_sqrt_info=prior_w, use_jacfwd=use_fwd)
est = SlidingWindowEstimator(window, calib_bad, imu=seq.imu_calib,
                             solver=solver)


def err():
    T1 = est.cams_np["T_bs"][1]
    dT = nplie.se3_compose(nplie.se3_inverse(T_true[1]), T1)
    return (np.linalg.norm(nplie.so3_log(dT[:4])),
            np.linalg.norm(dT[4:]), dT[4:])


t_first = seq.frames[0][0]
last_solves = 0
for stamp, cam_idx, tids, px in seq.frames:
    if stamp - t_first < 0.35:
        est.add_pose_prior(stamp, np.asarray(seq.gt_pose(stamp)))
    est.add_visual_tracks(stamp, cam_idx, tids, px)
    if est._solve_count != last_solves:
        last_solves = est._solve_count
        r, t, v = err()
        print(f"t={stamp - t_first:5.2f}  solves={last_solves:3d}  "
              f"rot_err={np.degrees(r):7.4f} deg  trans_err={t*1000:7.3f} mm"
              f"  dvec={np.round(v*1000,2)}"
              f"  knots={est.num_knots}  bearings={len(est._bearing)}"
              f"  priors={len(est._prior)}  overflow={est.overflow_counts}",
              flush=True)
est.optimize()
r, t, v = err()
print(f"final: rot_err={np.degrees(r):.4f} deg  trans_err={t*1000:.3f} mm"
      f"  dvec={np.round(v*1000,3)}  baseline_est={np.round(est.cams_np['T_bs'][1][4:]*1000,2)}")
