"""Find the teleporting solve in a diverging EuRoC run (MH_03 at ~t=105).

Logs per-solve: stamp, initial/final cost, accepted pattern, and the max
knot-translation change — the catastrophe signature is one solve whose
accepted step moves knots by meters.
"""
import os
import sys
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
suffix = "" if "--cpu" in sys.argv else "_tpu"
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache" + suffix))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.window.estimator import SlidingWindowEstimator, WindowConfig

SEQ = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "MH_03_medium"
DUR = float(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else 115.0

knots, t0, kdt = synthetic.knots_from_tum(
    f"/root/reference/resources/datasets/euroc/sequences/{SEQ}.txt",
    0.1, max_duration=DUR)
full_dur = (int(knots.shape[0]) - 3) * kdt
USE_IMU = os.environ.get("DIAG_IMU", "0") == "1"
cfg = synthetic.SyntheticConfig(
    duration=full_dur, cam_rate=20.0, imu_rate=200.0 if USE_IMU else 1e-9,
    num_landmarks=max(300, int(40 * full_dur)), pixel_noise=0.5, seed=11)
seq = synthetic.generate(cfg, gt_knots=knots, gt_dt=kdt)

window = WindowConfig(
    knot_separation=0.1, max_window=3.0, max_knots=40,
    max_landmarks=1024, max_bearing=12288,
    max_inertial=1024 if USE_IMU else 0, max_prior=16,
    bias_separation=2.0, max_bias_knots=8,
    dtype=jnp.float32,
    extrapolation=os.environ.get("DIAG_EXTRAP", "constant_position"),
    warm_lambda=os.environ.get("DIAG_WARMLAM", "0") == "1")
solver = SolverConfig(
    max_iterations=int(os.environ.get("DIAG_ITERS", "5")),
    bearing_sqrt_info=458 / 0.5, prior_sqrt_info=500.0,
    gyro_sqrt_info=1 / 1.7e-3, accel_sqrt_info=1 / 2e-2,
    inertial_scale=1.0)
est = SlidingWindowEstimator(window, seq.calib, imu=seq.imu_calib,
                             solver=solver)

orig_opt = est.optimize


def wrapped(async_dispatch=False):
    pre = est.knots.copy()
    n_pre = est.num_knots
    stats = orig_opt(async_dispatch=False)
    if stats is None:
        return None
    dmax = float(np.abs(est.knots[:n_pre, 4:] - pre[:n_pre, 4:]).max())
    t = est.t0 + est.num_knots * est.w.knot_separation
    flag = "  <<<< JUMP" if dmax > 1.0 else ""
    if dmax > 0.25 or t > 105.0 or not np.asarray(stats.accepted).any():
        print(f"solve {est._solve_count:4d} t~{t:7.2f} cost "
              f"{float(stats.initial_cost):12.4e} -> "
              f"{float(stats.final_cost):12.4e} acc "
              f"{''.join('1' if a else '0' for a in np.asarray(stats.accepted))} "
              f"dknot {dmax:10.3f} bear {len(est._bearing)} "
              f"tracks {len(est.tracks)}"
              f" g={np.round(est.gravity, 2)}"
              f" |bg|={np.linalg.norm(est.bias_g, axis=1).max():.3f}"
              f" |ba|={np.linalg.norm(est.bias_a, axis=1).max():.2f}{flag}",
              flush=True)
    return stats


est.optimize = wrapped
events = [(f[0], 1, ("frame", f)) for f in seq.frames]
if USE_IMU:
    events += [(s_[0], 2, ("imu", s_)) for s_ in seq.imu]
events.sort(key=lambda e: (e[0], e[1]))
t_first = events[0][0]
if USE_IMU:
    est.add_pose_prior(t_first, np.asarray(seq.gt_pose(t_first)))
for t_, _, (kind, payload) in events:
    if kind == "frame":
        stamp, cam_idx, tids, px = payload
        if stamp - t_first < 0.5:
            est.add_pose_prior(stamp, np.asarray(seq.gt_pose(stamp)))
        est.add_visual_tracks(stamp, cam_idx, tids, px)
    else:
        stamp, gyro, accel = payload
        est.add_imu(stamp, gyro, accel)
est.optimize()
print("done; solves", est._solve_count, "overflow", est.overflow_counts)
