"""Diagnostic: which folded factor family makes marginalization hurt?

Runs the failing e2e scenario (tests/test_marginalization.py) with folding of
each factor family toggled off, printing ATE per variant.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hyperslam_tpu.evaluation import metrics
from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.window.estimator import SlidingWindowEstimator, WindowConfig
from tests.test_e2e import _run_estimator

cfg = synthetic.SyntheticConfig(
    duration=6.0, knot_dt=0.5, cam_rate=10.0, imu_rate=50.0,
    num_landmarks=120, pixel_noise=0.3, gyro_noise=2e-3,
    accel_noise=2e-2, gyro_bias=(0.002, -0.001, 0.003),
    accel_bias=(0.05, -0.02, 0.03), seed=5)
seq = synthetic.generate(cfg)


def run(enable, **dbg):
    window = WindowConfig(
        knot_separation=0.25, max_window=1.5, max_knots=12,
        max_landmarks=160, max_bearing=4096, max_inertial=512,
        max_prior=16, bias_separation=2.0, max_bias_knots=8,
        dtype=jnp.float64, enable_marginalization=enable)
    solver = SolverConfig(
        max_iterations=4, bearing_sqrt_info=458 / 0.3,
        gyro_sqrt_info=1 / 2e-3, accel_sqrt_info=1 / 2e-2,
        inertial_scale=1.0)
    est = SlidingWindowEstimator(window, seq.calib, imu=seq.imu_calib,
                                 solver=solver)
    for k, v in dbg.items():
        setattr(est, k, v)
    # replicate _run_estimator inline to keep the instance
    events = []
    for f in seq.frames:
        events.append((f[0], 1, ("frame", f)))
    for s in seq.imu:
        events.append((s[0], 0, ("imu", s)))
    events.sort(key=lambda e: (e[0], e[1]))
    t_first = events[0][0]
    for t, _, (kind, payload) in events:
        if kind == "frame":
            stamp, cam_idx, tids, px = payload
            if stamp - t_first < 0.35:
                T_gt = np.asarray(seq.gt_pose(stamp))
                est.add_pose_prior(stamp, T_gt)
            est.add_visual_tracks(stamp, cam_idx, tids, px)
        else:
            stamp, gyro, accel = payload
            est.add_imu(stamp, gyro, accel)
    est.optimize()
    stamps, poses = est.export_trajectory(rate_hz=20.0)
    gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
    out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                      stamps, gt[:, 4:], gt[:, :4], align=True)
    return est, out


import sys as _sys
variants = [
    ("marg-keep-freeze", dict(enable=True, _dbg_marg_freeze=True)),
    ("marg-full", dict(enable=True)),
    ("marg-no-smooth", dict(enable=True, _dbg_fold_smooth=False)),
    ("marg-no-prior", dict(enable=True, _dbg_fold_prior=False)),
    ("marg-no-inertial", dict(enable=True, _dbg_fold_inertial=False)),
    ("marg-no-visual", dict(enable=True, _dbg_fold_visual=False)),
    ("marg-only-inertial", dict(enable=True, _dbg_fold_smooth=False,
                                _dbg_fold_prior=False,
                                _dbg_fold_visual=False)),
    ("freeze-only", dict(enable=False)),
]
sel = _sys.argv[1:]
import time as _time
for name, kw in variants:
    if sel and name not in sel:
        continue
    en = kw.pop("enable")
    t0 = _time.time()
    est, out = run(en, **kw)
    print(f"{name:22s} trans_rmse={out['trans_rmse']*1000:7.2f} mm  "
          f"rot_rmse={out['rot_rmse_deg']:6.3f} deg  "
          f"active={getattr(est, '_marg_prior', None) is not None and est._marg_prior.active}"
          f"  [{_time.time()-t0:.0f}s]", flush=True)
