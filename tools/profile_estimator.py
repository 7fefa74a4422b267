"""Instrument the estimator's per-solve host/device phases on a short
EuRoC-derived run to find the full-pipeline throughput bottleneck
(VERDICT r4 item 5: reference live envelope is 20 fps stereo,
settings.yaml:30).

Phases timed per solve:
  build   - _build_factors host staging (python lists -> device arrays)
  masks   - _build_masks
  dispatch- ba.optimize call (trace/dispatch; device runs async)
  pull    - _pull (blocks on device results)
Everything else (KLT/bearing conversion/triangulation/event loop) is
"other".
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--async", dest="async_solves", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    suffix = "" if args.cpu else "_tpu"
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache" + suffix))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from hyperslam_tpu.frontend import synthetic
    from hyperslam_tpu.solver import ba
    from hyperslam_tpu.solver.problem import SolverConfig
    from hyperslam_tpu.window import estimator as est_mod
    from hyperslam_tpu.window.estimator import (SlidingWindowEstimator,
                                                WindowConfig)

    knots, t0, kdt = synthetic.knots_from_tum(
        "/root/reference/resources/datasets/euroc/sequences/MH_02_easy.txt",
        0.1, max_duration=args.duration)
    full_dur = (int(knots.shape[0]) - 3) * kdt
    cfg = synthetic.SyntheticConfig(
        duration=full_dur, cam_rate=20.0, imu_rate=1e-9,
        num_landmarks=max(300, int(25 * full_dur)), pixel_noise=0.5, seed=11)
    seq = synthetic.generate(cfg, gt_knots=knots, gt_dt=kdt)

    window = WindowConfig(
        knot_separation=0.1, max_window=3.0, max_knots=40,
        max_landmarks=512, max_bearing=8192, max_inertial=0, max_prior=16,
        dtype=jnp.float32)
    solver = SolverConfig(max_iterations=5, bearing_sqrt_info=458 / 0.5,
                          prior_sqrt_info=500.0)
    est = SlidingWindowEstimator(window, seq.calib, imu=seq.imu_calib,
                                 solver=solver)
    est.async_solves = args.async_solves

    acc = {"build": 0.0, "masks": 0.0, "dispatch": 0.0, "pull": 0.0,
           "n": 0}

    orig_build = est._build_factors
    orig_masks = est._build_masks
    orig_pull = est._pull

    def t_build(*a, **k):
        t = time.perf_counter()
        r = orig_build(*a, **k)
        acc["build"] += time.perf_counter() - t
        return r

    def t_masks(*a, **k):
        t = time.perf_counter()
        r = orig_masks(*a, **k)
        acc["masks"] += time.perf_counter() - t
        return r

    def t_pull(*a, **k):
        t = time.perf_counter()
        r = orig_pull(*a, **k)
        acc["pull"] += time.perf_counter() - t
        return r

    est._build_factors = t_build
    est._build_masks = t_masks
    est._pull = t_pull

    orig_opt = ba.optimize

    t_first = seq.frames[0][0]
    warm_until = t_first + 4.0   # first solves pay (remote) compiles
    wall0 = None
    n_frames = 0
    n_warm_solves = 0
    for stamp, cam_idx, tids, px in seq.frames:
        if wall0 is None and stamp >= warm_until:
            # steady state begins: reset accumulators
            for k in acc:
                acc[k] = 0.0
            n_warm_solves = est._solve_count
            wall0 = time.perf_counter()
            n_frames = 0
        if stamp - t_first < 0.5:
            est.add_pose_prior(stamp, np.asarray(seq.gt_pose(stamp)))
        est.add_visual_tracks(stamp, cam_idx, tids, px)
        n_frames += 1
    est.optimize()
    est._sync_pending()
    wall = time.perf_counter() - wall0
    n = est._solve_count - n_warm_solves
    other = wall - acc["build"] - acc["masks"] - acc["pull"]
    print(f"steady-state: frames {n_frames}  solves {n}  wall {wall:.1f}s "
          f"-> {n_frames / wall:.1f} fps")
    print(f"per-solve: build {1e3 * acc['build'] / n:.1f} ms   "
          f"masks {1e3 * acc['masks'] / n:.1f} ms   "
          f"pull(includes device) {1e3 * acc['pull'] / n:.1f} ms   "
          f"other-total {other:.1f}s ({1e3 * other / n:.1f} ms/solve)")
    from hyperslam_tpu.evaluation import metrics
    stamps, poses = est.export_trajectory(rate_hz=50.0)
    gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
    out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                      stamps, gt[:, 4:], gt[:, :4], align=True)
    print(f"APE: trans_rmse {out['trans_rmse']*1e3:.2f} mm  "
          f"rot_rmse {out['rot_rmse_deg']:.3f} deg")


if __name__ == "__main__":
    main()
