"""EuRoC-trajectory-scale accuracy suite (VERDICT r4 item 4).

The reference evaluates whole EuRoC sequences (minutes) against the shipped
ground-truth files with evo APE/RPE (`/root/reference/evaluation/run.py:12-170`,
`resources/datasets/euroc/sequences/*.txt`).  No rosbags/imagery exist in
this environment, so this suite reconstructs the reference protocol from
the same ground truth: fit a GT spline to each shipped trajectory
(`synthetic.knots_from_tum`), generate stereo feature tracks (+ IMU) from
it at the reference sensor envelope, run the FULL estimator over the FULL
sequence length, and score the exported trajectory with the evo protocol
(APE/RPE after Umeyama alignment, `evaluation/metrics.py`).

Usage:
  python tools/euroc_suite.py [--cpu] [--duration S] [--imu]
      [--sequences MH_02_easy,V1_01_easy] [--out DIR]
      [--cam-rate 20] [--pixel-noise 0.5]

Writes per-sequence TUM trajectories + results.json (one APE/RPE row per
sequence) to --out, and prints a markdown table for BASELINE.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GT_DIR = "/root/reference/resources/datasets/euroc/sequences"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--duration", type=float, default=None,
                   help="cap sequence duration in seconds (default: full)")
    p.add_argument("--imu", action="store_true",
                   help="stereo-inertial (direct IMU factors) instead of "
                        "stereo-only")
    p.add_argument("--sequences", default=None,
                   help="comma-separated sequence names (default: all)")
    p.add_argument("--out", default="/tmp/euroc_suite")
    p.add_argument("--cam-rate", type=float, default=20.0)
    p.add_argument("--imu-rate", type=float, default=200.0)
    p.add_argument("--pixel-noise", type=float, default=0.5)
    p.add_argument("--knot-separation", type=float, default=0.1)
    p.add_argument("--gt-knot-dt", type=float, default=0.1)
    p.add_argument("--f64", action="store_true",
                   help="f64 working dtype (CPU tests); default f32 (TPU)")
    p.add_argument("--max-landmarks", type=int, default=512)
    p.add_argument("--max-bearing", type=int, default=8192)
    p.add_argument("--landmarks-per-s", type=float, default=25.0)
    args = p.parse_args(argv)

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

    from hyperslam_tpu.evaluation import metrics
    from hyperslam_tpu.frontend import synthetic
    from hyperslam_tpu.solver.problem import SolverConfig
    from hyperslam_tpu.window.estimator import (SlidingWindowEstimator,
                                                WindowConfig)

    seq_names = (args.sequences.split(",") if args.sequences else
                 sorted(f[:-4] for f in os.listdir(GT_DIR)
                        if f.endswith(".txt")))
    os.makedirs(args.out, exist_ok=True)
    results = []

    for name in seq_names:
        gt_path = os.path.join(GT_DIR, name + ".txt")
        t_start = time.time()
        knots, t0, kdt = synthetic.knots_from_tum(
            gt_path, args.gt_knot_dt, max_duration=args.duration)
        n_knots = int(knots.shape[0])
        full_dur = (n_knots - 3) * kdt
        # landmark density scales with duration (25 world points per second
        # of trajectory keeps ~100-150 stereo-visible tracks per frame)
        n_lms = max(300, int(args.landmarks_per_s * full_dur))
        cfg = synthetic.SyntheticConfig(
            duration=full_dur, cam_rate=args.cam_rate,
            imu_rate=args.imu_rate if args.imu else 1e-9,
            num_landmarks=n_lms, pixel_noise=args.pixel_noise,
            gyro_noise=1.7e-3, accel_noise=2e-2, seed=11)
        # generate on the CPU backend: the block outputs are tens of MB
        # per chunk, which would ride the device tunnel for nothing (the
        # estimator only ever sees the host-side measurement lists)
        try:
            gen_dev = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            gen_dev = jax.devices()[0]
        with jax.default_device(gen_dev):
            seq = synthetic.generate(cfg, gt_knots=knots, gt_dt=kdt)
        gen_s = time.time() - t_start

        window = WindowConfig(
            knot_separation=args.knot_separation, max_window=3.0,
            max_knots=40, max_landmarks=args.max_landmarks,
            max_bearing=args.max_bearing,
            max_inertial=1024 if args.imu else 0, max_prior=16,
            bias_separation=2.0, max_bias_knots=8,
            dtype=jnp.float64 if args.f64 else jnp.float32)
        solver = SolverConfig(
            max_iterations=5,
            bearing_sqrt_info=458.0 / max(args.pixel_noise, 1e-3),
            gyro_sqrt_info=1 / 1.7e-3, accel_sqrt_info=1 / 2e-2,
            inertial_scale=1.0, prior_sqrt_info=500.0)
        est = SlidingWindowEstimator(window, seq.calib, imu=seq.imu_calib,
                                     solver=solver)

        events = [(f[0], 1, ("frame", f)) for f in seq.frames]
        if args.imu:
            events += [(s[0], 2, ("imu", s)) for s in seq.imu]
        events.sort(key=lambda e: (e[0], e[1]))
        t_first = events[0][0]
        if args.imu:
            # bootstrap from the GT pose BEFORE any IMU sample: gravity
            # seeding needs the initial attitude (EuRoC worlds are not
            # body-aligned)
            est.add_pose_prior(t_first, np.asarray(seq.gt_pose(t_first)))
        n_frames = 0
        for t, _, (kind, payload) in events:
            if kind == "frame":
                stamp, cam_idx, tids, px = payload
                if stamp - t_first < 0.5:
                    est.add_pose_prior(stamp, np.asarray(seq.gt_pose(stamp)))
                est.add_visual_tracks(stamp, cam_idx, tids, px)
                n_frames += 1
            else:
                stamp, gyro, accel = payload
                est.add_imu(stamp, gyro, accel)
        est.optimize()
        run_s = time.time() - t_start - gen_s

        stamps, poses = est.export_trajectory(rate_hz=100.0)
        gt = np.asarray(seq.gt_pose(stamps - est.root_stamp))
        ape = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                          stamps, gt[:, 4:], gt[:, :4], align=True)
        rpe = metrics.rpe(stamps, poses[:, 4:], poses[:, :4],
                          stamps, gt[:, 4:], gt[:, :4])
        metrics.save_tum(os.path.join(args.out, name + "_est.txt"),
                         stamps, poses[:, 4:], poses[:, :4])
        row = {
            "sequence": name,
            "duration_s": round(full_dur, 1),
            "frames": n_frames,
            "solves": est._solve_count,
            "mode": "stereo-inertial" if args.imu else "stereo",
            "ape_trans_rmse_m": ape["trans_rmse"],
            "ape_rot_rmse_deg": ape["rot_rmse_deg"],
            "rpe_trans_rmse_m": rpe["trans_rmse"],
            "rpe_rot_rmse_deg": rpe["rot_rmse_deg"],
            "gen_s": round(gen_s, 1),
            "run_s": round(run_s, 1),
            "fps": round(n_frames / run_s, 1) if run_s > 0 else None,
            "overflow": est.overflow_counts,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    # markdown table for BASELINE.md
    print("\n| sequence | dur [s] | APE trans RMSE [m] | APE rot RMSE [deg]"
          " | RPE trans [m] | RPE rot [deg] | run fps |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['sequence']} | {r['duration_s']} |"
              f" {r['ape_trans_rmse_m']:.4f} | {r['ape_rot_rmse_deg']:.3f} |"
              f" {r['rpe_trans_rmse_m']:.4f} | {r['rpe_rot_rmse_deg']:.3f} |"
              f" {r['fps']} |")


if __name__ == "__main__":
    main()
