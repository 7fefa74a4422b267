"""Full-system throughput bench: PNG decode -> KLT -> estimator -> solve.

Reports frames/s for the complete pipeline at the reference's operating
envelope (stereo 752x480 @ 20 fps, IMU @ 200 Hz, separation 0.1 s, window
3 s — SURVEY.md §6) plus a per-stage wall-time breakdown, so the
"real-time?" question (reference budget: process 20 fps live) has a number.

Usage: python tools/bench_system.py [--cpu] [--frames N] [--no-imu]
Writes one JSON line; detailed breakdown on stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--no-imu", action="store_true")
    ap.add_argument("--size", type=int, nargs=2, default=(752, 480))
    ap.add_argument("--sync", action="store_true",
                    help="disable the async solve pipeline (overlap off)")
    args = ap.parse_args()
    if args.frames <= 4:
        ap.error("--frames must be > 4 (first 3 frames are warmup)")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hyperslam_tpu.frontend import render, synthetic
    from hyperslam_tpu.frontend.klt import StereoKLT, KLTConfig
    from hyperslam_tpu.solver.problem import SolverConfig
    from hyperslam_tpu.window.estimator import (SlidingWindowEstimator,
                                                WindowConfig)

    W, H = args.size
    cam_rate = 20.0
    duration = args.frames / cam_rate + 0.5
    calib = synthetic.euroc_stereo_calib(jnp.float64)
    rcfg = render.RenderConfig(
        duration=duration, cam_rate=cam_rate, imu_rate=200.0,
        image_size=(W, H), seed=1)
    t0 = time.time()
    seq = render.render_sequence(rcfg, calib)
    print(f"[bench_system] rendered {len(seq.frames)} frames in "
          f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    window = WindowConfig(knot_separation=0.1, max_window=3.0,
                          max_knots=40, max_landmarks=256, max_bearing=8192,
                          max_inertial=1024 if not args.no_imu else 0,
                          max_prior=8, dtype=jnp.float32)
    solver = SolverConfig(max_iterations=5, bearing_sqrt_info=458.0,
                          gyro_sqrt_info=5.9e1, accel_sqrt_info=3.5e1,
                          inertial_scale=1.0)
    est = SlidingWindowEstimator(window, jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), calib), solver=solver)
    est.async_solves = not args.sync
    klt = StereoKLT(KLTConfig(max_tracks=150, win=13, levels=3))

    events = [("stereo", t, a, b) for (t, a, b) in seq.frames]
    if not args.no_imu:
        events += [("imu", t, g, a) for (t, g, a) in seq.imu]
    events.sort(key=lambda e: e[1])

    stage = {"klt": 0.0, "estimator": 0.0, "imu": 0.0}
    n_frames = 0
    # warmup: first 3 frames pay the compiles
    warm_cut = 3
    t_run = None
    for e in events:
        if e[0] == "stereo":
            if n_frames == warm_cut:
                t_run = time.time()
                stage = {k: 0.0 for k in stage}
            tq = time.time()
            ids, p0, p1 = klt.process(e[2], e[3])
            stage["klt"] += time.time() - tq
            tq = time.time()
            if len(ids):
                cam_idx = np.concatenate([np.zeros(len(ids), int),
                                          np.ones(len(ids), int)])
                est.add_visual_tracks(e[1], cam_idx,
                                      np.concatenate([ids, ids]),
                                      np.concatenate([p0, p1]))
            stage["estimator"] += time.time() - tq
            n_frames += 1
        else:
            tq = time.time()
            est.add_imu(e[1], e[2], e[3])
            stage["imu"] += time.time() - tq
    est.optimize()
    wall = time.time() - t_run
    frames = n_frames - warm_cut
    fps = frames / wall
    print(f"[bench_system] stages over {frames} frames: " + ", ".join(
        f"{k}={v:.2f}s" for k, v in stage.items()) +
        f", solves={est._solve_count}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "system_frames_per_s",
        "value": round(fps, 2),
        "unit": f"frames/s full pipeline (KLT+estimator, {W}x{H} stereo"
                f"{'' if args.no_imu else ' + 200 Hz IMU'})",
        "vs_baseline": round(fps / cam_rate, 3),  # 1.0 == real-time 20 fps
        "stage_seconds": {k: round(v, 2) for k, v in stage.items()},
    }))


if __name__ == "__main__":
    main()
