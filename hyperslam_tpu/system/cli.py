"""CLI entry point: ``python -m hyperslam_tpu <settings.yaml> <output_dir>``.

Mirrors the reference binary's interface (``HyperSLAM <settings.yaml>
<output_dir>``, ``/root/reference/apps/hyperslam/main.cpp:106-163``) with a
``--dataset`` flag pointing at a EuRoC sequence folder (replacing rosbag
playback) or ``--synthetic`` for the built-in simulator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="hyperslam_tpu",
        description="TPU-native continuous-time SLAM (HyperSLAM-capability)")
    p.add_argument("settings", help="settings.yaml (reference schema)")
    p.add_argument("output", help="output directory")
    p.add_argument("--dataset", default=None,
                   help="dataset root: EuRoC (contains mav0/) or KITTI "
                        "odometry (contains times.txt + image_0/)")
    p.add_argument("--format", default="auto",
                   choices=["auto", "euroc", "kitti"],
                   help="dataset layout (auto-sniffed by default)")
    p.add_argument("--synthetic", action="store_true",
                   help="run on the built-in synthetic sequence")
    p.add_argument("--duration", type=float, default=None,
                   help="max seconds of data to process")
    p.add_argument("--no-imu", action="store_true")
    p.add_argument("--f64", action="store_true",
                   help="use float64 (CPU debugging)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (use jax.config, not env)")
    p.add_argument("--groundtruth", default=None,
                   help="TUM ground-truth file for scoring")
    args = p.parse_args(argv)
    if not args.synthetic and not args.dataset:
        p.error("provide --dataset or --synthetic")
    if not os.path.isfile(args.settings):
        p.error(f"settings file not found: {args.settings}")

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float64 if args.f64 else jnp.float32
    # x64 is always enabled so the solver's normal equations accumulate in
    # f64 (solver/ba.py _solve_dtype); the working dtype stays f32 unless
    # --f64 is given.
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache (compiles dominate on cold starts).
    # Platform-suffixed: the axon/TPU plugin compiles on a REMOTE machine
    # and may write XLA:CPU AOT artifacts for a different CPU into the
    # cache; loading those on this host risks SIGILL / wrong code
    # (cpu_aot_loader machine-feature mismatch warnings).  Keeping one
    # cache per platform makes cross-pollution impossible.
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    suffix = "" if args.cpu else "_tpu"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache" + suffix))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .config import (load_system_spec, load_system_specs,
                         split_spec_by_backend)
    from .system import Cluster, System
    from ..evaluation import metrics

    # A settings file may define several systems (reference Cluster,
    # main.cpp:25-45) and/or several backends per system (each split to its
    # own System with only its linked sensors, system.cpp:133 TODO).
    specs = [sub for s in load_system_specs(args.settings)
             for sub in split_spec_by_backend(s)]
    cluster = Cluster(specs, dtype=dtype) if len(specs) > 1 else None
    system = cluster.systems[0] if cluster else System(specs[0], dtype=dtype)
    if system.show_tracks:
        # the reference's show_tracks debug view (klt.cpp:103-141), headless:
        # one annotated PNG per N frames under <output>/tracks/
        system.enable_track_viz(os.path.join(args.output, "tracks"))

    if args.synthetic:
        from ..frontend import synthetic
        cfg = synthetic.SyntheticConfig(duration=args.duration or 10.0)
        seq = synthetic.generate(cfg, calib=system.cams)
        events = []
        for (t, cam_idx, tids, px) in seq.frames:
            events.append(("tracks", t, cam_idx, tids, px))
        if not args.no_imu:
            for (t, g, a) in seq.imu:
                events.append(("imu", t, g, a))
        events.sort(key=lambda e: e[1])
    elif args.dataset:
        from ..frontend import kitti as kitti_mod
        from ..frontend import native_io
        fmt = args.format
        if fmt == "auto":
            fmt = "kitti" if kitti_mod.looks_like_kitti(args.dataset) \
                else "euroc"
        if fmt == "kitti":
            ds = kitti_mod.KittiSequence(args.dataset)
            # per-sequence rectified calibration overrides the setup YAML
            # (the YAML carries seq-00 values; calib.txt is authoritative)
            if os.path.isfile(os.path.join(args.dataset, "calib.txt")):
                system.cams = ds.calib(dtype)
                system.estimator.cams = system.cams
                system.estimator.cams_np = {
                    "T_bs": np.asarray(system.cams.T_bs, np.float64),
                    "intr": np.asarray(system.cams.intrinsics, np.float64),
                    "dist": np.asarray(system.cams.distortion, np.float64),
                }
            events = ds.events(max_duration=args.duration)
        elif native_io.available():
            # native C++ runtime: threaded PNG prefetch + stream merge
            events = native_io.NativeEurocStream(
                args.dataset, use_imu=not args.no_imu,
                max_duration=args.duration or 0.0)
        else:
            from ..frontend.euroc import EurocSequence
            ds = EurocSequence(args.dataset)
            def event_stream():
                for e in ds.events(use_imu=not args.no_imu,
                                   max_duration=args.duration):
                    if e[0] == "stereo":
                        _, t, n0, n1 = e
                        yield ("stereo", t, ds.read_image(0, n0),
                               ds.read_image(1, n1))
                    else:
                        yield e
            events = event_stream()

    # SIGINT / SIGUSR1 stop-and-export, mirroring the reference's handlers
    # (apps/hyperslam/main.cpp:142-153): both trigger a clean shutdown with
    # trajectory export; SIGUSR1 is what evaluation scripts send.
    import signal
    stop = {"flag": False}

    def _handler(signum, frame):
        stop["flag"] = True

    signal.signal(signal.SIGINT, _handler)
    signal.signal(signal.SIGUSR1, _handler)

    if cluster is not None:
        cluster.run(events, progress_every=500,
                    should_stop=lambda: stop["flag"])
        results = cluster.shutdown(args.output)
        for name, (st, _) in results.items():
            print(f"exported {len(st)} poses to {args.output}/{name}")
        stamps, poses = results[system.spec.name]
    else:
        system.run(events, progress_every=500,
                   should_stop=lambda: stop["flag"])
        stamps, poses = system.shutdown(args.output)
        print(f"exported {len(stamps)} poses to {args.output}")

    if args.synthetic:
        # score directly against the generating trajectory
        gt = np.asarray(seq.gt_pose(stamps - system.estimator.root_stamp))
        out = metrics.ape(stamps, poses[:, 4:], poses[:, :4],
                          stamps, gt[:, 4:], gt[:, :4], align=True)
        print(json.dumps({"ape_vs_synthetic_gt": out}, indent=2))

    if args.groundtruth:
        gs, gp, gq = metrics.load_tum(args.groundtruth)
        out = metrics.ape(stamps, poses[:, 4:], poses[:, :4], gs, gp, gq,
                          align=True)
        print(json.dumps({"ape": out}, indent=2))
        with open(os.path.join(args.output, "ape.json"), "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
