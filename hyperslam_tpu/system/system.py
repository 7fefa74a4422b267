"""System assembly and run loop — the reference's L6/L7 rebuilt without ROS.

``System(yaml)`` wires sensors -> frontends -> backend exactly like the
reference factory/registry/linker
(``/root/reference/internal/hyper/system/system.cpp:10-203``), but the
communication backend is a host-side event stream (dataset reader or
synthetic generator) instead of ROS topics, and the "backend thread" is the
device-resident sliding-window solver (SURVEY.md §2.4, §5.8).

``run()`` consumes time-ordered events and dispatches:
  stereo image pair -> StereoKLT frontend -> visual tracks -> estimator
  IMU sample        -> inertial frontend (direct) -> estimator
At the end the spline is sampled and exported (reference SIGUSR1 path,
``apps/hyperslam/main.cpp:52-85``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Iterable, Optional

import numpy as np
import jax.numpy as jnp

from ..evaluation import metrics
from ..frontend.klt import StereoKLT
from ..utils.timing import StageTimer
from ..window.estimator import SlidingWindowEstimator, WindowConfig
from . import config as cfg_mod


class System:
    """One estimation system (the reference supports several in a Cluster —
    ``apps/hyperslam/main.cpp:25-36``; instantiate several Systems for that)."""

    def __init__(self, spec: cfg_mod.SystemSpec, dtype=jnp.float32,
                 window_overrides: Optional[dict] = None,
                 solver_overrides: Optional[dict] = None):
        self.spec = spec
        self.cams = cfg_mod.camera_calib_from_spec(spec, dtype)
        self.imu = cfg_mod.imu_calib_from_spec(spec, dtype)
        self.window = cfg_mod.window_config_from_spec(
            spec, dtype, **(window_overrides or {}))
        self.solver = cfg_mod.solver_config_from_spec(
            spec, **(solver_overrides or {}))
        self.estimator = SlidingWindowEstimator(
            self.window, self.cams, self.imu, self.solver)
        # Overlap the device solve with host staging + frontend dispatch
        # (the reference's frontend/backend thread split, backend.cpp:124-158)
        self.estimator.async_solves = True
        vis = [f for f in spec.frontends if f.type == "visual"]
        self.klt = StereoKLT(vis[0].klt) if vis else StereoKLT()
        self.has_imu = any(s.type == "imu" for s in spec.sensors)
        self._frames = 0
        self._imu_samples = 0
        # Observability: per-stage wall-time stats (reference has only glog
        # + BriefReport, SURVEY §5.1) + the reference's show_tracks debug
        # view (klt.cpp:103-141, settings.yaml:124) — enabled by the CLI via
        # enable_track_viz when the YAML flag is set.
        self.timer = StageTimer()
        self.show_tracks = bool(vis and vis[0].show_tracks)
        self.viz = None

    def enable_track_viz(self, out_dir: str, every: int = 5):
        from ..frontend.viz import TrackVisualizer
        self.viz = TrackVisualizer(out_dir, every=every)

    # -- frontend callbacks (reference AbstractFrontend::callback) -------- #

    def on_stereo_images(self, stamp: float, img0: np.ndarray,
                         img1: np.ndarray):
        with self.timer.stage("klt"):
            ids, p0, p1 = self.klt.process(img0, img1)
        if self.viz is not None:
            self.viz(img0, img1, p0, p1, ids, stamp=stamp)
        if len(ids) == 0:
            return
        cam_idx = np.concatenate([np.zeros(len(ids), int),
                                  np.ones(len(ids), int)])
        tids = np.concatenate([ids, ids])
        px = np.concatenate([p0, p1])
        with self.timer.stage("estimator_visual"):
            self.estimator.add_visual_tracks(stamp, cam_idx, tids, px)
        self._frames += 1

    def on_visual_tracks(self, stamp: float, cam_idx, tids, px):
        """Pre-tracked features (synthetic pipelines / external trackers).

        Rows whose camera index is not wired into this system (multi-
        backend sensor subsetting, ``config.split_spec_by_backend``) are
        dropped — the stream carries global indices."""
        cam_idx = np.asarray(cam_idx)
        n_cams = int(self.cams.T_bs.shape[0])
        if cam_idx.size and cam_idx.max() >= n_cams:
            keep = cam_idx < n_cams
            cam_idx, tids, px = cam_idx[keep], np.asarray(tids)[keep], \
                np.asarray(px)[keep]
        self.estimator.add_visual_tracks(stamp, cam_idx, tids, px)
        self._frames += 1

    def on_imu(self, stamp: float, gyro, accel):
        with self.timer.stage("estimator_imu"):
            self.estimator.add_imu(stamp, gyro, accel)
        self._imu_samples += 1

    def on_pose_prior(self, stamp: float, T_ws):
        self.estimator.add_pose_prior(stamp, T_ws)

    # -- run loop --------------------------------------------------------- #

    def accepts(self, kind: str) -> bool:
        """Whether this system's sensor set consumes an event kind (multi-
        backend subsetting: an IMU-less backend skips imu events)."""
        if kind == "imu":
            return self.has_imu
        return True

    def dispatch(self, e: tuple):
        """Route one event ("imu", t, gyro, accel) / ("stereo", t, img0,
        img1) / ("tracks", t, cam_idx, tids, px) / ("prior", t, T)."""
        kind = e[0]
        if kind == "imu":
            self.on_imu(e[1], e[2], e[3])
        elif kind == "stereo":
            self.on_stereo_images(e[1], e[2], e[3])
        elif kind == "tracks":
            self.on_visual_tracks(e[1], e[2], e[3], e[4])
        elif kind == "prior":
            self.on_pose_prior(e[1], e[2])
        else:
            raise ValueError(f"unknown event kind {kind}")

    def run(self, events: Iterable[tuple], progress_every: float = 0.0,
            should_stop=None):
        """Consume a time-ordered event stream (see :meth:`dispatch`).

        ``should_stop``: optional callable polled between events — the
        equivalent of the reference's SIGINT/SIGUSR1 shutdown path
        (``apps/hyperslam/main.cpp:48-98``)."""
        t_wall = time.time()
        n = 0
        for e in events:
            if should_stop is not None and should_stop():
                break
            self.dispatch(e)
            n += 1
            if progress_every and n % int(progress_every) == 0:
                print(f"[system] {n} events, {self._frames} frames, "
                      f"{self.estimator._solve_count} solves, "
                      f"{time.time() - t_wall:.1f}s", flush=True)
        self.estimator.optimize()

    def shutdown(self, output_dir: str, rate_hz: float = 100.0):
        """Final solve + trajectory export (reference Shutdown handler:
        ``estimation.hyper`` rows 'stamp, SE3 params' + TUM conversion)."""
        os.makedirs(output_dir, exist_ok=True)
        stamps, poses = self.estimator.export_trajectory(rate_hz)
        # per-stage wall-time stats (SURVEY §5.1 recommendation)
        import json
        with open(os.path.join(output_dir, "stage_times.json"), "w") as f:
            json.dump(self.timer.as_dict(), f, indent=2)
        hyper_path = os.path.join(output_dir, "estimation.hyper")
        with open(hyper_path, "w") as f:
            for t, p in zip(stamps, poses):
                # reference row: stamp, qx, qy, qz, qw, x, y, z
                f.write(f"{t:.9f}, {p[1]}, {p[2]}, {p[3]}, {p[0]}, "
                        f"{p[4]}, {p[5]}, {p[6]}\n")
        tum_path = os.path.join(output_dir, "estimation_tum.txt")
        metrics.save_tum(tum_path, stamps, poses[:, 4:], poses[:, :4])
        return stamps, poses


class Cluster:
    """Several Systems run together off one event stream — the reference's
    ``Cluster`` (``apps/hyperslam/main.cpp:25-45``: start all, one SIGINT
    stops all, each exports to its own directory).

    Multi-backend specs are split so each backend receives only its linked
    sensors (``config.split_spec_by_backend`` — the reference's open TODO
    at ``system.cpp:133``); events are routed by each system's sensor set
    (:meth:`System.accepts`)."""

    def __init__(self, specs, dtype=jnp.float32, **system_kw):
        if not specs:
            raise ValueError("Cluster needs at least one SystemSpec")
        self.systems = [System(s, dtype=dtype, **system_kw) for s in specs]

    @classmethod
    def from_settings(cls, path: str, dtype=jnp.float32, **system_kw):
        """All systems of a settings file, multi-backend ones split."""
        specs = []
        for spec in cfg_mod.load_system_specs(path):
            specs.extend(cfg_mod.split_spec_by_backend(spec))
        return cls(specs, dtype=dtype, **system_kw)

    def run(self, events: Iterable[tuple], progress_every: float = 0.0,
            should_stop=None):
        t_wall = time.time()
        n = 0
        for e in events:
            if should_stop is not None and should_stop():
                break
            kind = e[0]
            for s in self.systems:
                if s.accepts(kind):
                    s.dispatch(e)
            n += 1
            if progress_every and n % int(progress_every) == 0:
                print(f"[cluster] {n} events, {time.time() - t_wall:.1f}s",
                      flush=True)
        for s in self.systems:
            s.estimator.optimize()

    def shutdown(self, output_dir: str, rate_hz: float = 100.0):
        """Export every system to ``<output_dir>/<system name>/``."""
        out = {}
        for s in self.systems:
            d = os.path.join(output_dir, s.spec.name)
            out[s.spec.name] = s.shutdown(d, rate_hz)
        return out
