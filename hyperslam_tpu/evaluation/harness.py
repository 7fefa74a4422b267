"""Dataset evaluation harness — the reference's ``evaluation/run.py``
rebuilt without ROS/evo (SURVEY.md §2.1 "Evaluation harness", §5.5).

Discovers sequences, runs the full system on each, converts the exported
trajectory, scores APE/RPE (rotation deg + translation m, Umeyama-aligned —
the evo protocol), and writes a results tree:

    <out>/<dataset>/<sequence>/
        estimation.hyper        reference row format
        estimation_tum.txt      TUM rows
        results.json            APE/RPE numbers + run stats
        ape_*/rpe_*.png + _results.zip   evo --save_plot/--save_results
                                analogues (plots.save_evo_artifacts)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from . import metrics

__all__ = ["Sequence", "Dataset", "evaluate_synthetic_suite"]


@dataclasses.dataclass
class Sequence:
    """One runnable sequence: an event source + ground truth."""
    name: str
    events: Callable[[], object]        # () -> iterable of system events
    groundtruth: Callable[[], tuple]    # () -> (stamps, pos, quat wxyz)
    save_plots: bool = True             # evo --save_plot/--save_results

    def run(self, system, out_dir: str) -> Dict:
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        system.run(self.events())
        stamps, poses = system.shutdown(out_dir)
        wall = time.time() - t0
        gs, gp, gq = self.groundtruth()
        ape = metrics.ape(stamps, poses[:, 4:], poses[:, :4], gs, gp, gq,
                          align=True)
        rpe = metrics.rpe(stamps, poses[:, 4:], poses[:, :4], gs, gp, gq)
        if self.save_plots:
            from . import plots
            plots.save_evo_artifacts(out_dir, stamps, poses[:, 4:],
                                     poses[:, :4], gs, gp, gq)
        result = {
            "sequence": self.name,
            "ape": ape,
            "rpe": rpe,
            "wall_s": wall,
            "poses": int(len(stamps)),
            "solves": system.estimator._solve_count,
        }
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump(result, f, indent=2)
        return result


@dataclasses.dataclass
class Dataset:
    name: str
    sequences: List[Sequence]

    def run(self, make_system, out_root: str) -> List[Dict]:
        """make_system: () -> fresh System per sequence."""
        results = []
        for seq in self.sequences:
            out_dir = os.path.join(out_root, self.name, seq.name)
            results.append(seq.run(make_system(), out_dir))
        with open(os.path.join(out_root, self.name, "summary.json"),
                  "w") as f:
            json.dump(results, f, indent=2)
        return results


def evaluate_synthetic_suite(out_root: str, durations=(5.0, 10.0),
                             seeds=(0, 1), use_imu=False, dtype=None,
                             window_overrides: Optional[dict] = None):
    """Built-in regression suite over synthetic sequences (the CI stand-in
    for EuRoC rosbags, which are not shipped in this environment)."""
    import jax.numpy as jnp
    from ..frontend import synthetic
    from ..system.config import load_system_spec
    from ..system.system import System

    dtype = dtype or jnp.float32
    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "configs",
        "euroc_stereo_inertial.yaml")
    spec = load_system_spec(cfg_path)

    sequences = []
    for dur in durations:
        for seed in seeds:
            cfg = synthetic.SyntheticConfig(duration=dur, seed=seed)
            seq_data = synthetic.generate(cfg)

            def make_events(sd=seq_data, imu=use_imu):
                def events():
                    ev = [("tracks", t, c, i, p)
                          for (t, c, i, p) in sd.frames]
                    if imu:
                        ev += [("imu", t, g, a) for (t, g, a) in sd.imu]
                    ev.sort(key=lambda e: e[1])
                    return ev
                return events

            def make_gt(sd=seq_data):
                def gt():
                    ts = np.asarray([f[0] for f in sd.frames])
                    poses = sd.gt_pose(ts)
                    return ts, poses[:, 4:], poses[:, :4]
                return gt

            sequences.append(Sequence(
                name=f"synth_d{dur:g}_s{seed}",
                events=make_events(), groundtruth=make_gt()))

    ds = Dataset("synthetic", sequences)
    return ds.run(
        lambda: System(spec, dtype=dtype,
                       window_overrides=window_overrides), out_root)
