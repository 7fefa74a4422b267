"""Checkpoint / resume for the sliding-window estimator.

The reference has NO mid-run snapshotting (SURVEY.md §5.4 — the only
persisted artifact is the final trajectory).  Here the entire estimator
state is a handful of arrays + host bookkeeping, so checkpointing is a
single compressed ``.npz`` — designed in from the start as SURVEY
recommends: (knot values + stamps, landmark table, biases, gravity,
factor queues, track table).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from .estimator import SlidingWindowEstimator

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT_VERSION = 1


def save_checkpoint(est: "SlidingWindowEstimator", path: str) -> None:
    """Serialize the full estimator state to ``path`` (.npz)."""
    meta = {
        "version": _FORMAT_VERSION,
        "root_stamp": est.root_stamp,
        "t0": est.t0,
        "bias_t0": est.bias_t0,
        "bootstrapped": est.bootstrapped,
        "num_knots": est.num_knots,
        "solve_count": est._solve_count,
        "tracks": {str(tid): [tr.slot, tr.last_stamp, tr.first_stamp]
                   for tid, tr in est.tracks.items()},
        "free_slots": est._free_slots,
    }
    bearing = np.asarray(
        [(t, c, s) for (t, c, s, _) in est._bearing], np.float64).reshape(-1, 3)
    bearing_meas = (np.stack([b for (_, _, _, b) in est._bearing])
                    if est._bearing else np.zeros((0, 3)))
    inertial_t = np.asarray([t for (t, _) in est._inertial])
    inertial_m = (np.stack([m for (_, m) in est._inertial])
                  if est._inertial else np.zeros((0, 6)))
    prior_t = np.asarray([t for (t, _) in est._prior])
    prior_m = (np.stack([m for (_, m) in est._prior])
               if est._prior else np.zeros((0, 7)))
    arch_t = np.asarray([t for (t, _) in est._knot_archive])
    arch_k = (np.stack([k for (_, k) in est._knot_archive])
              if est._knot_archive else np.zeros((0, 7)))
    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        knots=est.knots, landmarks=est.landmarks, gravity=est.gravity,
        bias_g=est.bias_g, bias_a=est.bias_a, lm_active=est._lm_active,
        bearing=bearing, bearing_meas=bearing_meas,
        inertial_t=inertial_t, inertial_m=inertial_m,
        prior_t=prior_t, prior_m=prior_m,
        arch_t=arch_t, arch_k=arch_k,
    )


def load_checkpoint(est: "SlidingWindowEstimator", path: str) -> None:
    """Restore state saved by ``save_checkpoint`` into ``est`` (must be
    constructed with the same WindowConfig capacities)."""
    from .estimator import TrackRecord

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != "
                         f"{_FORMAT_VERSION}")
    if z["knots"].shape != est.knots.shape:
        raise ValueError("checkpoint capacities do not match WindowConfig")
    est.root_stamp = meta["root_stamp"]
    est.t0 = meta["t0"]
    est.bias_t0 = meta["bias_t0"]
    est.bootstrapped = meta["bootstrapped"]
    est.num_knots = meta["num_knots"]
    est._solve_count = meta["solve_count"]
    est.knots = np.array(z["knots"])
    est.landmarks = np.array(z["landmarks"])
    est.gravity = np.array(z["gravity"])
    est.bias_g = np.array(z["bias_g"])
    est.bias_a = np.array(z["bias_a"])
    est._lm_active = np.array(z["lm_active"], np.float32)
    est.tracks = {int(tid): TrackRecord(int(v[0]), float(v[1]), float(v[2]))
                  for tid, v in meta["tracks"].items()}
    est._free_slots = [int(s) for s in meta["free_slots"]]
    est._bearing = [
        (float(row[0]), int(row[1]), int(row[2]), z["bearing_meas"][i])
        for i, row in enumerate(z["bearing"])]
    est._inertial = [(float(t), z["inertial_m"][i])
                     for i, t in enumerate(z["inertial_t"])]
    est._prior = [(float(t), z["prior_m"][i])
                  for i, t in enumerate(z["prior_t"])]
    est._knot_archive = [(float(t), z["arch_k"][i])
                         for i, t in enumerate(z["arch_t"])]
