"""Checkpoint / resume for the sliding-window estimator.

The reference has NO mid-run snapshotting (SURVEY.md §5.4 — the only
persisted artifact is the final trajectory).  Here the entire estimator
state is a handful of arrays + host bookkeeping, so checkpointing is a
single compressed ``.npz`` — designed in from the start as SURVEY
recommends: knot values + stamps, landmark table, biases, gravity, factor
queues, track table, the marginal prior (H, g, linearization points), the
mid-interval preintegrator accumulation, refined sensor calibration, and
the overflow counters.  Resume is bit-identical for every estimator
configuration (vision-only, marginalizing, preintegrating,
self-calibrating).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from .estimator import SlidingWindowEstimator

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT_VERSION = 2


def save_checkpoint(est: "SlidingWindowEstimator", path: str) -> None:
    """Serialize the full estimator state to ``path`` (.npz)."""
    est._sync_pending()   # materialize any in-flight async solve
    meta = {
        "version": _FORMAT_VERSION,
        "root_stamp": est.root_stamp,
        "t0": est.t0,
        "bias_t0": est.bias_t0,
        "bootstrapped": est.bootstrapped,
        "num_knots": est.num_knots,
        "solve_count": est._solve_count,
        "calib_rot_freed_at": est._calib_rot_freed_at,
        "lam_warm": est._lam_warm,
        "tracks": {str(tid): [tr.slot, tr.last_stamp, tr.first_stamp]
                   for tid, tr in est.tracks.items()},
        "free_slots": est._free_slots,
        "gravity_seeded": est._gravity_seeded,
        "overflow_counts": est.overflow_counts,
        "marg_enabled": est._marg_prior is not None,
        "marg_active": bool(est._marg_prior.active)
        if est._marg_prior is not None else False,
        "marg_ever_active": est._marg_ever_active,
        "pre_exists": est._pre is not None,
    }
    arrays = {}
    bearing = np.asarray(
        [(t, c, s) for (t, c, s, _) in est._bearing], np.float64).reshape(-1, 3)
    bearing_meas = (np.stack([b for (_, _, _, b) in est._bearing])
                    if est._bearing else np.zeros((0, 3)))
    pixel = np.asarray(
        [(t, c, s) for (t, c, s, _) in est._pixel], np.float64).reshape(-1, 3)
    pixel_meas = (np.stack([b for (_, _, _, b) in est._pixel])
                  if est._pixel else np.zeros((0, 2)))
    inertial_t = np.asarray([t for (t, _) in est._inertial])
    inertial_m = (np.stack([m for (_, m) in est._inertial])
                  if est._inertial else np.zeros((0, 6)))
    prior_t = np.asarray([t for (t, _) in est._prior])
    prior_m = (np.stack([m for (_, m) in est._prior])
               if est._prior else np.zeros((0, 7)))
    arch_t = np.asarray([t for (t, _) in est._knot_archive])
    arch_k = (np.stack([k for (_, k) in est._knot_archive])
              if est._knot_archive else np.zeros((0, 7)))

    # Marginal prior (solver/marginalization.HostPrior) — without it a
    # resumed marginalizing run silently loses its history information.
    if est._marg_prior is not None:
        hp = est._marg_prior
        arrays.update(marg_H=hp.H, marg_g=hp.g, marg_x0_knots=hp.x0_knots,
                      marg_x0_bg=hp.x0_bias_g, marg_x0_ba=hp.x0_bias_a,
                      marg_x0_grav=hp.x0_gravity)

    # Closed preintegration intervals staged as factors.
    pm = est._preint_meas
    arrays.update(
        pm_t=np.asarray([[m.t_i, m.t_j] for m in pm]).reshape(-1, 2),
        pm_dtij=np.asarray([m.dt_ij for m in pm]),
        pm_dq=(np.stack([m.dq for m in pm]) if pm else np.zeros((0, 4))),
        pm_dv=(np.stack([m.dv for m in pm]) if pm else np.zeros((0, 3))),
        pm_dp=(np.stack([m.dp for m in pm]) if pm else np.zeros((0, 3))),
        pm_Jb=(np.stack([m.J_bias for m in pm])
               if pm else np.zeros((0, 5, 3, 3))),
        pm_bg0=(np.stack([m.bg0 for m in pm]) if pm else np.zeros((0, 3))),
        pm_ba0=(np.stack([m.ba0 for m in pm]) if pm else np.zeros((0, 3))),
        pm_sqi=(np.stack([m.sqrt_info for m in pm])
                if pm else np.zeros((0, 9, 9))),
        pm_n=np.asarray([m.num_samples for m in pm], np.int64),
    )

    # The running (mid-interval) preintegrator accumulation.
    if est._pre is not None:
        p = est._pre
        meta["pre_scalars"] = [p.sigma_g2, p.sigma_a2, p.t_i, p.t_last,
                               int(p.n)]
        meta["pre_prev_exists"] = p._prev is not None
        arrays.update(
            pre_bias=np.stack([p.bg0, p.ba0]),
            pre_state=np.concatenate([p.dq, p.dv, p.dp]),
            pre_cov=p.cov,
            pre_Jb=np.stack([p.JR_bg, p.Jv_bg, p.Jv_ba, p.Jp_bg, p.Jp_ba]),
            pre_prev=(np.concatenate([[p._prev[0]], p._prev[1], p._prev[2]])
                      if p._prev is not None else np.zeros(7)),
        )

    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        knots=est.knots, landmarks=est.landmarks, gravity=est.gravity,
        bias_g=est.bias_g, bias_a=est.bias_a, lm_active=est._lm_active,
        bearing=bearing, bearing_meas=bearing_meas,
        pixel=pixel, pixel_meas=pixel_meas,
        inertial_t=inertial_t, inertial_m=inertial_m,
        prior_t=prior_t, prior_m=prior_m,
        arch_t=arch_t, arch_k=arch_k,
        # Sensor calibration (refined when a calibrate_* flag freed it;
        # resuming with the YAML values instead would discard the
        # self-calibration — SURVEY §5.6: config values are initial values).
        cam_T_bs=est.cams_np["T_bs"], cam_intr=est.cams_np["intr"],
        cam_dist=est.cams_np["dist"],
        imu_T_bs=np.asarray(est.imu.T_bs, np.float64),
        imu_gi=np.asarray(est.imu.gyro_intrinsics, np.float64),
        imu_ai=np.asarray(est.imu.accel_intrinsics, np.float64),
        imu_gs=np.asarray(est.imu.g_sensitivity, np.float64),
        imu_la=np.asarray(est.imu.lever_arm, np.float64),
        **arrays,
    )


def load_checkpoint(est: "SlidingWindowEstimator", path: str) -> None:
    """Restore state saved by ``save_checkpoint`` into ``est`` (must be
    constructed with the same WindowConfig capacities)."""
    import jax.numpy as jnp

    from ..factors.preintegration import Preintegrator, PreintMeasurement
    from ..solver.problem import CameraCalib, ImuCalib
    from .estimator import TrackRecord

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != "
                         f"{_FORMAT_VERSION}")
    if z["knots"].shape != est.knots.shape:
        raise ValueError("checkpoint capacities do not match WindowConfig")
    if meta["marg_enabled"] != (est._marg_prior is not None):
        raise ValueError("checkpoint marginalization mode does not match "
                         "WindowConfig.enable_marginalization")
    est.root_stamp = meta["root_stamp"]
    est.t0 = meta["t0"]
    est.bias_t0 = meta["bias_t0"]
    est.bootstrapped = meta["bootstrapped"]
    est.num_knots = meta["num_knots"]
    est._solve_count = meta["solve_count"]
    est._calib_rot_freed_at = meta.get("calib_rot_freed_at")
    est._lam_warm = meta.get("lam_warm")
    est._gravity_seeded = meta["gravity_seeded"]
    est.overflow_counts = dict(meta["overflow_counts"])
    est._marg_ever_active = meta["marg_ever_active"]
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
    est._pixel = ([
        (float(row[0]), int(row[1]), int(row[2]), z["pixel_meas"][i])
        for i, row in enumerate(z["pixel"])] if "pixel" in z else [])
    est._inertial = [(float(t), z["inertial_m"][i])
                     for i, t in enumerate(z["inertial_t"])]
    est._prior = [(float(t), z["prior_m"][i])
                  for i, t in enumerate(z["prior_t"])]
    est._knot_archive = [(float(t), z["arch_k"][i])
                         for i, t in enumerate(z["arch_t"])]

    # calibration
    dtype = est.dtype
    est.cams = CameraCalib(
        T_bs=jnp.asarray(z["cam_T_bs"], dtype),
        intrinsics=jnp.asarray(z["cam_intr"], dtype),
        distortion=jnp.asarray(z["cam_dist"], dtype))
    est.cams_np = {"T_bs": np.array(z["cam_T_bs"]),
                   "intr": np.array(z["cam_intr"]),
                   "dist": np.array(z["cam_dist"])}
    est.imu = ImuCalib(
        T_bs=jnp.asarray(z["imu_T_bs"], dtype),
        gyro_intrinsics=jnp.asarray(z["imu_gi"], dtype),
        accel_intrinsics=jnp.asarray(z["imu_ai"], dtype),
        g_sensitivity=jnp.asarray(z["imu_gs"], dtype),
        lever_arm=jnp.asarray(z["imu_la"], dtype))

    # marginal prior
    if est._marg_prior is not None:
        hp = est._marg_prior
        hp.H = np.array(z["marg_H"])
        hp.g = np.array(z["marg_g"])
        hp.x0_knots = np.array(z["marg_x0_knots"])
        hp.x0_bias_g = np.array(z["marg_x0_bg"])
        hp.x0_bias_a = np.array(z["marg_x0_ba"])
        hp.x0_gravity = np.array(z["marg_x0_grav"])
        hp.active = meta["marg_active"]

    # staged preintegrated measurements
    est._preint_meas = [
        PreintMeasurement(
            t_i=float(z["pm_t"][i, 0]), t_j=float(z["pm_t"][i, 1]),
            dt_ij=float(z["pm_dtij"][i]), dq=np.array(z["pm_dq"][i]),
            dv=np.array(z["pm_dv"][i]), dp=np.array(z["pm_dp"][i]),
            J_bias=np.array(z["pm_Jb"][i]), bg0=np.array(z["pm_bg0"][i]),
            ba0=np.array(z["pm_ba0"][i]), sqrt_info=np.array(z["pm_sqi"][i]),
            num_samples=int(z["pm_n"][i]))
        for i in range(z["pm_t"].shape[0])]

    # running preintegrator
    if meta["pre_exists"]:
        sg2, sa2, t_i, t_last, n = meta["pre_scalars"]
        p = Preintegrator.__new__(Preintegrator)
        p.sigma_g2, p.sigma_a2 = sg2, sa2
        p.bg0 = np.array(z["pre_bias"][0])
        p.ba0 = np.array(z["pre_bias"][1])
        p.t_i, p.t_last, p.n = t_i, t_last, int(n)
        st = np.array(z["pre_state"])
        p.dq, p.dv, p.dp = st[:4], st[4:7], st[7:10]
        p.cov = np.array(z["pre_cov"])
        (p.JR_bg, p.Jv_bg, p.Jv_ba, p.Jp_bg, p.Jp_ba) = [
            np.array(z["pre_Jb"][i]) for i in range(5)]
        if meta["pre_prev_exists"]:
            pv = np.array(z["pre_prev"])
            p._prev = (float(pv[0]), pv[1:4], pv[4:7])
        else:
            p._prev = None
        est._pre = p
    else:
        est._pre = None
