"""evo-style evaluation artifacts: plots + results archives.

The reference scores every sequence with ``evo_ape``/``evo_rpe`` and keeps
``--save_plot <name>`` PNGs and ``--save_results <name>_results.zip``
archives per metric (``/root/reference/evaluation/run.py:31-57``).  This
module reproduces those artifacts without evo: for each of
``ape_rotation / ape_translation / rpe_rotation / rpe_translation`` it
writes

    <out>/<name>.png          xy trajectory (APE only) + error-over-time
    <out>/<name>_results.zip  stats.json + error_array.npy + stamps.npy

Chart conventions: two series at most (estimate vs. reference) in a fixed
colorblind-safe blue/gray pair, neutral-ink text, recessive grid, one axis
per panel.
"""

from __future__ import annotations

import io
import json
import os
import zipfile

import numpy as np

from . import metrics

__all__ = ["save_evo_artifacts"]

# fixed series colors: estimate = blue, reference = gray (identity never
# re-assigned; safe for all CVD types as a pair)
_C_EST = "#2563eb"
_C_REF = "#6b7280"
_C_INK = "#374151"


def _style(ax, title, xlabel, ylabel):
    ax.set_title(title, color=_C_INK, fontsize=11)
    ax.set_xlabel(xlabel, color=_C_INK, fontsize=9)
    ax.set_ylabel(ylabel, color=_C_INK, fontsize=9)
    ax.tick_params(colors=_C_INK, labelsize=8)
    ax.grid(True, color="#e5e7eb", linewidth=0.6)
    for s in ax.spines.values():
        s.set_color("#d1d5db")


def _save_zip(path, stats, stamps, errors):
    """evo ``--save_results`` analogue: one zip with the stats and the raw
    per-pose error arrays."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("stats.json", json.dumps(stats, indent=2))
        for name, arr in (("error_array.npy", errors),
                          ("stamps.npy", stamps)):
            buf = io.BytesIO()
            np.save(buf, np.asarray(arr))
            z.writestr(name, buf.getvalue())


def _plot(path, stamps, errors, unit, title, rmse, traj=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncols = 2 if traj is not None else 1
    fig, axes = plt.subplots(1, ncols, figsize=(5.0 * ncols, 4.0))
    axes = np.atleast_1d(axes)
    if traj is not None:
        est, ref = traj
        ax = axes[0]
        ax.plot(ref[:, 0], ref[:, 1], color=_C_REF, linewidth=1.6,
                label="reference")
        ax.plot(est[:, 0], est[:, 1], color=_C_EST, linewidth=1.6,
                label="estimate")
        ax.set_aspect("equal", adjustable="datalim")
        _style(ax, "trajectory (xy, aligned)", "x [m]", "y [m]")
        ax.legend(frameon=False, fontsize=8, labelcolor=_C_INK)
    ax = axes[-1]
    t = np.asarray(stamps) - np.asarray(stamps)[0]
    ax.plot(t, errors, color=_C_EST, linewidth=1.6, label="error")
    ax.axhline(rmse, color=_C_REF, linewidth=1.2, linestyle="--",
               label=f"rmse = {rmse:.4g} {unit}")
    _style(ax, title, "t [s]", f"error [{unit}]")
    ax.legend(frameon=False, fontsize=8, labelcolor=_C_INK)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_evo_artifacts(out_dir, est_stamps, est_pos, est_quat,
                       gt_stamps, gt_pos, gt_quat, align=True,
                       rpe_delta=1):
    """Write the four evo metric artifacts; returns {metric: stats}."""
    os.makedirs(out_dir, exist_ok=True)
    ape = metrics.ape(est_stamps, est_pos, est_quat, gt_stamps, gt_pos,
                      gt_quat, align=align, return_errors=True)
    rpe = metrics.rpe(est_stamps, est_pos, est_quat, gt_stamps, gt_pos,
                      gt_quat, delta=rpe_delta, return_errors=True)
    results = {}
    for name, res, field, unit, rmse_key in (
            ("ape_translation", ape, "trans_errors", "m", "trans_rmse"),
            ("ape_rotation", ape, "rot_errors_deg", "deg", "rot_rmse_deg"),
            ("rpe_translation", rpe, "trans_errors", "m", "trans_rmse"),
            ("rpe_rotation", rpe, "rot_errors_deg", "deg", "rot_rmse_deg")):
        arrays = res.get("arrays")
        stats = {k: v for k, v in res.items() if k != "arrays"}
        results[name] = stats
        if arrays is None:      # too few matched poses: stats only
            with open(os.path.join(out_dir, f"{name}_results.json"),
                      "w") as f:
                json.dump(stats, f, indent=2)
            continue
        traj = None
        if name.startswith("ape"):
            traj = (arrays["est_pos_aligned"], arrays["ref_pos"])
        _plot(os.path.join(out_dir, f"{name}.png"), arrays["stamps"],
              arrays[field], unit, name.replace("_", " "),
              stats[rmse_key], traj=traj)
        _save_zip(os.path.join(out_dir, f"{name}_results.zip"), stats,
                  arrays["stamps"], arrays[field])
    return results
