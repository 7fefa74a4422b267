"""Trajectory evaluation: APE / RPE with Umeyama alignment, TUM format IO.

Self-contained replacement for the reference's external ``evo`` dependency
(``/root/reference/evaluation/run.py:31-57`` shells out to ``evo_ape`` /
``evo_rpe`` with ``-a`` alignment on TUM files).  Metrics follow evo's
definitions: APE = RMSE of absolute pose error after SE3 (or Sim3) Umeyama
alignment; RPE = RMSE of relative pose error over consecutive pairs at a
fixed delta.  Rotation errors in degrees, translation in meters.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "umeyama_alignment", "associate", "ape", "rpe",
    "load_tum", "save_tum", "quat_to_matrix_np",
]


def quat_to_matrix_np(q):
    """(..., 4) wxyz -> (..., 3, 3), numpy."""
    w, x, y, z = np.moveaxis(q, -1, 0)
    m = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def umeyama_alignment(src, dst, with_scale=False):
    """Least-squares similarity transform aligning src -> dst.

    src, dst: (N, 3).  Returns (s, R (3,3), t (3,)) with
    ``dst ~ s * R @ src + t``.  Umeyama 1991, as used by evo's ``-a``/
    ``-as`` alignment.
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs * xs).sum() / len(src)
        s = float(np.trace(np.diag(d) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def associate(stamps_a, stamps_b, max_diff=0.02):
    """Match nearest stamps between two trajectories.

    Returns (idx_a, idx_b) integer arrays of matched pairs."""
    ia, ib = [], []
    j = 0
    order = np.argsort(stamps_b)
    sb = stamps_b[order]
    for i, t in enumerate(stamps_a):
        j = np.searchsorted(sb, t)
        best, bestd = -1, max_diff
        for jj in (j - 1, j):
            if 0 <= jj < len(sb) and abs(sb[jj] - t) <= bestd:
                best, bestd = jj, abs(sb[jj] - t)
        if best >= 0:
            ia.append(i)
            ib.append(order[best])
    return np.asarray(ia, int), np.asarray(ib, int)


def ape(est_stamps, est_pos, est_quat, gt_stamps, gt_pos, gt_quat,
        align=True, with_scale=False, max_diff=0.02, return_errors=False):
    """Absolute pose error after association (+ optional Umeyama alignment).

    Returns dict with translation/rotation RMSE/mean/median/max and the
    number of matched poses.  quats are wxyz.  ``return_errors`` adds the
    per-pose arrays (stamps, trans/rot errors, aligned + reference
    positions) for plotting — the evo ``--save_plot/--save_results``
    payload (reference ``evaluation/run.py:31-57``)."""
    ia, ib = associate(est_stamps, gt_stamps, max_diff)
    if len(ia) < 3:
        return {"n": int(len(ia)), "trans_rmse": np.inf, "rot_rmse_deg": np.inf}
    pe, pg = est_pos[ia], gt_pos[ib]
    qe, qg = est_quat[ia], gt_quat[ib]
    if align:
        s, R, t = umeyama_alignment(pe, pg, with_scale)
        pe = (s * (R @ pe.T)).T + t
        Re = R[None] @ quat_to_matrix_np(qe)
    else:
        Re = quat_to_matrix_np(qe)
    Rg = quat_to_matrix_np(qg)
    dp = pe - pg
    terr = np.linalg.norm(dp, axis=-1)
    dR = np.einsum("nij,nkj->nik", Re, Rg)  # Re Rg^T
    tr = np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1.0, 1.0)
    rerr = np.degrees(np.arccos(tr))
    out = {
        "n": int(len(ia)),
        "trans_rmse": float(np.sqrt((terr ** 2).mean())),
        "trans_mean": float(terr.mean()),
        "trans_median": float(np.median(terr)),
        "trans_max": float(terr.max()),
        "rot_rmse_deg": float(np.sqrt((rerr ** 2).mean())),
        "rot_mean_deg": float(rerr.mean()),
    }
    if return_errors:
        out["arrays"] = {
            "stamps": np.asarray(est_stamps)[ia],
            "trans_errors": terr,
            "rot_errors_deg": rerr,
            "est_pos_aligned": pe,
            "ref_pos": pg,
        }
    return out


def rpe(est_stamps, est_pos, est_quat, gt_stamps, gt_pos, gt_quat,
        delta=1, max_diff=0.02, return_errors=False):
    """Relative pose error over pairs (i, i+delta) of matched poses."""
    ia, ib = associate(est_stamps, gt_stamps, max_diff)
    if len(ia) < delta + 2:
        return {"n": 0, "trans_rmse": np.inf, "rot_rmse_deg": np.inf}
    pe, pg = est_pos[ia], gt_pos[ib]
    Re = quat_to_matrix_np(est_quat[ia])
    Rg = quat_to_matrix_np(gt_quat[ib])
    i0 = np.arange(len(ia) - delta)
    i1 = i0 + delta
    # relative motions
    dRe = np.einsum("nji,njk->nik", Re[i0], Re[i1])
    dpe = np.einsum("nji,nj->ni", Re[i0], pe[i1] - pe[i0])
    dRg = np.einsum("nji,njk->nik", Rg[i0], Rg[i1])
    dpg = np.einsum("nji,nj->ni", Rg[i0], pg[i1] - pg[i0])
    terr = np.linalg.norm(dpe - dpg, axis=-1)
    dR = np.einsum("nij,nkj->nik", dRe, dRg)
    tr = np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1.0, 1.0)
    rerr = np.degrees(np.arccos(tr))
    out = {
        "n": int(len(i0)),
        "trans_rmse": float(np.sqrt((terr ** 2).mean())),
        "rot_rmse_deg": float(np.sqrt((rerr ** 2).mean())),
    }
    if return_errors:
        out["arrays"] = {
            "stamps": np.asarray(est_stamps)[ia][i0],
            "trans_errors": terr,
            "rot_errors_deg": rerr,
        }
    return out


def load_tum(path):
    """TUM format: ``t x y z qx qy qz qw`` -> (stamps, pos (N,3), quat wxyz)."""
    data = np.loadtxt(path, comments="#").reshape(-1, 8)
    stamps = data[:, 0]
    pos = data[:, 1:4]
    q_xyzw = data[:, 4:8]
    quat = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, 0:3]], axis=1)
    return stamps, pos, quat


def save_tum(path, stamps, pos, quat_wxyz):
    """Write TUM rows (quaternion stored xyzw per TUM convention) — the
    reference's conversion ``evaluation/conversions.py:5-8``."""
    q = np.asarray(quat_wxyz)
    out = np.column_stack([
        stamps, pos, q[:, 1], q[:, 2], q[:, 3], q[:, 0]])
    np.savetxt(path, out, fmt="%.9f")
