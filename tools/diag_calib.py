"""Diagnostics for self-calibration:
(1) FD-check the cam-extrinsics Jacobian columns of linearize().
(2) Check whether a small batch solve with freed cam1 extrinsics converges.
"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hyperslam_tpu.factors import residuals as res
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import ImuCalib, Masks, SolverConfig
from tests.test_solver import _make_visual_problem, DT

key = jax.random.PRNGKey(0)
dtype = jnp.float64
gt, factors, calib = _make_visual_problem(key, K=8, L=40, dtype=dtype)
K, L, Kb = gt.num_knots, gt.num_landmarks, gt.num_bias_knots
masks = Masks.all_free(K, L, Kb, gravity_free=False, C=2, cam_ext=True)
masks = masks.replace(cam_ext=masks.cam_ext.at[0].set(0.0),
                      bias=masks.bias * 0.0)
cfg = SolverConfig(max_iterations=5, bearing_sqrt_info=1.0, bearing_huber=1e9)
imu = ImuCalib.default(dtype)
dt = jnp.asarray(DT, dtype)

lay = ba.problem_layout(gt, calib, masks)
print("layout D =", lay.D, "cext =", lay.cext)

sys0 = ba.linearize(gt, calib, imu, factors, masks, cfg, dt, dt)
J_cext = np.asarray(sys0.J[:, lay.cext + 6:lay.cext + 12])  # cam1 cols

# FD: perturb cam1 extrinsics through the same retraction
eps = 1e-6
J_fd = np.zeros_like(J_cext)
for k in range(6):
    d = np.zeros((2, 6))
    d[1, k] = eps
    cp = calib.replace(T_bs=res.retract_pose_knots(calib.T_bs, jnp.asarray(d)))
    cm = calib.replace(T_bs=res.retract_pose_knots(calib.T_bs, jnp.asarray(-d)))
    rp = ba.linearize(gt, cp, imu, factors, masks, cfg, dt, dt).r
    rm = ba.linearize(gt, cm, imu, factors, masks, cfg, dt, dt).r
    J_fd[:, k] = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
err = np.abs(J_cext - J_fd).max()
print("cam1-extrinsics Jacobian: max |analytic - FD| =", err)

# (2) batch-solve convergence: perturb cam1, free it, solve.
from hyperslam_tpu.variables import nplie
T_true = np.asarray(calib.T_bs, np.float64)
d = np.asarray([2e-3, -3e-3, 4e-3, 2e-3, -3e-3, 2e-3])
T1_bad = nplie.se3_compose(T_true[1], nplie.se3_exp(d))
calib_bad = calib.replace(
    T_bs=jnp.asarray(np.stack([T_true[0], T1_bad]), dtype))
# gauge: freeze first 2 knots at ground truth (plays the pose-prior role)
masks2 = masks.replace(knots=masks.knots.at[:2].set(0.0))
cfg2 = SolverConfig(max_iterations=15, bearing_sqrt_info=1.0,
                    bearing_huber=1e9)
p_fin, c_fin, _, stats = ba.optimize(
    gt, calib_bad, imu, factors, masks2, cfg2, dt, dt)
T1_est = np.asarray(c_fin.T_bs, np.float64)[1]
def err_of(T):
    dT = nplie.se3_compose(nplie.se3_inverse(T_true[1]), T)
    return (np.linalg.norm(nplie.so3_log(dT[:4])), np.linalg.norm(dT[4:]))
print("batch solve from GT state, bad calib:")
print("  before:", err_of(T1_bad), " after:", err_of(T1_est))
print("  cost:", float(stats.initial_cost), "->", float(stats.final_cost))
