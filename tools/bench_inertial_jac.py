"""jacfwd vs jacrev for the inertial linearizer (50 tangents vs 6 cotangents
through the nested-jvp spline derivative chain)."""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from __graft_entry__ import _build_problem
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.factors import residuals as res
from hyperslam_tpu.state import bspline
from hyperslam_tpu.variables import s2

cfg = SolverConfig(max_iterations=5)
params, cams, imu, factors, masks = _build_problem()
lay = ba.problem_layout(params, cams, masks)
f = factors.inertial
dtype = params.knots.dtype
order, border = cfg.order, cfg.bias_order
dt = jnp.asarray(0.1, jnp.float32)


def timeit(fn, *args, n=40):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def inertial_blocks(jac):
    def run(params, imu, f):
        def one(s, u, bs, bu, meas, active):
            ctrl = bspline.gather_support(params.knots, s, order)
            bg_ctrl = bspline.gather_support(params.bias_g, bs, border)
            ba_ctrl = bspline.gather_support(params.bias_a, bs, border)

            def g(dk, dbg, dba, dgr):
                c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
                bg = bspline.interp_euclidean(
                    bg_ctrl + dbg.reshape(border, 3), bu, border)
                bb = bspline.interp_euclidean(
                    ba_ctrl + dba.reshape(border, 3), bu, border)
                grav = s2.retract(params.gravity, dgr, norm=s2.GRAVITY_NORM)
                return res.inertial_residual(
                    c, u, dt, bg, bb, imu.T_bs, grav,
                    imu.gyro_intrinsics, imu.accel_intrinsics,
                    imu.g_sensitivity, imu.lever_arm, meas)

            zk = jnp.zeros(order * 6, dtype)
            zb = jnp.zeros(border * 3, dtype)
            zg = jnp.zeros(2, dtype)
            r = g(zk, zb, zb, zg)
            Js = jac(g, argnums=(0, 1, 2, 3))(zk, zb, zb, zg)
            return (r,) + Js

        return jax.vmap(one)(f.s, f.u, f.bias_s, f.bias_u, f.meas, f.active)
    return run


t_rev = timeit(inertial_blocks(jax.jacrev), params, imu, f)
t_fwd = timeit(inertial_blocks(jax.jacfwd), params, imu, f)
print(f"inertial blocks ({f.s.shape[0]} factors) "
      f"jacrev: {t_rev*1e3:7.3f} ms   jacfwd: {t_fwd*1e3:7.3f} ms")
