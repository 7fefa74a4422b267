"""Chained timing of the frame-shared fast path's pieces on TPU."""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_problem
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import SolverConfig

cfg = SolverConfig(max_iterations=5)
dt = jnp.asarray(0.1, jnp.float32)
bdt = jnp.asarray(1.0, jnp.float32)


def chain_time(params, fn, n_inner, dtype, reps=3):
    @jax.jit
    def run(p0, eps0):
        def body(eps, _):
            p = p0.replace(knots=p0.knots + eps * 1e-12)
            s = fn(p)
            return ((s * 1e-6) % 1.0).astype(eps.dtype), None
        out, _ = jax.lax.scan(body, eps0, None, length=n_inner)
        return out
    float(run(params, jnp.asarray(0.5, dtype)))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(run(params, jnp.asarray(0.5 + 0.001 * i, dtype)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(tag, params, fn, n=20):
    t1 = chain_time(params, fn, 1, params.knots.dtype)
    tn = chain_time(params, fn, n, params.knots.dtype)
    print(f"{tag:44s} {1e3*(tn-t1)/(n-1):8.3f} ms/iter", flush=True)


for NF in [128, 32]:
    params, cams, imu, factors, masks = _build_problem(NF=NF)
    lay = ba.problem_layout(params, cams, masks)
    frames = factors.frames
    f = factors.bearing

    def frame_only(p):
        T0, J6k, J6c = ba._frame_poses(p, cams, frames, cfg, False)
        return jnp.sum(T0) + jnp.sum(J6k)

    def bearing_fast(p):
        s0 = ba._linearize_bearing_frames(p, cams, f, frames, cfg, lay)
        return jnp.sum(s0.r * s0.r) + jnp.sum(s0.J[0])

    measure(f"NF={NF}: _frame_poses (pose+J only)", params, frame_only)
    measure(f"NF={NF}: bearing fast (frames+factors+rows)", params,
            bearing_fast)

params, cams, imu, factors, masks = _build_problem()
lay = ba.problem_layout(params, cams, masks)


def prior_only(p):
    s0 = ba._linearize_prior(p, factors.prior, cfg, lay)
    return jnp.sum(s0.r * s0.r) + jnp.sum(s0.J[0])


def inertial_only(p):
    s0 = ba._linearize_inertial(p, imu, factors.inertial, cfg, lay, dt, bdt)
    return jnp.sum(s0.r * s0.r) + jnp.sum(s0.J[0])


measure("prior only (8 factors)", params, prior_only)
measure("inertial only (640 factors)", params, inertial_only)
