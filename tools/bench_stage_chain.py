"""Honest per-stage timing: each stage is iterated inside one jitted
lax.scan whose carry perturbs the next iteration's input (true data
dependence — nothing can be cached or overlapped), so
    stage_time = (call_time - overhead) / n_inner
with overhead measured by the same harness at n_inner=1 vs n_inner=N.
"""
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

cfg = SolverConfig(max_iterations=5, gyro_sqrt_info=5.9e1,
                   accel_sqrt_info=3.5e1)
params, cams, imu, factors, masks = _build_problem()
dt = jnp.asarray(0.1, jnp.float32)
bdt = jnp.asarray(1.0, jnp.float32)
L = params.num_landmarks


def chain_time(stage_scalar_fn, n_inner, reps=3):
    """stage_scalar_fn(params_perturbed) -> scalar; we scan n_inner times,
    feeding the scalar back into the knot perturbation."""
    @jax.jit
    def run(p0, eps0):
        def body(eps, _):
            p = p0.replace(knots=p0.knots + eps * 1e-12)
            s = stage_scalar_fn(p)
            return ((s * 1e-6) % 1.0).astype(eps.dtype), None
        out, _ = jax.lax.scan(body, eps0, None, length=n_inner)
        return out

    eps = jnp.asarray(0.5, params.knots.dtype)
    r = run(params, eps)
    float(r)  # block (compile + warm)
    ts = []
    for i in range(reps):
        eps = jnp.asarray(0.5 + 0.001 * i, params.knots.dtype)
        t0 = time.perf_counter()
        float(run(params, eps))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(name, fn, n_inner=20):
    t1 = chain_time(fn, 1)
    tn = chain_time(fn, n_inner)
    per = (tn - t1) / (n_inner - 1)
    print(f"{name:28s} {per*1e3:8.3f} ms/iter   "
          f"(1-iter call {t1*1e3:6.1f} ms, {n_inner}-iter call {tn*1e3:7.1f} ms)")
    return per


def lin_scalar(p):
    sys0 = ba.linearize(p, cams, imu, factors, masks, cfg, dt, bdt)
    return jnp.sum(sys0.r * sys0.r) + jnp.sum(sys0.J[0])


def lin_reduce_scalar(p):
    sys0 = ba.linearize(p, cams, imu, factors, masks, cfg, dt, bdt)
    H, g, Hll, gl, W = ba.reduce_system(sys0, L)
    return jnp.sum(jnp.diagonal(H)) + jnp.sum(g) + jnp.sum(gl)


def schur_scalar(p):
    sys0 = ba.linearize(p, cams, imu, factors, masks, cfg, dt, bdt)
    H, g, Hll, gl, W = ba.reduce_system(sys0, L)
    dp, dl = ba.solve_reduced(H, g, Hll, gl, W, masks,
                              jnp.asarray(1e-4, H.dtype), cfg)
    return jnp.sum(dp) + jnp.sum(dl)


def cost_scalar(p):
    return ba.compute_cost(p, cams, imu, factors, cfg, dt, bdt)


def full_scalar(p):
    _, _, _, stats = ba.optimize(p, cams, imu, factors, masks, cfg, dt, bdt)
    return stats.final_cost


print("device:", jax.devices()[0])
t_cost = measure("cost only", cost_scalar)
t_lin = measure("linearize", lin_scalar)
t_red = measure("linearize+reduce", lin_reduce_scalar)
t_sch = measure("linearize+reduce+schur", schur_scalar)
t_full = measure("full optimize (5 LM iters)", full_scalar, n_inner=10)
print(f"\nimplied: reduce {1e3*(t_red-t_lin):.3f} ms, schur "
      f"{1e3*(t_sch-t_red):.3f} ms; full/5 = {t_full/5*1e3:.3f} ms/LM-iter")
