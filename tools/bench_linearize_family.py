"""Chained (honest) timing of linearize per factor family."""
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
from hyperslam_tpu.solver.problem import Factors, SolverConfig, VisualFactors, InertialFactors, PriorFactors

cfg = SolverConfig(max_iterations=5)
params, cams, imu, factors, masks = _build_problem()
dt = jnp.asarray(0.1, jnp.float32)
bdt = jnp.asarray(1.0, jnp.float32)
dtype = params.knots.dtype


def chain_time(fn, n_inner, reps=3):
    @jax.jit
    def run(p0, eps0):
        def body(eps, _):
            p = p0.replace(knots=p0.knots + eps * 1e-12)
            s = fn(p)
            return ((s * 1e-6) % 1.0).astype(eps.dtype), None
        out, _ = jax.lax.scan(body, eps0, None, length=n_inner)
        return out
    eps = jnp.asarray(0.5, dtype)
    float(run(params, eps))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(run(params, jnp.asarray(0.5 + 0.001 * i, dtype)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(name, fn, n=20):
    t1 = chain_time(fn, 1)
    tn = chain_time(fn, n)
    per = (tn - t1) / (n - 1)
    print(f"{name:32s} {per*1e3:8.3f} ms/iter")
    return per


def fam(only):
    f = Factors(
        bearing=factors.bearing if only == "bearing"
        else VisualFactors.empty(0, 3, dtype),
        pixel=VisualFactors.empty(0, 2, dtype),
        inertial=factors.inertial if only == "inertial"
        else InertialFactors.empty(0, dtype),
        prior=factors.prior if only == "prior"
        else PriorFactors.empty(0, dtype))

    def run(p):
        sys0 = ba.linearize(p, cams, imu, f, masks, cfg, dt, bdt)
        return jnp.sum(sys0.r * sys0.r) + jnp.sum(sys0.J[0])
    return run


measure("linearize bearing only (2048)", fam("bearing"))
measure("linearize inertial only (640)", fam("inertial"))
measure("linearize prior only (8)", fam("prior"))
