"""Measure batched-solve wall time vs batch size B on the real chip."""
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
dt = jnp.asarray(0.1, jnp.float32)
bdt = jnp.asarray(1.0, jnp.float32)

for B in [1, 2, 4, 8, 16, 32]:
    probs = [_build_problem(seed=i) for i in range(B)]
    cams, imu = probs[0][1], probs[0][2]
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    params_b = stack([p[0] for p in probs])
    factors_b = stack([p[3] for p in probs])
    masks_b = stack([p[4] for p in probs])

    @jax.jit
    def step(params, factors, masks, eps):
        p = params.replace(knots=params.knots + eps)
        _, _, _, stats = ba.batch_optimize(
            p, cams, imu, factors, masks, cfg, dt, bdt)
        return stats.final_cost

    eps = jnp.asarray(0.0, params_b.knots.dtype)
    for _ in range(2):
        c = float(jnp.sum(step(params_b, factors_b, masks_b, eps)))
        eps = jnp.asarray((c % 1.0) * 1e-9, params_b.knots.dtype)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(jnp.sum(step(params_b, factors_b, masks_b, eps)))
        eps = jnp.asarray((c % 1.0) * 1e-9, params_b.knots.dtype)
    tot = (time.perf_counter() - t0) / iters
    print(f"B={B:3d}  t/call={tot*1000:8.1f} ms  per-window={tot/B*1000:7.1f} ms"
          f"  solves/s={B/tot:8.1f}")
