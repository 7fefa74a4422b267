"""Benchmark: sliding-window BA throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's operating envelope (SURVEY.md §6) — ~30 active
cubic-spline pose knots (separation 0.1 s, window 3 s), 256 landmark slots,
2048 stereo bearing factors, 640 direct IMU factors, 5 LM iterations per
solve (the reference's iteration cap, ceres/optimizer.cpp:40).

Measurement protocol (honest by construction):
- B independent window problems are solved per device call
  (``ba.batch_optimize`` — the chip is occupancy-bound at one window,
  PROFILE.md, so batching is the intended way to use it).
- Timed iterations are CHAINED: each call takes a scalar ``eps`` computed on
  the host from the PREVIOUS call's summed final cost and adds it to the
  knots, so call k+1 cannot be dispatched, cached, or reordered before call
  k's result has been materialized on the host.  Every iteration therefore
  pays full execution + device->host transfer; nothing measures dispatch.
- Throughput = (B * iters) / total wall time of the chained loop.

Baseline: the reference solves ONE such window on CPU within its (commented)
real-time budget of 0.02 s/solve => 50 solves/s (ceres/optimizer.cpp:45).
vs_baseline = our solves/s / 50.  North-star target >= 5x (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    # x64 on: the solver accumulates its normal equations in f64
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem
    from hyperslam_tpu.solver import ba
    from hyperslam_tpu.solver.problem import SolverConfig

    cfg = SolverConfig(max_iterations=5, gyro_sqrt_info=5.9e1,
                      accel_sqrt_info=3.5e1)
    dt = jnp.asarray(0.1, jnp.float32)
    bdt = jnp.asarray(1.0, jnp.float32)

    B = 32
    probs = [_build_problem(seed=i) for i in range(B)]
    cams, imu = probs[0][1], probs[0][2]
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    params_b = stack([p[0] for p in probs])
    factors_b = stack([p[3] for p in probs])
    masks_b = stack([p[4] for p in probs])

    @jax.jit
    def step(params, factors, masks, eps):
        # eps (scalar, derived on host from the previous call's output)
        # perturbs the state, chaining the calls into a true dependency.
        p = params.replace(knots=params.knots + eps)
        p_fin, _, _, stats = ba.batch_optimize(
            p, cams, imu, factors, masks, cfg, dt, bdt)
        return stats.final_cost

    eps = jnp.asarray(0.0, params_b.knots.dtype)

    # compile + warm (2 calls: first compiles, second confirms steady state)
    for _ in range(2):
        c = float(jnp.sum(step(params_b, factors_b, masks_b, eps)))
        eps = jnp.asarray((c % 1.0) * 1e-9, params_b.knots.dtype)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        cost = step(params_b, factors_b, masks_b, eps)
        c = float(jnp.sum(cost))            # host materialization: blocks
        eps = jnp.asarray((c % 1.0) * 1e-9, params_b.knots.dtype)
    total = time.perf_counter() - t0
    assert np.isfinite(c), "non-finite final cost"

    solves_per_s = B * iters / total
    baseline = 50.0  # reference CPU real-time budget: 0.02 s/solve
    print(json.dumps({
        "metric": "ba_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s (5-iter LM, 30-knot window, 2048 bearing + 640 imu"
                " each; batch of %d windows/call, %d chained calls, each call"
                " input depends on previous call's host-materialized cost)"
                % (B, iters),
        "vs_baseline": round(solves_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
