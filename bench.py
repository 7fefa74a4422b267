"""Benchmark: sliding-window BA throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's operating envelope (SURVEY.md §6) — ~30 active
cubic-spline pose knots (separation 0.1 s, window 3 s), 256 landmark slots,
2048 stereo bearing factors, 640 direct IMU factors, 5 LM iterations per
solve (the reference's iteration cap, ceres/optimizer.cpp:40).

Measurement protocol (honest by construction):
- B independent window problems are solved per program iteration
  (``ba.batch_optimize``), and CHAIN iterations run inside one jitted
  ``lax.scan`` whose carry perturbs the next iteration's knots from the
  previous iteration's summed final cost — a true data dependency, so no
  iteration can be cached, elided, or overlapped away.
- Between device calls the carry is materialized on the host and re-fed,
  chaining the calls as well.  Every solve therefore executes in full;
  the per-call device->host round trip (~28 ms on the axon tunnel)
  amortizes over B * CHAIN solves, which is exactly the production
  pattern (the estimator dispatches solves asynchronously).
- Throughput = (B * CHAIN * calls) / total wall time of the loop.

Baseline: the reference solves ONE such window on CPU within its (commented)
real-time budget of 0.02 s/solve => 50 solves/s (ceres/optimizer.cpp:45).
vs_baseline = our solves/s / 50.  North-star target >= 5x (BASELINE.md).
"""

import json
import os
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

    B = int(os.environ.get("BENCH_B", "1"))
    CHAIN = int(os.environ.get("BENCH_CHAIN", "250"))
    probs = [_build_problem(seed=i) for i in range(B)]
    cams, imu = probs[0][1], probs[0][2]
    stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
    params_b = stack([p[0] for p in probs])
    factors_b = stack([p[3] for p in probs])
    masks_b = stack([p[4] for p in probs])
    kdtype = params_b.knots.dtype

    @jax.jit
    def step(params, factors, masks, eps0):
        # CHAIN batched solves, each perturbed by the previous one's summed
        # final cost (true in-program data dependency); eps0 is derived on
        # the host from the previous CALL's output, chaining calls too.
        def body(eps, _):
            p = params.replace(knots=params.knots + eps * 1e-9)
            if B == 1:
                _, _, _, stats = ba.optimize(
                    jax.tree.map(lambda x: x[0], p), cams, imu,
                    jax.tree.map(lambda x: x[0], factors),
                    jax.tree.map(lambda x: x[0], masks), cfg, dt, bdt)
            else:
                _, _, _, stats = ba.batch_optimize(
                    p, cams, imu, factors, masks, cfg, dt, bdt)
            nxt = (jnp.sum(stats.final_cost) * 1e-6) % 1.0
            return nxt.astype(eps.dtype), None
        e_fin, _ = jax.lax.scan(body, eps0, None, length=CHAIN)
        return e_fin

    eps = jnp.asarray(0.5, kdtype)
    # compile + warm (2 calls)
    for i in range(2):
        eps = jnp.asarray(float(step(params_b, factors_b, masks_b, eps)),
                          kdtype)

    calls = 2
    t0 = time.perf_counter()
    for _ in range(calls):
        # float() blocks until the whole chain has executed
        eps = jnp.asarray(float(step(params_b, factors_b, masks_b, eps)),
                          kdtype)
    total = time.perf_counter() - t0
    assert np.isfinite(float(eps)), "non-finite chained carry"

    solves_per_s = B * CHAIN * calls / total
    baseline = 50.0  # reference CPU real-time budget: 0.02 s/solve
    print(json.dumps({
        "metric": "ba_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s (5-iter LM, 30-knot window, 2048 bearing + 640 imu"
                " each; %d windows/iteration x %d chained iterations/call"
                " (in-program data dependency) x %d chained calls"
                " (host-materialized carry))" % (B, CHAIN, calls),
        "vs_baseline": round(solves_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
