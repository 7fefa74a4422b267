"""Benchmark: sliding-window BA throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's operating envelope (SURVEY.md §6) — ~30 active
cubic-spline pose knots (separation 0.1 s, window 3 s), 256 landmark slots,
2048 stereo bearing factors, 640 direct IMU factors, 5 LM iterations per
solve (the reference's iteration cap, ceres/optimizer.cpp:40).

Baseline: the reference solves this window on CPU within its (commented)
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

    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn)

    # A fleet of distinct problem instances (perturbed knots/landmarks), so
    # no runtime-level memoization of repeated identical launches can
    # flatter the number.
    params = args[0]
    rng = np.random.default_rng(7)
    variants = []
    for _ in range(8):
        p = params.replace(
            knots=params.knots + jnp.asarray(
                rng.normal(0, 1e-3, params.knots.shape), params.knots.dtype),
            landmarks=params.landmarks + jnp.asarray(
                rng.normal(0, 1e-2, params.landmarks.shape),
                params.landmarks.dtype))
        variants.append((p,) + args[1:])

    # compile + warm
    for v in variants[:2]:
        jax.block_until_ready(step(*v))

    # strict per-call latency: block on every solve
    lat = []
    for i in range(40):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        jax.block_until_ready(step(*v))
        lat.append(time.perf_counter() - t0)
    dt = float(np.median(lat))

    solves_per_s = 1.0 / dt
    baseline = 50.0  # reference CPU real-time budget: 0.02 s/solve
    print(json.dumps({
        "metric": "ba_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s (5-iter LM, 30-knot window, 2048 bearing + 640 imu,"
                " per-solve blocking, median of 40)",
        "vs_baseline": round(solves_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
