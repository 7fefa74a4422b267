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
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn)

    # compile
    out = step(*args)
    jax.block_until_ready(out)

    # measure
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    solves_per_s = 1.0 / dt
    baseline = 50.0  # reference CPU real-time budget: 0.02 s/solve
    print(json.dumps({
        "metric": "ba_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s (5-iter LM, 30-knot window, 2048 bearing + 640 imu)",
        "vs_baseline": round(solves_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
