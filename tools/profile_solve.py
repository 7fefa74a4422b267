"""Per-stage profile + MFU/roofline of the windowed BA solve on the bench
envelope (VERDICT r1 item 3; BASELINE.md "speed of light" row).

Stages (one jitted function each, timed with per-call blocking):
  linearize   — vmapped jacfwd of all factor types -> stacked rows (R, D)
  reduce      — J^T J, J^T r, per-landmark blocks (segment_sum + matmul)
  schur_solve — batched 3x3 inverses, Schur complement, dense Cholesky
  apply+cost  — retraction + robust cost (LM bookkeeping)
  full        — ba.optimize (5 LM iterations, the bench number)

For each stage we report wall time, XLA's own FLOP estimate
(compiled.cost_analysis()), and the implied FLOP/s vs. the chip peak.

Usage:  python tools/profile_solve.py [--cpu] [--trace DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_time(fn, args, n=30, warmup=3):
    """Per-call latency with blocking — includes host<->device round trips
    (on the axon tunnel those are ~30 ms, dwarfing device time)."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _amortized_time(fn, args, n=60, warmup=3):
    """Pipelined throughput: dispatch n calls back-to-back, block once at
    the end — dispatch/tunnel latency overlaps with device execution, so
    this approximates pure device time per call."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def _flops(fn, args):
    import jax
    try:
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="capture an xprof trace of the full solve to DIR")
    ap.add_argument("--json", default=None, help="write results to JSON file")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from hyperslam_tpu.solver import ba
    from hyperslam_tpu.solver.problem import SolverConfig
    import __graft_entry__ as ge

    cfg = SolverConfig(max_iterations=5, gyro_sqrt_info=5.9e1,
                       accel_sqrt_info=3.5e1)
    params, cams, imu, factors, masks = ge._build_problem()
    dt = jnp.asarray(0.1, jnp.float32)
    bdt = jnp.asarray(1.0, jnp.float32)
    L = params.num_landmarks
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def stage_linearize(p, c, i, f, m):
        return ba.linearize(p, c, i, f, m, cfg, dt, bdt)

    sys0 = jax.block_until_ready(stage_linearize(params, cams, imu, factors,
                                                 masks))
    R, D = sys0.J.shape
    print(f"rows R={R}, reduced dim D={D}, landmarks L={L}")

    @jax.jit
    def stage_reduce(sys):
        return ba.reduce_system(sys, L)

    blocks = jax.block_until_ready(stage_reduce(sys0))

    @jax.jit
    def stage_schur(H, g, Hll, gl, W):
        return ba.solve_reduced(H, g, Hll, gl, W, masks,
                                jnp.asarray(1e-4, H.dtype), cfg)

    dp, dl = jax.block_until_ready(stage_schur(*blocks))

    @jax.jit
    def stage_apply_cost(p, c, i, dp, dl):
        tp, tc, ti = ba.apply_delta(p, c, i, dp, dl, masks, cfg)
        return ba.compute_cost(tp, tc, ti, factors, cfg, dt, bdt)

    def stage_full(p, c, i, f, m):
        out = ba.optimize(p, c, i, f, m, cfg, dt, bdt)
        return out[0].knots, out[3].final_cost

    stages = [
        ("linearize", stage_linearize, (params, cams, imu, factors, masks)),
        ("reduce", stage_reduce, (sys0,)),
        ("schur_solve", stage_schur, blocks),
        ("apply_cost", stage_apply_cost, (params, cams, imu, dp, dl)),
        ("full_5iter", jax.jit(stage_full),
         (params, cams, imu, factors, masks)),
    ]

    # Rough peak FLOP/s for MFU denominators (f32 unless noted).
    peaks = {"tpu": 197e12 / 2,   # bf16 MXU ~197T; f32 ~half (v5p-class)
             "cpu": 1e11}
    peak = peaks.get(dev.platform, 1e12)

    results = {}
    for name, fn, a in stages:
        t_lat = _median_time(fn, a, n=10)
        t = _amortized_time(fn, a)
        fl = _flops(fn, a)
        mfu = fl / t / peak if np.isfinite(fl) else float("nan")
        results[name] = {"time_ms": t * 1e3, "latency_ms": t_lat * 1e3,
                         "xla_flops": fl,
                         "gflops_per_s": fl / t / 1e9 if np.isfinite(fl)
                         else float("nan"),
                         "mfu_vs_f32_peak": mfu}
        print(f"{name:12s} {t*1e3:9.3f} ms amortized "
              f"({t_lat*1e3:8.2f} ms blocking)   flops={fl:.3e}   "
              f"{fl/t/1e9 if np.isfinite(fl) else 0:9.1f} GFLOP/s   "
              f"MFU={mfu*100 if np.isfinite(mfu) else 0:6.2f}%")

    t_full = results["full_5iter"]["time_ms"]
    per_iter = (results["linearize"]["time_ms"]
                + results["reduce"]["time_ms"]
                + results["schur_solve"]["time_ms"]
                + results["apply_cost"]["time_ms"])
    print(f"\nfull solve {t_full:.3f} ms amortized "
          f"(= {1e3/t_full:.0f} solves/s pipelined); "
          f"sum-of-stages x5 = {per_iter*5:.3f} ms "
          f"(fusion/loop delta {(t_full - per_iter*5):+.3f} ms)")
    results["solves_per_s_pipelined"] = 1e3 / t_full

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                jax.block_until_ready(
                    stages[-1][1](params, cams, imu, factors, masks))
        print(f"trace written to {args.trace}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
