"""Multi-process worker for the distributed BA parity/scaling runs.

Each process runs this script with JAX_NUM_PROCESSES / JAX_PROCESS_ID /
JAX_COORDINATOR_ADDRESS set (see tools/launch_multihost.sh); process 0
writes the solved knots/landmarks to --out for comparison against the
single-process run (tests/test_multihost.py gates exact agreement).

Single-process invocation (num_processes=1) is the degenerate path of
the same code — the solvers see one global mesh either way.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--devices-per-process", type=int, default=4)
    p.add_argument("--solver", choices=["dist", "time"], default="dist")
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.devices_per_process}").strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from hyperslam_tpu.parallel import dist_ba, multihost, time_ba

    multihost.initialize()

    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__ as ge
    from hyperslam_tpu.solver.problem import SolverConfig

    n_total = len(jax.devices())
    pid = jax.process_index()
    if pid == 0:
        print(f"processes={jax.process_count()} global_devices={n_total}",
              flush=True)

    cfg = SolverConfig(max_iterations=1, init_lambda=1e4)
    # replicated inputs enter as HOST numpy arrays (identical on every
    # process) — committed process-local jax Arrays would conflict with
    # the global mesh in multi-controller mode
    dt = np.float64(0.1)
    bdt = np.float64(1.0)
    if args.solver == "dist":
        mesh = multihost.global_mesh(dist_ba.AXIS)
        params, cams, imu, factors, masks = jax.tree.map(
            np.asarray, ge._build_problem(
                K=8, L=16, FB=16 * n_total, FI=8 * n_total, FP=n_total,
                Kb=5, dtype=jnp.float64))
        factors = factors.replace(
            frames=None, bearing=factors.bearing.replace(frame=None),
            pixel=factors.pixel.replace(frame=None))
        f_sh = multihost.put_sharded(factors, mesh, dist_ba.AXIS)
        f_sh = f_sh.replace(marg=None, calib_prior=None)
        p_fin, _, _, stats = dist_ba.distributed_optimize(
            params, cams, imu, f_sh, masks, cfg, dt, bdt, mesh)
    else:
        K = 4 * n_total
        mesh = multihost.global_mesh(time_ba.AXIS)
        params, cams, imu, factors, masks = jax.tree.map(
            np.asarray, ge._build_problem(
                K=K, L=16, FB=16 * n_total, FI=8 * n_total, FP=n_total,
                Kb=5, dtype=jnp.float64))
        f_td = jax.tree.map(
            np.asarray, time_ba.partition_factors_by_time(
                factors, K, n_total))
        f_td = multihost.put_sharded(f_td.replace(marg=None), mesh,
                                     time_ba.AXIS)
        p_fin, _, _, stats = time_ba.time_partitioned_optimize(
            params, cams, imu, f_td, masks, cfg, dt, bdt, mesh)

    out = multihost.fetch_replicated(
        {"knots": p_fin.knots, "landmarks": p_fin.landmarks,
         "final_cost": stats.final_cost,
         "initial_cost": stats.initial_cost})
    if pid == 0:
        np.savez(args.out, **out)
        print("wrote", args.out, "final_cost", float(out["final_cost"]),
              flush=True)


if __name__ == "__main__":
    main()
