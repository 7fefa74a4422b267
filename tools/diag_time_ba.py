"""Bisect the time-sharded BA parity break (VERDICT r3 item 1).

Compares the reduced normal equations (H, g, Hll, gl, W) between:
  A. global single-device, frame-shared fast path (what ba.optimize uses)
  B. global single-device, per-factor path (frames dropped)
  C. simulated time-sharded band assembly (the exact per-chip local view +
     scatter math of time_ba.reduce_shard, but in a host loop — no
     shard_map, so it compiles in seconds)
to localize whether the break is frames-vs-per-factor or the band scatter.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import __graft_entry__ as ge
from hyperslam_tpu.parallel import time_ba
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import SolverConfig, make_layout


@functools.partial(jax.jit, static_argnames=("cfg", "L"))
def lin_reduce(params, cams, imu, factors, masks, cfg, dt, bdt, L):
    sys = ba.linearize(params, cams, imu, factors, masks, cfg, dt, bdt)
    return ba.reduce_system(sys, L)


linearize_reduce_jit = jax.jit(ba.linearize_reduce,
                               static_argnames=("cfg",))


def main():
    n_dev, K = 8, 32
    params, cams, imu, factors, masks = ge._build_problem(
        K=K, L=32, FB=256, FI=96, FP=8, Kb=5, dtype=jnp.float64, seed=3)
    cfg = SolverConfig(max_iterations=1, init_lambda=1e4,
                       bearing_sqrt_info=100.0, gyro_sqrt_info=10.0,
                       accel_sqrt_info=10.0, inertial_scale=1.0)
    dt = jnp.asarray(0.1, jnp.float64)
    bdt = jnp.asarray(1.0, jnp.float64)
    f_td = time_ba.partition_factors_by_time(factors, K, n_dev)

    L = params.num_landmarks
    Kb = params.num_bias_knots
    C = cams.T_bs.shape[0]
    D = make_layout(K, Kb, C, masks).D
    Ks = K // n_dev
    halo = 3

    # A: frame-shared global
    A = linearize_reduce_jit(params, cams, imu, factors, masks, cfg, dt, bdt)
    print("A done", flush=True)
    # B: per-factor global (frames dropped, like partition does)
    f_nf = factors.replace(
        frames=None, bearing=factors.bearing.replace(frame=None),
        pixel=factors.pixel.replace(frame=None))
    B = linearize_reduce_jit(params, cams, imu, f_nf, masks, cfg, dt, bdt)
    print("B done", flush=True)
    # B2: per-factor global via linearize + reduce_system (time_ba's local op)
    B2 = lin_reduce(params, cams, imu, f_nf, masks, cfg, dt, bdt, L)
    print("B2 done", flush=True)

    # C: simulated sharded band assembly (host loop over chips)
    knots_np = np.asarray(params.knots)
    kmask_np = np.asarray(masks.knots)
    H = np.zeros((D, D))
    g = np.zeros(D)
    Hll = np.zeros((L, 3, 3))
    gl = np.zeros((L, 3))
    W = np.zeros((L, D, 3))
    for d in range(n_dev):
        # local view: own slice + right-neighbour halo (zeros on last chip)
        sl = slice(d * Ks, (d + 1) * Ks)
        kl = np.zeros((Ks + halo, 7))
        ml = np.zeros(Ks + halo)
        kl[:Ks] = knots_np[sl]
        ml[:Ks] = kmask_np[sl]
        if d + 1 < n_dev:
            kl[Ks:] = knots_np[(d + 1) * Ks:(d + 1) * Ks + halo]
            ml[Ks:] = kmask_np[(d + 1) * Ks:(d + 1) * Ks + halo]
        p_loc = params.replace(knots=jnp.asarray(kl))
        m_loc = masks.replace(knots=jnp.asarray(ml))
        f_loc = jax.tree.map(lambda x: x[d], f_td.replace(marg=None))
        Hl, gll, Hlll, glll, Wl = lin_reduce(
            p_loc, cams, imu, f_loc, m_loc, cfg, dt, bdt, L)
        Hl, gll, Wl = np.asarray(Hl), np.asarray(gll), np.asarray(Wl)
        knot_cols = d * Ks * 6 + np.arange((Ks + halo) * 6)
        valid_k = knot_cols < K * 6
        tail = np.arange(K * 6, D)
        cmap = np.concatenate([np.minimum(knot_cols, K * 6 - 1), tail])
        valid = np.concatenate([valid_k, np.ones(D - K * 6, bool)])
        v = valid.astype(float)
        Hl = Hl * v[:, None] * v[None, :]
        gll2 = gll * v
        Wl = Wl * v[None, :, None]
        np.add.at(H, np.ix_(cmap, cmap), Hl)
        np.add.at(g, cmap, gll2)
        for i3 in range(3):
            np.add.at(W[..., i3], np.s_[:, cmap], Wl[..., i3])
        Hll += np.asarray(Hlll)
        gl += np.asarray(glll)
    print("C done", flush=True)
    Cres = (H, g, Hll, gl, W)

    names = ["H", "g", "Hll", "gl", "W"]
    for nm, a, b in zip(names, A, B):
        d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        print(f"A(frames) vs B(per-factor) {nm}: max abs diff {d:.3e}")
    for nm, a, b in zip(names, B, B2):
        d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        print(f"B(lin_reduce) vs B2(lin+reduce) {nm}: max abs diff {d:.3e}")
    for nm, b, c in zip(names, B2, Cres):
        bn, cn = np.asarray(b), np.asarray(c)
        d = float(np.abs(bn - cn).max())
        print(f"B2(global) vs C(sharded) {nm}: max abs diff {d:.3e}")
        if d > 1e-9 and bn.ndim == 2 and nm == "H":
            idx = np.unravel_index(np.abs(bn - cn).argmax(), bn.shape)
            print(f"   worst at {idx}: {bn[idx]:.6e} vs {cn[idx]:.6e}")
            bad = np.argwhere(np.abs(bn - cn) > 1e-9)
            rows = np.unique(bad[:, 0])
            print(f"   bad rows ({len(rows)}): {rows[:40]} (K*6={K*6}, D={D})")
        if d > 1e-9 and nm == "g":
            bad = np.argwhere(np.abs(bn - cn) > 1e-9).ravel()
            print(f"   bad cols ({len(bad)}): {bad[:40]}")
        if d > 1e-9 and nm == "W":
            bad = np.argwhere(np.abs(bn - cn) > 1e-9)
            print(f"   bad (lm, col) sample: {bad[:10]}")

    # one heavily-damped step from each assembly + the two optimizers
    from hyperslam_tpu.parallel.time_ba import time_partitioned_optimize
    from jax.sharding import Mesh
    cfg1 = cfg.replace(max_iterations=1, init_lambda=1e4)
    lam = jnp.asarray(1e4, jnp.float64)
    dpA, dlA = ba.solve_reduced(*A, masks, lam, cfg1)
    dpC, dlC = ba.solve_reduced(*[jnp.asarray(x) for x in Cres], masks, lam,
                                cfg1)
    print("dp A vs C max diff:", float(jnp.abs(dpA - dpC).max()))
    pA, _, _ = ba.apply_delta(params, cams, imu, dpA, dlA, masks, cfg1)
    pC, _, _ = ba.apply_delta(params, cams, imu, dpC, dlC, masks, cfg1)
    p_ref, _, _, st_ref = ba.optimize(params, cams, imu, factors, masks,
                                      cfg1, dt, bdt)
    print("knots: manualA vs ba.optimize:",
          float(jnp.abs(pA.knots - p_ref.knots).max()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (time_ba.AXIS,))
    p_t, _, _, st_t = time_partitioned_optimize(
        params, cams, imu, f_td, masks, cfg1, dt, bdt, mesh)
    print("knots: manualC vs time_ba:",
          float(jnp.abs(pC.knots - p_t.knots).max()))
    print("knots: time_ba vs ba.optimize:",
          float(jnp.abs(p_t.knots - p_ref.knots).max()))
    print("accepted ref:", np.asarray(st_ref.accepted),
          "time:", np.asarray(st_t.accepted))
    print("cost ref:", float(st_ref.initial_cost), float(st_ref.final_cost))
    print("cost time:", float(st_t.initial_cost), float(st_t.final_cost))


if __name__ == "__main__":
    main()
