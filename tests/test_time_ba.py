"""Time-axis sharded BA (parallel/time_ba.py): the 8-device halo-partitioned
solve must match the single-device solve on the same window.

Reference contrast: the reference has no distribution at all (SURVEY.md
§2.4); the time axis partitioning with halo knots is the TPU-native SP/CP
analogue (SURVEY §5.7, outerPadding ``ceres/optimizer.cpp:288-290``).

Parity strategy (same as tests/test_distributed.py): compare the initial
cost and ONE heavily-damped LM step to tight tolerances — with the damped
(diagonally dominant) system, halo routing or column-scatter errors show up
at full magnitude while legitimate summation-order roundoff stays at 1e-12.
Multi-step trajectories are checked for convergence only (condition numbers
~1e12 amplify reduction-order roundoff into accept/reject flips)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import __graft_entry__ as ge
from hyperslam_tpu.parallel import time_ba
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import SolverConfig


def _problem(n_dev, K=32):
    params, cams, imu, factors, masks = ge._build_problem(
        K=K, L=32, FB=256, FI=96, FP=8, Kb=5, dtype=jnp.float64, seed=3)
    cfg = SolverConfig(max_iterations=3, bearing_sqrt_info=100.0,
                       gyro_sqrt_info=10.0, accel_sqrt_info=10.0,
                       inertial_scale=1.0)
    dt = jnp.asarray(0.1, jnp.float64)
    bdt = jnp.asarray(1.0, jnp.float64)
    return params, cams, imu, factors, masks, cfg, dt, bdt


def _check_parity(params, cams, imu, factors, masks, cfg, dt, bdt, mesh,
                  f_td, halo=None):
    n_dev = mesh.shape[time_ba.AXIS]
    # one heavily-damped step: identical across partitionings
    cfg1 = cfg.replace(max_iterations=1, init_lambda=1e4)
    p_ref, _, _, st_ref = ba.optimize(
        params, cams, imu, factors, masks, cfg1, dt, bdt)
    p_t, _, _, st_t = time_ba.time_partitioned_optimize(
        params, cams, imu, f_td, masks, cfg1, dt, bdt, mesh, halo=halo)
    np.testing.assert_allclose(np.asarray(st_t.initial_cost),
                               np.asarray(st_ref.initial_cost), rtol=1e-12)
    # atol 2e-8, not 1e-9: XLA:CPU codegen (FMA/vectorization schedules)
    # varies per host CPU, so the reference and sharded programs round
    # differently run-to-run across machines — observed up to 5.6e-9 on
    # knot elements from IDENTICAL code on a different host (round-5 log).
    # Real halo/routing/scatter bugs show at >=1e-5 (round-3 regression:
    # 5e-5 on 83% of elements), 3+ orders above this tolerance.
    np.testing.assert_allclose(np.asarray(p_t.knots),
                               np.asarray(p_ref.knots), atol=2e-8)
    # bias knots: the damped first step from zero bias is ~4e-8 — pure
    # cancellation noise at cross-machine codegen level (values carry no
    # signal; a real misroute would also corrupt the knots above, which
    # agree to ~1e-9)
    np.testing.assert_allclose(np.asarray(p_t.bias_g),
                               np.asarray(p_ref.bias_g), atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_t.final_cost),
                               np.asarray(st_ref.final_cost), rtol=1e-7)
    # full multi-step sharded solve converges
    p_n, _, _, st_n = time_ba.time_partitioned_optimize(
        params, cams, imu, f_td, masks, cfg, dt, bdt, mesh, halo=halo)
    assert float(st_n.final_cost) < 0.2 * float(st_n.initial_cost)


def test_time_partitioned_matches_single_device():
    n_dev = 8
    K = 32   # Ks = 4 >= halo = order - 1 = 3
    params, cams, imu, factors, masks, cfg, dt, bdt = _problem(n_dev, K)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (time_ba.AXIS,))
    f_td = time_ba.partition_factors_by_time(factors, K, n_dev)
    # routed factor count equals the active input count
    n_in = int(np.asarray(factors.bearing.active).sum())
    n_out = int(np.asarray(f_td.bearing.active).sum())
    assert n_in == n_out
    _check_parity(params, cams, imu, factors, masks, cfg, dt, bdt, mesh,
                  f_td)


def test_time_partitioned_full_families():
    """Preint + smoothness + marginal-prior factors in time-sharded mode
    (VERDICT r2 item 8): parity with the single-device solve."""
    from hyperslam_tpu.solver import marginalization as marg
    from hyperslam_tpu.solver.problem import (MargPrior, PreintFactors,
                                              SmoothFactors)

    n_dev, K = 4, 16
    params, cams, imu, factors, masks, cfg, dt, bdt = _problem(n_dev, K)
    Kb = params.num_bias_knots
    rng = np.random.default_rng(11)
    dtype = jnp.float64

    # preintegrated factors spanning one segment (s_j = s_i + 1)
    FQ = 12
    s_i = rng.integers(0, K - 5, FQ)
    s_i[0] = 3  # force a slice-boundary-crossing preint (halo = order)
    dq = rng.normal(size=(FQ, 4)) * 0.05 + np.array([1.0, 0, 0, 0])
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    preint = PreintFactors(
        s_i=jnp.asarray(s_i, jnp.int32),
        u_i=jnp.asarray(rng.uniform(0, 1, FQ), dtype),
        s_j=jnp.asarray(s_i + 1, jnp.int32),
        u_j=jnp.asarray(rng.uniform(0, 1, FQ), dtype),
        bias_s=jnp.zeros(FQ, jnp.int32),
        bias_u=jnp.asarray(rng.uniform(0, 1, FQ), dtype),
        dq=jnp.asarray(dq, dtype),
        dv=jnp.asarray(rng.normal(0, 0.1, (FQ, 3)), dtype),
        dp=jnp.asarray(rng.normal(0, 0.1, (FQ, 3)), dtype),
        dt_ij=jnp.full((FQ,), 0.1, dtype),
        J_bias=jnp.asarray(rng.normal(0, 0.1, (FQ, 5, 3, 3)), dtype),
        bg0=jnp.zeros((FQ, 3), dtype),
        ba0=jnp.zeros((FQ, 3), dtype),
        sqrt_info=jnp.tile(jnp.eye(9, dtype=dtype), (FQ, 1, 1)),
        active=jnp.ones(FQ, dtype))

    smooth = SmoothFactors(
        i=jnp.asarray(np.arange(K), jnp.int32),
        active=jnp.asarray((np.arange(K) < K - 2).astype(np.float64)))

    # dense marginal prior around the current state
    D0 = K * 6 + Kb * 6 + 2
    A = rng.normal(size=(D0, D0)) * 0.1
    H0 = A.T @ A
    g0 = rng.normal(size=D0) * 0.01
    sqrt_H, r0 = marg.sqrt_factor(H0, g0)
    mp = MargPrior(
        sqrt_H=jnp.asarray(sqrt_H, dtype), r0=jnp.asarray(r0, dtype),
        x0_knots=params.knots, x0_bias_g=params.bias_g,
        x0_bias_a=params.bias_a, x0_gravity=params.gravity,
        active=jnp.asarray(1.0, dtype))

    factors = factors.replace(preint=preint, smooth=smooth, marg=mp)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), (time_ba.AXIS,))
    f_td = time_ba.partition_factors_by_time(factors, K, n_dev)
    halo = time_ba.required_halo(factors, K, n_dev)
    assert halo == 4  # order - 1 + one-segment preint span at slice end
    _check_parity(params, cams, imu, factors, masks, cfg, dt, bdt, mesh,
                  f_td, halo=halo)


def test_partition_routes_by_segment_ownership():
    """Factors land on the chip owning their first support knot, with the
    segment index rebased to the local slice."""
    n_dev, K = 4, 16
    params, cams, imu, factors, masks, cfg, dt, bdt = _problem(n_dev, K)
    f_td = time_ba.partition_factors_by_time(factors, K, n_dev)
    Ks = K // n_dev
    s_orig = np.asarray(factors.bearing.s)
    act = np.asarray(factors.bearing.active) > 0
    owners = np.clip(s_orig[act] // Ks, 0, n_dev - 1)
    counts = np.bincount(owners, minlength=n_dev)
    s_td = np.asarray(f_td.bearing.s)
    a_td = np.asarray(f_td.bearing.active) > 0
    for d in range(n_dev):
        assert a_td[d].sum() == counts[d]
        # local segments stay inside the slice (halo only via support span)
        assert (s_td[d][a_td[d]] >= 0).all()
        assert (s_td[d][a_td[d]] < Ks).all()
