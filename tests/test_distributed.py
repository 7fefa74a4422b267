"""Distributed BA over the 8-device virtual CPU mesh: parity with the
single-chip solver and the dryrun entry points."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from hyperslam_tpu.parallel import dist_ba
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import ImuCalib, Masks, SolverConfig


def _problem(dtype=jnp.float64, n_pad=8):
    import __graft_entry__ as ge
    params, cams, imu, factors, masks = ge._build_problem(
        K=8, L=16, FB=8 * n_pad, FI=4 * n_pad, FP=n_pad, Kb=5, dtype=dtype)
    return params, cams, imu, factors, masks


def test_distributed_matches_single_chip():
    dtype = jnp.float64
    params, cams, imu, factors, masks = _problem(dtype)
    cfg = SolverConfig(max_iterations=3)
    dt = jnp.asarray(0.1, dtype)
    bdt = jnp.asarray(1.0, dtype)

    p_single, _, _, s_single = ba.optimize(
        params, cams, imu, factors, masks, cfg, dt, bdt)

    mesh = Mesh(np.array(jax.devices()[:8]), (dist_ba.AXIS,))
    f_sharded = dist_ba.shard_factors(factors, mesh)
    p_dist, _, _, s_dist = dist_ba.distributed_optimize(
        params, cams, imu, f_sharded, masks, cfg, dt, bdt, mesh)

    np.testing.assert_allclose(
        float(s_dist.initial_cost), float(s_single.initial_cost), rtol=1e-10)
    np.testing.assert_allclose(
        float(s_dist.final_cost), float(s_single.final_cost), rtol=1e-6)
    np.testing.assert_allclose(p_dist.knots, p_single.knots, atol=1e-8)
    np.testing.assert_allclose(p_dist.landmarks, p_single.landmarks, atol=1e-8)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    knots, cost = jax.jit(fn)(*args)
    assert knots.shape == (34, 7)
    assert np.isfinite(float(cost))
