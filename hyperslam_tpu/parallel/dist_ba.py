"""Distributed bundle adjustment — factor-sharded reduction over a device mesh.

The reference has no distribution (single-process ROS + 1-thread Ceres —
SURVEY.md §2.4); this module adds the TPU-native scaling story: factors are
sharded across chips along the batch axis, each chip linearizes its shard and
assembles local normal-equation blocks (dense matmuls on its MXU), then one
``psum`` over the ICI mesh produces the replicated reduced system
(H, g, Hll, gl, W).  The small Schur solve runs replicated; deltas are
identical on every chip, so the parameter update needs no further
communication.  This is the classic distributed Schur-complement BA pattern
(reduce-then-solve), with communication O(D^2 + L·D·3) independent of the
number of factors.

Works on any ``jax.sharding.Mesh`` — virtual CPU devices in tests
(``--xla_force_host_platform_device_count``), real TPU slices in production.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..solver import ba
from ..solver.problem import (CameraCalib, Factors, ImuCalib, Masks, Params,
                              SolverConfig)

__all__ = ["distributed_optimize", "shard_factors"]

AXIS = "factors"


def shard_factors(factors: Factors, mesh: Mesh) -> Factors:
    """Place factor arrays sharded along their leading (capacity) axis.

    Capacities must be divisible by the mesh size — pad capacities up when
    building the window (they are static anyway).  The frame-shared fast
    path is dropped (frames=None): frame indices do not survive batch
    sharding, and each chip falls back to the per-factor linearizer.

    The marginal prior and the calibration anchor are NOT factor batches
    (dense D0-row / 6-row blocks); they are placed REPLICATED and the
    solver applies them outside the sharded reduction
    (ba.dense_prior_reduce) — the sharded solve optimizes the same problem
    as the single-device one, self-calibration included."""
    dense = {"marg": factors.marg, "calib_prior": factors.calib_prior}
    factors = factors.replace(
        frames=None, bearing=factors.bearing.replace(frame=None),
        pixel=factors.pixel.replace(frame=None), marg=None, calib_prior=None)
    sharding = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    out = jax.tree.map(lambda x: jax.device_put(x, sharding), factors)
    dense = jax.tree.map(lambda x: jax.device_put(x, rep), dense)
    return out.replace(marg=dense["marg"], calib_prior=dense["calib_prior"])


def _replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"))
def distributed_optimize(params: Params, cams: CameraCalib, imu: ImuCalib,
                         factors: Factors, masks: Masks, cfg: SolverConfig,
                         dt, bias_dt, mesh: Mesh):
    """LM loop with factor-sharded linearization + psum-reduced solve.

    Semantically identical to ``ba.optimize`` (same fixed iteration count,
    damping and acceptance rule); only the reduction is distributed."""
    L = params.num_landmarks
    dtype = params.knots.dtype
    # Forward-mode factor Jacobians inside the shard: XLA:CPU (jax 0.9.0)
    # miscompiles reverse-mode autodiff of the spline chain inside
    # shard_map bodies depending on the surrounding fusion (wrong J,
    # correct primal — see SolverConfig.use_jacfwd).  Forward mode is
    # immune; every sharded solver forces it.
    # bias-prior rows must be counted ONCE, not once per shard: suppress
    # them inside the shard body and add them with the other replicated
    # dense rows below (SolverConfig.include_bias_prior)
    has_bias_prior = bool(
        factors.inertial.s.shape[0] or
        (factors.preint is not None and factors.preint.s_i.shape[0]))
    cfg = cfg.replace(use_jacfwd=True, include_bias_prior=False)

    # dense replicated rows (see shard_factors): applied outside the shard
    marg = factors.marg
    calib_prior = factors.calib_prior
    factors_sh = factors.replace(marg=None, calib_prior=None)

    fspec = jax.tree.map(lambda _: P(AXIS), factors_sh)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, fspec, rep),
        out_specs=(rep, rep, rep, rep, rep))
    def reduce_shard(p, c, i, f, m):
        sys = ba.linearize(p, c, i, f, m, cfg, dt, bias_dt)
        H, g, Hll, gl, W = ba.reduce_system(sys, L)
        return tuple(jax.lax.psum(x, AXIS) for x in (H, g, Hll, gl, W))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(rep, rep, rep, fspec),
        out_specs=rep)
    def cost_shard(p, c, i, f):
        return jax.lax.psum(
            ba.compute_cost(p, c, i, f, cfg, dt, bias_dt), AXIS)

    def cost_of(p, c, i):
        return cost_shard(p, c, i, factors_sh) \
            + ba.dense_prior_cost(p, c, i, marg, calib_prior, cfg,
                                  has_bias_prior)

    cost0 = cost_of(params, cams, imu)

    def body(carry, _):
        p, c, i, lam, cost = carry
        H, g, Hll, gl, W = reduce_shard(p, c, i, factors_sh, masks)
        if marg is not None or calib_prior is not None or has_bias_prior:
            Ha, ga = ba.dense_prior_reduce(p, c, i, marg, calib_prior,
                                           masks, cfg, H.dtype,
                                           bias_prior=has_bias_prior)
            H = H + Ha
            g = g + ga
        dp, dl = ba.solve_reduced(H, g, Hll, gl, W, masks, lam, cfg)
        tp, tc, ti = ba.apply_delta(p, c, i, dp, dl, masks, cfg)
        trial_cost = cost_of(tp, tc, ti)
        accept = trial_cost < cost
        sel = lambda a, b: jnp.where(accept, a, b)
        p_next = jax.tree.map(sel, tp, p)
        c_next = jax.tree.map(sel, tc, c)
        i_next = jax.tree.map(sel, ti, i)
        cost_next = jnp.where(accept, trial_cost, cost)
        lam_next = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            1e-10, 1e6)
        return (p_next, c_next, i_next, lam_next, cost_next), accept

    init = (params, cams, imu, jnp.asarray(cfg.init_lambda, dtype), cost0)
    (p_fin, c_fin, i_fin, lam_fin, cost_fin), accepted = jax.lax.scan(
        body, init, None, length=cfg.max_iterations)
    return p_fin, c_fin, i_fin, ba.SolveStats(
        initial_cost=cost0, final_cost=cost_fin, lambda_final=lam_fin,
        accepted=accepted)
