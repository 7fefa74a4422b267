"""Time-axis (sequence-parallel) sharded bundle adjustment with halo knots.

This is the honest SP/CP analogue for continuous-time SLAM (SURVEY.md §2.4,
§5.7): the trajectory/time axis is the "sequence", and the cumulative
B-spline's local support gives the natural overlap — each residual touches
exactly ``order`` consecutive knots (the reference's ``outerPadding``,
``ceres/optimizer.cpp:288-290``).

Partitioning (contrast with ``dist_ba.py``, which shards only the factor
batch while every chip linearizes against the FULL window):

- **Knots are sharded along time**: inside the mapped region chip d sees its
  contiguous slice of ``Ks = K / n_dev`` knots plus a halo of ``halo``
  knots received from its right neighbour with one ``ppermute`` — the only
  knot communication.  (A replicated (K, 7) copy also exists at the top
  level for the retraction step; at 7K floats it is negligible — the things
  that grow with window length and data rate, the per-factor autodiff
  linearization and the row reductions, are what shard.)
- **Factors are routed by segment** (host-side, one-time): chip d linearizes
  only factors whose first support knot lies in its slice; their Jacobian
  columns fall entirely inside its slice + halo, so its local system is a
  band of the global one.  Smoothness triples route by their first knot
  (span 3 <= order - 1 + 1, inside the halo band); preintegrated factors
  route by their *start* segment — their end segment may reach into the
  halo, so the halo is widened to ``order - 1 + max_span`` (see
  :func:`required_halo`); both ends must then fall within one slice + halo
  (i.e. interval length < slice span), which holds for keyframe-rate
  preintegration on any practical slicing.
- Per-chip banded blocks are scattered to global column offsets and
  ``psum``-ed into the replicated reduced system (an overlap-add of bands).
  Bias/gravity/calibration columns are global (they couple all of time) and
  reduce like any sum.  The last chip's halo columns would alias the tail
  (bias) columns; its halo contributions are explicitly zeroed before the
  scatter, so the invariant is enforced rather than assumed.
- The **marginal prior** is dense over the whole window (not banded); its
  D0 x D0 row block is tiny and is linearized REPLICATED outside the
  shard_map and added to the psum-reduced system — exact, with zero
  communication.
- The reduced solve (window-sized: ~30 knots online) runs replicated.  For
  offline windows with thousands of knots see ``condensed_ba.py`` —
  interface condensation (eliminate each chip's interior onto its
  boundary knots, all-gather the tiny interface system).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..solver import ba
from ..solver.problem import (CameraCalib, Factors, ImuCalib, Masks, Params,
                              SolverConfig, make_layout)

__all__ = ["partition_factors_by_time", "time_partitioned_optimize",
           "required_halo", "AXIS"]

AXIS = "time"


def required_halo(factors: Factors, K: int, n_dev: int,
                  order: int = 4) -> int:
    """Halo width (knots borrowed from the right neighbour) needed so every
    routed factor's support falls inside slice + halo.

    Plain factors need ``order - 1``.  A preintegrated factor routed by its
    start segment ``s_i`` additionally reaches ``s_j - s_i`` segments right:
    halo >= s_j_local + order - Ks over all factors."""
    Ks = K // n_dev
    halo = order - 1
    if factors.preint is not None:
        act = np.asarray(factors.preint.active) > 0
        if act.any():
            s_i = np.asarray(factors.preint.s_i)[act]
            s_j = np.asarray(factors.preint.s_j)[act]
            need = int((s_j - (s_i // Ks) * Ks).max()) + order - Ks
            halo = max(halo, need)
    if halo > Ks:
        raise ValueError(
            f"required halo ({halo}) exceeds the per-chip slice ({Ks}): "
            "a preintegration interval spans more than one slice — use "
            "fewer chips, more knots, or dist_ba")
    return halo


def partition_factors_by_time(factors: Factors, K: int, n_dev: int,
                              cap_per_dev: int = None) -> Factors:
    """Host-side routing: reshape every factor family to (n_dev, cap, ...)
    with segment indices rebased to the owner's slice (s_local = s - d*Ks).

    ``cap_per_dev`` defaults to the worst chip's count (static per window
    configuration when the input capacities are static).  The marginal
    prior (dense in time) is passed through unsharded — the solver applies
    it replicated."""
    Ks = K // n_dev
    assert Ks * n_dev == K, "K must be divisible by n_dev"
    # frame-shared fast path does not survive re-routing; per-factor (s, u)
    # stay authoritative
    factors = factors.replace(
        frames=None, bearing=factors.bearing.replace(frame=None),
        pixel=factors.pixel.replace(frame=None))

    def split_family(f, key_field="s", rebase_fields=("s",)):
        if f is None:
            return None
        s = np.asarray(getattr(f, key_field))
        act = np.asarray(f.active)
        owner = np.clip(np.where(act > 0, s // Ks, 0), 0, n_dev - 1)
        counts = np.bincount(owner[act > 0], minlength=n_dev) \
            if (act > 0).any() else np.zeros(n_dev, int)
        cap = int(cap_per_dev or max(1, counts.max() if counts.size else 1))
        out = {}
        for name in f.__dataclass_fields__:
            if getattr(f, name) is None:
                continue
            arr = np.asarray(getattr(f, name))
            new = np.zeros((n_dev, cap) + arr.shape[1:], arr.dtype)
            if name == "meas" and arr.ndim == 2:
                if arr.shape[1] == 3:    # bearing: unit z
                    new[..., 2] = 1.0
                elif arr.shape[1] == 7:  # pose: identity quaternion
                    new[..., 0] = 1.0
            if name in ("dq",) and arr.ndim == 2:
                new[..., 0] = 1.0        # identity preintegrated rotation
            if name == "sqrt_info" and arr.ndim == 3:
                new[:] = np.eye(arr.shape[-1], dtype=arr.dtype)
            if name == "dt_ij":
                new[:] = 1.0
            out[name] = new
        for d in range(n_dev):
            rows = np.nonzero((owner == d) & (act > 0))[0]
            if len(rows) > cap:
                rows = rows[-cap:]
            n = len(rows)
            for name in out:
                vals = np.asarray(getattr(f, name))[rows]
                if name in rebase_fields:
                    vals = vals - d * Ks
                out[name][d, :n] = vals
        return type(f)(**{k: jnp.asarray(v) for k, v in out.items()})

    return Factors(
        bearing=split_family(factors.bearing),
        pixel=split_family(factors.pixel),
        inertial=split_family(factors.inertial),
        prior=split_family(factors.prior),
        preint=split_family(factors.preint, key_field="s_i",
                            rebase_fields=("s_i", "s_j")),
        smooth=split_family(factors.smooth, key_field="i",
                            rebase_fields=("i",)),
        marg=factors.marg,
        calib_prior=factors.calib_prior)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "order", "halo"))
def time_partitioned_optimize(params: Params, cams: CameraCalib,
                              imu: ImuCalib, factors_td: Factors,
                              masks: Masks, cfg: SolverConfig,
                              dt, bias_dt, mesh: Mesh, order: int = 4,
                              halo: int = None):
    """LM loop with time-sharded knots/factors (see module docstring).

    ``factors_td``: output of :func:`partition_factors_by_time`.  ``halo``:
    knots borrowed from the right neighbour (default ``order - 1``; pass
    :func:`required_halo` when preint factors are present).  Semantics
    identical to ``ba.optimize`` (fixed iterations, damping, acceptance)."""
    K = params.num_knots
    L = params.num_landmarks
    Kb = params.num_bias_knots
    n_dev = mesh.shape[AXIS]
    Ks = K // n_dev
    # Forward-mode factor Jacobians inside the shard: XLA:CPU (jax 0.9.0)
    # miscompiles jacrev of the spline chain when the local knots come from
    # a concatenate inside a shard_map body (wrong J, correct primal —
    # see SolverConfig.use_jacfwd and the repro notes there).
    # bias-prior rows counted ONCE (outside the psum), not once per chip:
    # every chip's slice has nonzero inertial capacity, so without the
    # suppression the psum scales the bias prior by n_dev (r5 fix, see
    # SolverConfig.include_bias_prior).
    has_bias_prior = bool(
        factors_td.inertial.s.shape[1] or
        (factors_td.preint is not None and factors_td.preint.s_i.shape[1]))
    cfg = cfg.replace(use_jacfwd=True, include_bias_prior=False)
    if halo is None:
        halo = order - 1
    assert Ks >= halo, (
        f"knot slice per chip ({Ks}) must cover the halo ({halo}): "
        f"use fewer chips or more knots")
    dtype = params.knots.dtype
    C = cams.T_bs.shape[0]
    D = make_layout(K, Kb, C, masks).D

    # The marginal prior is dense in time and the calibration anchor's
    # columns are global: both are linearized REPLICATED, outside the
    # sharded band reduction (their rows are tiny next to the factor
    # batch).  ``factors_sh`` is the sharded remainder.
    marg = factors_td.marg
    calib_prior = factors_td.calib_prior
    factors_sh = factors_td.replace(marg=None, calib_prior=None)

    fspec = jax.tree.map(lambda _: P(AXIS), factors_sh)
    rep = P()
    perm = [(d, d - 1) for d in range(1, n_dev)]   # halo: right -> left

    def local_view(knots_sh, kmask_sh):
        """(Ks, 7) own slice -> (Ks + halo, 7) with the right-neighbour halo
        (the outerPadding exchange).  The last chip's halo arrives as zeros
        with a zero mask; its factors never gather those rows (their support
        ends at its own last knot)."""
        halo_knots = jax.lax.ppermute(knots_sh[:halo], AXIS, perm)
        halo_mask = jax.lax.ppermute(kmask_sh[:halo], AXIS, perm)
        return (jnp.concatenate([knots_sh, halo_knots], 0),
                jnp.concatenate([kmask_sh, halo_mask], 0))

    def cmap_valid(d_idx):
        """Local column -> (global column, validity).  On the last chip the
        halo columns have no global counterpart (they would alias the bias
        tail); they are flagged invalid and their contributions zeroed."""
        knot_cols = d_idx * Ks * 6 + jnp.arange((Ks + halo) * 6)
        valid_k = knot_cols < K * 6
        tail = jnp.arange(K * 6, D)
        cmap = jnp.concatenate([jnp.minimum(knot_cols, K * 6 - 1), tail])
        valid = jnp.concatenate(
            [valid_k, jnp.ones(D - K * 6, dtype=bool)])
        return cmap, valid

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), rep, rep, rep, fspec, P(AXIS), rep),
        out_specs=(rep, rep, rep, rep, rep))
    def reduce_shard(knots_sh, p_rest, c, i, f_td, kmask_sh, m):
        d_idx = jax.lax.axis_index(AXIS)
        f = jax.tree.map(lambda x: x[0], f_td)
        knots_loc, kmask_loc = local_view(knots_sh, kmask_sh)
        p_loc = p_rest.replace(knots=knots_loc)
        m_loc = m.replace(knots=kmask_loc)
        sys = ba.linearize(p_loc, c, i, f, m_loc, cfg, dt, bias_dt)
        H_loc, g_loc, Hll, gl, W_loc = ba.reduce_system(sys, L)
        cmap, valid = cmap_valid(d_idx)
        sdt = H_loc.dtype
        v = valid.astype(sdt)
        H_loc = H_loc * v[:, None] * v[None, :]
        g_loc = g_loc * v
        W_loc = W_loc * v[None, :, None]
        H = jnp.zeros((D, D), sdt).at[jnp.ix_(cmap, cmap)].add(H_loc)
        g = jnp.zeros((D,), sdt).at[cmap].add(g_loc)
        W = jnp.zeros((L, D, 3), sdt).at[:, cmap, :].add(W_loc)
        return tuple(jax.lax.psum(x, AXIS) for x in (H, g, Hll, gl, W))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), rep, rep, rep, fspec),
        out_specs=rep)
    def cost_shard(knots_sh, p_rest, c, i, f_td):
        f = jax.tree.map(lambda x: x[0], f_td)
        ones = jnp.ones(knots_sh.shape[0], dtype)
        knots_loc, _ = local_view(knots_sh, ones)
        p_loc = p_rest.replace(knots=knots_loc)
        return jax.lax.psum(
            ba.compute_cost(p_loc, c, i, f, cfg, dt, bias_dt), AXIS)

    def cost_of(p, c, i):
        cost = cost_shard(p.knots, p, c, i, factors_sh)
        return cost + ba.dense_prior_cost(p, c, i, marg, calib_prior, cfg,
                                          has_bias_prior)

    def reduce_full(p, c, i):
        H, g, Hll, gl, W = reduce_shard(p.knots, p, c, i, factors_sh,
                                        masks.knots, masks)
        if marg is not None or calib_prior is not None or has_bias_prior:
            Ha, ga = ba.dense_prior_reduce(p, c, i, marg, calib_prior,
                                           masks, cfg, H.dtype,
                                           bias_prior=has_bias_prior)
            H = H + Ha
            g = g + ga
        return H, g, Hll, gl, W

    cost0 = cost_of(params, cams, imu)

    def body(carry, _):
        p, c, i, lam, cost = carry
        H, g, Hll, gl, W = reduce_full(p, c, i)
        dp, dl = ba.solve_reduced(H, g, Hll, gl, W, masks, lam, cfg)
        tp, tc, ti = ba.apply_delta(p, c, i, dp, dl, masks, cfg)
        trial = cost_of(tp, tc, ti)
        accept = trial < cost
        sel = lambda a, b: jnp.where(accept, a, b)
        p_next = jax.tree.map(sel, tp, p)
        c_next = jax.tree.map(sel, tc, c)
        i_next = jax.tree.map(sel, ti, i)
        cost_next = jnp.where(accept, trial, cost)
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
