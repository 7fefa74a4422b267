"""Interface-condensed time-sharded BA for long offline windows.

``time_ba.py`` shards the *assembly* along time but still solves the full
reduced system REPLICATED — fine online (~30 knots), wasteful offline where
a window has thousands of knots.  This module completes the SP/CP story
(promised in ``time_ba.py``; reference window mechanics
``ceres/optimizer.cpp:286-345``): each chip ELIMINATES its interior knots
onto its boundary (interface) knots, only the tiny interface system is
``psum``-reduced and solved replicated, and interiors + landmarks are
back-substituted locally.  Per-iteration communication drops from
O((K*6)^2) to O((n_dev*halo*6 + tail)^2), and the dense factorization from
O((K*6)^3) replicated to O(((Ks-halo)*6)^3) per chip in parallel.

Partitioning (host-side, one-time, :func:`condense_partition`):

- Knots: chip d owns slice ``[d*Ks, (d+1)*Ks)`` and borrows ``halo`` knots
  from its right neighbour (one ``ppermute`` — the cumulative B-spline's
  ``outerPadding`` overlap, ``ceres/optimizer.cpp:288-290``).
- Local column classes: the leading ``halo`` knots of every slice are
  INTERFACE (shared with the left neighbour's borrowed halo; chip 0's are
  promoted too so shapes stay uniform); the remaining ``Ks - halo`` slice
  knots are INTERIOR (touched by this chip only); the
  bias/gravity/calibration tail is global interface.
- Factors route by first support knot; every LANDMARK's observations must
  land on ONE chip (it is Schur-eliminated locally): a landmark is owned
  by the chip of its first observation and all its factors must fit in
  that chip's slice + halo — the natural regime offline (hundreds of knots
  per chip, tracks spanning tens).  Violations raise at partition time.
- Landmark slots are RELABELLED per chip (``lm_map``), so the per-chip
  elimination arrays are (L_cap, ...) local, not (L_global, ...).

Exactness: one damped step solves the SAME damped system as
``ba.optimize``'s ``solve_reduced`` (landmark damping, lambda*diag,
frozen-column identities, jitter); interior elimination is block Gaussian
elimination of that system, so the step matches the single-device solver
to reduction roundoff (parity-tested on the 8-device CPU mesh).

Not supported: a ``MargPrior`` (dense over ALL knot columns — it breaks
the banded structure, and a fixed-lag marginal prior is incoherent for
offline full-window BA).  The ``CalibPrior`` IS supported — its columns
live in the global tail, which is interface.

Forward-mode Jacobians are forced inside the shard (see
``SolverConfig.use_jacfwd`` for the XLA:CPU jacrev miscompile this avoids).
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

__all__ = ["condense_partition", "condensed_optimize", "AXIS"]

AXIS = "time"


def condense_partition(factors: Factors, K: int, n_dev: int,
                       halo: int = 3, lm_cap: int = None):
    """Route factors by time with landmark locality (see module docstring).

    Returns ``(factors_td, lm_map, lm_active_td)``:
    - factors_td: (n_dev, cap, ...) routed families, segment indices
      rebased, landmark indices relabelled to local slots;
    - lm_map: (n_dev, L_cap) int32 global slot per local slot (0-padded);
    - lm_active_td: (n_dev, L_cap) {0,1} local slot validity."""
    if factors.marg is not None:
        raise ValueError("condensed BA does not support a dense MargPrior "
                         "(see module docstring); use time_ba")
    factors = factors.replace(
        frames=None, bearing=factors.bearing.replace(frame=None),
        pixel=factors.pixel.replace(frame=None))
    Ks = K // n_dev
    assert Ks * n_dev == K, "K must be divisible by n_dev"

    # landmark ownership: chip of the first active observation
    owner_of_lm = {}
    for fam in (factors.bearing, factors.pixel):
        s = np.asarray(fam.s)
        lm = np.asarray(fam.lm)
        act = np.asarray(fam.active) > 0
        for idx in np.nonzero(act)[0]:
            d = min(int(s[idx]) // Ks, n_dev - 1)
            owner_of_lm.setdefault(int(lm[idx]), d)

    slots = [dict() for _ in range(n_dev)]
    for g_slot, d in sorted(owner_of_lm.items()):
        slots[d][g_slot] = len(slots[d])
    n_loc = max([len(s) for s in slots] + [1])
    L_cap = int(lm_cap or n_loc)
    if n_loc > L_cap:
        raise ValueError(f"lm_cap {L_cap} < required {n_loc}")
    lm_map = np.zeros((n_dev, L_cap), np.int32)
    lm_active = np.zeros((n_dev, L_cap), np.float64)
    for d in range(n_dev):
        for g_slot, l_slot in slots[d].items():
            lm_map[d, l_slot] = g_slot
            lm_active[d, l_slot] = 1.0

    def split_family(f, key_field="s", rebase_fields=("s",), visual=False):
        if f is None:
            return None
        s = np.asarray(getattr(f, key_field))
        act = np.asarray(f.active)
        if visual:
            lm = np.asarray(f.lm)
            owner = np.zeros(len(act), int)
            for idx in np.nonzero(act > 0)[0]:
                d = owner_of_lm[int(lm[idx])]
                owner[idx] = d
                s_loc = int(s[idx]) - d * Ks
                if not (0 <= s_loc and s_loc + 3 < Ks + halo):
                    raise ValueError(
                        f"landmark {int(lm[idx])} observed at segment "
                        f"{int(s[idx])} outside owner chip {d}'s "
                        f"slice+halo (halo {halo} too narrow for this "
                        "track span)")
        else:
            owner = np.clip(np.where(act > 0, s // Ks, 0), 0, n_dev - 1)
        counts = np.bincount(owner[act > 0].astype(int), minlength=n_dev) \
            if (act > 0).any() else np.zeros(n_dev, int)
        cap = int(max(1, counts.max() if counts.size else 1))
        out = {}
        for name in f.__dataclass_fields__:
            if getattr(f, name) is None:
                continue
            arr = np.asarray(getattr(f, name))
            new = np.zeros((n_dev, cap) + arr.shape[1:], arr.dtype)
            if name == "meas" and arr.ndim == 2:
                if arr.shape[1] == 3:
                    new[..., 2] = 1.0
                elif arr.shape[1] == 7:
                    new[..., 0] = 1.0
            if name == "dq" and arr.ndim == 2:
                new[..., 0] = 1.0
            if name == "sqrt_info" and arr.ndim == 3:
                new[:] = np.eye(arr.shape[-1], dtype=arr.dtype)
            if name == "dt_ij":
                new[:] = 1.0
            out[name] = new
        for d in range(n_dev):
            rows = np.nonzero((owner == d) & (act > 0))[0]
            n = len(rows)
            for name in out:
                vals = np.asarray(getattr(f, name))[rows]
                if name in rebase_fields:
                    vals = vals - d * Ks
                if visual and name == "lm":
                    vals = np.array([slots[d][int(v)] for v in vals],
                                    np.int32)
                out[name][d, :n] = vals
        return type(f)(**{k: jnp.asarray(v) for k, v in out.items()})

    f_td = Factors(
        bearing=split_family(factors.bearing, visual=True),
        pixel=split_family(factors.pixel, visual=True),
        inertial=split_family(factors.inertial),
        prior=split_family(factors.prior),
        preint=split_family(factors.preint, key_field="s_i",
                            rebase_fields=("s_i", "s_j")),
        smooth=split_family(factors.smooth, key_field="i",
                            rebase_fields=("i",)),
        marg=None,
        calib_prior=factors.calib_prior)
    return f_td, jnp.asarray(lm_map), jnp.asarray(lm_active)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "order", "halo"))
def condensed_optimize(params: Params, cams: CameraCalib, imu: ImuCalib,
                       factors_td: Factors, lm_map, lm_active_td,
                       masks: Masks, cfg: SolverConfig, dt, bias_dt,
                       mesh: Mesh, order: int = 4, halo: int = 3):
    """LM loop with per-chip interior condensation (see module docstring).

    Inputs from :func:`condense_partition`; semantics identical to
    ``ba.optimize`` (fixed iterations, damping, acceptance)."""
    K = params.num_knots
    L = params.num_landmarks
    Kb = params.num_bias_knots
    n_dev = mesh.shape[AXIS]
    Ks = K // n_dev
    # bias-prior rows counted once in the dense tail (not per chip —
    # see SolverConfig.include_bias_prior, r5 fix)
    has_bias_prior = bool(
        factors_td.inertial.s.shape[1] or
        (factors_td.preint is not None and factors_td.preint.s_i.shape[1]))
    cfg = cfg.replace(use_jacfwd=True, include_bias_prior=False)
    assert Ks >= 2 * halo, (
        f"per-chip slice ({Ks}) must cover leading interface + interior "
        f"+ borrowed halo (needs Ks >= 2*halo = {2 * halo})")
    dtype = params.knots.dtype
    C = cams.T_bs.shape[0]
    D = make_layout(K, Kb, C, masks).D
    Dtail = D - K * 6
    L_cap = lm_map.shape[1]
    nH = halo * 6                   # interface block per slice boundary
    nI = (Ks - halo) * 6            # interior block per chip
    DI = n_dev * nH + Dtail         # global interface dimension
    D_loc = (Ks + halo) * 6 + Dtail

    calib_prior = factors_td.calib_prior
    factors_sh = factors_td.replace(marg=None, calib_prior=None)

    fspec = jax.tree.map(lambda _: P(AXIS), factors_sh)
    rep = P()
    perm = [(d, d - 1) for d in range(1, n_dev)]

    # static local column classes:
    # [lead nH | interior nI | borrowed nH | tail Dtail]
    inter = nH + jnp.arange(nI)
    iface_cols_loc = jnp.concatenate([
        jnp.arange(nH),                       # own leading halo
        Ks * 6 + jnp.arange(nH),              # borrowed (next chip's lead)
        (Ks + halo) * 6 + jnp.arange(Dtail)])  # global tail
    is_interior = jnp.zeros(D_loc, bool).at[inter].set(True)

    def iface_cmap(d_idx):
        """Local interface columns -> global interface indices; the last
        chip's borrowed block has no global partner (invalid)."""
        own = d_idx * nH + jnp.arange(nH)
        nxt = jnp.minimum(d_idx + 1, n_dev - 1) * nH + jnp.arange(nH)
        valid_nxt = jnp.full((nH,), d_idx + 1 < n_dev)
        tail = n_dev * nH + jnp.arange(Dtail)
        cmap = jnp.concatenate([own, nxt, tail])
        valid = jnp.concatenate(
            [jnp.ones(nH, bool), valid_nxt, jnp.ones(Dtail, bool)])
        return cmap, valid

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), rep, rep, rep, fspec, P(AXIS), rep, rep,
                  P(AXIS), P(AXIS), rep, rep),
        out_specs=(rep, rep))
    def step_shard(knots_sh, p_rest, c, i, f_td, kmask_sh, m, lam,
                   lm_map_sh, lm_act_sh, Ha_tail, ga_tail):
        d_idx = jax.lax.axis_index(AXIS)
        lm_map_d = lm_map_sh[0]
        lm_act_d = lm_act_sh[0]
        halo_knots = jax.lax.ppermute(knots_sh[:halo], AXIS, perm)
        halo_mask = jax.lax.ppermute(kmask_sh[:halo], AXIS, perm)
        knots_loc = jnp.concatenate([knots_sh, halo_knots], 0)
        kmask_loc = jnp.concatenate([kmask_sh, halo_mask], 0)
        p_loc = p_rest.replace(knots=knots_loc,
                               landmarks=p_rest.landmarks[lm_map_d])
        m_loc = m.replace(knots=kmask_loc,
                          landmarks=m.landmarks[lm_map_d] * lm_act_d)
        f = jax.tree.map(lambda x: x[0], f_td)
        sys = ba.linearize(p_loc, c, i, f, m_loc, cfg, dt, bias_dt)
        H, g, Hll, gl, W = ba.reduce_system(sys, L_cap)
        sdt = H.dtype

        # invalidate the last chip's borrowed columns (no global partner)
        cmap, valid = iface_cmap(d_idx)
        v_loc = jnp.ones(D_loc, bool).at[iface_cols_loc].set(valid)
        vf = v_loc.astype(sdt)
        H = H * vf[:, None] * vf[None, :]
        g = g * vf
        W = W * vf[None, :, None]

        # landmark elimination (damped, solve_reduced semantics)
        lmfree = m_loc.landmarks.astype(sdt)
        eye3 = jnp.eye(3, dtype=sdt)
        dHll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
        Hll_d = (Hll + lam * dHll[..., None] * eye3
                 + (cfg.landmark_jitter + (1.0 - lmfree))[:, None, None]
                 * eye3)
        Hll_inv = ba._inv3x3(Hll_d)
        S = H - jnp.einsum("ldi,lij,lej->de", W, Hll_inv, W)
        gs = g - jnp.einsum("ldi,lij,lj->d", W, Hll_inv, gl)

        # interior damping + frozen identity + jitter (the interior
        # diagonal is exclusively local, so diag(S_global) = diag(S) there)
        cm_loc = jnp.clip(jnp.diagonal(H), 0.0, None) > 0.0
        dS = jnp.diagonal(S)
        S = S + jnp.diag(jnp.where(
            is_interior, lam * dS + 1e-8 + (1.0 - cm_loc.astype(sdt)), 0.0))

        # eliminate the interior onto the interface
        SEE = S[inter][:, inter]
        SEI = S[inter][:, iface_cols_loc]           # (nI, nIf_loc)
        gE = gs[inter]
        cE, lowE = jax.scipy.linalg.cho_factor(SEE, lower=True)
        X = jax.scipy.linalg.cho_solve((cE, lowE), SEI)
        y = jax.scipy.linalg.cho_solve((cE, lowE), gE)
        S_II = S[iface_cols_loc][:, iface_cols_loc] - SEI.T @ X
        g_II = gs[iface_cols_loc] - SEI.T @ y
        dS_iface = dS[iface_cols_loc]               # undamped diag info
        cm_iface = cm_loc[iface_cols_loc].astype(sdt)

        vv = valid.astype(sdt)
        SI = jnp.zeros((DI, DI), sdt).at[jnp.ix_(cmap, cmap)].add(
            S_II * vv[:, None] * vv[None, :])
        gI = jnp.zeros((DI,), sdt).at[cmap].add(g_II * vv)
        dI = jnp.zeros((DI,), sdt).at[cmap].add(dS_iface * vv)
        cmI = jnp.zeros((DI,), sdt).at[cmap].add(cm_iface * vv)
        SI = jax.lax.psum(SI, AXIS)
        gI = jax.lax.psum(gI, AXIS)
        dI = jax.lax.psum(dI, AXIS)
        cmI = jax.lax.psum(cmI, AXIS)

        # replicated calibration-anchor rows: tail columns are interface
        tail_I = n_dev * nH + jnp.arange(Dtail)
        SI = SI.at[jnp.ix_(tail_I, tail_I)].add(Ha_tail)
        gI = gI.at[tail_I].add(ga_tail)
        dI = dI.at[tail_I].add(jnp.diagonal(Ha_tail))
        cmI = cmI.at[tail_I].add(jnp.diagonal(Ha_tail) > 0.0)

        # interface damping + frozen identity + jitter, Jacobi-scaled chol
        SI = SI + jnp.diag(lam * dI + 1e-8
                           + (1.0 - (cmI > 0.0).astype(sdt)))
        dsc = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(SI), 1e-12, None))
        Ss = SI * dsc[:, None] * dsc[None, :]
        cI, lowI = jax.scipy.linalg.cho_factor(Ss, lower=True)
        xI = -dsc * jax.scipy.linalg.cho_solve((cI, lowI), dsc * gI)

        # back-substitute this chip's interior:
        # xE = -SEE^-1 (gE + SEI @ xI_loc) = -(y + X @ xI_loc)
        xI_loc = xI[cmap] * vv
        xE = -(y + X @ xI_loc)

        # assemble the global delta: interface knots + tail replicated,
        # interiors scattered per chip
        dp = jnp.zeros((D,), sdt)
        dp = dp.at[K * 6:].set(xI[n_dev * nH:])
        lead_cols = (jnp.arange(n_dev)[:, None] * Ks * 6
                     + jnp.arange(nH)[None, :]).reshape(-1)
        dp = dp.at[lead_cols].set(xI[:n_dev * nH])
        int_cols = d_idx * Ks * 6 + nH + jnp.arange(nI)
        dp = dp + jax.lax.psum(
            jnp.zeros((D,), sdt).at[int_cols].set(xE), AXIS)

        # landmark back-substitution on local slots, scattered to global
        dp_loc = jnp.concatenate([
            xI_loc[:nH], xE, xI_loc[nH:2 * nH], xI_loc[2 * nH:]]) * vf
        dl_loc = -jnp.einsum("lij,lj->li", Hll_inv,
                             gl + jnp.einsum("ldi,d->li", W, dp_loc))
        dl_loc = dl_loc * lm_act_d[:, None]
        dl = jax.lax.psum(
            jnp.zeros((L, 3), sdt).at[lm_map_d].add(dl_loc), AXIS)
        return dp, dl

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), rep, rep, rep, fspec, P(AXIS)),
        out_specs=rep)
    def cost_shard(knots_sh, p_rest, c, i, f_td, lm_map_sh):
        f = jax.tree.map(lambda x: x[0], f_td)
        halo_knots = jax.lax.ppermute(knots_sh[:halo], AXIS, perm)
        knots_loc = jnp.concatenate([knots_sh, halo_knots], 0)
        p_loc = p_rest.replace(knots=knots_loc,
                               landmarks=p_rest.landmarks[lm_map_sh[0]])
        return jax.lax.psum(
            ba.compute_cost(p_loc, c, i, f, cfg, dt, bias_dt), AXIS)

    def cost_of(p, c, i):
        return cost_shard(p.knots, p, c, i, factors_sh, lm_map) \
            + ba.dense_prior_cost(p, c, i, None, calib_prior, cfg,
                                  has_bias_prior)

    cost0 = cost_of(params, cams, imu)

    def dense_tail(p, c, i):
        if calib_prior is None and not has_bias_prior:
            z = jnp.zeros((Dtail, Dtail), ba._solve_dtype(dtype))
            return z, jnp.zeros((Dtail,), z.dtype)
        # calib anchor + bias prior both touch only tail columns (>= K*6)
        Ha, ga = ba.dense_prior_reduce(p, c, i, None, calib_prior, masks,
                                       cfg, ba._solve_dtype(dtype),
                                       bias_prior=has_bias_prior)
        return Ha[K * 6:, K * 6:], ga[K * 6:]

    def body(carry, _):
        p, c, i, lam, cost = carry
        Ha_tail, ga_tail = dense_tail(p, c, i)
        dp, dl = step_shard(
            p.knots, p, c, i, factors_sh, masks.knots, masks,
            jnp.asarray(lam, ba._solve_dtype(dtype)),
            lm_map, lm_active_td, Ha_tail, ga_tail)
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
