"""Microbenchmark: where does linearize time go?

Variants of the bearing linearizer on the bench envelope:
  full       — current path (jac + dense-row scatter)
  blocks     — jac only, return (F,3,24)/(F,3,3) blocks, no dense rows
  fwd/rev    — jacfwd vs jacrev for the blocks variant
  reduce_blk — block-based normal-equation assembly (one-hot matmul + static
               band scatter) vs current dense reduce
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_problem
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import SolverConfig
from hyperslam_tpu.factors import residuals as res
from hyperslam_tpu.factors import losses
from hyperslam_tpu.state import bspline

cfg = SolverConfig(max_iterations=5)
params, cams, imu, factors, masks = _build_problem()
lay = ba.problem_layout(params, cams, masks)
f = factors.bearing
dtype = params.knots.dtype
order = cfg.order


def timeit(fn, *args, n=40):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def bearing_blocks(jac):
    def run(params, cams, f):
        def one(s, u, cam_i, lm_i, meas, active):
            ctrl = bspline.gather_support(params.knots, s, order)
            T_bs = cams.T_bs[cam_i]
            lm = params.landmarks[lm_i]

            def g(dk, dl):
                c = res.retract_pose_knots(ctrl, dk.reshape(order, 6))
                return res.bearing_residual(c, u, T_bs, lm + dl, meas)

            zk = jnp.zeros(order * 6, dtype)
            zl = jnp.zeros(3, dtype)
            r_raw = g(zk, zl)
            Jk, Jl = jac(g, argnums=(0, 1))(zk, zl)
            w = losses.huber_weight(jnp.sum(r_raw * r_raw), cfg.bearing_huber)
            sw = jnp.sqrt(w) * cfg.bearing_sqrt_info * active
            return r_raw * sw, Jk * sw, Jl * sw

        return jax.vmap(one)(f.s, f.u, f.cam, f.lm, f.meas, f.active)
    return run


t_full = timeit(lambda p, c, i, fa, m: ba.linearize(p, c, i, fa, m, cfg,
                                                    jnp.asarray(0.1, jnp.float32),
                                                    jnp.asarray(1.0, jnp.float32)),
                params, cams, imu, factors, masks)
print(f"linearize full (all families + dense rows): {t_full*1e3:7.3f} ms")

t_rev = timeit(bearing_blocks(jax.jacrev), params, cams, f)
t_fwd = timeit(bearing_blocks(jax.jacfwd), params, cams, f)
print(f"bearing blocks jacrev: {t_rev*1e3:7.3f} ms   jacfwd: {t_fwd*1e3:7.3f} ms")


# dense-row scatter cost in isolation
def with_scatter(params, cams, f):
    r, Jk, Jl = bearing_blocks(jax.jacrev)(params, cams, f)
    D = lay.D
    Jp = jax.vmap(lambda Jb, s: ba._dense_row(Jb, ba._knot_cols(s), D))(Jk, f.s)
    return r, Jp, Jl


t_scat = timeit(with_scatter, params, cams, f)
print(f"bearing blocks + dense-row scatter: {t_scat*1e3:7.3f} ms")


# block reduce: H knot-band via one-hot matmul + static band scatter
K = params.num_knots
S = K - order + 1

def block_reduce(params, cams, f):
    r, Jk, Jl = bearing_blocks(jax.jacrev)(params, cams, f)
    F = r.shape[0]
    onehot_s = (f.s[:, None] == jnp.arange(S)[None, :]).astype(Jk.dtype)
    # per-factor knot-block outer products
    Hf = jnp.einsum("fmi,fmj->fij", Jk, Jk).reshape(F, 24 * 24)
    HS = (onehot_s.T @ Hf).reshape(S, 24, 24)
    gf = jnp.einsum("fmi,fm->fi", Jk, r)
    gS = onehot_s.T @ gf
    D = lay.D
    H = jnp.zeros((D, D), Jk.dtype)
    g = jnp.zeros(D, Jk.dtype)
    for s in range(S):
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (6 * s, 6 * s), (24, 24)) + HS[s],
            (6 * s, 6 * s))
        g = jax.lax.dynamic_update_slice(
            g, jax.lax.dynamic_slice(g, (6 * s,), (24,)) + gS[s], (6 * s,))
    # landmark blocks via one-hot (as before)
    L = params.num_landmarks
    onehot_l = (f.lm[:, None] == jnp.arange(L)[None, :]).astype(Jk.dtype)
    JlJl = jnp.einsum("fmi,fmj->fij", Jl, Jl).reshape(F, 9)
    Hll = (onehot_l.T @ JlJl).reshape(L, 3, 3)
    gl = onehot_l.T @ jnp.einsum("fmi,fm->fi", Jl, r)
    # W: (L, S, 24, 3) via joint one-hot, then static scatter into (L, D, 3)
    Wf = jnp.einsum("fmi,fmj->fij", Jk, Jl).reshape(F, 72)
    joint = (onehot_l[:, :, None] * onehot_s[:, None, :]).reshape(F, L * S)
    WLS = (joint.T @ Wf).reshape(L, S, 24, 3)
    W = jnp.zeros((L, D, 3), Jk.dtype)
    for s in range(S):
        W = jax.lax.dynamic_update_slice(
            W, jax.lax.dynamic_slice(W, (0, 6 * s, 0), (L, 24, 3)) + WLS[:, s],
            (0, 6 * s, 0))
    return H, g, Hll, gl, W


t_blkred = timeit(block_reduce, params, cams, f)
print(f"bearing blocks + block reduce (H,g,Hll,gl,W): {t_blkred*1e3:7.3f} ms")


# current: full linearize + reduce for comparison
def cur_lin_reduce(p, c, i, fa, m):
    sys0 = ba.linearize(p, c, i, fa, m, cfg, jnp.asarray(0.1, jnp.float32),
                        jnp.asarray(1.0, jnp.float32))
    return ba.reduce_system(sys0, p.num_landmarks)


t_cur = timeit(cur_lin_reduce, params, cams, imu, factors, masks)
print(f"current linearize+reduce (all families):     {t_cur*1e3:7.3f} ms")
