"""Pallas TPU kernel: Schur-complement landmark elimination.

The dominant contraction of the reduced solve (``solver/ba.py
solve_reduced``) forms the pose-system Schur complement

    S  = H - sum_l  W_l · Hll_inv_l · W_l^T          (D, D)
    gs = g - sum_l  W_l · (Hll_inv_l · gl_l)         (D,)

over all landmark slots l (reference semantics: Ceres' sparse-normal-
Cholesky eliminating each 3-DoF landmark block, ceres/optimizer.cpp:38-54;
here the elimination is explicit — SURVEY.md §2.4 TPU plan).

The kernel keeps the W tiles resident in VMEM, applies the tiny 3x3
inverse blocks on the VPU between loads, contracts on the MXU in STRICT
f32 (``preferred_element_type`` + f32 operands), and revisits the (D, D)
accumulator across landmark-tile grid steps — the (L, D, 3) intermediate
``W @ Hll_inv`` never exists in HBM.

Measured on the TPU v5 lite chip at the bench envelope (D=254, L=256,
chained so nothing hoists — protocol in tools/bench_schur_pallas.py):

    XLA einsum, default precision    1.6 us / call   (bf16-input MXU)
    XLA einsum, precision=highest  247   us / call   (true f32)
    this kernel (strict f32)       262   us / call

i.e. the kernel matches XLA's true-f32 contraction, while XLA's
*default*-precision einsum — bf16 operand rounding, f32 accumulation —
runs at ~110 TFLOP/s effective and is the speed-of-light choice at this
size (rel. deviation from true f32: ~9e-4, absorbed by the LM damping and
the mixed-precision refinement downstream; see ba.solve_reduced).  The
production path therefore keeps the einsum; this kernel is the strict-f32
alternative (``SolverConfig.schur_pallas``) and the measurement vehicle
that established the comparison (PROFILE.md round-5 log).

Requirements: ``Hll_inv`` must be symmetric per block (it is: the inverse
of the damped SPD landmark Hessian).  The kernel exploits the symmetry to
contract as ``sum_i A_i^T @ W_i`` with ``A_i = sum_j Hinv[:,i,j] * W_j``.

On non-TPU backends pass ``interpret=True`` (tests do).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _kernel(H_ref, g_ref, Wt_ref, Hinv_ref, gl_ref, S_ref, gs_ref):
    step = pl.program_id(0)
    acc = acc_g = None
    W = [Wt_ref[i] for i in range(3)]            # each (TL, Dp)
    for i in range(3):
        # A_i[l, :] = sum_j Hinv[l, i, j] * W_j[l, :]   — VPU broadcasts
        A_i = (Hinv_ref[:, 3 * i + 0:3 * i + 1] * W[0]
               + Hinv_ref[:, 3 * i + 1:3 * i + 2] * W[1]
               + Hinv_ref[:, 3 * i + 2:3 * i + 3] * W[2])
        ws_i = (Hinv_ref[:, 3 * i + 0:3 * i + 1] * gl_ref[:, 0:1]
                + Hinv_ref[:, 3 * i + 1:3 * i + 2] * gl_ref[:, 1:2]
                + Hinv_ref[:, 3 * i + 2:3 * i + 3] * gl_ref[:, 2:3])
        # (Dp, TL) x (TL, Dp) on the MXU, contracting the landmark tile
        part = jax.lax.dot_general(
            A_i, W[i], (((0,), (0,)), ((), ())),
            preferred_element_type=S_ref.dtype)
        gpart = jnp.sum(W[i] * ws_i, axis=0, keepdims=True)
        acc = part if acc is None else acc + part
        acc_g = gpart if acc_g is None else acc_g + gpart

    @pl.when(step == 0)
    def _():
        S_ref[:] = H_ref[:] - acc
        gs_ref[:] = g_ref[:] - acc_g

    @pl.when(step != 0)
    def _():
        S_ref[:] = S_ref[:] - acc
        gs_ref[:] = gs_ref[:] - acc_g


@functools.partial(jax.jit, static_argnames=("interpret", "tile_l"))
def schur_reduce(H, g, W, Hll_inv, gl, *, interpret: bool = False,
                 tile_l: int = 256):
    """Fused S = H - W Hll_inv W^T, gs = g - W (Hll_inv gl).

    H: (D, D); g: (D,); W: (L, D, 3); Hll_inv: (L, 3, 3) symmetric blocks
    (inactive landmarks must carry zero blocks); gl: (L, 3).
    Returns (S (D, D), gs (D,)) in H.dtype.
    """
    D = H.shape[0]
    L = W.shape[0]
    dt = H.dtype
    Dp = _round_up(D, 128)
    Lp = _round_up(L, tile_l)
    # zero padding: padded landmarks have zero Hll_inv -> zero contribution;
    # padded pose columns only touch S rows/cols that are sliced away.
    Wt = jnp.pad(W, ((0, Lp - L), (0, Dp - D), (0, 0))).transpose(2, 0, 1)
    Hinv = jnp.pad(Hll_inv.reshape(L, 9), ((0, Lp - L), (0, 0)))
    glp = jnp.pad(gl, ((0, Lp - L), (0, 0)))
    Hp = jnp.pad(H, ((0, Dp - D), (0, Dp - D)))
    gp = jnp.pad(g, (0, Dp - D)).reshape(1, Dp)

    grid = (Lp // tile_l,)
    S, gs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Dp, Dp), lambda l: (0, 0)),
            pl.BlockSpec((1, Dp), lambda l: (0, 0)),
            pl.BlockSpec((3, tile_l, Dp), lambda l: (0, l, 0)),
            pl.BlockSpec((tile_l, 9), lambda l: (l, 0)),
            pl.BlockSpec((tile_l, 3), lambda l: (l, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Dp, Dp), lambda l: (0, 0)),
            pl.BlockSpec((1, Dp), lambda l: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Dp), dt),
            jax.ShapeDtypeStruct((1, Dp), dt),
        ],
        interpret=interpret,
    )(Hp, gp, Wt, Hinv, glp)
    return S[:D, :D], gs[0, :D]
