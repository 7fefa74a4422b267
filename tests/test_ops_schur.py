"""Pallas Schur-elimination kernel (ops/schur.py) parity tests.

Runs in interpret mode on the CPU test backend; the compiled-kernel path is
exercised on the chip by tools/bench_schur_pallas.py (measurements recorded
in PROFILE.md).  Reference semantics: explicit per-landmark 3-DoF block
elimination, the TPU-native replacement for Ceres' sparse elimination
(reference ceres/optimizer.cpp:38-54).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperslam_tpu.ops.schur import schur_reduce


def _random_problem(rng, D, L, dtype):
    H = rng.normal(size=(D, D))
    H = H + H.T
    g = rng.normal(size=D)
    W = rng.normal(size=(L, D, 3))
    M = rng.normal(size=(L, 3, 3))
    Hll_inv = M @ M.transpose(0, 2, 1)        # symmetric (as in the solver)
    gl = rng.normal(size=(L, 3))
    return [jnp.asarray(x, dtype) for x in (H, g, W, Hll_inv, gl)]


@pytest.mark.parametrize("D,L,dtype,tol", [
    (254, 256, jnp.float64, 1e-12),   # bench envelope shape, exact dtype
    (100, 130, jnp.float64, 1e-12),   # unaligned shapes exercise padding
    (62, 40, jnp.float32, 2e-5),
])
def test_schur_reduce_matches_einsum(D, L, dtype, tol):
    rng = np.random.default_rng(0)
    H, g, W, Hll_inv, gl = _random_problem(rng, D, L, dtype)
    S_ref = H - jnp.einsum("ldi,lij,lej->de", W, Hll_inv, W)
    gs_ref = g - jnp.einsum("ldi,lij,lj->d", W, Hll_inv, gl)
    S, gs = schur_reduce(H, g, W, Hll_inv, gl, interpret=True)
    scale = float(jnp.abs(S_ref).max())
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref),
                               atol=tol * scale)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               atol=tol * float(jnp.abs(gs_ref).max()))
    # symmetric inputs must give a symmetric Schur complement
    np.testing.assert_allclose(np.asarray(S), np.asarray(S).T,
                               atol=tol * scale)


def test_zero_padding_landmarks_contribute_nothing():
    """Padded landmark slots (zero Hll_inv blocks) must not change S."""
    rng = np.random.default_rng(1)
    H, g, W, Hll_inv, gl = _random_problem(rng, 50, 70, jnp.float64)
    mask = (np.arange(70) < 33)
    Hll_inv = Hll_inv * jnp.asarray(mask, jnp.float64)[:, None, None]
    S_full, gs_full = schur_reduce(H, g, W, Hll_inv, gl, interpret=True)
    S_cut, gs_cut = schur_reduce(
        H, g, W[:33], Hll_inv[:33], gl[:33], interpret=True)
    np.testing.assert_allclose(np.asarray(S_full), np.asarray(S_cut),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(gs_full), np.asarray(gs_cut),
                               atol=1e-12)


def test_solver_parity_with_pallas_schur():
    """Full damped LM step through ba.optimize with schur_pallas on/off."""
    import __graft_entry__ as ge
    from hyperslam_tpu.solver import ba
    from hyperslam_tpu.solver.problem import SolverConfig

    params, cams, imu, factors, masks = ge._build_problem(
        K=8, L=16, FB=64, FI=16, FP=2, Kb=5, dtype=jnp.float64, NF=16)
    dt = jnp.asarray(0.1, jnp.float64)
    bdt = jnp.asarray(1.0, jnp.float64)
    cfg = SolverConfig(max_iterations=1, init_lambda=1e4)
    cfg_p = cfg.replace(schur_pallas=True)
    p0, _, _, st0 = ba.optimize(params, cams, imu, factors, masks, cfg,
                                dt, bdt)
    p1, _, _, st1 = ba.optimize(params, cams, imu, factors, masks, cfg_p,
                                dt, bdt)
    np.testing.assert_allclose(np.asarray(st1.initial_cost),
                               np.asarray(st0.initial_cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p1.knots), np.asarray(p0.knots),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(p1.landmarks),
                               np.asarray(p0.landmarks), atol=1e-9)
