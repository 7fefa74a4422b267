"""Interface-condensed BA (parallel/condensed_ba.py): the per-chip
interior-elimination solve must match the single-device solver.

Same parity strategy as tests/test_time_ba.py: initial cost to 1e-12 and
ONE heavily-damped LM step to tight tolerances (assembly/elimination errors
appear at full magnitude; summation-order roundoff stays ~1e-12), then a
multi-step convergence check."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hyperslam_tpu.parallel import condensed_ba
from hyperslam_tpu.solver import ba
from hyperslam_tpu.solver.problem import (CalibPrior, CameraCalib, Factors,
                                          ImuCalib, InertialFactors, Masks,
                                          Params, PriorFactors, SmoothFactors,
                                          SolverConfig, VisualFactors)
from hyperslam_tpu.variables import s2


def _problem(n_dev=4, Ks=8, lm_per_chip=6, obs_per_lm=4, seed=5):
    """Landmark-local time-partitioned problem: each landmark's
    observations stay inside its owner chip's slice + halo (the condensed
    solver's structural requirement)."""
    dtype = jnp.float64
    K = n_dev * Ks
    rng = np.random.default_rng(seed)
    knots = np.concatenate(
        [np.tile([1.0, 0, 0, 0], (K, 1)),
         np.cumsum(rng.normal(0, 0.05, (K, 3)), 0)], axis=1)
    L = n_dev * lm_per_chip
    lms = rng.normal(0, 3, (L, 3)) + [0, 0, 8]
    params = Params(
        knots=jnp.asarray(knots, dtype),
        landmarks=jnp.asarray(lms, dtype),
        gravity=jnp.asarray([0.0, 0.0, -s2.GRAVITY_NORM], dtype),
        bias_g=jnp.zeros((5, 3), dtype),
        bias_a=jnp.zeros((5, 3), dtype))
    cams = CameraCalib(
        T_bs=jnp.asarray(np.stack([
            [1, 0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0.11, 0, 0]]), dtype),
        intrinsics=jnp.asarray([[376., 240., 458., 458.]] * 2, dtype),
        distortion=jnp.zeros((2, 4), dtype))
    imu = ImuCalib.default(dtype)

    halo = 3
    s_list, u_list, cam_list, lm_list = [], [], [], []
    for lm_i in range(L):
        d = lm_i // lm_per_chip
        lo, hi = d * Ks, d * Ks + (Ks + halo - 3) - 1  # s_loc + 3 < Ks+halo
        for _ in range(obs_per_lm):
            s_list.append(int(rng.integers(lo, min(hi, K - 4) + 1)))
            u_list.append(rng.uniform(0, 1))
            cam_list.append(int(rng.integers(0, 2)))
            lm_list.append(lm_i)
    FB = len(s_list)
    b = rng.normal(size=(FB, 3))
    b[:, 2] = np.abs(b[:, 2]) + 0.5
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    bearing = VisualFactors(
        s=jnp.asarray(s_list, jnp.int32), u=jnp.asarray(u_list, dtype),
        cam=jnp.asarray(cam_list, jnp.int32),
        lm=jnp.asarray(lm_list, jnp.int32),
        meas=jnp.asarray(b, dtype), active=jnp.ones(FB, dtype))
    FI = 32
    inertial = InertialFactors(
        s=jnp.asarray(rng.integers(0, K - 4, FI), jnp.int32),
        u=jnp.asarray(rng.uniform(0, 1, FI), dtype),
        bias_s=jnp.zeros(FI, jnp.int32),
        bias_u=jnp.asarray(rng.uniform(0, 1, FI), dtype),
        meas=jnp.asarray(rng.normal(0, 1, (FI, 6)), dtype),
        active=jnp.ones(FI, dtype))
    FP = 4
    q = rng.normal(size=(FP, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    prior = PriorFactors(
        s=jnp.asarray(rng.integers(0, K - 4, FP), jnp.int32),
        u=jnp.asarray(rng.uniform(0, 1, FP), dtype),
        meas=jnp.asarray(np.concatenate([q, rng.normal(0, 1, (FP, 3))], 1),
                         dtype),
        active=jnp.ones(FP, dtype))
    smooth = SmoothFactors(
        i=jnp.asarray(np.arange(K), jnp.int32),
        active=jnp.asarray((np.arange(K) < K - 2).astype(np.float64)))
    factors = Factors(
        bearing=bearing, pixel=VisualFactors.empty(0, 2, dtype),
        inertial=inertial, prior=prior, smooth=smooth)
    masks = Masks.all_free(K, L, 5)
    cfg = SolverConfig(max_iterations=3, bearing_sqrt_info=100.0,
                       gyro_sqrt_info=10.0, accel_sqrt_info=10.0,
                       inertial_scale=1.0)
    return params, cams, imu, factors, masks, cfg


def _check_parity(params, cams, imu, factors, masks, cfg, n_dev, halo=3,
                  atol=2e-8):  # 2e-8: per-host codegen roundoff, see
    # tests/test_time_ba.py:48 note; routing bugs show >=1e-5
    dt = jnp.asarray(0.1, jnp.float64)
    bdt = jnp.asarray(1.0, jnp.float64)
    K = params.num_knots
    mesh = Mesh(np.array(jax.devices()[:n_dev]), (condensed_ba.AXIS,))
    f_td, lm_map, lm_act = condensed_ba.condense_partition(
        factors, K, n_dev, halo=halo)
    # routed counts preserved
    n_in = int(np.asarray(factors.bearing.active).sum())
    n_out = int(np.asarray(f_td.bearing.active).sum())
    assert n_in == n_out

    cfg1 = cfg.replace(max_iterations=1, init_lambda=1e4)
    p_ref, _, _, st_ref = ba.optimize(
        params, cams, imu, factors, masks, cfg1, dt, bdt)
    p_c, _, _, st_c = condensed_ba.condensed_optimize(
        params, cams, imu, f_td, lm_map, lm_act, masks, cfg1, dt, bdt,
        mesh, halo=halo)
    np.testing.assert_allclose(np.asarray(st_c.initial_cost),
                               np.asarray(st_ref.initial_cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p_c.knots),
                               np.asarray(p_ref.knots), atol=atol)
    np.testing.assert_allclose(np.asarray(p_c.landmarks),
                               np.asarray(p_ref.landmarks), atol=atol)
    np.testing.assert_allclose(np.asarray(st_c.final_cost),
                               np.asarray(st_ref.final_cost), rtol=1e-7)

    # multi-step condensed solve converges
    p_n, _, _, st_n = condensed_ba.condensed_optimize(
        params, cams, imu, f_td, lm_map, lm_act, masks, cfg, dt, bdt,
        mesh, halo=halo)
    assert float(st_n.final_cost) < 0.5 * float(st_n.initial_cost)


def test_condensed_matches_single_device():
    params, cams, imu, factors, masks, cfg = _problem(n_dev=4, Ks=8)
    _check_parity(params, cams, imu, factors, masks, cfg, n_dev=4)


def test_condensed_with_calibration():
    """Freed cam1 extrinsics + anchor rows carried through condensation
    (the anchor's columns are global tail = interface)."""
    params, cams, imu, factors, masks, cfg = _problem(n_dev=4, Ks=8, seed=9)
    dtype = jnp.float64
    masks = masks.replace(cam_ext=jnp.asarray([0.0, 1.0], dtype))
    cp = CalibPrior(
        cam_T_bs0=cams.T_bs, cam_active=jnp.asarray([0.0, 1.0], dtype),
        imu_T_bs0=imu.T_bs, imu_active=jnp.asarray(0.0, dtype),
        sqrt_rot=jnp.asarray(100.0, dtype),
        sqrt_trans=jnp.asarray(166.0, dtype))
    factors = factors.replace(calib_prior=cp)
    _check_parity(params, cams, imu, factors, masks, cfg, n_dev=4)


def test_condense_partition_rejects_nonlocal_track():
    """A landmark observed across distant slices must be rejected loudly,
    not silently mis-assembled."""
    import pytest
    params, cams, imu, factors, masks, cfg = _problem(n_dev=4, Ks=8)
    bad_s = np.asarray(factors.bearing.s).copy()
    bad_s[1] = 28   # landmark 0 owned by chip 0; segment 28 is chip 3's
    factors = factors.replace(
        bearing=factors.bearing.replace(s=jnp.asarray(bad_s)))
    with pytest.raises(ValueError):
        condensed_ba.condense_partition(factors, params.num_knots, 4)
