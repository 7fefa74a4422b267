"""Cumulative B-spline state: basis properties, interpolation invariants,
time derivatives vs finite differences (reference test strategy: numeric
derivative checking, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperslam_tpu.state import bspline
from hyperslam_tpu.variables import se3, so3


def test_blending_matrix_cubic():
    M = np.asarray(bspline.blending_matrix(4, jnp.float64))
    expected = np.array(
        [[1, -3, 3, -1], [4, 0, -6, 3], [1, 3, 3, -3], [0, 0, 0, 1]]) / 6.0
    np.testing.assert_allclose(M, expected, atol=1e-12)


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_partition_of_unity(k):
    M = np.asarray(bspline.blending_matrix(k, jnp.float64))
    for u in [0.0, 0.25, 0.7, 0.999]:
        b = M @ (u ** np.arange(k))
        np.testing.assert_allclose(b.sum(), 1.0, atol=1e-12)
        assert np.all(b >= -1e-12)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_cumulative_first_weight_is_one(k):
    Mt = np.asarray(bspline.cumulative_blending_matrix(k, jnp.float64))
    for u in [0.0, 0.3, 0.99]:
        lam = Mt @ (u ** np.arange(k))
        np.testing.assert_allclose(lam[0], 1.0, atol=1e-12)
        # cumulative weights are decreasing in j and within [0, 1]
        assert np.all(np.diff(lam) <= 1e-12)
        assert np.all((lam >= -1e-12) & (lam <= 1 + 1e-12))


def test_constant_knots_give_constant_pose(key):
    T = se3.random(key, (), jnp.float64)
    knots = jnp.tile(T[None], (8, 1))
    t = jnp.linspace(0.0, 4.99, 13)
    out = bspline.eval_se3(knots, t, 0.0, 1.0)
    np.testing.assert_allclose(out, jnp.tile(T[None], (13, 1)), atol=1e-12)


def test_euclidean_matches_scipy(key):
    from scipy.interpolate import BSpline
    N, D, k = 12, 3, 4
    knots = jax.random.normal(key, (N, D), jnp.float64)
    t = jnp.linspace(0.0, (N - k + 1) - 1e-6, 50)
    ours = bspline.eval_euclidean(knots, t, 0.0, 1.0, k)
    d = k - 1
    kv = np.arange(-d, N + 1, dtype=float)  # N + d + 1 knots for N coeffs
    for dim in range(D):
        spl = BSpline(kv, np.asarray(knots[:, dim]), d, extrapolate=True)
        np.testing.assert_allclose(ours[:, dim], spl(np.asarray(t)), atol=1e-9)


def test_se3_matches_euclidean_for_translation_only(key):
    # With identity rotations the cumulative SE3 spline must reduce to the
    # ordinary Euclidean spline on translations.
    N = 10
    trans = jax.random.normal(key, (N, 3), jnp.float64)
    knots = jnp.concatenate(
        [jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (N, 1)), trans], axis=-1)
    t = jnp.linspace(0.0, (N - 3) - 1e-6, 23)
    pose = bspline.eval_se3(knots, t, 0.0, 1.0)
    euc = bspline.eval_euclidean(trans, t, 0.0, 1.0)
    np.testing.assert_allclose(pose[:, 4:], euc, atol=1e-9)
    np.testing.assert_allclose(pose[:, 0], 1.0, atol=1e-12)


def test_continuity_across_segments(key):
    # C2 continuity: pose, velocity, acceleration continuous at knot times.
    N = 8
    knots = se3.random(key, (N,), jnp.float64) * 1.0
    # moderate rotations: interpolate towards each other to keep logs small
    eps = 1e-7
    for tk in [1.0, 2.0, 3.0]:
        s_m, u_m = bspline.support_index(tk - eps, 0.0, 1.0, N)
        s_p, u_p = bspline.support_index(tk + eps, 0.0, 1.0, N)
        dm = bspline.se3_with_derivatives(
            bspline.gather_support(knots, s_m), u_m, 1.0)
        dp = bspline.se3_with_derivatives(
            bspline.gather_support(knots, s_p), u_p, 1.0)
        np.testing.assert_allclose(dm["pose"], dp["pose"], atol=1e-5)
        np.testing.assert_allclose(dm["omega_b"], dp["omega_b"], atol=1e-4)
        np.testing.assert_allclose(dm["v_w"], dp["v_w"], atol=1e-4)
        np.testing.assert_allclose(dm["a_w"], dp["a_w"], atol=1e-3)


def test_derivatives_vs_finite_difference(key):
    N = 9
    dt = 0.5
    knots = se3.random(key, (N,), jnp.float64)
    t = jnp.asarray([1.3, 2.05, 0.4])
    s, u = bspline.support_index(t, 0.0, dt, N)
    ctrl = bspline.gather_support(knots, s)
    d = bspline.se3_with_derivatives(ctrl, u, dt)
    eps = 1e-5  # balances truncation vs roundoff for the 2nd difference
    f = lambda tt: bspline.eval_se3(knots, tt, 0.0, dt)
    # world linear velocity / acceleration from central differences
    p_p, p_m = f(t + eps)[..., 4:], f(t - eps)[..., 4:]
    p_0 = f(t)[..., 4:]
    np.testing.assert_allclose(d["v_w"], (p_p - p_m) / (2 * eps), atol=1e-5)
    np.testing.assert_allclose(
        d["a_w"], (p_p - 2 * p_0 + p_m) / eps**2, atol=1e-4)
    # body angular velocity: log of relative rotation over dt
    q_p = f(t + eps)[..., :4]
    q_m = f(t - eps)[..., :4]
    w_fd = so3.log(so3.mul(so3.conj(q_m), q_p)) / (2 * eps)
    np.testing.assert_allclose(d["omega_b"], w_fd, atol=1e-5)


def test_alpha_b_vs_finite_difference(key):
    N = 9
    dt = 0.5
    knots = se3.random(key, (N,), jnp.float64)
    t = jnp.asarray([1.1, 2.2])

    def omega_at(tt):
        s, u = bspline.support_index(tt, 0.0, dt, N)
        ctrl = bspline.gather_support(knots, s)
        return bspline.se3_with_derivatives(ctrl, u, dt)["omega_b"]

    eps = 1e-6
    alpha_fd = (omega_at(t + eps) - omega_at(t - eps)) / (2 * eps)
    s, u = bspline.support_index(t, 0.0, dt, N)
    d = bspline.se3_with_derivatives(bspline.gather_support(knots, s), u, dt)
    np.testing.assert_allclose(d["alpha_b"], alpha_fd, atol=1e-4)


def test_unit_quaternion_output(key):
    N = 12
    knots = se3.random(key, (N,), jnp.float64)
    t = jnp.linspace(0.0, (N - 3) - 1e-3, 40)
    q = bspline.eval_se3(knots, t, 0.0, 1.0)[..., :4]
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-9)


def test_valid_range():
    lo, hi = bspline.valid_range(10.0, 0.1, 34)
    np.testing.assert_allclose(lo, 10.0)
    np.testing.assert_allclose(hi, 10.0 + 31 * 0.1)


def test_jit_and_vmap(key):
    N = 8
    knots = se3.random(key, (N,), jnp.float64)
    f = jax.jit(lambda k, t: bspline.eval_se3(k, t, 0.0, 1.0))
    out = f(knots, jnp.linspace(0.1, 4.9, 17))
    assert out.shape == (17, 7)
    assert np.all(np.isfinite(out))
