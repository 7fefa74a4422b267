"""Evaluation metrics: Umeyama alignment, APE/RPE, TUM IO."""

import numpy as np

from hyperslam_tpu.evaluation import metrics


def _random_traj(rng, n=50):
    pos = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    q = rng.normal(0, 1, (n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    stamps = np.arange(n) * 0.1
    return stamps, pos, q


def test_umeyama_recovers_transform(rng):
    src = rng.normal(0, 1, (30, 3))
    ang = 0.7
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t_true = np.array([1.0, -2.0, 0.5])
    s_true = 1.7
    dst = s_true * src @ R_true.T + t_true
    s, R, t = metrics.umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_true, atol=1e-9)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ape_zero_for_identical(rng):
    stamps, pos, q = _random_traj(rng)
    out = metrics.ape(stamps, pos, q, stamps, pos, q, align=False)
    assert out["trans_rmse"] < 1e-12
    assert out["rot_rmse_deg"] < 1e-5


def test_ape_alignment_removes_global_transform(rng):
    stamps, pos, q = _random_traj(rng)
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    pos2 = pos @ R.T + np.array([5.0, 1.0, -2.0])
    Rq = metrics.quat_to_matrix_np(q)
    Rq2 = R[None] @ Rq
    # convert back to quats via trace method: reuse test via rotation error
    out = metrics.ape(stamps, pos2, q, stamps, pos, q, align=True)
    assert out["trans_rmse"] < 1e-9


def test_rpe_invariant_to_global_transform(rng):
    stamps, pos, q = _random_traj(rng)
    pos2 = pos + np.array([100.0, 0.0, 0.0])
    out = metrics.rpe(stamps, pos2, q, stamps, pos, q)
    assert out["trans_rmse"] < 1e-12


def test_tum_roundtrip(tmp_path, rng):
    stamps, pos, q = _random_traj(rng, 10)
    p = tmp_path / "traj.txt"
    metrics.save_tum(p, stamps, pos, q)
    s2, p2, q2 = metrics.load_tum(p)
    np.testing.assert_allclose(s2, stamps, atol=1e-8)
    np.testing.assert_allclose(p2, pos, atol=1e-8)
    np.testing.assert_allclose(q2, q, atol=1e-8)


def test_associate_handles_offsets():
    a = np.arange(10) * 0.1
    b = a + 0.004
    ia, ib = metrics.associate(a, b, max_diff=0.02)
    assert len(ia) == 10
    np.testing.assert_array_equal(ia, ib)


def test_evo_artifacts(tmp_path):
    """plots.save_evo_artifacts writes the four evo-style artifacts
    (reference evaluation/run.py:31-57: --save_plot + --save_results per
    metric) with correct stats inside the zips."""
    import json
    import os
    import zipfile
    from hyperslam_tpu.evaluation import plots

    rng = np.random.default_rng(0)
    n = 60
    t = np.arange(n) * 0.1
    gt_pos = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)
    q = np.tile([1.0, 0, 0, 0], (n, 1))
    est_pos = gt_pos + rng.normal(0, 0.01, (n, 3))
    out = plots.save_evo_artifacts(tmp_path, t, est_pos, q, t, gt_pos, q)
    assert set(out) == {"ape_translation", "ape_rotation",
                        "rpe_translation", "rpe_rotation"}
    for name in out:
        png = os.path.join(tmp_path, f"{name}.png")
        zp = os.path.join(tmp_path, f"{name}_results.zip")
        assert os.path.isfile(png) and os.path.getsize(png) > 1000
        with zipfile.ZipFile(zp) as z:
            stats = json.loads(z.read("stats.json"))
            assert stats["trans_rmse"] == out[name]["trans_rmse"]
            import io
            err = np.load(io.BytesIO(z.read("error_array.npy")))
            assert len(err) == stats["n"]
    # numbers agree with the direct metric call
    ape = metrics.ape(t, est_pos, q, t, gt_pos, q, align=True)
    assert abs(out["ape_translation"]["trans_rmse"] - ape["trans_rmse"]) < 1e-12
