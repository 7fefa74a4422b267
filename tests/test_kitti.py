"""KITTI odometry reader + config (frontend/kitti.py): the reference ships
KITTI ground truth 00-10 but an EMPTY setup YAML
(``/root/reference/resources/datasets/kitti/setups/stereo/settings.yaml``,
0 bytes — SURVEY.md §2.1); this path completes it.  Tests: calib round-trip
through calib.txt, format sniffing, and the full CLI pipeline on a rendered
KITTI-layout dataset with an ATE gate."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hyperslam_tpu.frontend import kitti, render
from hyperslam_tpu.solver.problem import CameraCalib
from hyperslam_tpu.variables import se3, so3


def _rect_calib(dtype=jnp.float64):
    """Rectified (zero-distortion) stereo rig at 376x240 — KITTI-style."""
    intr = jnp.asarray([[188.0, 120.0, 230.0, 230.0],
                        [188.0, 120.0, 230.0, 230.0]], dtype)
    T_b_c0 = se3.identity(dtype)
    T_b_c1 = se3.from_parts(so3.identity(dtype),
                            jnp.asarray([0.2, 0.0, 0.0], dtype))
    return CameraCalib(T_bs=jnp.stack([T_b_c0, T_b_c1]), intrinsics=intr,
                       distortion=jnp.zeros((2, 4), dtype))


def test_calib_roundtrip(tmp_path):
    calib = _rect_calib()
    frames = [(0.0, np.zeros((8, 8), np.uint8), np.zeros((8, 8), np.uint8))]
    root = kitti.write_kitti_dataset(str(tmp_path / "seq"), frames, calib)
    assert kitti.looks_like_kitti(root)
    assert not kitti.looks_like_kitti(str(tmp_path))
    loaded = kitti.load_kitti_calib(os.path.join(root, "calib.txt"),
                                    jnp.float64)
    np.testing.assert_allclose(np.asarray(loaded.intrinsics),
                               np.asarray(calib.intrinsics), atol=1e-9)
    np.testing.assert_allclose(np.asarray(loaded.T_bs),
                               np.asarray(calib.T_bs), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(loaded.distortion), 0.0)


def test_reference_kitti_groundtruth_loads():
    """The shipped reference GT files parse as TUM and cover 00-10."""
    from hyperslam_tpu.evaluation import metrics
    root = "/root/reference/resources/datasets/kitti/sequences"
    if not os.path.isdir(root):
        pytest.skip("reference KITTI ground truth not present")
    stamps, pos, quat = metrics.load_tum(os.path.join(root, "00.txt"))
    assert len(stamps) > 1000
    assert np.all(np.diff(stamps) > 0)
    np.testing.assert_allclose(np.linalg.norm(quat, axis=1), 1.0, atol=1e-6)


def test_config_kitti_stereo_parses():
    from hyperslam_tpu.system import config as cfgmod
    spec = cfgmod.load_system_spec(os.path.join(
        os.path.dirname(__file__), "..", "configs", "kitti_stereo.yaml"))
    assert len(spec.sensors) == 2
    cams = cfgmod.camera_calib_from_spec(spec, jnp.float64)
    # 0.537 m grayscale-rig baseline, rectified => zero distortion
    assert abs(float(cams.T_bs[1, 4]) - 0.53716) < 1e-6
    np.testing.assert_array_equal(np.asarray(cams.distortion), 0.0)


@pytest.mark.slow
def test_kitti_layout_to_ate(tmp_path):
    """Full CLI on a rendered KITTI-layout dataset (auto-sniffed format),
    scored against the generating trajectory."""
    from hyperslam_tpu.evaluation import metrics
    from hyperslam_tpu.system import cli
    from tests.test_rendered_pipeline import _settings_yaml

    calib = _rect_calib()
    W, H = 376, 240
    cfg = render.RenderConfig(duration=4.0, cam_rate=5.0, image_size=(W, H),
                              seed=6, rot_scale=0.03, trans_scale=0.10)
    seq = render.render_sequence(cfg, calib)
    root = kitti.write_kitti_dataset(
        str(tmp_path / "00"), seq.frames, calib)
    settings = str(tmp_path / "settings.yaml")
    _settings_yaml(settings, calib, W, H, cfg.cam_rate)
    out = str(tmp_path / "out")

    rc = cli.main([settings, out, "--dataset", root, "--cpu"])
    assert rc == 0
    stamps, pos, quat = metrics.load_tum(
        os.path.join(out, "estimation_tum.txt"))
    assert len(stamps) > 40
    gt = np.asarray(seq.gt_pose(stamps))
    ape = metrics.ape(stamps, pos, quat, stamps, gt[:, 4:], gt[:, :4],
                      align=True)
    assert ape["trans_rmse"] < 0.15, ape
    assert ape["rot_rmse_deg"] < 3.0, ape
