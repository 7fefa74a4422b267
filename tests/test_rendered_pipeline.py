"""Real-image end-to-end regression: rendered PNG photographs through the
FULL production pipeline — dataset on disk -> (native C++ or Python) EuRoC
stream -> pyramidal KLT -> triangulation -> sliding-window solver -> TUM
export -> APE gate.

This is the bench-environment substitute for the reference's EuRoC-rosbag
evaluation (``/root/reference/evaluation/run.py:29-57``): no rosbags are
available here, so the imagery is ray-cast through the exact stereo model
along a known ground-truth spline (frontend/render.py) — every stage
downstream of the renderer is the real production code consuming real PNG
bytes."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hyperslam_tpu.frontend import render
from hyperslam_tpu.solver.problem import CameraCalib
from hyperslam_tpu.variables import se3, so3


def _half_res_calib(dtype=jnp.float64):
    """EuRoC-like stereo rig scaled to 376x240 (intrinsics halve; the
    radial-tangential coefficients act on normalized coords and are
    resolution-invariant)."""
    intr = jnp.asarray([[367.215, 248.375, 458.654, 457.296],
                        [379.999, 255.238, 457.587, 456.134]], dtype) / 2.0
    dist = jnp.asarray([[-0.28340811, 0.07395907, 1.9359e-4, 1.76187114e-5],
                        [-0.28368365, 0.07451284, -1.0847e-4, -3.5559e-5]],
                       dtype)
    T_b_c0 = se3.identity(dtype)
    T_b_c1 = se3.from_parts(so3.identity(dtype),
                            jnp.asarray([0.110074, 0.0, 0.0], dtype))
    return CameraCalib(T_bs=jnp.stack([T_b_c0, T_b_c1]), intrinsics=intr,
                       distortion=dist)


def _settings_yaml(path, calib, W, H, rate, imu=False, imu_rate=50.0,
                   marginalization=False):
    import yaml
    T = np.asarray(calib.T_bs, np.float64)
    intr = np.asarray(calib.intrinsics, np.float64)
    dist = np.asarray(calib.distortion, np.float64)
    sensors = []
    for c in range(2):
        q, t = T[c, :4], T[c, 4:]
        sensors.append({
            "type": "CAMERA", "name": f"cam{c}", "module": "Module-0",
            "frontend": "Frontend-0", "topic": f"/cam{c}/image_raw",
            "rate": rate, "resolution": [W, H],
            # YAML order: [qx, qy, qz, qw, px, py, pz]
            "transformation": [float(q[1]), float(q[2]), float(q[3]),
                               float(q[0]), float(t[0]), float(t[1]),
                               float(t[2])],
            "intrinsics": [float(x) for x in intr[c]],
            "distortion": {"type": "radial_tangential",
                           "parameters": [float(x) for x in dist[c]]},
        })
    frontends = [{
        "type": "VISUAL", "name": "Frontend-0", "backend": "Backend-0",
        "max_num_tracks": 120, "min_track_separation": 16,
        "patch_size": 13, "num_pyramid_levels": 3,
        "max_track_error": 1.0,
    }]
    if imu:
        sensors.append({
            "type": "IMU", "name": "imu0", "module": "Module-0",
            "frontend": "Frontend-1", "topic": "/imu0", "rate": imu_rate,
            "transformation": [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
            # ideal rendered IMU: tiny noise densities keep whitening sane
            "gyroscope_noise_density": 1.0e-4,
            "accelerometer_noise_density": 1.0e-3,
        })
        frontends.append({
            "type": "INERTIAL", "name": "Frontend-1",
            "backend": "Backend-0", "representation": "direct",
        })
    doc = {"Node": "HyperSLAM", "System": {
        "name": "System-0", "modules": [{"name": "Module-0", "threads": 1}],
        "sensors": sensors,
        "frontends": frontends,
        "backends": [{
            "name": "Backend-0", "suite": "tpu", "manifold": "se3",
            "representation": "continuous", "separation": 0.25,
            "max_window": 2.0, "marginalization": marginalization,
        }],
    }}
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


def test_renderer_produces_trackable_imagery():
    """Fast gate: rendered frames are textured and KLT locks onto them."""
    from hyperslam_tpu.frontend.klt import StereoKLT, KLTConfig
    calib = _half_res_calib()
    cfg = render.RenderConfig(duration=0.6, cam_rate=5.0,
                              image_size=(188, 120), seed=2)
    seq = render.render_sequence(cfg, calib)
    assert len(seq.frames) >= 3
    img = seq.frames[0][1]
    assert img.dtype == np.uint8 and img.std() > 10.0
    klt = StereoKLT(KLTConfig(max_tracks=60, win=9, levels=2, cell=16,
                              min_score=8.0, min_track_separation=10.0))
    n = []
    for (t, a, b) in seq.frames[:3]:
        ids, p0, p1 = klt.process(a, b)
        n.append(len(ids))
    assert n[0] > 20, n          # detection finds corners
    assert n[-1] > 15, n         # tracking survives motion


@pytest.mark.slow
def test_rendered_png_to_ate(tmp_path):
    """The full CLI path on real PNG bytes with an ATE gate."""
    from hyperslam_tpu.system import cli
    from hyperslam_tpu.evaluation import metrics

    calib = _half_res_calib()
    W, H = 376, 240
    cfg = render.RenderConfig(duration=5.0, cam_rate=5.0, imu_rate=50.0,
                              image_size=(W, H), seed=4,
                              rot_scale=0.03, trans_scale=0.10)
    seq = render.render_sequence(cfg, calib)
    offset = 1.4e9  # EuRoC-scale absolute stamps, exercises root-stamp
    ds = str(tmp_path / "ds")
    render.write_euroc_dataset(ds, seq, stamp_offset=offset)
    settings = str(tmp_path / "settings.yaml")
    _settings_yaml(settings, calib, W, H, cfg.cam_rate)
    out = str(tmp_path / "out")

    rc = cli.main([settings, out, "--dataset", ds, "--no-imu", "--cpu"])
    assert rc == 0
    stamps, pos, quat = metrics.load_tum(os.path.join(
        out, "estimation_tum.txt"))
    assert len(stamps) > 50
    gt = np.asarray(seq.gt_pose(stamps - offset))
    ape = metrics.ape(stamps, pos, quat, stamps, gt[:, 4:], gt[:, :4],
                      align=True)
    # Real-tracking noise at half resolution: gate generously but
    # meaningfully (divergence is metres; healthy runs are centimetres).
    assert ape["trans_rmse"] < 0.15, ape
    assert ape["rot_rmse_deg"] < 3.0, ape


@pytest.mark.slow
def test_rendered_stereo_inertial_marg_to_ate(tmp_path):
    """The FLAGSHIP config through real image bytes: PNG decode -> KLT ->
    direct IMU + bias splines -> fixed-lag marginalization -> TUM -> APE.

    This is the reference's actual product (stereo_inertial settings.yaml +
    the RA-L paper); its released code could not even run it (bias-spline
    management was CHECK(false), ceres/optimizer.cpp:384-386)."""
    from hyperslam_tpu.system import cli
    from hyperslam_tpu.evaluation import metrics

    calib = _half_res_calib()
    W, H = 376, 240
    cfg = render.RenderConfig(duration=5.0, cam_rate=5.0, imu_rate=50.0,
                              image_size=(W, H), seed=4,
                              rot_scale=0.03, trans_scale=0.10)
    seq = render.render_sequence(cfg, calib)
    assert len(seq.imu) > 200
    offset = 1.4e9
    ds = str(tmp_path / "ds")
    render.write_euroc_dataset(ds, seq, stamp_offset=offset)
    settings = str(tmp_path / "settings.yaml")
    _settings_yaml(settings, calib, W, H, cfg.cam_rate, imu=True,
                   imu_rate=cfg.imu_rate, marginalization=True)
    out = str(tmp_path / "out")

    rc = cli.main([settings, out, "--dataset", ds, "--cpu"])
    assert rc == 0
    stamps, pos, quat = metrics.load_tum(os.path.join(
        out, "estimation_tum.txt"))
    assert len(stamps) > 50
    gt = np.asarray(seq.gt_pose(stamps - offset))
    ape = metrics.ape(stamps, pos, quat, stamps, gt[:, 4:], gt[:, :4],
                      align=True)
    assert ape["trans_rmse"] < 0.15, ape
    assert ape["rot_rmse_deg"] < 3.0, ape
