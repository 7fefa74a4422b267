"""System config parsing and assembly (reference System factory/linker,
system.cpp:10-203)."""

import os

import numpy as np
import jax.numpy as jnp

from hyperslam_tpu.system import config as cfg_mod

CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                   "euroc_stereo_inertial.yaml")


def test_load_system_spec():
    spec = cfg_mod.load_system_spec(CFG)
    assert spec.name == "System-0"
    assert len(spec.sensors) == 3
    assert [s.type for s in spec.sensors] == ["camera", "camera", "imu"]
    assert len(spec.frontends) == 2
    assert spec.frontends[0].type == "visual"
    assert spec.frontends[0].backend == "Backend-0"
    assert spec.backends[0].separation == 0.1
    assert spec.backends[0].max_window == 3.0


def test_case_normalization(tmp_path):
    # reference YAML writes CAMERA/VISUAL, code compares lowercase
    p = tmp_path / "s.yaml"
    p.write_text("""
System:
  name: S
  sensors:
    - {type: CaMeRa, name: c, transformation: [0,0,0,1,0,0,0],
       intrinsics: [1,2,3,4], distortion: {parameters: [0,0,0,0]}}
  frontends:
    - {type: VISUAL, name: f}
  backends:
    - {name: b, suite: TPU}
""")
    spec = cfg_mod.load_system_spec(str(p))
    assert spec.sensors[0].type == "camera"
    assert spec.frontends[0].type == "visual"
    assert spec.backends[0].suite == "tpu"


def test_camera_calib_roundtrip():
    spec = cfg_mod.load_system_spec(CFG)
    calib = cfg_mod.camera_calib_from_spec(spec, jnp.float64)
    assert calib.T_bs.shape == (2, 7)
    # quaternion normalized, wxyz order (w from YAML's 4th element)
    np.testing.assert_allclose(
        np.linalg.norm(calib.T_bs[:, :4], axis=-1), 1.0, atol=1e-9)
    np.testing.assert_allclose(calib.T_bs[0, 0], 0.712301460668946, atol=1e-9)
    np.testing.assert_allclose(calib.intrinsics[0],
                               [367.215, 248.375, 458.654, 457.296])


def test_imu_calib_and_solver_weights():
    spec = cfg_mod.load_system_spec(CFG)
    imu = cfg_mod.imu_calib_from_spec(spec, jnp.float64)
    np.testing.assert_allclose(imu.gyro_intrinsics, np.eye(3))
    solver = cfg_mod.solver_config_from_spec(spec)
    # sigma = density * sqrt(rate): gyro 1.6968e-4 * sqrt(200)
    np.testing.assert_allclose(
        solver.gyro_sqrt_info, 1.0 / (1.6968e-4 * np.sqrt(200)), rtol=1e-6)


def test_window_config_from_spec():
    spec = cfg_mod.load_system_spec(CFG)
    w = cfg_mod.window_config_from_spec(spec)
    assert w.knot_separation == 0.1
    assert w.max_window == 3.0
    assert w.max_knots >= 30


def test_show_tracks_and_stage_times(tmp_path):
    """The reference's show_tracks debug view (klt.cpp:103-141, YAML flag
    settings.yaml:124) writes annotated PNGs; per-stage wall-time stats land
    in stage_times.json (SURVEY §5.1)."""
    import yaml
    from hyperslam_tpu.system.system import System

    doc = {"Node": "H", "System": {
        "name": "S", "modules": [{"name": "M"}],
        "sensors": [
            {"type": "CAMERA", "name": f"cam{c}", "module": "M",
             "frontend": "F", "topic": f"/c{c}",
             "transformation": [0, 0, 0, 1, 0.05 * c, 0, 0],
             "intrinsics": [94, 60, 115, 115],
             "distortion": {"parameters": [0, 0, 0, 0]}}
            for c in range(2)],
        "frontends": [{"type": "VISUAL", "name": "F", "backend": "B",
                       "show_tracks": True, "patch_size": 9,
                       "num_pyramid_levels": 2, "max_num_tracks": 40,
                       "min_track_separation": 8}],
        "backends": [{"name": "B", "separation": 0.25, "max_window": 1.0}],
    }}
    p = tmp_path / "s.yaml"
    p.write_text(yaml.safe_dump(doc))
    spec = cfg_mod.load_system_spec(str(p))
    assert spec.frontends[0].show_tracks
    system = System(spec, dtype=jnp.float64)
    assert system.show_tracks
    viz_dir = str(tmp_path / "tracks")
    system.enable_track_viz(viz_dir, every=1)

    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (120, 188)) * 0.3
            + 128).astype(np.uint8)
    events = [("stereo", 0.1 * i, base, base) for i in range(3)]
    system.run(events)
    out = str(tmp_path / "out")
    system.shutdown(out)
    import json
    st = json.load(open(os.path.join(out, "stage_times.json")))
    assert "klt" in st and st["klt"]["count"] == 3
    pngs = os.listdir(viz_dir)
    assert len(pngs) == 3 and all(n.endswith(".png") for n in pngs)
