"""Multi-backend sensor subsetting + Cluster runner.

Reference: ``apps/hyperslam/main.cpp:25-45`` (Cluster of Systems, one
signal stops all) and the open TODO at ``system.cpp:133`` — "Only provide
(correct) subset of sensors for multiple backends" — which the reference
never implemented (every backend received every sensor).  Here the declared
link graph (sensor -> frontend -> backend) drives the split
(``config.split_spec_by_backend``) and the Cluster routes events by each
system's sensor set.
"""

import os
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

from hyperslam_tpu.frontend import synthetic
from hyperslam_tpu.system import config as cfg_mod
from hyperslam_tpu.system.system import Cluster


TWO_BACKEND_YAML = textwrap.dedent("""\
    Node: HyperSLAM
    System:
      name: System-0
      modules:
        - name: Module-0
          threads: 1
      sensors:
        - type: CAMERA
          name: cam0
          module: Module-0
          frontend: Frontend-0
          rate: 10
          resolution: [752, 480]
          transformation: [0, 0, 0, 1, 0, 0, 0]
          intrinsics: [367.215, 248.375, 458.654, 457.296]
          distortion: {parameters: [-0.28340811, 0.07395907, 1.76187114e-05, 0.00019359]}
        - type: CAMERA
          name: cam1
          module: Module-0
          frontend: Frontend-0
          rate: 10
          resolution: [752, 480]
          transformation: [0, 0, 0, 1, 0.110074, 0, 0]
          intrinsics: [379.999, 255.238, 457.587, 456.134]
          distortion: {parameters: [-0.28368365, 0.07451284, -3.55590700e-05, -0.00010473]}
        - type: IMU
          name: imu0
          module: Module-0
          frontend: Frontend-1
          rate: 50
          transformation: [0, 0, 0, 1, 0, 0, 0]
          gyroscope_noise_density: 2.0e-3
          accelerometer_noise_density: 2.0e-2
      frontends:
        - type: VISUAL
          name: Frontend-0
          max_num_tracks: 100
        - type: INERTIAL
          name: Frontend-1
          backend: Backend-1
      backends:
        - name: Backend-0
          separation: 0.25
          max_window: 2.0
        - name: Backend-1
          separation: 0.25
          max_window: 2.0
    """)


def test_split_spec_by_backend(tmp_path):
    p = os.path.join(tmp_path, "settings.yaml")
    with open(p, "w") as f:
        f.write(TWO_BACKEND_YAML)
    spec = cfg_mod.load_system_spec(p)
    subs = cfg_mod.split_spec_by_backend(spec)
    assert [s.backends[0].name for s in subs] == ["Backend-0", "Backend-1"]
    # Backend-0: visual frontend only (no backend link -> attaches to all),
    # so cams but NO imu; Backend-1: cams + imu.
    types0 = sorted(s.type for s in subs[0].sensors)
    types1 = sorted(s.type for s in subs[1].sensors)
    assert types0 == ["camera", "camera"]
    assert types1 == ["camera", "camera", "imu"]
    assert subs[0].name == "System-0-Backend-0"


def test_load_system_specs_multi(tmp_path):
    """A ``Systems:`` list yields one spec per entry (Cluster input)."""
    single = TWO_BACKEND_YAML.split("System:\n", 1)[1]
    multi = ("Node: HyperSLAM\nSystems:\n  -" +
             "\n   ".join(("\n" + single).rstrip().split("\n"))).replace(
                 "name: System-0", "name: System-A", 1)
    p = os.path.join(tmp_path, "multi.yaml")
    with open(p, "w") as f:
        f.write(multi)
    specs = cfg_mod.load_system_specs(p)
    assert len(specs) == 1 and specs[0].name == "System-A"
    p2 = os.path.join(tmp_path, "one.yaml")
    with open(p2, "w") as f:
        f.write(TWO_BACKEND_YAML)
    assert len(cfg_mod.load_system_specs(p2)) == 1


@pytest.mark.slow
def test_cluster_run_and_export(tmp_path):
    p = os.path.join(tmp_path, "settings.yaml")
    with open(p, "w") as f:
        f.write(TWO_BACKEND_YAML)

    overrides = dict(max_knots=16, max_landmarks=128, max_bearing=1024,
                     max_inertial=256, max_prior=16, max_frames=64)
    cluster = Cluster.from_settings(p, dtype=jnp.float64,
                                    window_overrides=overrides)
    assert len(cluster.systems) == 2
    vis_sys, vi_sys = cluster.systems
    assert not vis_sys.has_imu and vi_sys.has_imu

    cfg = synthetic.SyntheticConfig(
        duration=2.5, knot_dt=0.5, cam_rate=10.0, imu_rate=50.0,
        num_landmarks=80, pixel_noise=0.3, seed=2)
    seq = synthetic.generate(cfg, calib=vis_sys.cams)
    events = [("tracks", t, c, i, px) for (t, c, i, px) in seq.frames]
    events += [("imu", t, g, a) for (t, g, a) in seq.imu]
    events += [("prior", t, np.asarray(seq.gt_pose(t)))
               for (t, _, _, _) in seq.frames if t < seq.frames[0][0] + 0.6]
    events.sort(key=lambda e: e[1])

    cluster.run(events)
    # imu events were routed only to the inertial-capable system
    assert vis_sys._imu_samples == 0
    assert vi_sys._imu_samples == len(seq.imu)
    assert vis_sys._frames == vi_sys._frames == len(seq.frames)

    out = cluster.shutdown(os.path.join(tmp_path, "out"))
    assert set(out) == {"System-0-Backend-0", "System-0-Backend-1"}
    for name, (stamps, poses) in out.items():
        assert len(stamps) > 20
        assert np.isfinite(poses).all()
        assert os.path.isfile(
            os.path.join(tmp_path, "out", name, "estimation_tum.txt"))
