"""EuRoC MAV dataset reader (ASL folder format) — no ROS.

Replaces the reference's ROS-topic ingestion (rosbags played into
``Module``/``AsyncSpinner`` subscribers, SURVEY.md §5.8) with a direct
host-side dataset stream: images from ``mav0/cam{0,1}/data/*.png``, IMU from
``mav0/imu0/data.csv``, ground truth from
``mav0/state_groundtruth_estimate0/data.csv`` or the TUM files shipped in
``/root/reference/resources/datasets/euroc/sequences/``.

Yields time-ordered measurement events for the estimator, mirroring the
ordering the reference gets from ``rosbag play``.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["EurocSequence", "load_imu_csv", "load_cam_csv",
           "load_groundtruth_csv", "sensor_yaml_to_calib"]


def load_imu_csv(path: str):
    """imu0/data.csv: timestamp [ns], gyro xyz [rad/s], accel xyz [m/s^2]."""
    data = np.loadtxt(path, delimiter=",", skiprows=1)
    stamps = data[:, 0] * 1e-9
    return stamps, data[:, 1:4], data[:, 4:7]


def load_cam_csv(path: str):
    """cam*/data.csv: timestamp [ns], filename."""
    stamps, names = [], []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            stamps.append(int(row[0]) * 1e-9)
            names.append(row[1].strip())
    return np.asarray(stamps), names


def load_groundtruth_csv(path: str):
    """state_groundtruth_estimate0/data.csv -> (stamps, pos, quat wxyz)."""
    data = np.loadtxt(path, delimiter=",", skiprows=1)
    return data[:, 0] * 1e-9, data[:, 1:4], data[:, 4:8]


def sensor_yaml_to_calib(cam_yamls: List[str], dtype=None):
    """Parse EuRoC sensor.yaml files into a CameraCalib.

    EuRoC stores T_BS (body-from-sensor) row-major 4x4, intrinsics
    [fu, fv, cu, cv] and radial-tangential [k1, k2, p1, p2]; note the
    reference's Intrinsics order is [cx, cy, fx, fy] (SURVEY.md §2.3) which
    is what our CameraCalib uses."""
    import yaml
    import jax.numpy as jnp
    from ..evaluation.metrics import quat_to_matrix_np  # noqa: F401
    from ..solver.problem import CameraCalib
    from ..variables import so3

    dtype = dtype or jnp.float32
    T_list, intr_list, dist_list = [], [], []
    for p in cam_yamls:
        with open(p) as f:
            y = yaml.safe_load(f)
        T = np.asarray(y["T_BS"]["data"], np.float64).reshape(4, 4)
        q = np.asarray(so3.from_matrix(jnp.asarray(T[:3, :3])))
        fu, fv, cu, cv = y["intrinsics"]
        T_list.append(np.concatenate([q, T[:3, 3]]))
        intr_list.append([cu, cv, fu, fv])
        dist_list.append(y["distortion_coefficients"])
    return CameraCalib(
        T_bs=jnp.asarray(np.stack(T_list), dtype),
        intrinsics=jnp.asarray(intr_list, dtype),
        distortion=jnp.asarray(dist_list, dtype))


@dataclasses.dataclass
class EurocSequence:
    """One EuRoC sequence rooted at ``<root>/mav0``."""
    root: str

    def __post_init__(self):
        self.mav = os.path.join(self.root, "mav0")
        if not os.path.isdir(self.mav):
            # allow pointing directly at mav0
            self.mav = self.root

    def imu(self):
        return load_imu_csv(os.path.join(self.mav, "imu0", "data.csv"))

    def cam_index(self, cam: int):
        return load_cam_csv(os.path.join(self.mav, f"cam{cam}", "data.csv"))

    def image_path(self, cam: int, name: str) -> str:
        return os.path.join(self.mav, f"cam{cam}", "data", name)

    def read_image(self, cam: int, name: str) -> np.ndarray:
        import cv2
        img = cv2.imread(self.image_path(cam, name), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(self.image_path(cam, name))
        return img

    def groundtruth(self):
        return load_groundtruth_csv(
            os.path.join(self.mav, "state_groundtruth_estimate0", "data.csv"))

    def calib(self, dtype=None):
        return sensor_yaml_to_calib(
            [os.path.join(self.mav, "cam0", "sensor.yaml"),
             os.path.join(self.mav, "cam1", "sensor.yaml")], dtype)

    def events(self, use_imu=True, max_duration: Optional[float] = None
               ) -> Iterator[tuple]:
        """Yield ("imu", stamp, gyro, accel) and ("stereo", stamp, name0,
        name1) events in stamp order — the analogue of rosbag playback into
        the reference's module queues."""
        imu_s, gyro, accel = self.imu() if use_imu else (np.zeros(0),) * 3
        c0_s, c0_n = self.cam_index(0)
        c1_s, c1_n = self.cam_index(1)
        # pair stereo frames by stamp (reference klt.cpp:162-198)
        j = 0
        pairs = []
        for i, t in enumerate(c0_s):
            j = int(np.argmin(np.abs(c1_s - t)))
            if abs(c1_s[j] - t) < 0.003:
                pairs.append((t, c0_n[i], c1_n[j]))
        events = []
        for i, t in enumerate(imu_s):
            events.append((t, 0, ("imu", t, gyro[i], accel[i])))
        for (t, n0, n1) in pairs:
            events.append((t, 1, ("stereo", t, n0, n1)))
        events.sort(key=lambda e: (e[0], e[1]))
        if not events:
            return
        t_base = events[0][0]  # earliest stamp across imu + stereo
        for t, _, e in events:
            if max_duration is not None and t - t_base > max_duration:
                break
            yield e
