"""KITTI odometry dataset reader (grayscale stereo folder layout) — no ROS.

The reference ships KITTI ground truth for sequences 00-10
(``/root/reference/resources/datasets/kitti/sequences/*.txt``, TUM format
``t x y z qx qy qz qw``) but its KITTI setup YAML is EMPTY (0 bytes,
``resources/datasets/kitti/setups/stereo/settings.yaml`` — SURVEY.md §2.1
"Configs & data"); this reader + ``configs/kitti_stereo.yaml`` complete
what the reference declared.

Standard KITTI odometry layout::

    <root>/
      image_0/000000.png ...   # left grayscale
      image_1/000000.png ...   # right grayscale
      times.txt                # one stamp [s] per line
      calib.txt                # P0..P3 3x4 rectified projection matrices

Rectified model: zero distortion; stereo baseline from P1's translation
column (P1[0,3] = -fx * baseline).  KITTI has no IMU in the odometry kit,
so sequences are vision-only (the reference's stereo setup).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import numpy as np

__all__ = ["KittiSequence", "load_kitti_calib", "write_kitti_dataset",
           "looks_like_kitti"]


def looks_like_kitti(root: str) -> bool:
    """Dataset-format sniff: KITTI roots carry times.txt + image_0/."""
    return (os.path.isfile(os.path.join(root, "times.txt"))
            and os.path.isdir(os.path.join(root, "image_0")))


def load_kitti_calib(path: str, dtype=None):
    """Parse calib.txt (P0/P1) into a CameraCalib.

    Returns intrinsics in the framework's [cx, cy, fx, fy] order
    (SURVEY.md §2.3, reference ``Intrinsics``), zero distortion (KITTI
    images are rectified), cam0 at the body origin and cam1 offset by the
    stereo baseline along +x."""
    import jax.numpy as jnp
    from ..solver.problem import CameraCalib
    from ..variables import se3, so3

    dtype = dtype or jnp.float32
    P = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            P[key.strip()] = np.fromstring(vals, sep=" ").reshape(3, 4)
    P0, P1 = P["P0"], P["P1"]
    fx, fy = P0[0, 0], P0[1, 1]
    cx, cy = P0[0, 2], P0[1, 2]
    baseline = -P1[0, 3] / P1[0, 0]
    T_b_c0 = se3.identity(jnp.float64)
    T_b_c1 = se3.from_parts(so3.identity(jnp.float64),
                            jnp.asarray([baseline, 0.0, 0.0], jnp.float64))
    intr = np.asarray([[cx, cy, fx, fy],
                       [P1[0, 2], P1[1, 2], P1[0, 0], P1[1, 1]]])
    return CameraCalib(
        T_bs=jnp.asarray(np.stack([np.asarray(T_b_c0), np.asarray(T_b_c1)]),
                         dtype),
        intrinsics=jnp.asarray(intr, dtype),
        distortion=jnp.zeros((2, 4), dtype))


@dataclasses.dataclass
class KittiSequence:
    """One KITTI odometry sequence folder (e.g. ``.../sequences/00``)."""
    root: str

    def times(self) -> np.ndarray:
        return np.loadtxt(os.path.join(self.root, "times.txt")).reshape(-1)

    def calib(self, dtype=None):
        return load_kitti_calib(os.path.join(self.root, "calib.txt"), dtype)

    def image_path(self, cam: int, index: int) -> str:
        return os.path.join(self.root, f"image_{cam}", f"{index:06d}.png")

    def read_image(self, cam: int, index: int) -> np.ndarray:
        from PIL import Image
        p = self.image_path(cam, index)
        if not os.path.isfile(p):
            raise FileNotFoundError(p)
        return np.asarray(Image.open(p).convert("L"))

    def num_frames(self) -> int:
        return len(self.times())

    def events(self, use_imu: bool = False,
               max_duration: Optional[float] = None) -> Iterator[tuple]:
        """Yield ("stereo", stamp, img0, img1) in stamp order (KITTI has no
        IMU; ``use_imu`` accepted for interface parity and ignored)."""
        ts = self.times()
        for i, t in enumerate(ts):
            if max_duration is not None and t - ts[0] > max_duration:
                break
            yield ("stereo", float(t), self.read_image(0, i),
                   self.read_image(1, i))


def write_kitti_dataset(root: str, frames, calib, times=None) -> str:
    """Write a KITTI-odometry-layout dataset for tests: ``frames`` is a list
    of (stamp, img0 uint8, img1 uint8); ``calib`` a CameraCalib (rectified:
    distortion ignored, baseline taken from T_bs[1])."""
    from PIL import Image
    for c in range(2):
        os.makedirs(os.path.join(root, f"image_{c}"), exist_ok=True)
    ts = []
    for i, (t, img0, img1) in enumerate(frames):
        ts.append(t)
        for c, img in ((0, img0), (1, img1)):
            Image.fromarray(img, "L").save(
                os.path.join(root, f"image_{c}", f"{i:06d}.png"))
    np.savetxt(os.path.join(root, "times.txt"),
               np.asarray(times if times is not None else ts), fmt="%.6e")
    intr = np.asarray(calib.intrinsics, np.float64)
    base = float(np.asarray(calib.T_bs, np.float64)[1, 4])
    with open(os.path.join(root, "calib.txt"), "w") as f:
        for name, cam, tx in (("P0", 0, 0.0), ("P1", 1, -base),
                              ("P2", 0, 0.0), ("P3", 1, -base)):
            cx, cy, fx, fy = intr[cam]
            P = np.asarray([[fx, 0, cx, tx * fx],
                            [0, fy, cy, 0],
                            [0, 0, 1, 0]])
            f.write(name + ": " + " ".join(f"{v:.12e}" for v in P.ravel())
                    + "\n")
    return root
