"""YAML configuration loader — reference-compatible schema.

Parses the reference's ``settings.yaml`` layout
(``/root/reference/resources/datasets/euroc/setups/stereo_inertial/settings.yaml``,
consumed by ``System`` at ``internal/hyper/system/system.cpp:114-151``;
SURVEY.md §5.6): a ``System:`` node with ``modules / sensors / frontends /
backends`` lists whose entries name their links (``module:``, ``frontend:``,
``backend:``) to form the wiring graph.

Type strings are case-normalized (the reference YAML writes ``CAMERA`` /
``VISUAL`` while its code compares lowercase — SURVEY.md §2.1 config note).
Quaternions in the YAML are ``[qx, qy, qz, qw]`` + translation; internally we
store wxyz+t.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import yaml

import jax.numpy as jnp

from ..frontend.klt import KLTConfig
from ..solver.problem import CameraCalib, ImuCalib, SolverConfig
from ..window.estimator import WindowConfig


@dataclasses.dataclass
class SensorSpec:
    type: str                      # "camera" | "imu"
    name: str
    module: str = ""
    frontend: str = ""
    topic: str = ""
    rate: float = 0.0
    transformation: np.ndarray = None    # (7,) wxyz + t
    # camera
    resolution: Optional[tuple] = None
    intrinsics: Optional[np.ndarray] = None   # [cx, cy, fx, fy]
    distortion: Optional[np.ndarray] = None   # [k1, k2, p1, p2]
    # shutter model (reference YAML `shutter: GLOBAL`, settings.yaml:28;
    # the correction hook is commented out in the reference,
    # abstract.cpp:217-219 — implemented here for VERTICAL readout)
    shutter: str = "global"                   # "global" | "vertical"
    shutter_delta: float = 0.0                # line delay [s/row]
    # imu
    gyroscope_intrinsics: Optional[np.ndarray] = None    # (3,3)
    accelerometer_intrinsics: Optional[np.ndarray] = None
    gyroscope_sensitivity: Optional[np.ndarray] = None
    accelerometer_axes_offsets: Optional[np.ndarray] = None
    gyroscope_noise_density: float = 1.6968e-4
    accelerometer_noise_density: float = 2.0e-3


@dataclasses.dataclass
class FrontendSpec:
    type: str                      # "visual" | "inertial"
    name: str
    backend: str = ""
    max_queue_size: int = 20
    klt: Optional[KLTConfig] = None
    # reference debug view flag (settings.yaml:124, klt.cpp:103-141)
    show_tracks: bool = False


@dataclasses.dataclass
class BackendSpec:
    name: str
    mode: str = "window"
    suite: str = "tpu"             # replaces the reference's "ceres"
    manifold: str = "se3"
    representation: str = "continuous"
    separation: float = 0.1
    max_window: float = 3.0
    time_constant: bool = True
    rotation_constant: bool = False
    translation_constant: bool = False
    threads: int = 1
    # extensions beyond the reference schema
    marginalization: bool = False   # fixed-lag marg of evicted factors
    inertial_mode: str = "direct"   # "direct" | "preintegrated"


@dataclasses.dataclass
class SystemSpec:
    name: str
    sensors: List[SensorSpec]
    frontends: List[FrontendSpec]
    backends: List[BackendSpec]
    modules: List[dict]
    node_name: str = "HyperSLAM"


def _quat_xyzw_to_wxyz_t(vals):
    v = np.asarray(vals, np.float64)
    q = np.asarray([v[3], v[0], v[1], v[2]])
    q = q / np.linalg.norm(q)
    return np.concatenate([q, v[4:7]])


def _intr_diag_offdiag_to_matrix(vals):
    """Reference IMU intrinsics: [c00,c11,c22, c10,c20,c21] -> lower-tri
    scale/misalignment matrix (``align()`` semantics, SURVEY.md §2.3)."""
    c = np.asarray(vals, np.float64)
    m = np.diag(c[:3])
    m[1, 0], m[2, 0], m[2, 1] = c[3], c[4], c[5]
    return m


def _parse_sensor(node: dict) -> SensorSpec:
    stype = str(node.get("type", "")).lower()
    spec = SensorSpec(
        type=stype, name=node.get("name", ""),
        module=node.get("module", ""), frontend=node.get("frontend", ""),
        topic=node.get("topic", ""), rate=float(node.get("rate", 0.0)),
        transformation=_quat_xyzw_to_wxyz_t(node["transformation"]))
    if stype == "camera":
        spec.resolution = tuple(node.get("resolution", (752, 480)))
        intr = np.asarray(node["intrinsics"], np.float64)
        spec.intrinsics = intr  # already [cx, cy, fx, fy]
        d = node.get("distortion", {})
        p = np.asarray(d.get("parameters", [0, 0, 0, 0]), np.float64)
        # YAML order: [k1, k2, p1, p2] (radial then tangential); note the
        # stereo_inertial file lists cam0 tangential as [p2, p1]-looking
        # values — we keep the declared order [k1, k2, p1, p2].
        spec.distortion = p
        spec.shutter = str(node.get("shutter", "GLOBAL")).lower()
        spec.shutter_delta = float(node.get("shutter_delta", 0.0))
        if spec.shutter not in ("global", "vertical"):
            raise ValueError(
                f"unsupported shutter type '{node.get('shutter')}' for "
                f"{spec.name}: GLOBAL and VERTICAL are supported")
        if spec.shutter == "vertical" and spec.shutter_delta <= 0.0:
            raise ValueError(
                f"camera {spec.name}: shutter VERTICAL requires "
                "shutter_delta (line delay in seconds/row)")
    elif stype == "imu":
        spec.gyroscope_intrinsics = _intr_diag_offdiag_to_matrix(
            node.get("gyroscope_intrinsics", [1, 1, 1, 0, 0, 0]))
        spec.accelerometer_intrinsics = _intr_diag_offdiag_to_matrix(
            node.get("accelerometer_intrinsics", [1, 1, 1, 0, 0, 0]))
        spec.gyroscope_sensitivity = np.asarray(
            node.get("gyroscope_sensitivity", np.zeros(9)),
            np.float64).reshape(3, 3)
        spec.accelerometer_axes_offsets = np.asarray(
            node.get("accelerometer_axes_offsets", np.zeros(9)),
            np.float64).reshape(3, 3)
        spec.gyroscope_noise_density = float(
            node.get("gyroscope_noise_density", 1.6968e-4))
        spec.accelerometer_noise_density = float(
            node.get("accelerometer_noise_density", 2.0e-3))
    else:
        raise ValueError(f"unknown sensor type: {node.get('type')}")
    return spec


def _parse_frontend(node: dict) -> FrontendSpec:
    ftype = str(node.get("type", "")).lower()
    spec = FrontendSpec(type=ftype, name=node.get("name", ""),
                        backend=node.get("backend", ""),
                        max_queue_size=int(node.get("max_queue_size", 20)))
    if ftype == "visual":
        spec.klt = KLTConfig(
            max_tracks=int(node.get("max_num_tracks", 150)),
            min_track_separation=float(node.get("min_track_separation", 30)),
            win=int(node.get("patch_size", 21)) | 1,
            levels=int(node.get("num_pyramid_levels", 3)),
            fb_threshold=float(node.get("max_track_error", 0.5)),
        )
        spec.show_tracks = bool(node.get("show_tracks", False))
    return spec


def _parse_backend(node: dict) -> BackendSpec:
    return BackendSpec(
        name=node.get("name", ""),
        mode=str(node.get("mode", "window")).lower(),
        suite=str(node.get("suite", "tpu")).lower(),
        manifold=str(node.get("manifold", "se3")).lower(),
        representation=str(node.get("representation", "continuous")).lower(),
        separation=float(node.get("separation", 0.1)),
        max_window=float(node.get("max_window", 3.0)),
        time_constant=bool(node.get("time_constant", True)),
        rotation_constant=bool(node.get("rotation_constant", False)),
        translation_constant=bool(node.get("translation_constant", False)),
        threads=int(node.get("threads", 1)),
        marginalization=bool(node.get("marginalization", False)),
        inertial_mode=str(node.get("inertial_mode", "direct")).lower(),
    )


def _parse_system_node(node: dict, node_name: str) -> SystemSpec:
    return SystemSpec(
        name=node.get("name", "System-0"),
        node_name=node_name,
        modules=node.get("modules", []),
        sensors=[_parse_sensor(s) for s in node.get("sensors", [])],
        frontends=[_parse_frontend(s) for s in node.get("frontends", [])],
        backends=[_parse_backend(s) for s in node.get("backends", [])],
    )


def load_system_spec(path: str) -> SystemSpec:
    with open(path) as f:
        root = yaml.safe_load(f)
    node = root.get("System", root)
    return _parse_system_node(node, root.get("Node", "HyperSLAM"))


def load_system_specs(path: str) -> List[SystemSpec]:
    """All systems in a settings file (the reference's Cluster input,
    ``apps/hyperslam/main.cpp:25-45``; its YAML schema titles the section
    "# Systems", settings.yaml:3).  Accepts either one ``System:`` node or
    a ``Systems:`` list."""
    with open(path) as f:
        root = yaml.safe_load(f)
    node_name = root.get("Node", "HyperSLAM")
    if "Systems" in root:
        return [_parse_system_node(n, node_name) for n in root["Systems"]]
    return [_parse_system_node(root.get("System", root), node_name)]


def split_spec_by_backend(spec: SystemSpec) -> List[SystemSpec]:
    """One sub-spec per backend, each carrying ONLY its linked sensors —
    the reference's open TODO at ``system.cpp:133`` ("Only provide
    (correct) subset of sensors for multiple backends"), resolved here via
    the declared link graph: sensor --frontend--> frontend --backend-->
    backend.  Frontends with no ``backend:`` link attach to every backend
    (matching the reference's permissive default)."""
    if len(spec.backends) <= 1:
        return [spec]
    out = []
    for be in spec.backends:
        fes = [f for f in spec.frontends
               if f.backend == be.name or not f.backend]
        fe_names = {f.name for f in fes}
        sensors = [s for s in spec.sensors
                   if s.frontend in fe_names or not s.frontend]
        if not any(s.type == "camera" for s in sensors):
            raise ValueError(
                f"backend {be.name}: no camera sensor linked (frontends "
                f"{sorted(fe_names)}) — every backend needs at least one")
        out.append(SystemSpec(
            name=f"{spec.name}-{be.name}", node_name=spec.node_name,
            modules=spec.modules, sensors=sensors, frontends=fes,
            backends=[be]))
    return out


def camera_calib_from_spec(spec: SystemSpec, dtype=jnp.float32) -> CameraCalib:
    cams = [s for s in spec.sensors if s.type == "camera"]
    if not cams:
        raise ValueError("no camera sensors in config")
    return CameraCalib(
        T_bs=jnp.asarray(np.stack([c.transformation for c in cams]), dtype),
        intrinsics=jnp.asarray(np.stack([c.intrinsics for c in cams]), dtype),
        distortion=jnp.asarray(np.stack([c.distortion for c in cams]), dtype))


def imu_calib_from_spec(spec: SystemSpec, dtype=jnp.float32) -> ImuCalib:
    imus = [s for s in spec.sensors if s.type == "imu"]
    if not imus:
        return ImuCalib.default(dtype)
    i = imus[0]
    return ImuCalib(
        T_bs=jnp.asarray(i.transformation, dtype),
        gyro_intrinsics=jnp.asarray(i.gyroscope_intrinsics, dtype),
        accel_intrinsics=jnp.asarray(i.accelerometer_intrinsics, dtype),
        g_sensitivity=jnp.asarray(i.gyroscope_sensitivity, dtype),
        lever_arm=jnp.zeros(3, dtype),
    )


def window_config_from_spec(spec: SystemSpec, dtype=jnp.float32,
                            **overrides) -> WindowConfig:
    be = spec.backends[0] if spec.backends else BackendSpec(name="Backend-0")
    if not be.time_constant:
        import logging
        logging.getLogger(__name__).warning(
            "backend %s sets time_constant: false, but knot stamps live on "
            "a structural uniform grid and are never optimizable; ignoring",
            be.name)
    # Size factor capacities to the actual data envelope: every stereo
    # observation inside the window is a residual (the reference keeps them
    # all as Ceres blocks).  An undersized capacity silently thins the
    # problem (see estimator._build_factors), so compute the need from the
    # sensor rates and clamp to a sane device budget.
    cams = [s for s in spec.sensors if s.type == "camera"]
    vis = [f for f in spec.frontends if f.type == "visual"]
    rate = max([c.rate or 20.0 for c in cams], default=20.0)
    tracks = vis[0].klt.max_tracks if (vis and vis[0].klt) else 150
    need = len(cams) * tracks * rate * be.max_window
    # Clamp at 32k rows: J is (R, D) f32 ~ R*254*4B = 33 MB at the clamp —
    # fine for device HBM; steady-state thinning beyond it is surfaced via
    # estimator.overflow_counts (ADVICE r2: silent thinning is visible).
    max_bearing = int(min(2 ** int(np.ceil(np.log2(max(need, 1024)))), 32768))
    kw = dict(knot_separation=be.separation, max_window=be.max_window,
              max_knots=int(np.ceil(be.max_window / be.separation)) + 8,
              max_bearing=max_bearing,
              max_landmarks=int(2 ** int(np.ceil(np.log2(max(
                  2 * tracks, 256))))),
              knot_rotation_constant=be.rotation_constant,
              knot_translation_constant=be.translation_constant,
              enable_marginalization=be.marginalization,
              inertial_mode=be.inertial_mode,
              max_preint=(64 if be.inertial_mode == "preintegrated" else 0),
              dtype=dtype)
    if any(c.shutter == "vertical" for c in cams):
        kw["shutter_deltas"] = tuple(
            c.shutter_delta if c.shutter == "vertical" else 0.0 for c in cams)
        kw["shutter_rows"] = tuple(
            (c.resolution or (752, 480))[1] for c in cams)
        # each image now needs bands x cams frame slots (default 8 bands)
        bands = int(overrides.get("shutter_bands", 8))
        if bands > 0:
            kw["max_frames"] = int(256 * bands)
    kw.update(overrides)
    return WindowConfig(**kw)


def solver_config_from_spec(spec: SystemSpec, imu_rate: float = 200.0,
                            pixel_sigma: float = 1.0,
                            **overrides) -> SolverConfig:
    """Whitened information weights from sensor noise models.

    IMU: discrete-time sigma = density * sqrt(rate); with whitening the
    extra ScaledLoss the reference applies (1.6e-5) becomes 1.0.
    Bearing: angular sigma ~ pixel_sigma / focal_length."""
    imus = [s for s in spec.sensors if s.type == "imu"]
    cams = [s for s in spec.sensors if s.type == "camera"]
    kw = {}
    if imus:
        i = imus[0]
        rate = i.rate or imu_rate
        kw["gyro_sqrt_info"] = 1.0 / (i.gyroscope_noise_density
                                      * np.sqrt(rate))
        kw["accel_sqrt_info"] = 1.0 / (i.accelerometer_noise_density
                                       * np.sqrt(rate))
        kw["inertial_scale"] = 1.0
    if cams:
        fx = float(cams[0].intrinsics[2])
        kw["bearing_sqrt_info"] = fx / pixel_sigma
        kw["pixel_sqrt_info"] = 1.0 / pixel_sigma
    kw.update(overrides)
    return SolverConfig(**kw)
