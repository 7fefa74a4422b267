"""Fixed-capacity, masked problem tensors for the sliding-window NLLS.

This is the TPU-native inversion of the reference's pointer-graph problem
(heterogeneous Ceres parameter blocks + per-residual dynamic layouts,
``/root/reference/internal/hyper/optimizers/ceres/optimizer.cpp:73-283``):
all residuals of a type live in one struct-of-arrays with an ``active`` mask,
capacities are static so nothing recompiles as the window slides, and the
whole window is solved as one batched Gauss-Newton problem.

Reduced parameter layout (tangent space), mirroring the reference's canonical
block order [state knots | sensor params | observation params]
(``ceres/costs/exteroceptive.cpp:25-99``):

    [ pose knots: K * 6 | gyro bias knots: Kb * 3 | accel bias knots: Kb * 3
      | gravity: 2 | cam extrinsics: C * 6 | cam intrinsics: C * 4
      | cam distortion: C * 4 | imu extrinsics: 6 ]

The sensor-calibration columns realize the reference's self-calibration
(every sensor parameter is a registered, optionally-constant Ceres block,
``ceres/optimizer.cpp:56-69`` + ``manifolds/sensors/*``); they are frozen by
default via ``Masks`` and freed per-group for online calibration.

Landmarks (L * 3) are Schur-eliminated, not part of the reduced system.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import struct

from ..variables import s2, se3


@struct.dataclass
class CameraCalib:
    """Per-camera calibration, batched over cameras (C, ...).

    Reference: ``Camera`` sensor parameters — extrinsics T_bs, intrinsics
    [cx, cy, fx, fy], radial-tangential distortion (SURVEY.md §2.3)."""
    T_bs: jnp.ndarray    # (C, 7)
    intrinsics: jnp.ndarray  # (C, 4)
    distortion: jnp.ndarray  # (C, 4)


@struct.dataclass
class ImuCalib:
    """IMU calibration (reference ``IMU`` sensor, SURVEY.md §2.3)."""
    T_bs: jnp.ndarray        # (7,)
    gyro_intrinsics: jnp.ndarray   # (3, 3) scale/misalignment
    accel_intrinsics: jnp.ndarray  # (3, 3)
    g_sensitivity: jnp.ndarray     # (3, 3)
    lever_arm: jnp.ndarray         # (3,)

    @classmethod
    def default(cls, dtype=jnp.float32):
        return cls(
            T_bs=se3.identity(dtype),
            gyro_intrinsics=jnp.eye(3, dtype=dtype),
            accel_intrinsics=jnp.eye(3, dtype=dtype),
            g_sensitivity=jnp.zeros((3, 3), dtype),
            lever_arm=jnp.zeros(3, dtype),
        )


@struct.dataclass
class Params:
    """Optimizable state of one window."""
    knots: jnp.ndarray       # (K, 7) SE3 pose spline knots
    landmarks: jnp.ndarray   # (L, 3) world points
    gravity: jnp.ndarray     # (3,) norm-fixed
    bias_g: jnp.ndarray      # (Kb, 3) gyroscope bias spline knots
    bias_a: jnp.ndarray      # (Kb, 3) accelerometer bias spline knots

    @property
    def num_knots(self):
        return self.knots.shape[0]

    @property
    def num_landmarks(self):
        return self.landmarks.shape[0]

    @property
    def num_bias_knots(self):
        return self.bias_g.shape[0]


@struct.dataclass
class FrameTable:
    """Shared per-(stamp, camera) spline queries for visual factors.

    All observations of one camera frame share one sensor pose T_ws(t) and
    its Jacobian w.r.t. the 4 support knots; evaluating them once per FRAME
    instead of once per OBSERVATION cuts the linearize op count ~10x (the
    reference re-evaluates the state per residual, ``evaluators/bearing.cpp``
    — structure sharing is where the TPU design beats it)."""
    s: jnp.ndarray       # (NF,) int32 first support-knot index
    u: jnp.ndarray       # (NF,) local spline coordinate
    cam: jnp.ndarray     # (NF,) int32 camera index
    active: jnp.ndarray  # (NF,) {0, 1}

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32):
        return cls(s=jnp.zeros(capacity, jnp.int32),
                   u=jnp.zeros(capacity, dtype),
                   cam=jnp.zeros(capacity, jnp.int32),
                   active=jnp.zeros(capacity, dtype))


@struct.dataclass
class VisualFactors:
    """Bearing or pixel observations (one array set per camera-agnostic batch).

    Each factor references its spline segment (s, u), camera, landmark slot.
    Reference analogue: one ``ExteroceptiveCost`` per observation
    (``ceres/optimizer.cpp:189-232``).  When ``frame`` is present (indices
    into ``Factors.frames``), the solver uses the frame-shared fast path;
    (s, u, cam) stay populated so frame-less consumers (time/factor sharding)
    keep working on the same arrays."""
    s: jnp.ndarray       # (F,) int32 first support-knot index
    u: jnp.ndarray       # (F,) local spline coordinate
    cam: jnp.ndarray     # (F,) int32 camera index
    lm: jnp.ndarray      # (F,) int32 landmark slot
    meas: jnp.ndarray    # (F, 3) bearing  or (F, 2) pixel
    active: jnp.ndarray  # (F,) {0, 1}
    frame: Any = None    # (F,) int32 into Factors.frames, or None

    @classmethod
    def empty(cls, capacity: int, meas_dim: int = 3, dtype=jnp.float32):
        return cls(
            s=jnp.zeros(capacity, jnp.int32),
            u=jnp.zeros(capacity, dtype),
            cam=jnp.zeros(capacity, jnp.int32),
            lm=jnp.zeros(capacity, jnp.int32),
            meas=jnp.zeros((capacity, meas_dim), dtype).at[:, -1].set(1.0),
            active=jnp.zeros(capacity, dtype),
        )


@struct.dataclass
class InertialFactors:
    """Direct continuous-time IMU factors (reference ``direct.cpp:13-38``)."""
    s: jnp.ndarray        # (F,) pose-spline segment
    u: jnp.ndarray        # (F,)
    bias_s: jnp.ndarray   # (F,) bias-spline segment
    bias_u: jnp.ndarray   # (F,)
    meas: jnp.ndarray     # (F, 6) [gyro, accel]
    active: jnp.ndarray   # (F,)

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32):
        return cls(
            s=jnp.zeros(capacity, jnp.int32),
            u=jnp.zeros(capacity, dtype),
            bias_s=jnp.zeros(capacity, jnp.int32),
            bias_u=jnp.zeros(capacity, dtype),
            meas=jnp.zeros((capacity, 6), dtype),
            active=jnp.zeros(capacity, dtype),
        )


@struct.dataclass
class PriorFactors:
    """SE3 pose priors (reference manifold observations,
    ``ceres/optimizer.cpp:234-251``)."""
    s: jnp.ndarray       # (F,)
    u: jnp.ndarray       # (F,)
    meas: jnp.ndarray    # (F, 7) measured T_ws
    active: jnp.ndarray  # (F,)

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32):
        meas = jnp.zeros((capacity, 7), dtype).at[:, 0].set(1.0)
        return cls(
            s=jnp.zeros(capacity, jnp.int32),
            u=jnp.zeros(capacity, dtype),
            meas=meas,
            active=jnp.zeros(capacity, dtype),
        )


@struct.dataclass
class PreintFactors:
    """Preintegrated IMU factors (the reference's absent INTEGRATING
    frontend, ``frontends/inertial/forward.hpp:9-13``; see
    ``factors/preintegration.py``).  One 9-dim residual per keyframe
    interval, endpoints on (possibly different) pose-spline segments."""
    s_i: jnp.ndarray      # (F,) int32 pose segment at t_i
    u_i: jnp.ndarray      # (F,)
    s_j: jnp.ndarray      # (F,) pose segment at t_j
    u_j: jnp.ndarray      # (F,)
    bias_s: jnp.ndarray   # (F,) bias-spline segment at t_i
    bias_u: jnp.ndarray   # (F,)
    dq: jnp.ndarray       # (F, 4) preintegrated rotation (wxyz)
    dv: jnp.ndarray       # (F, 3)
    dp: jnp.ndarray       # (F, 3)
    dt_ij: jnp.ndarray    # (F,)
    J_bias: jnp.ndarray   # (F, 5, 3, 3) [dR/dbg, dv/dbg, dv/dba, dp/dbg, dp/dba]
    bg0: jnp.ndarray      # (F, 3) bias linearization point
    ba0: jnp.ndarray      # (F, 3)
    sqrt_info: jnp.ndarray  # (F, 9, 9) whitening matrix
    active: jnp.ndarray   # (F,)

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32):
        dq = jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0)
        eye9 = jnp.tile(jnp.eye(9, dtype=dtype), (capacity, 1, 1))
        return cls(
            s_i=jnp.zeros(capacity, jnp.int32),
            u_i=jnp.zeros(capacity, dtype),
            s_j=jnp.zeros(capacity, jnp.int32),
            u_j=jnp.zeros(capacity, dtype),
            bias_s=jnp.zeros(capacity, jnp.int32),
            bias_u=jnp.zeros(capacity, dtype),
            dq=dq,
            dv=jnp.zeros((capacity, 3), dtype),
            dp=jnp.zeros((capacity, 3), dtype),
            dt_ij=jnp.full((capacity,), 1.0, dtype),
            J_bias=jnp.zeros((capacity, 5, 3, 3), dtype),
            bg0=jnp.zeros((capacity, 3), dtype),
            ba0=jnp.zeros((capacity, 3), dtype),
            sqrt_info=eye9,
            active=jnp.zeros(capacity, dtype),
        )


@struct.dataclass
class SmoothFactors:
    """Second-difference (constant-velocity) smoothness prior on consecutive
    pose knots: r = w * (log(k_{i+1}^-1 k_{i+2}) - log(k_i^-1 k_{i+1})).

    The reference has no such prior — and correspondingly its spline knots
    are only constrained by whatever measurements land on their segments.
    With sparse visual data (~1 frame per segment) the newest extrapolated
    knot is nearly unobserved and Gauss-Newton sends it arbitrarily far
    without raising the cost (measured: km-scale divergence of the CLI run
    at separation 0.1 s / 10 fps).  A weak constant-velocity prior floors
    the information in those null directions at 1/sigma^2 while biasing real
    trajectories only through their *acceleration* (zero residual for
    constant velocity), the standard motion-model regularizer in
    continuous-time SLAM."""
    i: jnp.ndarray       # (F,) int32 first knot index (uses knots i, i+1, i+2)
    active: jnp.ndarray  # (F,)

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32):
        return cls(i=jnp.zeros(capacity, jnp.int32),
                   active=jnp.zeros(capacity, dtype))


@struct.dataclass
class CalibPrior:
    """Prior anchoring freed sensor extrinsics at their initial calibration.

    Online self-calibration (reference constancy flags off,
    ``ceres/optimizer.cpp:56-69``) adds gauge freedom: with short feature
    tracks the long-range monocular scale chain is broken and a free stereo
    baseline lets the whole world + baseline co-scale at noise-level cost
    (measured: 54% baseline collapse in the first solves, a self-consistent
    wrong basin).  The standard treatment is a prior at the factory/initial
    calibration — strong enough to keep the solver in the true-scale basin,
    weak enough that observable corrections converge.  Sigmas come from
    ``WindowConfig.calib_prior_sigma_*``."""
    cam_T_bs0: jnp.ndarray   # (C, 7) anchor extrinsics
    cam_active: jnp.ndarray  # (C,) {0,1} — freed, non-gauge cameras
    imu_T_bs0: jnp.ndarray   # (7,)
    imu_active: jnp.ndarray  # () {0,1}
    sqrt_rot: jnp.ndarray    # () 1/sigma [1/rad]
    sqrt_trans: jnp.ndarray  # () 1/sigma [1/m]


@struct.dataclass
class MargPrior:
    """Gaussian marginalization prior over the non-calibration state block
    ``[pose knots | gyro bias | accel bias | gravity]`` (D0 = K*6 + Kb*6 + 2
    tangent dims), produced by Schur-eliminating state leaving the window
    (solver/marginalization.py).

    The reference has NO marginalization — old knots are merely frozen and
    their factors' information discarded (``ceres/optimizer.cpp:322-328``,
    SURVEY.md §2.2); this factor retains that information.  Cost
    ``0.5 * ||sqrt_H @ (x [-] x0) + r0||^2`` with first-estimate Jacobians
    (sqrt_H fixed at the linearization point x0)."""
    sqrt_H: jnp.ndarray    # (D0, D0) rows of the information square root
    r0: jnp.ndarray        # (D0,)
    x0_knots: jnp.ndarray  # (K, 7) linearization point
    x0_bias_g: jnp.ndarray  # (Kb, 3)
    x0_bias_a: jnp.ndarray  # (Kb, 3)
    x0_gravity: jnp.ndarray  # (3,)
    active: jnp.ndarray    # () {0, 1}

    @classmethod
    def empty(cls, K: int, Kb: int, dtype=jnp.float32):
        D0 = K * 6 + Kb * 6 + 2
        knots = jnp.zeros((K, 7), dtype).at[:, 0].set(1.0)
        return cls(
            sqrt_H=jnp.zeros((D0, D0), dtype),
            r0=jnp.zeros(D0, dtype),
            x0_knots=knots,
            x0_bias_g=jnp.zeros((Kb, 3), dtype),
            x0_bias_a=jnp.zeros((Kb, 3), dtype),
            x0_gravity=jnp.zeros(3, dtype).at[2].set(-s2.GRAVITY_NORM),
            active=jnp.zeros((), dtype),
        )


@struct.dataclass
class Factors:
    bearing: VisualFactors
    pixel: VisualFactors
    inertial: InertialFactors
    prior: PriorFactors
    # Optional factor families (None => absent, zero trace/compile cost).
    preint: Any = None    # PreintFactors
    marg: Any = None      # MargPrior
    smooth: Any = None    # SmoothFactors
    frames: Any = None    # FrameTable (shared visual spline queries)
    calib_prior: Any = None  # CalibPrior (anchor freed extrinsics)

    @classmethod
    def empty(cls, bearing_cap=0, pixel_cap=0, inertial_cap=0, prior_cap=0,
              preint_cap=0, dtype=jnp.float32):
        return cls(
            bearing=VisualFactors.empty(bearing_cap, 3, dtype),
            pixel=VisualFactors.empty(pixel_cap, 2, dtype),
            inertial=InertialFactors.empty(inertial_cap, dtype),
            prior=PriorFactors.empty(prior_cap, dtype),
            preint=(PreintFactors.empty(preint_cap, dtype)
                    if preint_cap else None),
        )


@struct.dataclass
class Masks:
    """Freeze masks (1 = free, 0 = frozen/constant).

    The reference freezes knots at/below the window lower bound instead of
    marginalizing (``ceres/optimizer.cpp:322-328``) and marks inactive
    landmark slots; same semantics here, imposed on the normal equations.

    The calibration masks implement the reference's per-sensor-parameter
    constancy flags (``ceres/manifolds/sensors/*`` ``setConstant`` setters):
    ``None`` (the default) means fully frozen — the reference's default
    operating mode — so existing constructors keep their behavior."""
    knots: jnp.ndarray      # (K,)
    landmarks: jnp.ndarray  # (L,)
    gravity: jnp.ndarray    # () scalar {0,1}
    bias: jnp.ndarray       # (Kb,) shared by gyro/accel knots
    cam_ext: Any = None     # (C,) camera extrinsics T_bs free?
    cam_intr: Any = None    # (C,) camera intrinsics free?
    cam_dist: Any = None    # (C,) camera distortion free?
    imu_ext: Any = None     # () IMU extrinsics free?
    # Per-part extrinsics constancy (() scalar {0,1}, on top of cam_ext /
    # imu_ext; None = free).  Used by the estimator's staged calibration
    # release: extrinsic ROTATION is strongly observable while extrinsic
    # TRANSLATION contains the near-degenerate baseline-scale direction —
    # freeing rotation first prevents the joint first step from dumping the
    # rotation misfit into a baseline-scale plunge (see
    # WindowConfig.calib_warmup).
    cam_ext_rot: Any = None
    cam_ext_trans: Any = None
    # Per-part knot constancy (the reference's SE3 product-manifold
    # rotation/translation constancy flags, backend.cpp:52-55 +
    # ceres/manifolds/variables/se3.cpp:19-24): () scalar {0,1} applied to
    # the rotation (cols 0-2) / translation (cols 3-5) of EVERY knot, on top
    # of the per-knot ``knots`` mask.  None = free (default).
    knots_rot: Any = None
    knots_trans: Any = None

    @classmethod
    def all_free(cls, K, L, Kb, dtype=jnp.float32, gravity_free=True,
                 C=0, cam_ext=False, cam_intr=False, cam_dist=False,
                 imu_ext=False):
        def cmask(flag):
            # None => the calibration columns are not even traced (static);
            # an array => columns exist and the mask freezes/frees per camera.
            if not flag:
                return None
            return jnp.full((C,), 1.0, dtype)
        return cls(
            knots=jnp.ones(K, dtype),
            landmarks=jnp.ones(L, dtype),
            gravity=jnp.asarray(1.0 if gravity_free else 0.0, dtype),
            bias=jnp.ones(Kb, dtype),
            cam_ext=cmask(cam_ext),
            cam_intr=cmask(cam_intr),
            cam_dist=cmask(cam_dist),
            imu_ext=jnp.asarray(1.0, dtype) if imu_ext else None,
        )


class SolverConfig(struct.PyTreeNode):
    """Static solve configuration (python-level; not traced)."""
    max_iterations: int = struct.field(pytree_node=False, default=5)
    order: int = struct.field(pytree_node=False, default=4)
    bias_order: int = struct.field(pytree_node=False, default=4)
    # measurement information (1/sigma): residuals are premultiplied
    bearing_sqrt_info: float = struct.field(pytree_node=False, default=1.0)
    pixel_sqrt_info: float = struct.field(pytree_node=False, default=1.0)
    gyro_sqrt_info: float = struct.field(pytree_node=False, default=1.0)
    accel_sqrt_info: float = struct.field(pytree_node=False, default=1.0)
    prior_sqrt_info: float = struct.field(pytree_node=False, default=1.0)
    # robust losses (reference parameters, see factors/losses.py)
    bearing_huber: float = struct.field(pytree_node=False, default=1.6e-3)
    pixel_huber: float = struct.field(pytree_node=False, default=0.5)
    inertial_scale: float = struct.field(pytree_node=False, default=1.6e-5)
    # Factor-Jacobian autodiff mode.  Default: reverse mode (jacrev) — the
    # bearing/pixel/inertial residuals have 2-6 outputs vs 24-50 inputs, so
    # pullbacks are cheaper than pushforwards (measured, PROFILE.md).
    # ``use_jacfwd=True`` switches to forward mode: required inside the
    # time-sharded solver (parallel/time_ba.py), where XLA:CPU (jax 0.9.0)
    # MISCOMPILES jacrev of the spline chain when the knots were assembled
    # by concatenate inside a shard_map body (wrong Jacobian, correct
    # primal; minimal repro in tools/diag_time_ba.py history — neither
    # stop_gradient nor optimization_barrier suppresses it, jacfwd does).
    use_jacfwd: bool = struct.field(pytree_node=False, default=False)
    # Schur landmark elimination via the strict-f32 Pallas kernel
    # (ops/schur.py) instead of XLA's default-precision einsum.  Off by
    # default: the einsum (bf16-input MXU, f32 accumulate) measured ~150x
    # faster at the bench envelope with ~1e-3 relative deviation that the
    # damped, refinement-corrected solve absorbs — see ops/schur.py.
    schur_pallas: bool = struct.field(pytree_node=False, default=False)
    # LM damping
    init_lambda: float = struct.field(pytree_node=False, default=1e-4)
    lambda_up: float = struct.field(pytree_node=False, default=10.0)
    lambda_down: float = struct.field(pytree_node=False, default=0.5)
    landmark_jitter: float = struct.field(pytree_node=False, default=1e-6)
    # Constant-velocity smoothness prior (SmoothFactors): 1/sigma per knot
    # second difference, rotation [rad] / translation [m] parts.
    smooth_sqrt_info_rot: float = struct.field(pytree_node=False,
                                               default=1.0 / 0.15)
    smooth_sqrt_info_trans: float = struct.field(pytree_node=False,
                                                 default=1.0 / 0.15)
    # IMU bias evolution priors (rows added whenever bias columns are free;
    # 0 disables).  Random walk between consecutive bias knots
    # (1/sigma per knot step) + a weak absolute anchor per knot: without
    # them the accel-bias spline is 3 free DoF per knot that absorbs
    # gravity misalignment and extrapolates unboundedly (measured: |b_a|
    # reached 1e7 m/s^2 and the stereo-inertial EuRoC runs exploded).
    # Standard VIO treatment (e.g. Forster-style bias random walk); the
    # reference's released bias handling is CHECK(false)
    # (ceres/optimizer.cpp:384-386) so the paper formulation governs.
    bias_rw_sqrt_info_g: float = struct.field(pytree_node=False,
                                              default=1.0 / 1e-3)
    bias_rw_sqrt_info_a: float = struct.field(pytree_node=False,
                                              default=1.0 / 2e-2)
    bias_abs_sqrt_info_g: float = struct.field(pytree_node=False,
                                               default=1.0 / 0.05)
    bias_abs_sqrt_info_a: float = struct.field(pytree_node=False,
                                               default=1.0 / 0.5)
    # Whether THIS linearize/cost call contributes the bias-prior rows.
    # The sharded solvers (parallel/{dist,time,condensed}_ba.py) set False
    # inside the shard body and add the rows ONCE outside the psum via
    # ba.dense_prior_reduce — otherwise every shard with a nonzero
    # inertial/preint capacity adds them and the psum counts them
    # n_devices times (found round 5: H bias blocks exactly 8x on the
    # 8-device mesh, biasing sharded solves toward the bias prior).
    include_bias_prior: bool = struct.field(pytree_node=False, default=True)


class Layout(NamedTuple):
    """Column offsets of the reduced tangent-space system.

    Calibration groups are only materialized (offset >= 0) when the
    corresponding ``Masks`` field is present; otherwise their columns do not
    exist and the linearizers skip the extra autodiff tangents entirely."""
    D: int
    bg: int          # gyro bias knots (Kb * 3)
    ba: int          # accel bias knots (Kb * 3)
    grav: int        # gravity tangent (2)
    cext: int = -1   # camera extrinsics (C * 6)
    cintr: int = -1  # camera intrinsics (C * 4)
    cdist: int = -1  # camera distortion (C * 4)
    iext: int = -1   # IMU extrinsics (6)
    C: int = 0


def make_layout(K: int, Kb: int, C: int = 0, masks: "Masks" = None) -> Layout:
    """Build the reduced-system layout; calib groups appear iff their mask
    is present (not None) in ``masks``."""
    bg = K * 6
    ba = bg + Kb * 3
    grav = ba + Kb * 3
    off = grav + 2
    cext = cintr = cdist = iext = -1
    if masks is not None:
        if masks.cam_ext is not None:
            cext = off
            off += 6 * C
        if masks.cam_intr is not None:
            cintr = off
            off += 4 * C
        if masks.cam_dist is not None:
            cdist = off
            off += 4 * C
        if masks.imu_ext is not None:
            iext = off
            off += 6
    return Layout(D=off, bg=bg, ba=ba, grav=grav, cext=cext, cintr=cintr,
                  cdist=cdist, iext=iext, C=C)


def layout_dims(K: int, Kb: int):
    """Legacy helper: offsets of the calib-frozen layout as a 4-tuple
    (D, off_bias_g, off_bias_a, off_gravity)."""
    lay = make_layout(K, Kb)
    return lay.D, lay.bg, lay.ba, lay.grav
