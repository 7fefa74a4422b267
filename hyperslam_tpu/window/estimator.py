"""Sliding-window continuous-time estimator — host-side bookkeeping around the
device-resident batched solver.

TPU-native equivalent of the reference's ``AbstractOptimizer`` + ``Backend``
pair (``/root/reference/internal/hyper/optimizers/abstract.cpp``,
``components/backend.cpp``; SURVEY.md §2.1, §3.2, §5.7):

- **bootstrap**: on the first measurement, create identity-valued knots
  covering the initial stamp (reference ``abstract.cpp:76-96``).
- **window advance**: when a measurement stamp exceeds the spline range,
  run ``optimize()``, extrapolate new knots by repeating the last knot value
  (reference ``abstract.cpp:119-144``), slide the window, freeze knots at or
  below the window lower bound and drop landmarks that left the window
  (reference ``ceres/optimizer.cpp:286-382``).
- **visual processing**: pixels -> bearings, triangulate new tracks (midpoint)
  and add two bearing observations per stereo track point (reference
  ``abstract.cpp:186-264``).
- **inertial processing**: each IMU sample becomes one direct residual
  (reference ``abstract.cpp:272-292``), with bias splines that the reference
  left unimplemented (``ceres/optimizer.cpp:384-386``) managed here.

TPU design decisions:
- Knot/landmark/factor arrays have **fixed capacity** with active masks, so
  the jitted solve compiles exactly once per configuration.
- **All host-side bookkeeping math is NumPy** (``variables/nplie.py``): on
  the axon TPU platform each eager JAX op is a slow remote compile, so the
  host path must never dispatch device ops.  The device is touched only by
  ``ba.optimize`` (one jitted call per solve).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..factors.preintegration import Preintegrator, PreintMeasurement
from ..solver import ba
from ..solver import marginalization as marg
from ..solver.problem import (CalibPrior, CameraCalib, Factors, FrameTable,
                              ImuCalib, InertialFactors, MargPrior, Masks,
                              Params, PreintFactors, PriorFactors,
                              SmoothFactors, SolverConfig, VisualFactors)
from ..state.bspline import _blending_matrix_np
from ..variables import nplie, s2


@dataclasses.dataclass
class WindowConfig:
    """Window geometry (reference defaults: separation 0.1 s, window 3.0 s,
    ``abstract.cpp:26-28``)."""
    knot_separation: float = 0.1
    max_window: float = 3.0
    order: int = 4
    # capacities (static shapes)
    max_knots: int = 40
    max_landmarks: int = 256
    max_bearing: int = 2048
    max_pixel: int = 0
    # Visual observation mode (reference declares both; its release uses
    # bearings and comments the pixel path out, abstract.cpp:225-241):
    # "bearing"  - pixels are undistorted to unit bearings on the host and
    #              enter as angular residuals (reference behavior);
    # "pixel"    - raw pixels enter as full projection-chain residuals
    #              (project+distort+denormalize), required when intrinsics/
    #              distortion are being calibrated online and natural for
    #              far-field rigs (KITTI).  Set max_pixel > 0.
    visual_mode: str = "bearing"
    max_inertial: int = 1024
    max_prior: int = 8
    # (stamp, camera) pairs sharing one spline query (solver FrameTable fast
    # path); window 3 s x 20 Hz x 2 cams = 120 at the reference envelope
    max_frames: int = 256
    bias_separation: float = 1.0
    max_bias_knots: int = 12
    bias_order: int = 4
    dtype: object = jnp.float32
    # Inertial frontend mode: "direct" = one residual per IMU sample
    # (reference direct.cpp); "preintegrated" = the reference's declared-but-
    # absent INTEGRATING variant (forward.hpp:9-13) — samples between
    # keyframes collapse into one 9-dim preintegrated factor
    # (factors/preintegration.py).
    inertial_mode: str = "direct"
    max_preint: int = 0
    sigma_gyro: float = 1.6968e-4   # noise densities (EuRoC defaults)
    sigma_accel: float = 2.0e-3
    # Online self-calibration (reference: per-sensor-parameter constancy
    # flags, ceres/optimizer.cpp:56-69 + manifolds/sensors/* — its default
    # configs keep calibration constant, as do these defaults).  NOTE:
    # freeing extrinsics adds gauge freedom; anchor with pose priors.
    calibrate_cam_extrinsics: bool = False
    calibrate_cam_intrinsics: bool = False
    calibrate_cam_distortion: bool = False
    calibrate_imu_extrinsics: bool = False
    # Extrinsics-anchor prior for freed calibration (solver CalibPrior):
    # without it a free stereo baseline co-scales with the world at
    # noise-level cost (measured 54% collapse).  Sigmas reflect how well the
    # initial (factory/Kalibr) calibration is trusted.
    calib_prior_sigma_rot: float = 0.01    # rad (~0.6 deg)
    calib_prior_sigma_trans: float = 0.006  # m
    # Staged calibration release.  In a short/young window a cam1 extrinsic
    # ROTATION error is indistinguishable from a baseline SCALE error
    # (delta_theta ~ (b/z) * delta_b/b: a 0.3 deg rotation mimics a ~38%
    # baseline change at z=8 m): the joint first step dumps the rotation
    # misfit into a 20+ mm baseline plunge, landmarks re-conform within the
    # same solve, and the solver is left in a self-consistent wrong-scale
    # valley it exits only at ~0.05 mm/solve (measured,
    # tools/diag_calib_e2e.py; the data DOES pin the baseline to <0.3 mm
    # when it never leaves the true basin — measured noperturb run).
    # Release order: (1) everything frozen until the window is temporally
    # full; (2) rotation parts freed (strongly observable, converges in
    # 1-2 solves); (3) translation parts freed ``calib_trans_delay`` solves
    # later, once no rotation misfit remains to mis-split.
    calib_warmup: bool = True
    calib_trans_delay: int = 3
    # Per-part knot constancy from the backend YAML (reference
    # rotation_constant / translation_constant, backend.cpp:52-55 +
    # ceres/manifolds/variables/se3.cpp:19-24).  The reference's
    # time_constant maps to nothing here: knot stamps live on a structural
    # uniform grid and are never optimizable (Stamped time constancy is
    # always true in the released reference configs as well).
    knot_rotation_constant: bool = False
    knot_translation_constant: bool = False
    # Fixed-lag marginalization (the reference has none — it freezes old
    # knots and discards evicted factors, SURVEY.md §2.2): when enabled,
    # factors leaving the window are Schur-eliminated into a MargPrior
    # instead of dropped (solver/marginalization.py).
    enable_marginalization: bool = False
    # Constant-velocity smoothness prior between consecutive knots
    # (solver SmoothFactors): regularizes knots with little measurement
    # support — without it the newest extrapolated knot is nearly
    # unobserved at sparse frame rates and Gauss-Newton diverges (the
    # reference has no such prior and relies on dense-enough data).
    # Sigmas live in SolverConfig (smooth_sqrt_info_rot/trans).
    enable_smoothness: bool = True
    # Knot extrapolation on window advance: "constant_position" repeats the
    # last knot (reference abstract.cpp:119-144).  "constant_velocity"
    # (k_n = k_{n-1} * (k_{n-2}^-1 k_{n-1})) is available but measured
    # UNSTABLE: the newest knot is the least-determined state, and doubling
    # its (noisy) step amplifies estimation noise into the seed (NaN
    # divergence on MH_03).
    extrapolation: str = "constant_position"
    # Warm-start each solve's LM damping at the previous solve's final
    # lambda (ba.optimize lam0).  Cold-starting at init_lambda rejected the
    # first 1-3 LM steps of EVERY online solve; under motion stress the
    # under-damped accepted remainder compounded into km-scale runaways
    # (measured on MH_03/V2_03 — warm start alone fixes the full-length
    # run and usually makes the FIRST iteration accept).
    warm_lambda: bool = True
    # Rolling-shutter stamp correction (the reference declares the hook and
    # comments it out: ``C.correctShutterStamps(stamp, PX)``,
    # abstract.cpp:217-219; the YAML carries ``shutter:`` per camera).
    # ``shutter_deltas[c]`` is camera c's line delay in seconds/row
    # (vertical readout): each observation's stamp becomes
    # ``t_frame + delta * row`` — free in a continuous-time spline model,
    # no extra states.  None or all-zero = global shutter.
    # ``shutter_bands`` > 0 quantizes the row offsets into that many bands
    # per image so observations within a band share a stamp and the
    # frame-shared linearization fast path survives (bands x cams spline
    # queries per frame instead of one); 0 = exact per-observation stamps
    # (each observation becomes its own "frame"; staging falls back to
    # per-factor spline queries).  ``shutter_rows[c]`` (image height) is
    # required when bands > 0 to place the band centers.
    shutter_deltas: Optional[tuple] = None
    shutter_bands: int = 8
    shutter_rows: Optional[tuple] = None


@dataclasses.dataclass
class TrackRecord:
    slot: int
    last_stamp: float
    first_stamp: float


# Jitted single linearization pass (no LM loop) for the marginalization step;
# compiles once per factor-capacity configuration (same shapes as the solve).
import functools as _functools
import jax as _jax


@_functools.partial(_jax.jit, static_argnames=("cfg",))
def _linearize_jit(params, cams, imu, factors, masks, cfg, dt, bias_dt):
    return ba.linearize(params, cams, imu, factors, masks, cfg, dt, bias_dt)


class SlidingWindowEstimator:
    """Online continuous-time sliding-window estimator.

    Usage: feed time-ordered measurements via ``add_visual_tracks`` /
    ``add_imu`` / ``add_pose_prior``; call ``export_trajectory`` at the end
    (reference SIGUSR1 path, ``apps/hyperslam/main.cpp:52-85``).
    """

    def __init__(self, window: WindowConfig, cams: CameraCalib,
                 imu: Optional[ImuCalib] = None,
                 solver: Optional[SolverConfig] = None):
        self.w = window
        # Calibration is cast to the WORKING dtype: a single f64 leaf (e.g.
        # f64 calib passed into an f32 window) silently promotes the whole
        # jitted solve to f64 — emulated and ~12x slower on TPU (measured
        # 459 -> 38 ms per solve).
        import jax as _j
        self.cams = _j.tree.map(
            lambda x: np.asarray(x, window.dtype), cams)
        imu = imu if imu is not None else ImuCalib.default(window.dtype)
        self.imu = _j.tree.map(lambda x: np.asarray(x, window.dtype), imu)
        self.solver = solver or SolverConfig(
            order=window.order, bias_order=window.bias_order)
        self.dtype = window.dtype
        # numpy copies of calibration for the host path
        self.cams_np = {
            "T_bs": np.asarray(cams.T_bs, np.float64),
            "intr": np.asarray(cams.intrinsics, np.float64),
            "dist": np.asarray(cams.distortion, np.float64),
        }

        self.root_stamp: Optional[float] = None  # stamp normalization origin
        self.t0: float = 0.0          # stamp of knot slot 0
        self.bias_t0: float = 0.0
        self.bootstrapped = False

        K, L, Kb = window.max_knots, window.max_landmarks, window.max_bias_knots
        # host-side (numpy) state; shipped to the device per solve
        self.knots = np.tile(
            np.array([1.0, 0, 0, 0, 0, 0, 0]), (K, 1))
        self.landmarks = np.zeros((L, 3))
        self.gravity = np.asarray(s2.default_gravity(jnp.float32), np.float64)
        self.bias_g = np.zeros((Kb, 3))
        self.bias_a = np.zeros((Kb, 3))
        self.num_knots = 0           # knots filled so far (<= K)

        # Host-side factor staging.
        self._bearing: List[tuple] = []   # (t, cam, slot, bearing3)
        self._pixel: List[tuple] = []     # (t, cam, slot, pixel2)
        self._inertial: List[tuple] = []  # (t, meas6)
        self._prior: List[tuple] = []     # (t, T7)
        self._preint_meas: List[PreintMeasurement] = []
        self._pre: Optional[Preintegrator] = None
        self._gravity_seeded = False
        # R_bs of the IMU for rotating raw samples into the body frame in
        # preintegrated mode (assumes neutral IMU intrinsics, like every
        # standard preintegration pipeline; direct mode keeps the full model).
        self._imu_R_bs = np.asarray(
            nplie.quat_to_matrix(np.asarray(self.imu.T_bs[:4], np.float64)))
        self.tracks: Dict[int, TrackRecord] = {}
        self._free_slots = list(range(L - 1, -1, -1))
        self._lm_active = np.zeros(L, np.float32)
        # async-overlap bookkeeping: slides and slot reuse between an async
        # dispatch and its merge are accounted for at merge time (_pull)
        self._slide_count = 0
        self._slot_gen = np.zeros(L, np.int64)

        # Anchor for freed calibration groups: the construction-time
        # (YAML/factory) calibration, with configured trust sigmas.
        self._calib_anchor = {
            "cam_T_bs": np.asarray(cams.T_bs, np.float64).copy(),
            "imu_T_bs": np.asarray(self.imu.T_bs, np.float64).copy(),
        }

        # archive of (stamp, knot value) for frozen/expired spline segments
        self._knot_archive: List[tuple] = []
        self._solve_count = 0
        # staged calibration release (see _build_masks): solve count at
        # which the rotation parts were first freed, None until then
        self._calib_rot_freed_at = None
        # LM damping warm-start: previous solve's final lambda (see
        # ba.optimize lam0)
        self._lam_warm = None
        self._last_stats = None
        # Asynchronous solve pipeline (the reference's frontend-thread /
        # backend-thread overlap, backend.cpp:124-158): when enabled, the
        # per-advance solve is dispatched without blocking and the host
        # continues staging/KLT; results are pulled lazily at the next
        # point that needs the solved state (next solve, slide, export,
        # checkpoint).  Off by default — direct estimator users (and
        # deterministic tests) get the synchronous semantics; System.run
        # turns it on.
        self.async_solves = False
        self._pending = None

        # Fixed-lag marginal prior (host f64 quadratic; see
        # solver/marginalization.py).  None when disabled.
        self._marg_prior = (
            marg.HostPrior.empty(K, Kb)
            if window.enable_marginalization else None)
        # True once the prior has ever carried real information (diagnostic:
        # vision-only scenarios with long-lived tracks may legitimately have
        # nothing to retain — each slide's departing information is absorbed
        # exactly by the eliminated knot/landmark block).
        self._marg_ever_active = False
        # capacity-overflow counters (reference warns on queue growth,
        # klt.cpp:181; we count every silent clamp instead of truncating
        # silently)
        self.overflow_counts: Dict[str, int] = {}

    # ------------------------------------------------------------------ #
    # bootstrap & window geometry
    # ------------------------------------------------------------------ #

    def _bootstrap(self, stamp: float,
                   initial_pose: Optional[np.ndarray] = None):
        """First-measurement state creation (reference abstract.cpp:76-96)."""
        self.root_stamp = stamp
        self.t0 = 0.0
        self.bias_t0 = 0.0
        init = (np.asarray(initial_pose, np.float64)
                if initial_pose is not None
                else np.array([1.0, 0, 0, 0, 0, 0, 0]))
        # enough knots that t=0 is inside [t0, t0 + (n-k+1) dt)
        n0 = self.w.order
        self.knots[:n0] = init
        self.num_knots = n0
        self.bootstrapped = True

    def _local(self, stamp: float) -> float:
        return stamp - self.root_stamp

    def _range(self):
        """Valid query range of the currently-filled knots (reference
        ``AbstractState::range()``)."""
        lo = self.t0
        hi = self.t0 + (self.num_knots - self.w.order + 1) \
            * self.w.knot_separation
        return lo, hi

    def _window_full(self) -> bool:
        """True once the live spline spans the configured window length —
        the calibration warm-up criterion (enough parallax/geometry that
        extrinsic rotation and baseline scale are separable)."""
        span = (self.num_knots - self.w.order + 1) * self.w.knot_separation
        return span >= self.w.max_window - 1e-9

    def _extrapolate_knot(self) -> np.ndarray:
        """Constant-VELOCITY extrapolation of the next knot:
        k_n = k_{n-1} * (k_{n-2}^-1 * k_{n-1}).

        The reference repeats the last knot value (constant position,
        abstract.cpp:119-144).  At speed v the new knot then starts
        v * separation behind truth (0.2-0.4 m at EuRoC MH speeds) and the
        LM solve must close that gap from a cold start every advance —
        measured on MH_03: under-corrected extrapolations compound into a
        runaway once the per-solve correction stops converging.  The
        constant-velocity seed starts acceleration-level close instead."""
        k1 = self.knots[self.num_knots - 1]
        if self.w.extrapolation != "constant_velocity" \
                or self.num_knots < 2:
            return k1.copy()
        k2 = self.knots[self.num_knots - 2]
        step = nplie.se3_compose(nplie.se3_inverse(k2), k1)
        return nplie.se3_compose(k1, step)

    def _extend_to(self, t: float):
        """Advance the window so t is inside the valid range: optimize the
        current window first (the reference optimizes on every window
        advance, abstract.cpp:119-144), then extrapolate new knots
        (constant velocity), sliding the ring when capacity is hit."""
        lo, hi = self._range()
        if t < hi:
            return
        if self._bearing or self._pixel or self._prior or self._inertial \
                or self._preint_meas:
            self.optimize(async_dispatch=self.async_solves)
        while True:
            lo, hi = self._range()
            if t < hi:
                return
            if self.num_knots < self.w.max_knots:
                self.knots[self.num_knots] = self._extrapolate_knot()
                self.num_knots += 1
            else:
                # MARGINALIZING slides must see the solved estimate (the
                # prior is linearized at it) — the async overlap window
                # ends here.  Plain (freeze-and-drop) slides are
                # stale-safe: the slid-out knot is frozen in the in-flight
                # solve (its value cannot change), and _pull merges with a
                # slide-shift — so the solve keeps overlapping host work.
                if self._marg_prior is not None:
                    self._sync_pending()
                self._slide()

    def _slide(self):
        """Drop the oldest knot (already optimized by ``_extend_to``)."""
        if self._marg_prior is not None:
            self._marginalize_slot0()
        self._knot_archive.append((self.t0, self.knots[0].copy()))
        self.knots[:-1] = self.knots[1:]
        self.num_knots -= 1
        self.t0 += self.w.knot_separation
        self._slide_count += 1
        self._evict_stale()

    def _marginalize_slot0(self):
        """Fold the information of the departing state into the marginal
        prior (see solver/marginalization.py): linearize the factors about
        to be evicted at the current (just-optimized) estimate, combine with
        the existing prior, Schur-eliminate the departing knot and any
        landmarks whose observations all leave, and store the result in the
        post-slide indexing."""
        w = self.w
        lo_new = self.t0 + w.knot_separation
        prior = self._marg_prior
        K, Kb = w.max_knots, w.max_bias_knots
        D0 = prior.H.shape[0]

        dying_b = [b for b in self._bearing if b[0] < lo_new]
        dying_px = [b for b in self._pixel if b[0] < lo_new]
        dying_i = [b for b in self._inertial if b[0] < lo_new]
        dying_p = [b for b in self._prior if b[0] < lo_new]
        dying_q = [m for m in self._preint_meas if m.t_i < lo_new]
        # debug toggles (diagnostics only; default = full behavior)
        if not getattr(self, "_dbg_fold_visual", True):
            dying_b = []
        if not getattr(self, "_dbg_fold_inertial", True):
            dying_i = []
        if not getattr(self, "_dbg_fold_prior", True):
            dying_p = []
        _fold_smooth = getattr(self, "_dbg_fold_smooth", True)
        surviving = {b[2] for b in self._bearing if b[0] >= lo_new} \
            | {b[2] for b in self._pixel if b[0] >= lo_new}
        dying_slots = sorted(({b[2] for b in dying_b}
                              | {b[2] for b in dying_px}) - surviving)
        # Visual rows usable for marginalization: only those on landmarks
        # that die with them.  Rows on surviving landmarks are dropped (as
        # the reference drops them) — folding them in while their landmark
        # stays active would double-count or over-constrain.
        dset = set(dying_slots)
        dying_b = [b for b in dying_b if b[2] in dset]
        dying_px = [b for b in dying_px if b[2] in dset]

        nl = len(dying_slots)
        Dtot = D0 + 3 * nl
        H_tot = np.zeros((Dtot, Dtot))
        g_tot = np.zeros(Dtot)

        # The smoothness triple anchored at the departing knot (i = 0) dies
        # with it; folding it in gives the prior cross-information on the
        # surviving knots 1..2 even in vision-only runs.
        has_dying = (bool(dying_b) or bool(dying_px) or bool(dying_i)
                     or bool(dying_p) or bool(dying_q)
                     or (_fold_smooth and self.w.enable_smoothness
                         and self.num_knots >= 3))
        if has_dying:
            factors = self._build_factors(
                bearing=dying_b, pixel=dying_px, inertial=dying_i,
                prior=dying_p, preint=dying_q, attach_marg=False,
                smooth_idx=[0] if _fold_smooth else [],
                attach_calib_prior=False)
            masks = self._build_masks(for_marginalization=True)
            sys = _linearize_jit(
                self._params(), self.cams, self.imu, factors, masks,
                self.solver, np.asarray(w.knot_separation, self.dtype),
                np.asarray(w.bias_separation, self.dtype))
            # NOTE: columns beyond D0 (self-calibration parameters, when a
            # calibrate_* flag frees them) are truncated: the prior treats
            # calibration as fixed, dropping evicted factors' calib
            # cross-information.  This is the standard fixed-lag
            # approximation (calibration is quasi-static; its information
            # accumulates through the live window instead).
            J = np.asarray(sys.J, np.float64)[:, :D0]
            r = np.asarray(sys.r, np.float64)
            Jl = np.asarray(sys.J_lm, np.float64)
            li = np.asarray(sys.lm_idx)
            visual = np.abs(Jl).sum(axis=1) > 0
            A = np.zeros((J.shape[0], Dtot))
            A[:, :D0] = J
            for i, slot in enumerate(dying_slots):
                rows = visual & (li == slot)
                A[rows, D0 + 3 * i:D0 + 3 * i + 3] = Jl[rows]
            # Safety: any visual row whose landmark survives is excluded.
            bad = visual & ~np.isin(li, dying_slots)
            A[bad] = 0.0
            r = np.where(bad, 0.0, r)
            H_tot = A.T @ A
            g_tot = A.T @ r

        if prior.active:
            # Recenter the old prior's gradient at the current estimate
            # (first-estimate Jacobians: H unchanged).
            dx = marg.local_diff_np(self.knots, self.bias_g, self.bias_a,
                                    self.gravity, prior)
            H_tot[:D0, :D0] += prior.H
            g_tot[:D0] += prior.g + prior.H @ dx
        elif not has_dying:
            return  # nothing to marginalize yet

        m_idx = np.concatenate([np.arange(6),
                                D0 + np.arange(3 * nl)]).astype(np.int64)
        H_s, g_s = marg.marginalize_columns(H_tot, g_tot, m_idx)
        prior.H, prior.g = marg.shift_knot_block(H_s, g_s, K)
        # Linearization point in the post-slide indexing.
        prior.x0_knots[:-1] = self.knots[1:]
        prior.x0_knots[-1] = self.knots[-1]
        prior.x0_bias_g[:] = self.bias_g
        prior.x0_bias_a[:] = self.bias_a
        prior.x0_gravity[:] = self.gravity
        # Threshold, don't np.any: a bundle whose rank the eliminated block
        # fully absorbs leaves ~1e-16 Schur residue, which must not count as
        # information (it would disable knot freezing and unanchor the gauge).
        if np.abs(prior.H).max() > marg.ACTIVE_TOL:
            prior.active = True
            self._marg_ever_active = True
        else:
            prior.H[:] = 0.0
            prior.g[:] = 0.0
            prior.active = False

    def _evict_stale(self):
        """Drop factors/landmarks that fell out of the window (reference
        ``updateLandmarks``, ceres/optimizer.cpp:347-382)."""
        lo = self.t0
        self._bearing = [b for b in self._bearing if b[0] >= lo]
        self._pixel = [b for b in self._pixel if b[0] >= lo]
        self._inertial = [b for b in self._inertial if b[0] >= lo]
        self._prior = [b for b in self._prior if b[0] >= lo]
        self._preint_meas = [m for m in self._preint_meas if m.t_i >= lo]
        observed = {b[2] for b in self._bearing} \
            | {b[2] for b in self._pixel}
        dead = [tid for tid, tr in self.tracks.items()
                if tr.slot not in observed]
        for tid in dead:
            slot = self.tracks.pop(tid).slot
            self._lm_active[slot] = 0.0
            self._slot_gen[slot] += 1   # reuse guard for async merges
            self._free_slots.append(slot)

    def _pose_at(self, t: float) -> np.ndarray:
        return nplie.eval_se3(self.knots, t, self.t0,
                              self.w.knot_separation, self.w.order,
                              n_valid=self.num_knots)

    # ------------------------------------------------------------------ #
    # measurement ingestion
    # ------------------------------------------------------------------ #

    def add_pose_prior(self, stamp: float, T_ws: np.ndarray):
        if not self.bootstrapped:
            self._bootstrap(stamp, T_ws)
        t = self._local(stamp)
        self._extend_to(t)
        self._prior.append((t, np.asarray(T_ws, np.float64)))

    def add_imu(self, stamp: float, gyro: np.ndarray, accel: np.ndarray):
        """One IMU sample -> one direct inertial factor
        (reference direct.cpp:13-38), or an increment of the current
        preintegration interval in ``inertial_mode="preintegrated"``."""
        if not self.bootstrapped:
            self._bootstrap(stamp)
        t = self._local(stamp)
        if t < self.t0:
            return  # out-of-scope message: drop (reference abstract.cpp:115)
        if not self._gravity_seeded:
            # Initialize the gravity direction from the first specific-force
            # sample: at (near) rest, a_meas = -R_bw g, so
            # g_w ~ -R_wb(t) a_meas scaled to the fixed norm.  R_wb comes
            # from the current estimate — identity right after an identity
            # bootstrap, the prior pose when the estimator was bootstrapped
            # from a pose prior (EuRoC ground truth starts at an arbitrary
            # attitude; assuming identity seeded gravity up to 180 deg
            # wrong and the full-weight accel factors exploded the first
            # solves — measured).  (The reference hard-codes -norm*e0,
            # environment/abstract.cpp:64.)
            a = np.asarray(accel, np.float64)
            norm = np.linalg.norm(a)
            if norm > 1.0:
                R_wb = nplie.quat_to_matrix(self._pose_at(t)[:4])
                self.gravity = -(R_wb @ (a / norm)) * s2.GRAVITY_NORM
                self._gravity_seeded = True
        self._extend_to(t)
        if self.w.inertial_mode == "preintegrated":
            gyro_b = self._imu_R_bs @ np.asarray(gyro, np.float64)
            accel_b = self._imu_R_bs @ np.asarray(accel, np.float64)
            if self._pre is None:
                self._pre = Preintegrator(
                    self.w.sigma_gyro, self.w.sigma_accel,
                    bg0=self._bias_at(t, self.bias_g),
                    ba0=self._bias_at(t, self.bias_a))
                self._pre.reset(t, self._pre.bg0, self._pre.ba0)
            self._pre.add(t, gyro_b, accel_b)
        else:
            self._inertial.append(
                (t, np.concatenate([np.asarray(gyro), np.asarray(accel)])))

    def _bias_at(self, t: float, bias_knots: np.ndarray) -> np.ndarray:
        """Host-side bias-spline evaluation (numpy; mirrors
        ``bspline.eval_euclidean``)."""
        k = self.w.bias_order
        dtb = self.w.bias_separation
        nb = bias_knots.shape[0]
        x = (t - self.bias_t0) / dtb
        s = int(np.clip(np.floor(x), 0, nb - k))
        u = x - s
        M = _blending_matrix_np(k)
        b = np.power(u, np.arange(k)) @ M.T
        return b @ bias_knots[s:s + k]

    def _close_preint_interval(self, t: float):
        """Close the running preintegration interval at keyframe stamp t and
        emit one preintegrated factor (INTEGRATING frontend)."""
        if self._pre is None or self._pre.n == 0:
            return
        if t <= self._pre.t_i:
            return
        self._ensure_bias_knots(t)
        meas = self._pre.finish(t)
        if meas.t_i >= self.t0:
            if len(self._preint_meas) < 4 * self.w.max_preint:
                self._preint_meas.append(meas)
            else:
                self._overflow("preint_staging", 1)
        self._pre.reset(t, self._bias_at(t, self.bias_g),
                        self._bias_at(t, self.bias_a))

    def add_visual_tracks(self, stamp: float, cam_indices, track_ids,
                          pixels) -> None:
        """Tracked features for one (stereo) frame.

        cam_indices: (M,) camera index per observation; track_ids: (M,)
        global track ids; pixels: (M, 2).  Mirrors the reference's
        ``process(VisualTracks)`` (abstract.cpp:186-264)."""
        if not self.bootstrapped:
            self._bootstrap(stamp)
        t = self._local(stamp)
        if t < self.t0:
            return

        cam_indices = np.asarray(cam_indices)
        track_ids = np.asarray(track_ids)
        pixels = np.asarray(pixels, np.float64)

        # Rolling-shutter stamp correction (abstract.cpp:217-219 analogue):
        # per-observation readout offsets from the measured row.
        t_off = self._shutter_offsets(cam_indices, pixels)
        self._extend_to(t + (float(t_off.max()) if t_off is not None else 0.0))
        if self.w.inertial_mode == "preintegrated":
            self._close_preint_interval(t)

        # pixels -> unit bearings (numpy, per camera)
        bearings = np.zeros((len(track_ids), 3))
        for c in np.unique(cam_indices):
            m = cam_indices == c
            bearings[m] = nplie.pixel_to_bearing(
                pixels[m], self.cams_np["intr"][int(c)],
                self.cams_np["dist"][int(c)])

        # split into known and new tracks
        new_obs: Dict[int, list] = {}
        for i, tid in enumerate(track_ids):
            tr = self.tracks.get(tid)
            if tr is not None:
                tr.last_stamp = t
            else:
                new_obs.setdefault(int(tid), []).append(i)

        if new_obs:
            T_wb = self._pose_at(t)
            T_w_c0 = nplie.se3_compose(T_wb, self.cams_np["T_bs"][0])
            T_w_c1 = nplie.se3_compose(T_wb, self.cams_np["T_bs"][1]) \
                if len(self.cams_np["T_bs"]) > 1 else None
            remaining = len(new_obs)
            for tid, idxs in new_obs.items():
                if not self._free_slots:
                    # capacity: skip the remaining new tracks (masked design)
                    self._overflow("landmark_slots", remaining)
                    break
                remaining -= 1
                cams_of = cam_indices[idxs]
                if len(idxs) >= 2 and T_w_c1 is not None:
                    i0 = idxs[int(np.argmin(cams_of))]
                    i1 = idxs[int(np.argmax(cams_of))]
                    T_01 = nplie.se3_compose(
                        nplie.se3_inverse(T_w_c0), T_w_c1)
                    p0 = nplie.triangulate_midpoint(
                        T_01, bearings[i0], bearings[i1])
                    depth = p0[2]
                    if not np.isfinite(depth) or not (0.05 < depth < 200.0):
                        continue
                    p_w = nplie.se3_act(T_w_c0, p0)
                else:
                    # monocular init at nominal depth along the ray
                    c = int(cams_of[0])
                    T_wc = T_w_c0 if c == 0 else T_w_c1
                    p_w = nplie.se3_act(T_wc, bearings[idxs[0]] * 5.0)
                slot = self._free_slots.pop()
                self.tracks[tid] = TrackRecord(slot, t, t)
                self._lm_active[slot] = 1.0
                self.landmarks[slot] = p_w

        t_obs = np.full(len(track_ids), t) if t_off is None else t + t_off
        if self.w.visual_mode == "pixel":
            for i, (cidx, tid, px_i) in enumerate(
                    zip(cam_indices, track_ids, pixels)):
                tr = self.tracks.get(tid)
                if tr is None:
                    continue
                self._pixel.append((t_obs[i], int(cidx), tr.slot, px_i))
        else:
            for i, (cidx, tid, b) in enumerate(
                    zip(cam_indices, track_ids, bearings)):
                tr = self.tracks.get(tid)
                if tr is None:
                    continue
                self._bearing.append((t_obs[i], int(cidx), tr.slot, b))

    def _shutter_offsets(self, cam_indices: np.ndarray,
                         pixels: np.ndarray) -> Optional[np.ndarray]:
        """Per-observation readout-time offsets, or None for global shutter.

        Vertical rolling shutter: ``offset = delta_c * row`` (the frame
        stamp is row 0's exposure).  With ``shutter_bands`` > 0 rows are
        quantized to band centers so each band shares one stamp (keeps the
        frame-shared solver fast path at bands x cams frames per image)."""
        deltas = self.w.shutter_deltas
        if deltas is None or not any(deltas):
            return None
        off = np.zeros(len(cam_indices))
        for c in np.unique(cam_indices):
            d = float(deltas[int(c)]) if int(c) < len(deltas) else 0.0
            if d == 0.0:
                continue
            m = cam_indices == c
            rows = pixels[m, 1]
            if self.w.shutter_bands > 0:
                if not self.w.shutter_rows:
                    raise ValueError(
                        "shutter_bands > 0 requires shutter_rows (image "
                        "heights) to place band centers; set "
                        "WindowConfig.shutter_rows or shutter_bands=0")
                bw = float(self.w.shutter_rows[int(c)]) / self.w.shutter_bands
                rows = (np.floor(rows / bw) + 0.5) * bw
            off[m] = d * rows
        return off

    # ------------------------------------------------------------------ #
    # solve
    # ------------------------------------------------------------------ #

    def _ensure_bias_knots(self, t: float):
        """Lazily slide bias splines to cover t (the piece the reference
        left as CHECK(false), ceres/optimizer.cpp:384-386)."""
        dtb = self.w.bias_separation
        kb = self.w.bias_order
        nb = self.w.max_bias_knots
        if t >= self.bias_t0 + (nb - kb + 1) * dtb:
            # structural shift: the pending solve's bias rows would merge
            # into shifted slots — sync first
            self._sync_pending()
        while t >= self.bias_t0 + (nb - kb + 1) * dtb:
            self.bias_g[:-1] = self.bias_g[1:]
            self.bias_a[:-1] = self.bias_a[1:]
            self.bias_t0 += dtb
            if self._marg_prior is not None:
                marg.shift_bias_block(self._marg_prior, self.w.max_knots,
                                      self.w.max_bias_knots)

    def _overflow(self, kind: str, dropped: int):
        """Record a capacity clamp (the reference warns on queue growth,
        klt.cpp:181; silent truncation is never acceptable)."""
        if dropped <= 0:
            return
        first = kind not in self.overflow_counts
        self.overflow_counts[kind] = self.overflow_counts.get(kind, 0) + dropped
        if first:
            logging.getLogger(__name__).warning(
                "capacity overflow: dropped %d oldest '%s' factors (raise "
                "the corresponding WindowConfig.max_* capacity); further "
                "drops are counted in overflow_counts", dropped, kind)

    def _seg(self, ts: np.ndarray):
        dt = self.w.knot_separation
        s = np.clip(np.floor((ts - self.t0) / dt).astype(np.int32),
                    0, self.num_knots - self.w.order)
        u = (ts - self.t0) / dt - s
        return s, u

    def _build_factors(self, bearing=None, pixel=None, inertial=None,
                       prior=None, preint=None, attach_marg=True,
                       smooth_idx=None, attach_calib_prior=True) -> Factors:
        """Stage host factor lists into full-capacity device arrays (one
        transfer per array, no device compute).  The list arguments default
        to the live staged lists; the marginalization step passes the dying
        subsets instead."""
        w, dtype = self.w, self.dtype
        bearing_l = self._bearing if bearing is None else bearing
        pixel_l = self._pixel if pixel is None else pixel
        inertial_l = self._inertial if inertial is None else inertial
        prior_l = self._prior if prior is None else prior
        preint_l = self._preint_meas if preint is None else preint

        def thin(data, cap, kind):
            """Capacity clamp by TEMPORAL STRIDE, not drop-oldest: the oldest
            observations are the only constraints on otherwise-unanchored
            early knots, so dropping them unravels the window (measured:
            the CLI synthetic run diverged to km-scale exactly when the
            oldest block was dropped).  An even stride keeps coverage."""
            if len(data) <= cap:
                return data
            self._overflow(kind, len(data) - cap)
            idx = np.linspace(0, len(data) - 1, cap).round().astype(int)
            return [data[i] for i in idx]

        # Frame table: unique (stamp, camera) pairs of the (thinned) visual
        # factors share one spline query + Jacobian on device (solver
        # FrameTable fast path — ~10x fewer linearize ops than per-factor).
        frame_of: Dict[tuple, int] = {}
        frames_ok = True

        def visual(data, cap, meas_dim, kind):
            nonlocal frames_ok
            s = np.zeros(cap, np.int32)
            u = np.zeros(cap, np.float32)
            cam = np.zeros(cap, np.int32)
            lm = np.zeros(cap, np.int32)
            fr = np.zeros(cap, np.int32)
            meas = np.zeros((cap, meas_dim), np.float32)
            meas[:, -1] = 1.0
            act = np.zeros(cap, np.float32)
            data = thin(data, cap, kind)
            n = len(data)
            if n:
                d = data
                ts = np.asarray([x[0] for x in d])
                s[:n], u[:n] = self._seg(ts)
                cam[:n] = [x[1] for x in d]
                lm[:n] = [x[2] for x in d]
                meas[:n] = np.stack([x[3] for x in d])
                act[:n] = 1.0
                for i, x in enumerate(d):
                    key = (x[0], int(x[1]))
                    idx = frame_of.get(key)
                    if idx is None:
                        idx = len(frame_of)
                        if idx >= w.max_frames:
                            frames_ok = False
                            self._overflow("frames", 1)
                            idx = 0
                        else:
                            frame_of[key] = idx
                    fr[i] = idx
            return VisualFactors(
                s=np.asarray(s), u=np.asarray(u, dtype),
                cam=np.asarray(cam), lm=np.asarray(lm),
                meas=np.asarray(meas, dtype), active=np.asarray(act, dtype),
                frame=np.asarray(fr))

        bearing = visual(bearing_l, w.max_bearing, 3, "bearing")
        pixel = visual(pixel_l, w.max_pixel, 2, "pixel")

        frames = None
        if frames_ok:
            NF = w.max_frames
            f_s = np.zeros(NF, np.int32)
            f_u = np.zeros(NF, np.float32)
            f_cam = np.zeros(NF, np.int32)
            f_act = np.zeros(NF, np.float32)
            if frame_of:
                keys = sorted(frame_of.items(), key=lambda kv: kv[1])
                ts = np.asarray([k[0][0] for k in keys])
                ss, uu = self._seg(ts)
                nf = len(keys)
                f_s[:nf], f_u[:nf] = ss, uu
                f_cam[:nf] = [k[0][1] for k in keys]
                f_act[:nf] = 1.0
            frames = FrameTable(
                s=np.asarray(f_s), u=np.asarray(f_u, dtype),
                cam=np.asarray(f_cam), active=np.asarray(f_act, dtype))
        else:
            bearing = bearing.replace(frame=None)
            pixel = pixel.replace(frame=None)

        cap = w.max_inertial
        s = np.zeros(cap, np.int32)
        u = np.zeros(cap, np.float32)
        bs = np.zeros(cap, np.int32)
        bu = np.zeros(cap, np.float32)
        meas = np.zeros((cap, 6), np.float32)
        act = np.zeros(cap, np.float32)
        inertial_l = thin(inertial_l, cap, "inertial")
        n = len(inertial_l)
        if n:
            d = inertial_l
            ts = np.asarray([x[0] for x in d])
            self._ensure_bias_knots(float(ts.max()))
            s[:n], u[:n] = self._seg(ts)
            bs_f = np.floor((ts - self.bias_t0) / w.bias_separation)
            bs[:n] = np.clip(bs_f.astype(np.int32), 0,
                             w.max_bias_knots - w.bias_order)
            bu[:n] = (ts - self.bias_t0) / w.bias_separation - bs[:n]
            meas[:n] = np.stack([x[1] for x in d])
            act[:n] = 1.0
        inertial = InertialFactors(
            s=np.asarray(s), u=np.asarray(u, dtype), bias_s=np.asarray(bs),
            bias_u=np.asarray(bu, dtype), meas=np.asarray(meas, dtype),
            active=np.asarray(act, dtype))

        cap = w.max_prior
        s = np.zeros(cap, np.int32)
        u = np.zeros(cap, np.float32)
        meas = np.zeros((cap, 7), np.float32)
        meas[:, 0] = 1.0
        act = np.zeros(cap, np.float32)
        prior_l = thin(prior_l, cap, "prior")
        n = len(prior_l)
        if n:
            d = prior_l
            ts = np.asarray([x[0] for x in d])
            s[:n], u[:n] = self._seg(ts)
            meas[:n] = np.stack([x[1] for x in d])
            act[:n] = 1.0
        prior = PriorFactors(
            s=np.asarray(s), u=np.asarray(u, dtype),
            meas=np.asarray(meas, dtype), active=np.asarray(act, dtype))

        preint = None
        if w.max_preint > 0:
            cap = w.max_preint
            f64 = np.float64
            cols = {
                "s_i": np.zeros(cap, np.int32), "u_i": np.zeros(cap, f64),
                "s_j": np.zeros(cap, np.int32), "u_j": np.zeros(cap, f64),
                "bs": np.zeros(cap, np.int32), "bu": np.zeros(cap, f64),
                "dq": np.zeros((cap, 4), f64), "dv": np.zeros((cap, 3), f64),
                "dp": np.zeros((cap, 3), f64),
                "dtij": np.ones(cap, f64),
                "Jb": np.zeros((cap, 5, 3, 3), f64),
                "bg0": np.zeros((cap, 3), f64),
                "ba0": np.zeros((cap, 3), f64),
                "sqi": np.tile(np.eye(9), (cap, 1, 1)),
                "act": np.zeros(cap, np.float32),
            }
            cols["dq"][:, 0] = 1.0
            preint_l = thin(preint_l, cap, "preint")
            n = len(preint_l)
            if n:
                d = preint_l
                t_i = np.asarray([m.t_i for m in d])
                t_j = np.asarray([m.t_j for m in d])
                self._ensure_bias_knots(float(t_j.max()))
                cols["s_i"][:n], cols["u_i"][:n] = self._seg(t_i)
                cols["s_j"][:n], cols["u_j"][:n] = self._seg(t_j)
                bs_f = np.floor((t_i - self.bias_t0) / w.bias_separation)
                cols["bs"][:n] = np.clip(bs_f.astype(np.int32), 0,
                                         w.max_bias_knots - w.bias_order)
                cols["bu"][:n] = ((t_i - self.bias_t0) / w.bias_separation
                                  - cols["bs"][:n])
                cols["dq"][:n] = np.stack([m.dq for m in d])
                cols["dv"][:n] = np.stack([m.dv for m in d])
                cols["dp"][:n] = np.stack([m.dp for m in d])
                cols["dtij"][:n] = np.asarray([m.dt_ij for m in d])
                cols["Jb"][:n] = np.stack([m.J_bias for m in d])
                cols["bg0"][:n] = np.stack([m.bg0 for m in d])
                cols["ba0"][:n] = np.stack([m.ba0 for m in d])
                cols["sqi"][:n] = np.stack([m.sqrt_info for m in d])
                cols["act"][:n] = 1.0
            preint = PreintFactors(
                s_i=np.asarray(cols["s_i"]),
                u_i=np.asarray(cols["u_i"], dtype),
                s_j=np.asarray(cols["s_j"]),
                u_j=np.asarray(cols["u_j"], dtype),
                bias_s=np.asarray(cols["bs"]),
                bias_u=np.asarray(cols["bu"], dtype),
                dq=np.asarray(cols["dq"], dtype),
                dv=np.asarray(cols["dv"], dtype),
                dp=np.asarray(cols["dp"], dtype),
                dt_ij=np.asarray(cols["dtij"], dtype),
                J_bias=np.asarray(cols["Jb"], dtype),
                bg0=np.asarray(cols["bg0"], dtype),
                ba0=np.asarray(cols["ba0"], dtype),
                sqrt_info=np.asarray(cols["sqi"], dtype),
                active=np.asarray(cols["act"], dtype))

        smooth = None
        if self.w.enable_smoothness:
            # one constant-velocity row per knot triple; the marginalization
            # path passes the dying triple only (smooth_idx=[0])
            capk = self.w.max_knots
            idx = np.arange(capk, dtype=np.int32)
            acts = np.zeros(capk, np.float32)
            n_s = max(0, self.num_knots - 2)
            if smooth_idx is None:
                acts[:n_s] = 1.0
            else:
                for j in smooth_idx:
                    if 0 <= j < n_s:
                        acts[j] = 1.0
            idx = np.clip(idx, 0, max(0, self.num_knots - 3))
            smooth = SmoothFactors(i=np.asarray(idx),
                                   active=np.asarray(acts))

        marg_f = None
        if attach_marg and self._marg_prior is not None:
            hp = self._marg_prior
            if hp.active:
                sqrt_H, r0 = marg.sqrt_factor(hp.H, hp.g)
            else:
                D0 = hp.H.shape[0]
                sqrt_H, r0 = np.zeros((D0, D0)), np.zeros(D0)
            marg_f = MargPrior(
                sqrt_H=np.asarray(sqrt_H, dtype),
                r0=np.asarray(r0, dtype),
                x0_knots=np.asarray(hp.x0_knots, dtype),
                x0_bias_g=np.asarray(hp.x0_bias_g, dtype),
                x0_bias_a=np.asarray(hp.x0_bias_a, dtype),
                x0_gravity=np.asarray(hp.x0_gravity, dtype),
                active=np.asarray(1.0 if hp.active else 0.0, dtype))

        calib_prior = None
        if attach_calib_prior and (w.calibrate_cam_extrinsics
                                   or w.calibrate_imu_extrinsics):
            C = int(self.cams.T_bs.shape[0])
            cam_act = np.zeros(C, np.float32)
            if w.calibrate_cam_extrinsics:
                cam_act[1:] = 1.0  # cam0 is the body-frame gauge (frozen)
            calib_prior = CalibPrior(
                cam_T_bs0=np.asarray(self._calib_anchor["cam_T_bs"], dtype),
                cam_active=np.asarray(cam_act, dtype),
                imu_T_bs0=np.asarray(self._calib_anchor["imu_T_bs"], dtype),
                imu_active=np.asarray(
                    1.0 if w.calibrate_imu_extrinsics else 0.0, dtype),
                sqrt_rot=np.asarray(1.0 / w.calib_prior_sigma_rot, dtype),
                sqrt_trans=np.asarray(1.0 / w.calib_prior_sigma_trans,
                                       dtype))

        return Factors(bearing=bearing, pixel=pixel, inertial=inertial,
                       prior=prior, preint=preint, marg=marg_f,
                       smooth=smooth, frames=frames,
                       calib_prior=calib_prior)

    def _build_masks(self, for_marginalization: bool = False) -> Masks:
        w = self.w
        K = w.max_knots
        knots = np.zeros(K, np.float32)
        knots[:self.num_knots] = 1.0
        # Freeze knots below the window lower bound (reference
        # ceres/optimizer.cpp:322-328) — ALSO when marginalizing.  The
        # marginal prior retains the evicted factors' cross-information on
        # the remaining FREE state; it does not replace the freeze.  Leaving
        # old knots free "because the prior anchors them" was measured 3.5x
        # WORSE than freeze-only (diag r3): the prior is built from the
        # dying factor subset only, a strictly weaker anchor than
        # conditioning on the just-optimized values, so freed old knots
        # drift before being archived.  Freeze + prior is consistent
        # (conditioning) and measured strictly better than freeze + drop
        # (the reference's behavior).  When linearizing FOR marginalization
        # nothing is frozen (the departing knot's columns are exactly what
        # gets eliminated).
        n_window = int(np.ceil(w.max_window / w.knot_separation)) + w.order
        first_free = max(0, self.num_knots - n_window)
        # Gauge anchor: knot slot 0 is always frozen (unless the marginal
        # prior carries information on it).  The global left-multiplication
        # null space (6 DoF; scale is fixed by the stereo baseline) must be
        # pinned somewhere: the reference gets away with identity bootstrap
        # + Ceres LM damping, but once observations fall out of capacity the
        # unanchored early knots drift unboundedly (measured km-scale
        # divergence on the prior-less CLI run).
        n_frozen = max(first_free, min(1, self.num_knots))
        if not for_marginalization and n_frozen > 0:
            knots[:n_frozen] = 0.0
        has_imu = bool(self._inertial) or bool(self._preint_meas)
        C = int(self.cams.T_bs.shape[0])
        # Staged calibration release (see WindowConfig.calib_warmup): masks
        # stay ARRAYS (static layout, no recompile) but are zeroed until the
        # window is temporally full; extrinsic translation columns unfreeze
        # ``calib_trans_delay`` solves after rotation.
        if not w.calib_warmup:
            calib_on, trans_on = 1.0, 1.0
        elif self._window_full():
            if self._calib_rot_freed_at is None:
                self._calib_rot_freed_at = self._solve_count
            calib_on = 1.0
            trans_on = 1.0 if (self._solve_count - self._calib_rot_freed_at
                               >= w.calib_trans_delay) else 0.0
        else:
            calib_on, trans_on = 0.0, 0.0

        def cmask(flag, free_first=True):
            if not flag:
                return None
            m = np.full(C, calib_on, np.float32)
            if not free_first:
                # freeze camera 0 to pin the body frame (gauge)
                m[0] = 0.0
            return np.asarray(m)

        return Masks(
            knots=np.asarray(knots),
            landmarks=np.asarray(self._lm_active),
            gravity=np.asarray(1.0 if has_imu else 0.0, np.float32),
            bias=jnp.ones(w.max_bias_knots, np.float32) if has_imu
            else jnp.zeros(w.max_bias_knots, np.float32),
            # Extrinsics of cam0 stay frozen (it defines the body frame
            # gauge together with the pose spline); cam1..C-1 calibrate.
            cam_ext=cmask(w.calibrate_cam_extrinsics, free_first=False),
            cam_intr=cmask(w.calibrate_cam_intrinsics),
            cam_dist=cmask(w.calibrate_cam_distortion),
            imu_ext=(np.asarray(calib_on, np.float32)
                     if w.calibrate_imu_extrinsics else None),
            cam_ext_trans=(np.asarray(trans_on, np.float32)
                           if (w.calibrate_cam_extrinsics
                               or w.calibrate_imu_extrinsics) else None),
            knots_rot=(np.asarray(0.0, np.float32)
                       if w.knot_rotation_constant else None),
            knots_trans=(np.asarray(0.0, np.float32)
                         if w.knot_translation_constant else None),
        )

    def _params(self) -> Params:
        dtype = self.dtype
        return Params(
            knots=np.asarray(self.knots, dtype),
            landmarks=np.asarray(self.landmarks, dtype),
            gravity=np.asarray(self.gravity, dtype),
            bias_g=np.asarray(self.bias_g, dtype),
            bias_a=np.asarray(self.bias_a, dtype),
        )

    def optimize(self, async_dispatch: bool = False):
        """One windowed solve (reference Optimizer<CERES>::optimize) —
        a single jitted device call.

        With ``async_dispatch`` the call returns right after dispatch; the
        host keeps its (stale) state for staging/triangulation and the
        solved state is merged in at the next sync point
        (:meth:`_sync_pending`) — the reference's frontend/backend thread
        overlap (backend.cpp:124-158) without threads."""
        if not self.bootstrapped:
            return None
        self._sync_pending()
        factors = self._build_factors()
        masks = self._build_masks()
        # ONE batched host->device transfer for all staged arrays, ONE
        # packed device->host fetch for all results (ba.optimize_flat).
        # Per-array transfers each pay a full round trip on remote-attached
        # devices (~30-45 ms on the axon tunnel); the per-solve transfer
        # cost drops from ~1.1 s to ~40 ms (measured, tools/tunnel probe +
        # profile_estimator.py).
        params, factors, masks = _jax.device_put(
            (self._params(), factors, masks))
        lam0 = None if (self._lam_warm is None
                        or not self.w.warm_lambda) else np.asarray(
            self._lam_warm, self.dtype)
        flat = ba.optimize_flat(
            params, self.cams, self.imu, factors, masks, self.solver,
            np.asarray(self.w.knot_separation, self.dtype),
            np.asarray(self.w.bias_separation, self.dtype), lam0)
        self._solve_count += 1
        if async_dispatch:
            self._pending = (flat, self.num_knots, self._lm_active.copy(),
                             self._gravity_seeded, self._slide_count,
                             self._slot_gen.copy())
            return None
        return self._pull(flat, self.num_knots, self._lm_active,
                          self._gravity_seeded, self._slide_count,
                          self._slot_gen)

    def _sync_pending(self):
        """Materialize an async solve's results into the host state."""
        if self._pending is None:
            return
        out, n_disp, lm_disp, grav_seeded, slides, gen = self._pending
        self._pending = None
        self._last_stats = self._pull(out, n_disp, lm_disp, grav_seeded,
                                      slides, gen)

    def _pull(self, flat, n_disp, lm_active_disp, grav_seeded_disp,
              slides_disp, gen_disp):
        """Merge device solve results into the host state.  Rows created
        after dispatch (extended knots, newly triangulated landmarks) keep
        their host-side initial values; extended knots are re-extrapolated
        from the solved last dispatched knot.  Async overlap: plain slides
        between dispatch and merge shift the knot indexing (``shift``); the
        slid-out knots were frozen in the solve so nothing is lost.
        Landmark slots freed-and-reused since dispatch (generation bump)
        keep their new host values."""
        w = self.w
        K, L, Kb = w.max_knots, w.max_landmarks, w.max_bias_knots
        C = int(self.cams_np["T_bs"].shape[0])
        off, total = ba.flat_layout(K, L, Kb, C, self.solver.max_iterations)
        v = np.array(flat, np.float64)   # the ONE blocking fetch

        def seg(name, shape=None):
            a, b = off[name]
            x = v[a:b]
            return x.reshape(shape) if shape is not None else x

        knots = seg("knots", (K, 7))
        shift = self._slide_count - slides_disp
        n_valid = n_disp - shift
        if n_valid > 0:
            self.knots[:n_valid] = knots[shift:n_disp]
            if self.w.extrapolation == "constant_velocity":
                for j in range(n_valid, self.num_knots):
                    k1 = self.knots[j - 1]
                    k2 = self.knots[j - 2] if j >= 2 else k1
                    self.knots[j] = nplie.se3_compose(
                        k1, nplie.se3_compose(nplie.se3_inverse(k2), k1))
            elif self.num_knots > n_valid:
                self.knots[n_valid:self.num_knots] = self.knots[n_valid - 1]
        lm = seg("landmarks", (L, 3))
        sel = (np.asarray(lm_active_disp) > 0) \
            & (self._slot_gen == gen_disp)
        self.landmarks[sel] = lm[sel]
        if grav_seeded_disp == self._gravity_seeded:
            self.gravity = seg("gravity").copy()
        self.bias_g = seg("bias_g", (Kb, 3)).copy()
        self.bias_a = seg("bias_a", (Kb, 3)).copy()
        # refined calibration (identical to the inputs unless a calibrate_*
        # flag freed it)
        if (w.calibrate_cam_extrinsics or w.calibrate_cam_intrinsics
                or w.calibrate_cam_distortion):
            self.cams_np = {
                "T_bs": seg("cam_T_bs", (C, 7)).copy(),
                "intr": seg("cam_intr", (C, 4)).copy(),
                "dist": seg("cam_dist", (C, 4)).copy(),
            }
            self.cams = CameraCalib(
                T_bs=np.asarray(self.cams_np["T_bs"], self.dtype),
                intrinsics=np.asarray(self.cams_np["intr"], self.dtype),
                distortion=np.asarray(self.cams_np["dist"], self.dtype))
        if w.calibrate_imu_extrinsics:
            self.imu = self.imu.replace(
                T_bs=np.asarray(seg("imu_T_bs"), self.dtype))
        st = seg("stats")
        stats = ba.SolveStats(
            initial_cost=st[0], final_cost=st[1], lambda_final=st[2],
            accepted=seg("accepted") > 0.5)
        # warm-start the next solve's damping at the converged level
        # (clipped: never so low the first step free-falls, never so high
        # the solver stalls)
        self._lam_warm = float(np.clip(st[2], 1e-5, 1e2))
        self._last_stats = stats
        return stats

    # ------------------------------------------------------------------ #
    # export
    # ------------------------------------------------------------------ #

    def export_trajectory(self, rate_hz: float = 100.0):
        """Sample the full trajectory (archive + live window) at rate_hz.

        Returns (stamps (N,), poses (N, 7)) with absolute stamps — the
        reference's SIGUSR1 export (``main.cpp:69-84``, 100 Hz)."""
        if not self.bootstrapped:
            return np.zeros(0), np.zeros((0, 7))
        self._sync_pending()
        dt = self.w.knot_separation
        if self._knot_archive:
            t0 = self._knot_archive[0][0]
            arch = np.stack([a[1] for a in self._knot_archive])
            all_knots = np.concatenate([arch, self.knots[:self.num_knots]])
        else:
            all_knots = self.knots[:self.num_knots]
            t0 = self.t0
        n = all_knots.shape[0]
        lo = t0
        hi = t0 + (n - self.w.order + 1) * dt
        ts = np.arange(lo, hi - 1e-9, 1.0 / rate_hz)
        poses = nplie.eval_se3(all_knots, ts, t0, dt, self.w.order)
        return ts + self.root_stamp, poses
