"""Stereo KLT visual frontend — batched pyramidal Lucas-Kanade in JAX.

TPU-native rebuild of the reference's ``VisualFrontend``
(``/root/reference/internal/hyper/system/frontends/visual/klt.cpp``;
SURVEY.md §2.1): pyramidal LK forward+backward tracking with cross-check,
sideways (left->right) stereo tracking, circular initialization of new
features (prevL->curL->curR vs prevL->prevR->curR consistency), Shi-Tomasi
(goodFeaturesToTrack-equivalent) detection with spatial separation, and
monotonically increasing global track ids.

Design: feature slots are a **fixed-capacity masked array** (no dynamic
shapes — the reference's std::vector push/prune becomes mask updates), all
per-point work is vmapped, and every image-level op is a fused XLA program.
The tracker state carries image pyramids + slot arrays; the per-frame step is
a single jitted function.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["build_pyramid", "lk_track", "shi_tomasi_grid", "StereoKLT"]


# --------------------------------------------------------------------------- #
# image ops
# --------------------------------------------------------------------------- #

_GAUSS5 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur5(img):
    """Separable 5-tap Gaussian blur, reflect padding. img (H, W) f32."""
    k = jnp.asarray(_GAUSS5, img.dtype)
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(p[i:i + img.shape[0], :] * k[i] for i in range(5))
    p = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(p[:, i:i + img.shape[1]] * k[i] for i in range(5))
    return img


def build_pyramid(img, levels: int = 4):
    """List of (H/2^l, W/2^l) images, level 0 = full resolution."""
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(1, levels):
        blurred = _blur5(pyr[-1])
        pyr.append(blurred[::2, ::2])
    return pyr


def _bilinear(img, y, x):
    """Bilinear sample img (H, W) at float coords; clamps to border."""
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    dx = jnp.clip(x - x0, 0.0, 1.0)
    dy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - dy) * ((1 - dx) * v00 + dx * v01)
            + dy * ((1 - dx) * v10 + dx * v11))


def _patch_grid(win: int):
    r = (win - 1) / 2.0
    off = jnp.arange(win, dtype=jnp.float32) - r
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    return oy.ravel(), ox.ravel()


# --------------------------------------------------------------------------- #
# pyramidal LK
# --------------------------------------------------------------------------- #

def _lk_level(img_prev, img_next, pts_prev, guess, win, iters, min_det):
    """One pyramid level of LK for all points.  pts (N, 2) as (x, y)."""
    oy, ox = _patch_grid(win)

    def one(p_prev, g):
        px, py = p_prev[0], p_prev[1]
        ys = py + oy
        xs = px + ox
        T = _bilinear(img_prev, ys, xs)
        # gradients of the template (inverse-compositional LK)
        Ix = 0.5 * (_bilinear(img_prev, ys, xs + 1.0)
                    - _bilinear(img_prev, ys, xs - 1.0))
        Iy = 0.5 * (_bilinear(img_prev, ys + 1.0, xs)
                    - _bilinear(img_prev, ys - 1.0, xs))
        gxx = jnp.sum(Ix * Ix)
        gxy = jnp.sum(Ix * Iy)
        gyy = jnp.sum(Iy * Iy)
        det = gxx * gyy - gxy * gxy
        ok = det > min_det
        det_safe = jnp.where(ok, det, 1.0)
        inv = jnp.asarray(
            [[gyy, -gxy], [-gxy, gxx]], jnp.float32) / det_safe

        def body(_, d):
            I = _bilinear(img_next, py + d[1] + oy, px + d[0] + ox)
            e = I - T
            b = jnp.asarray([jnp.sum(Ix * e), jnp.sum(Iy * e)], jnp.float32)
            step = inv @ b
            return d - step

        d = jax.lax.fori_loop(0, iters, body, g - p_prev)
        return p_prev + d, ok

    return jax.vmap(one)(pts_prev, guess)


@functools.partial(jax.jit, static_argnames=("win", "iters"))
def lk_track(pyr_prev, pyr_next, pts, guess, valid, win=13, iters=10,
             min_det=1e-4):
    """Track pts from pyr_prev to pyr_next.  Coarse-to-fine over all levels
    of the given pyramids (pyramid depth = number of levels passed in).

    pts, guess: (N, 2) (x, y) full-res pixels; valid: (N,) bool.
    Returns (tracked (N, 2), ok (N,) bool).  Equivalent of one
    ``cv::calcOpticalFlowPyrLK`` call (reference klt.cpp:234-262).
    """
    L = len(pyr_prev)
    cur = guess / (2.0 ** (L - 1))
    ok = None
    for l in range(L - 1, -1, -1):
        scale = 2.0 ** l
        p_l = pts / scale
        cur, ok_l = _lk_level(pyr_prev[l], pyr_next[l], p_l, cur, win, iters,
                              min_det)
        # A point badly conditioned at ANY level is unreliable (coarse-level
        # divergence poisons the fine-level initial guess).
        ok = ok_l if ok is None else (ok & ok_l)
        if l > 0:
            cur = cur * 2.0
    H, W = pyr_next[0].shape
    inb = ((cur[:, 0] >= 1.0) & (cur[:, 0] <= W - 2.0)
           & (cur[:, 1] >= 1.0) & (cur[:, 1] <= H - 2.0))
    return cur, valid & ok & inb


# --------------------------------------------------------------------------- #
# Shi-Tomasi detection with grid separation
# --------------------------------------------------------------------------- #

@functools.partial(jax.jit, static_argnames=("cell", "max_per_cell"))
def shi_tomasi_grid(img, cell: int = 32, max_per_cell: int = 1):
    """Min-eigenvalue corner response with per-grid-cell argmax selection.

    The grid replaces ``cv::goodFeaturesToTrack``'s minDistance suppression
    (reference klt.cpp:314-330) with a TPU-friendly fixed-shape reduction:
    at most ``max_per_cell`` corners per (cell x cell) tile.

    Returns (pts (C, 2) float (x, y), score (C,)) with C = num_cells.
    """
    img = img.astype(jnp.float32)
    Ix = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    Iy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    # box-filtered structure tensor
    def box(a):
        return _blur5(_blur5(a))
    gxx, gxy, gyy = box(Ix * Ix), box(Ix * Iy), box(Iy * Iy)
    tr = gxx + gyy
    dd = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 + 4 * gxy * gxy, 0.0))
    response = 0.5 * (tr - dd)  # min eigenvalue
    # zero the borders
    H, W = img.shape
    yb = (jnp.arange(H) < 8) | (jnp.arange(H) >= H - 8)
    xb = (jnp.arange(W) < 8) | (jnp.arange(W) >= W - 8)
    response = jnp.where(yb[:, None] | xb[None, :], 0.0, response)
    # per-cell argmax
    Hc, Wc = H // cell, W // cell
    r = response[:Hc * cell, :Wc * cell].reshape(Hc, cell, Wc, cell)
    r = r.transpose(0, 2, 1, 3).reshape(Hc * Wc, cell * cell)
    idx = jnp.argmax(r, axis=1)
    score = jnp.take_along_axis(r, idx[:, None], axis=1)[:, 0]
    cy = idx // cell
    cx = idx % cell
    gy = (jnp.arange(Hc * Wc) // Wc) * cell + cy
    gx = (jnp.arange(Hc * Wc) % Wc) * cell + cx
    pts = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)
    return pts, score


# --------------------------------------------------------------------------- #
# stereo tracker with circular initialization
# --------------------------------------------------------------------------- #

@dataclasses.dataclass
class KLTConfig:
    """Mirrors the reference frontend's YAML knobs (settings.yaml:110-124)."""
    max_tracks: int = 150           # max_num_tracks
    min_track_separation: float = 20.0
    win: int = 13                   # patch_size
    levels: int = 4                 # num_pyramid_levels
    iters: int = 10
    fb_threshold: float = 1.0       # forward-backward cross-check (px)
    circular_threshold: float = 2.0 # circular-init consistency (px)
    min_score: float = 25.0
    cell: int = 32


class StereoKLT:
    """Stateful stereo KLT tracker (host bookkeeping + jitted device math).

    Per-frame protocol mirrors ``VisualFrontend::callback``
    (klt.cpp:157-212): track existing features prev-left -> cur-left
    (forward+backward cross-check), track sideways cur-left -> cur-right,
    then top up with circularly-initialized new features.
    """

    def __init__(self, cfg: KLTConfig = KLTConfig()):
        self.cfg = cfg
        self.prev_pyr0 = None
        self.prev_pyr1 = None
        N = cfg.max_tracks
        self.pts0 = np.zeros((N, 2), np.float32)   # left pixels
        self.pts1 = np.zeros((N, 2), np.float32)   # right pixels
        self.valid = np.zeros(N, bool)
        self.ids = np.full(N, -1, np.int64)
        self.lengths = np.zeros(N, np.int64)
        self._next_id = 0   # instance-scoped (the reference used an unsafe
                            # function-local static id generator, klt.cpp:380)

    def process(self, img0: np.ndarray, img1: np.ndarray):
        """Returns (ids, pts0 (M,2), pts1 (M,2)) of tracked stereo features."""
        cfg = self.cfg
        pyr0 = build_pyramid(jnp.asarray(img0), cfg.levels)
        pyr1 = build_pyramid(jnp.asarray(img1), cfg.levels)

        if self.prev_pyr0 is not None and self.valid.any():
            pts = jnp.asarray(self.pts0)
            valid = jnp.asarray(self.valid)
            # forward track prevL -> curL, then backward cross-check
            fwd, ok = lk_track(self.prev_pyr0, pyr0, pts, pts, valid,
                               cfg.win, cfg.iters)
            bwd, ok_b = lk_track(pyr0, self.prev_pyr0, fwd, fwd, ok,
                                 cfg.win, cfg.iters)
            fb = jnp.linalg.norm(bwd - pts, axis=-1)
            ok = ok & ok_b & (fb < cfg.fb_threshold)
            # sideways curL -> curR (guess: previous disparity)
            guess1 = fwd + jnp.asarray(self.pts1 - self.pts0)
            right, ok_r = lk_track(pyr0, pyr1, fwd, guess1, ok,
                                   cfg.win, cfg.iters)
            ok = ok & ok_r
            self.pts0 = np.array(fwd)
            self.pts1 = np.array(right)
            self.valid = np.array(ok)
            self.lengths[self.valid] += 1
            self.ids[~self.valid] = -1
            self._select()

        # top-up with new circularly-verified features
        free = int((~self.valid).sum())
        if free > 0:
            self._initialize(pyr0, pyr1)

        self.prev_pyr0 = pyr0
        self.prev_pyr1 = pyr1
        m = self.valid
        return self.ids[m], self.pts0[m].copy(), self.pts1[m].copy()

    def _select(self):
        """Length-sorted track selection with a separation mask (reference
        ``selectFeatures``, klt.cpp:314-330): visit tracks longest-first and
        drop any track closer than ``min_track_separation`` to an
        already-kept (longer) one.  Long tracks carry the most constraint per
        landmark, so they win ties for image real estate."""
        cfg = self.cfg
        idx = np.nonzero(self.valid)[0]
        if len(idx) < 2:
            return
        # longest first; ties broken by older id (stable ordering)
        order = idx[np.lexsort((self.ids[idx], -self.lengths[idx]))]
        pts = self.pts0[order]
        kept_mask = np.zeros(len(order), bool)
        kept_pts = []
        for i in range(len(order)):
            p = pts[i]
            if kept_pts:
                d2 = np.sum((np.asarray(kept_pts) - p) ** 2, axis=1)
                if d2.min() < cfg.min_track_separation ** 2:
                    continue
            kept_mask[i] = True
            kept_pts.append(p)
        dropped = order[~kept_mask]
        self.valid[dropped] = False
        self.ids[dropped] = -1
        self.lengths[dropped] = 0

    def _initialize(self, pyr0, pyr1):
        """Detect corners in left, verify by left->right->(back) tracking
        (the reference's circular initialization, klt.cpp:332-399)."""
        cfg = self.cfg
        pts, score = shi_tomasi_grid(pyr0[0], cfg.cell)
        pts = np.asarray(pts)
        score = np.asarray(score)
        # suppress candidates near existing tracks
        if self.valid.any():
            d = np.linalg.norm(
                pts[:, None, :] - self.pts0[None, self.valid, :], axis=-1)
            far = d.min(axis=1) > cfg.min_track_separation
        else:
            far = np.ones(len(pts), bool)
        cand = (score > cfg.min_score) & far
        order = np.argsort(-score)
        cand_idx = [i for i in order if cand[i]]
        free_slots = np.nonzero(~self.valid)[0]
        n_new = min(len(cand_idx), len(free_slots))
        if n_new == 0:
            return
        cand_idx = np.asarray(cand_idx[:n_new])
        p0 = jnp.asarray(pts[cand_idx])
        v = jnp.ones(n_new, bool)
        # left -> right
        p1, ok = lk_track(pyr0, pyr1, p0, p0, v, cfg.win, cfg.iters)
        # right -> left back-check closes the loop (circular consistency)
        p0b, ok_b = lk_track(pyr1, pyr0, p1, p1, ok, cfg.win, cfg.iters)
        err = jnp.linalg.norm(p0b - p0, axis=-1)
        ok = np.asarray(ok & ok_b & (err < cfg.circular_threshold))
        sel = np.nonzero(ok)[0]
        slots = free_slots[:len(sel)]
        self.pts0[slots] = np.asarray(p0)[sel]
        self.pts1[slots] = np.asarray(p1)[sel]
        self.valid[slots] = True
        self.lengths[slots] = 1
        new_ids = np.arange(self._next_id, self._next_id + len(sel))
        self._next_id += len(sel)
        self.ids[slots] = new_ids
