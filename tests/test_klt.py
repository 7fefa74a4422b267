"""Stereo KLT frontend: pyramidal LK on synthetic imagery, detection,
track-id continuity (reference VisualFrontend behavior, klt.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperslam_tpu.frontend import klt


def _textured_image(rng, H=120, W=160):
    """Smooth random texture with enough gradient for LK."""
    img = rng.normal(0, 1, (H // 4, W // 4))
    img = np.kron(img, np.ones((4, 4)))
    # blur a little for subpixel interpolation friendliness
    k = np.array([0.25, 0.5, 0.25])
    for ax in (0, 1):
        img = (np.take(img, np.clip(np.arange(img.shape[ax]) - 1, 0, None), ax) * 0.25
               + img * 0.5
               + np.take(img, np.clip(np.arange(img.shape[ax]) + 1, None,
                                      img.shape[ax] - 1), ax) * 0.25)
    return (img - img.min()) / (img.max() - img.min()) * 255.0


def _shift_image(img, dx, dy):
    """Bilinear shift (content moves by +dx, +dy)."""
    H, W = img.shape
    y = np.arange(H)[:, None] - dy
    x = np.arange(W)[None, :] - dx
    x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, H - 2)
    fx = np.clip(x - x0, 0, 1)
    fy = np.clip(y - y0, 0, 1)
    return ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
            + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))


def test_lk_tracks_known_shift(rng):
    img0 = _textured_image(rng)
    shift = (3.3, -2.1)
    img1 = _shift_image(img0, *shift)
    pyr0 = klt.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = klt.build_pyramid(jnp.asarray(img1), 3)
    pts = jnp.asarray(rng.uniform([20, 20], [140, 100], (30, 2)),
                      jnp.float32)
    tracked, ok = klt.lk_track(pyr0, pyr1, pts, pts,
                               jnp.ones(30, bool), win=13, iters=15)
    ok = np.asarray(ok)
    assert ok.sum() >= 20
    err = np.asarray(tracked)[ok] - (np.asarray(pts)[ok]
                                     + np.asarray(shift))
    assert np.median(np.abs(err)) < 0.2, np.median(np.abs(err), axis=0)


def test_shi_tomasi_finds_checker_corners(rng):
    img = np.zeros((128, 128))
    img[32:96, 32:96] = 200.0  # one bright square -> 4 strong corners
    pts, score = klt.shi_tomasi_grid(jnp.asarray(img), cell=32)
    pts = np.asarray(pts)
    score = np.asarray(score)
    strong = pts[score > score.max() * 0.5]
    corners = np.array([[32, 32], [32, 96], [96, 32], [96, 96]])
    for c in corners:
        d = np.linalg.norm(strong - c, axis=-1).min()
        assert d < 4.0, (c, strong)


def test_stereo_klt_track_ids_persist(rng):
    base = _textured_image(rng, 160, 240)
    cfg = klt.KLTConfig(max_tracks=60, min_track_separation=12.0, levels=3,
                        min_score=1.0, cell=24)
    tracker = klt.StereoKLT(cfg)
    disparity = 4.0

    prev_ids = None
    for frame in range(4):
        dx = 1.5 * frame
        left = _shift_image(base, dx, 0.0)
        right = _shift_image(base, dx - disparity, 0.0)
        ids, p0, p1 = tracker.process(left.astype(np.float32),
                                      right.astype(np.float32))
        assert len(ids) > 10
        # stereo disparity recovered
        d = p0[:, 0] - p1[:, 0]
        assert np.median(np.abs(d - disparity)) < 0.5
        if prev_ids is not None:
            # most ids persist across frames (temporal tracking)
            common = np.intersect1d(ids, prev_ids)
            assert len(common) > 0.6 * len(prev_ids)
        prev_ids = ids
    # ids are unique and non-negative
    assert len(np.unique(prev_ids)) == len(prev_ids)
    assert (prev_ids >= 0).all()
