"""Feature-track visualization — the reference's ``show_tracks`` debug view
(``klt.cpp:103-141``, YAML flag ``show_tracks``) without GUI windows:
renders tracked features + stereo matches over the image pair and writes a
PNG per frame (headless-friendly).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["draw_tracks", "TrackVisualizer"]


def draw_tracks(img0, img1, pts0, pts1, ids=None):
    """Compose a side-by-side stereo visualization with track overlays.

    Returns an (H, 2W, 3) uint8 image: green dots = left features, cyan =
    right features, yellow lines = stereo correspondences."""
    import cv2
    H, W = img0.shape[:2]
    canvas = np.zeros((H, 2 * W, 3), np.uint8)
    canvas[:, :W] = cv2.cvtColor(img0.astype(np.uint8), cv2.COLOR_GRAY2BGR)
    canvas[:, W:] = cv2.cvtColor(img1.astype(np.uint8), cv2.COLOR_GRAY2BGR)
    for k in range(len(pts0)):
        p0 = (int(round(pts0[k][0])), int(round(pts0[k][1])))
        p1 = (int(round(pts1[k][0])) + W, int(round(pts1[k][1])))
        cv2.line(canvas, p0, p1, (0, 200, 200), 1, cv2.LINE_AA)
        cv2.circle(canvas, p0, 3, (0, 220, 0), -1, cv2.LINE_AA)
        cv2.circle(canvas, p1, 3, (220, 220, 0), -1, cv2.LINE_AA)
        if ids is not None:
            cv2.putText(canvas, str(int(ids[k])), (p0[0] + 4, p0[1] - 4),
                        cv2.FONT_HERSHEY_PLAIN, 0.8, (0, 220, 0), 1)
    return canvas


class TrackVisualizer:
    """Writes one annotated PNG per processed frame into ``out_dir``."""

    def __init__(self, out_dir: str, every: int = 1):
        self.out_dir = out_dir
        self.every = max(1, every)
        self._n = 0
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, img0, img1, pts0, pts1, ids=None,
                 stamp: Optional[float] = None):
        self._n += 1
        if self._n % self.every:
            return
        import cv2
        canvas = draw_tracks(img0, img1, pts0, pts1, ids)
        name = (f"tracks_{stamp:.6f}.png" if stamp is not None
                else f"tracks_{self._n:06d}.png")
        cv2.imwrite(os.path.join(self.out_dir, name), canvas)
