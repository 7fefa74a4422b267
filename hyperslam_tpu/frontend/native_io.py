"""ctypes bindings for the native measurement-streaming runtime
(``native/libhyperio.so``) — CSV parsing, stereo pairing, time-ordered
merge, and threaded PNG prefetch in C++ (see ``native/hyperio.cpp``).

Falls back cleanly: ``available()`` reports whether the shared library is
built; ``frontend.euroc.EurocSequence`` remains the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional

import numpy as np

__all__ = ["available", "NativeEurocStream", "decode_png"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libhyperio.so")

_lib = None


class _Event(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_int),
        ("stamp", ctypes.c_double),
        ("gyro", ctypes.c_double * 3),
        ("accel", ctypes.c_double * 3),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("img0", ctypes.POINTER(ctypes.c_uint8)),
        ("img1", ctypes.POINTER(ctypes.c_uint8)),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise FileNotFoundError(
            f"{_LIB_PATH} not built — run `make -C native`")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hyperio_open.restype = ctypes.c_void_p
    lib.hyperio_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.c_double, ctypes.c_int]
    lib.hyperio_next.restype = ctypes.c_int
    lib.hyperio_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_Event)]
    lib.hyperio_close.argtypes = [ctypes.c_void_p]
    lib.hyperio_decode_png.restype = ctypes.c_int
    lib.hyperio_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def decode_png(path: str, max_pixels: int = 4096 * 4096) -> np.ndarray:
    """Decode an 8-bit PNG to a grayscale (H, W) uint8 array natively."""
    lib = _load()
    buf = (ctypes.c_uint8 * max_pixels)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.hyperio_decode_png(path.encode(), buf, max_pixels,
                                ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"PNG decode failed ({rc}): {path}")
    n = w.value * h.value
    return np.frombuffer(buf, np.uint8, n).reshape(h.value, w.value).copy()


class NativeEurocStream:
    """Iterate ("imu", t, gyro, accel) / ("stereo", t, img0, img1) events
    from a EuRoC ``mav0`` folder via the native prefetching runtime."""

    def __init__(self, mav0_path: str, use_imu: bool = True,
                 max_duration: float = 0.0, prefetch: int = 8):
        self._lib = _load()
        if os.path.isdir(os.path.join(mav0_path, "mav0")):
            mav0_path = os.path.join(mav0_path, "mav0")
        self._handle = self._lib.hyperio_open(
            mav0_path.encode(), int(use_imu), float(max_duration),
            int(prefetch))
        if not self._handle:
            raise RuntimeError(f"hyperio_open failed for {mav0_path}")
        self._closed = False

    def __iter__(self) -> Iterator[tuple]:
        ev = _Event()
        while True:
            rc = self._lib.hyperio_next(self._handle, ctypes.byref(ev))
            if rc < 0:
                break
            if ev.type == 0:
                yield ("imu", ev.stamp, np.asarray(ev.gyro[:]),
                       np.asarray(ev.accel[:]))
            else:
                n = ev.width * ev.height
                img0 = np.ctypeslib.as_array(ev.img0, (n,)).reshape(
                    ev.height, ev.width).copy()
                img1 = np.ctypeslib.as_array(ev.img1, (n,)).reshape(
                    ev.height, ev.width).copy()
                yield ("stereo", ev.stamp, img0, img1)
        self.close()

    def close(self):
        if not self._closed:
            self._lib.hyperio_close(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
