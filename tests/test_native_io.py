"""Native IO runtime: PNG decode parity with PIL, EuRoC stream ordering,
stereo pairing, prefetch lifecycle."""

import os
import subprocess

import numpy as np
import pytest

from hyperslam_tpu.frontend import native_io

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_io.available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=True)
    assert native_io.available()


def _write_png(path, img):
    from PIL import Image
    Image.fromarray(img).save(path)


def _make_dataset(root, n_frames=4, imu_rate=20, size=(32, 24)):
    """Tiny EuRoC-layout dataset with random PNGs."""
    rng = np.random.default_rng(0)
    mav = root / "mav0"
    imgs = {}
    for c in range(2):
        (mav / f"cam{c}" / "data").mkdir(parents=True)
        rows = ["#timestamp [ns],filename"]
        for i in range(n_frames):
            ns = 1_000_000_000 + i * 100_000_000  # 10 Hz
            name = f"{ns}.png"
            img = rng.integers(0, 255, (size[1], size[0]), np.uint8)
            _write_png(str(mav / f"cam{c}" / "data" / name), img)
            imgs[(c, i)] = img
            rows.append(f"{ns},{name}")
        (mav / f"cam{c}" / "data.csv").write_text("\n".join(rows) + "\n")
    (mav / "imu0").mkdir(parents=True)
    rows = ["#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z"]
    n_imu = int(n_frames * 0.1 * imu_rate)
    for i in range(n_imu):
        ns = 1_000_000_000 + i * (1_000_000_000 // imu_rate)
        rows.append(f"{ns},0.1,0.2,0.3,0.4,0.5,{i * 0.01}")
    (mav / "imu0" / "data.csv").write_text("\n".join(rows) + "\n")
    return imgs


def test_png_decode_matches_pil(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 64), np.uint8)
    p = str(tmp_path / "t.png")
    _write_png(p, img)
    dec = native_io.decode_png(p)
    np.testing.assert_array_equal(dec, img)


def test_png_decode_rgb_to_gray(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (16, 16, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    _write_png(p, img)
    dec = native_io.decode_png(p)
    assert dec.shape == (16, 16)
    rgb = img.astype(int)
    luma = (77 * rgb[..., 0] + 150 * rgb[..., 1] + 29 * rgb[..., 2]) >> 8
    np.testing.assert_allclose(dec, luma, atol=1)


def test_stream_ordering_and_content(tmp_path):
    imgs = _make_dataset(tmp_path)
    stream = native_io.NativeEurocStream(str(tmp_path), use_imu=True)
    events = list(stream)
    assert len(events) > 0
    stamps = [e[1] for e in events]
    assert stamps == sorted(stamps)
    stereo = [e for e in events if e[0] == "stereo"]
    imu = [e for e in events if e[0] == "imu"]
    assert len(stereo) == 4
    assert len(imu) == 8
    # image payloads survive the ring buffer intact
    np.testing.assert_array_equal(stereo[0][2], imgs[(0, 0)])
    np.testing.assert_array_equal(stereo[0][3], imgs[(1, 0)])
    np.testing.assert_array_equal(stereo[3][2], imgs[(0, 3)])
    # imu payloads parsed correctly
    np.testing.assert_allclose(imu[3][3], [0.4, 0.5, 0.03], atol=1e-12)


def test_stream_max_duration(tmp_path):
    _make_dataset(tmp_path)
    stream = native_io.NativeEurocStream(str(tmp_path), use_imu=True,
                                         max_duration=0.15)
    events = list(stream)
    assert all(e[1] - 1.0 <= 0.15 + 1e-9 for e in events)
    assert len([e for e in events if e[0] == "stereo"]) == 2


def test_stream_no_imu(tmp_path):
    _make_dataset(tmp_path)
    events = list(native_io.NativeEurocStream(str(tmp_path), use_imu=False))
    assert all(e[0] == "stereo" for e in events)


def test_early_close_does_not_hang(tmp_path):
    _make_dataset(tmp_path)
    stream = native_io.NativeEurocStream(str(tmp_path), use_imu=True,
                                         prefetch=2)
    it = iter(stream)
    next(it)
    stream.close()  # must join the prefetch thread without deadlock
