"""Tests for the native (C++) IO pipeline against pure-Python oracles."""

import os
import struct
import zlib

import numpy as np
import pytest

from vslam_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.build_error()}"
)


def _write_png_gray(path: str, img: np.ndarray):
    """Minimal 8-bit grayscale PNG writer (filter 0 rows + zlib)."""
    h, w = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    _write_png_gray(p, img)
    assert native.probe_png(p) == (48, 64)
    out = native.read_png_gray(p)
    np.testing.assert_array_equal(out, img)


def test_png_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    p = str(tmp_path / "y.png")
    Image.fromarray(img, "L").save(p)
    out = native.read_png_gray(p)
    np.testing.assert_array_equal(out, img)


def test_remap_identity_and_shift():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 30), dtype=np.uint8)
    ys, xs = np.mgrid[0:24, 0:30].astype(np.float32)
    out = native.remap_bilinear_u8(img, xs, ys)
    np.testing.assert_array_equal(out, img)
    # integer shift by (1, 2): out[y, x] = img[y+1, x+2] where in range
    out2 = native.remap_bilinear_u8(img, xs + 2, ys + 1)
    np.testing.assert_array_equal(out2[:-1, :-2], img[1:, 2:])
    # half-pixel shift averages neighbors
    out3 = native.remap_bilinear_u8(img, xs + 0.5, ys)
    expect = ((img[:, :-1].astype(np.int32) + img[:, 1:]) / 2).astype(np.float64)
    got = out3[:, :-1].astype(np.float64)
    assert np.abs(got - expect).max() <= 1.0  # rounding


def test_imu_csv_matches_python(tmp_path):
    from vslam_tpu.utils import datasets

    rows = [
        "#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,a_RS_S_x,a_RS_S_y,a_RS_S_z",
        "1403636579758555392,-0.1,0.2,0.03,8.1,-0.4,-2.1",
        "1403636579763555584,-0.11,0.21,0.031,8.15,-0.42,-2.14",
        "",
        "1403636579768555776,-0.12,0.22,0.032,8.2,-0.44,-2.18",
    ]
    p = str(tmp_path / "data.csv")
    with open(p, "w") as f:
        f.write("\n".join(rows))
    a = native.parse_imu_csv(p)
    b = datasets.load_imu_csv(p)
    assert a.shape == b.shape == (3, 7)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_prefetcher_in_order_stereo(tmp_path):
    rng = np.random.default_rng(3)
    H, W, N = 20, 26, 9
    lefts, rights, imgs_l, imgs_r = [], [], [], []
    for i in range(N):
        il = rng.integers(0, 256, (H, W), dtype=np.uint8)
        ir = rng.integers(0, 256, (H, W), dtype=np.uint8)
        pl = str(tmp_path / f"l{i}.png")
        pr = str(tmp_path / f"r{i}.png")
        _write_png_gray(pl, il)
        _write_png_gray(pr, ir)
        lefts.append(pl)
        rights.append(pr)
        imgs_l.append(il)
        imgs_r.append(ir)
    pf = native.Prefetcher(lefts, rights, H, W, threads=3, queue_cap=3)
    seen = 0
    for idx, left, right in pf:
        np.testing.assert_array_equal(left, imgs_l[idx])
        np.testing.assert_array_equal(right, imgs_r[idx])
        assert idx == seen
        seen += 1
    assert seen == N
    pf.close()


def test_prefetcher_rectifies(tmp_path):
    rng = np.random.default_rng(4)
    H, W = 16, 22
    img = rng.integers(0, 256, (H, W), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    _write_png_gray(p, img)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    # shift-by-one rectification map
    pf = native.Prefetcher([p], None, H, W, maps=(xs + 1, ys, None, None), threads=1)
    idx, left, right = pf.next()
    assert idx == 0 and right is None
    np.testing.assert_array_equal(left[:, :-1], img[:, 1:])
    pf.close()
