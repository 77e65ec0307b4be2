"""Lossy VP8 (RFC 6386) decoder vs libwebp itself.

libwebp ships in this environment as a system shared library; these
tests drive it through ctypes as the conformance oracle — every test
asserts BIT-EXACT equality of the decoded planes/pixels, not a
tolerance.  The reference's own webp fixture (rgbsmall.webp, lossy)
is pinned the same way; its band-1 GDAL checksum lands on 21459,
one of the values the reference's autotest accepts
(autotest/gdrivers/webp.py: ``cs in (21464, 21450, 21459)``).
"""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.vp8 import decode_vp8, yuv420_to_rgb
from gdal_ray.raster.webp import decode_webp

_LIB_PATH = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
try:
    _lib = ctypes.CDLL(_LIB_PATH)
except OSError:  # pragma: no cover - environment without libwebp
    _lib = None

pytestmark = pytest.mark.skipif(_lib is None, reason="libwebp absent")

FIXTURE = "/root/reference/autotest/gdrivers/data/webp/rgbsmall.webp"


def _vp8_chunk(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if tag == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


def _encode_rgb(img: np.ndarray, q: float) -> bytes:
    h, w, _ = img.shape
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _lib.WebPEncodeRGB(img.tobytes(), w, h, w * 3, q,
                           ctypes.byref(out))
    assert n > 0
    return bytes(bytearray(out[i] for i in range(n)))


def _oracle_yuv(data: bytes):
    W = ctypes.c_int()
    H = ctypes.c_int()
    stride = ctypes.c_int()
    uvstride = ctypes.c_int()
    uptr = ctypes.POINTER(ctypes.c_ubyte)()
    vptr = ctypes.POINTER(ctypes.c_ubyte)()
    _lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    yptr = _lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(W), ctypes.byref(H),
        ctypes.byref(uptr), ctypes.byref(vptr),
        ctypes.byref(stride), ctypes.byref(uvstride))
    w, h = W.value, H.value
    y = np.ctypeslib.as_array(yptr, shape=(h, stride.value))[:, :w].copy()
    uh, uw = (h + 1) // 2, (w + 1) // 2
    u = np.ctypeslib.as_array(
        uptr, shape=(uh, uvstride.value))[:, :uw].copy()
    v = np.ctypeslib.as_array(
        vptr, shape=(uh, uvstride.value))[:, :uw].copy()
    return y, u, v


def _oracle_rgb(data: bytes):
    _lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _lib.WebPDecodeRGB(data, len(data), ctypes.byref(w),
                           ctypes.byref(h))
    return np.ctypeslib.as_array(p, shape=(h.value, w.value, 3)).copy()


class TestReferenceFixture:
    def test_yuv_bit_exact(self):
        with open(FIXTURE, "rb") as f:
            data = f.read()
        y, u, v = decode_vp8(_vp8_chunk(data))
        yo, uo, vo = _oracle_yuv(data)
        assert np.array_equal(y, yo)
        assert np.array_equal(u, uo)
        assert np.array_equal(v, vo)

    def test_rgb_and_gdal_checksum(self):
        with open(FIXTURE, "rb") as f:
            data = f.read()
        out = decode_webp(data)
        assert out.shape == (50, 50, 4)
        assert np.array_equal(out[:, :, :3], _oracle_rgb(data))
        # autotest/gdrivers/webp.py accepts {21464, 21450, 21459}
        assert checksum_array(out[:, :, 0]) == 21459
        assert checksum_array(out[:, :, 1]) == 21981
        assert checksum_array(out[:, :, 2]) == 21383


class TestSyntheticStreams:
    @pytest.mark.parametrize("quality", [20.0, 75.0, 95.0])
    def test_noise_all_qualities(self, quality):
        rng = np.random.default_rng(int(quality))
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        webp = _encode_rgb(img, quality)
        y, u, v = decode_vp8(_vp8_chunk(webp))
        yo, uo, vo = _oracle_yuv(webp)
        assert np.array_equal(y, yo)
        assert np.array_equal(u, uo)
        assert np.array_equal(v, vo)

    def test_odd_dimensions(self):
        # non-multiple-of-16 sizes exercise edge macroblock cropping
        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
        webp = _encode_rgb(img, 60.0)
        y, u, v = decode_vp8(_vp8_chunk(webp))
        yo, uo, vo = _oracle_yuv(webp)
        assert np.array_equal(y, yo)
        assert np.array_equal(u, uo)
        assert np.array_equal(v, vo)

    def test_smooth_image_skip_blocks(self):
        # smooth gradients produce skipped MBs + segment maps
        xx = np.arange(64)
        img = (np.sin(xx[:, None] / 5) * 50 + np.cos(xx[None, :] / 7)
               * 60 + 128).clip(0, 255).astype(np.uint8)
        img = img[:, :, None].repeat(3, 2)
        webp = _encode_rgb(img, 75.0)
        y, u, v = decode_vp8(_vp8_chunk(webp))
        yo, uo, vo = _oracle_yuv(webp)
        assert np.array_equal(y, yo)

    def test_fancy_upsampler_rgb_exact(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        webp = _encode_rgb(img, 85.0)
        y, u, v = decode_vp8(_vp8_chunk(webp))
        assert np.array_equal(yuv420_to_rgb(y, u, v), _oracle_rgb(webp))

    def test_lossy_with_alpha(self):
        _lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        _lib.WebPEncodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (40, 56, 4), dtype=np.uint8)
        img[..., 3] = np.tile(
            np.linspace(0, 255, 56).astype(np.uint8), (40, 1))
        p = ctypes.POINTER(ctypes.c_ubyte)()
        n = _lib.WebPEncodeRGBA(img.tobytes(), 56, 40, 56 * 4, 80.0,
                                ctypes.byref(p))
        webp = bytes(bytearray(p[i] for i in range(n)))
        mine = decode_webp(webp)
        _lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        W = ctypes.c_int()
        H = ctypes.c_int()
        q = _lib.WebPDecodeRGBA(webp, len(webp), ctypes.byref(W),
                                ctypes.byref(H))
        oracle = np.ctypeslib.as_array(
            q, shape=(H.value, W.value, 4)).copy()
        assert np.array_equal(mine, oracle)

    def test_interframe_raises(self):
        with open(FIXTURE, "rb") as f:
            data = f.read()
        chunk = bytearray(_vp8_chunk(data))
        chunk[0] |= 1  # set the not-keyframe bit
        with pytest.raises(NotImplementedError, match="interframe"):
            decode_vp8(bytes(chunk))
