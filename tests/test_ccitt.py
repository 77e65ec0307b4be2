"""CCITT G3/G4 fax codecs (raster/ccitt.py) — reference autotest pin
(gcore/tiff_read.py test_tiff_g4_split: slim_g4.tif checksum 3322)
plus libtiff-oracle roundtrips: libtiff (system shared library, via
ctypes) ENCODES synthetic bilevel images at every compression
variant; this repo's decoder must reproduce them bit-exactly."""

import ctypes

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.gtiff import decode_geotiff

_LIBTIFF = "/usr/lib/x86_64-linux-gnu/libtiff.so.6"
try:
    _t = ctypes.CDLL(_LIBTIFF)
    _t.TIFFOpen.restype = ctypes.c_void_p
    _t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
except OSError:  # pragma: no cover
    _t = None


def test_slim_g4_reference_pin():
    with open("/root/reference/autotest/gcore/data/slim_g4.tif",
              "rb") as f:
        d = decode_geotiff(f.read())
    b = d["bands"][0]
    assert b.shape == (7200, 1000)
    assert checksum_array(b) == 3322  # test_tiff_g4_split


def _write_tiff(path, img, comp, t4opts=None, rps=None):
    h, w = img.shape
    tif = _t.TIFFOpen(path.encode(), b"w")
    assert tif

    def setf(tag, val, ty=ctypes.c_uint32):
        _t.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                        ty(val))

    setf(256, w)
    setf(257, h)
    setf(258, 1, ctypes.c_uint16)
    setf(259, comp, ctypes.c_uint16)
    setf(262, 0, ctypes.c_uint16)
    setf(277, 1, ctypes.c_uint16)
    setf(278, rps or h)
    if t4opts is not None:
        setf(292, t4opts)
    rowbytes = (w + 7) // 8
    for y in range(h):
        packed = np.packbits(img[y]).tobytes().ljust(rowbytes, b"\0")
        assert _t.TIFFWriteScanline(
            ctypes.c_void_p(tif), packed, ctypes.c_uint32(y),
            ctypes.c_uint16(0)) == 1
    _t.TIFFClose(ctypes.c_void_p(tif))


@pytest.mark.skipif(_t is None, reason="libtiff absent")
@pytest.mark.parametrize("comp,t4opts,rps", [
    (4, None, None),      # G4 single strip
    (4, None, 16),        # G4 multi-strip
    (2, None, None),      # modified Huffman (CCITT RLE)
    (3, 0, None),         # G3 1-D with EOLs
    (3, 1, None),         # G3 2-D
])
def test_libtiff_oracle_roundtrip(tmp_path, comp, t4opts, rps):
    rng = np.random.default_rng(5)
    base = rng.random((20, 25)) > 0.5
    img = np.kron(base, np.ones((8, 8), bool))[:153, :197].astype(
        np.uint8)
    p = str(tmp_path / "cc.tif")
    _write_tiff(p, img, comp, t4opts=t4opts, rps=rps)
    with open(p, "rb") as f:
        d = decode_geotiff(f.read())
    assert np.array_equal(d["bands"][0], img)


@pytest.mark.skipif(_t is None, reason="libtiff absent")
def test_long_runs_use_makeup_codes(tmp_path):
    # >2560-pixel runs force chained extended makeup codes
    img = np.zeros((4, 6000), np.uint8)
    img[1, 2900:5900] = 1
    img[3, :] = 1
    p = str(tmp_path / "runs.tif")
    _write_tiff(p, img, 4)
    with open(p, "rb") as f:
        d = decode_geotiff(f.read())
    assert np.array_equal(d["bands"][0], img)
