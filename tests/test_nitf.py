"""NITF reader (gdal_ray/raster/nitf.py) vs the reference autotest
NITF-baseline checksum pins (autotest/gdrivers/nitf.py)."""
import os

import numpy as np
import pytest

from gdal_ray.raster import nitf
from gdal_ray.raster.checksum import checksum_array

DATA = "/root/reference/autotest/gdrivers/data/nitf"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent")


def cs(band):
    return checksum_array(band.astype(np.float64))


def test_rgb():
    """rgb.ntf: 3-band uncompressed (test_nitf_9 family pin)."""
    r = nitf.read_nitf(f"{DATA}/rgb.ntf")
    assert len(r["bands"]) == 3
    assert cs(r["bands"][2]) == 21349


def test_1bit():
    """i_3034c/ns3034d: bit-packed 1-bit image (test_nitf_11 pin)."""
    for f in ("i_3034c.ntf", "ns3034d.nsf", "i_3034f.ntf"):
        r = nitf.read_nitf(f"{DATA}/{f}")
        assert cs(r["bands"][0]) == 170, f


def test_sensrb():
    r = nitf.read_nitf(f"{DATA}/SENSRB_TRE.ntf")
    assert cs(r["bands"][0]) == 19430


def test_no_image_segments():
    """U_0006A: valid header, zero image segments (test_nitf_18)."""
    r = nitf.read_nitf(f"{DATA}/U_0006A.NTF")
    assert r["bands"] == []


def test_nitf_1x_rejected():
    """U_0002A is NITF 1.x: rejected like GDAL (returns None)."""
    with pytest.raises(ValueError, match="NITF 1.x"):
        nitf.read_nitf(f"{DATA}/U_0002A.NTF")


def test_12bit_jpeg():
    """U_4017A: 12-bit JPEG blocks — test_nitf_41 pins the band mean
    in [2385, 2386] (boundary closed round 5)."""
    import numpy as np

    d = nitf.read_nitf(f"{DATA}/U_4017A.NTF")
    b = np.asarray(d["bands"][0])
    assert b.shape == (64, 64)
    assert 2385 <= float(b.mean()) <= 2386


def test_geotransform():
    r = nitf.read_nitf(f"{DATA}/rgb.ntf")
    gt = r["geotransform"]
    assert gt is not None
    assert gt[1] > 0 and gt[5] < 0


def test_jp2_c8_segment():
    """IC=C8 JPEG 2000 image segment — the reference's
    nitf_check_created_file(test_jp2_ecw33.ntf) checksums."""
    import numpy as np

    from gdal_ray.raster.checksum import checksum_array
    from gdal_ray.raster.nitf import read_nitf

    d = read_nitf(DATA + "/test_jp2_ecw33.ntf")
    assert [checksum_array(np.asarray(b)) for b in d["bands"]] == [
        32398, 42502, 38882]


def test_c1_bilevel_fax():
    """U_1050A: IC=C1 CCITT G3 — test_nitf_19 checksum 65024."""
    import numpy as np

    from gdal_ray.raster.checksum import checksum_array
    from gdal_ray.raster.nitf import read_nitf

    d = read_nitf(f"{DATA}/U_1050A.NTF")
    b = np.asarray(d["bands"][0])
    assert b.shape == (1024, 1024)
    assert checksum_array(b) == 65024
