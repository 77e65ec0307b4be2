"""Sigmet IRIS weather-radar reader — pinned to the reference
autotest (gdrivers/iris.py): fakeiris.dat cs 65532; iristest.dat cs
52872 and its literal Vincenty/Mercator geotransform to 1e-5."""

import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.iris import read_iris

I = "/root/reference/autotest/gdrivers/data/iris"

EXPECTED_GT = [16435.721785269096, 1370.4263720754534, 0.0,
               5289830.4584420761, 0.0, -1357.6498705837876]


class TestIRIS:
    def test_fakeiris(self):
        d = read_iris(f"{I}/fakeiris.dat")
        assert checksum_array(d["bands"][0]) == 65532

    def test_iristest_checksum(self):
        d = read_iris(f"{I}/iristest.dat")
        assert d["bands"][0].shape == (262, 260)
        assert checksum_array(d["bands"][0]) == 52872
        assert d["metadata"]["PRODUCT"] == "CAPPI"
        assert d["metadata"]["PROJECTION"] == "Mercator"

    def test_iristest_geotransform(self):
        gt = read_iris(f"{I}/iristest.dat")["geotransform"]
        for g, e in zip(gt, EXPECTED_GT):
            if e == 0.0:
                assert g == 0.0
            else:
                assert abs(g - e) / abs(e) <= 1e-5

    def test_bad_magic(self):
        from gdal_ray.raster.iris import decode_iris

        with pytest.raises(ValueError):
            decode_iris(b"\x00" * 700)
