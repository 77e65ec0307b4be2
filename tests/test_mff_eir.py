"""Vexcel MFF + Erdas Imagine Raw drivers — autotest pins."""

import numpy as np

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.eir import read_eir
from gdal_ray.raster.mff import read_mff

D = "/root/reference/autotest/gdrivers/data/"


class TestMFF:
    def test_plain_and_tiled_pins(self):
        # gdrivers/mff.py tests 1-2: checksum 1 for the 1×1 plain
        # form and the 2×2-tile crop (truncated tile pads zero)
        for name in ("mff/fakemff.hdr", "mff/fakemfftiled.hdr"):
            d = read_mff(D + name)
            assert d["bands"][0].shape == (1, 1)
            assert checksum_array(d["bands"][0]) == 1

    def test_byte_fixture_pin(self):
        # test 3: real 20×20 byte image → 4672 (byte.tif family)
        d = read_mff(D + "mff/bytemff.hdr")
        assert d["bands"][0].shape == (20, 20)
        assert d["bands"][0].dtype == np.uint8
        assert checksum_array(d["bands"][0]) == 4672
        assert d["crs"].upper() == "UTM"

    def test_gcps_parsed(self):
        d = read_mff(D + "mff/fakemff.hdr")
        assert d["gcps"] == [(0.0, 1.0, 2.0, 3.0)]


class TestEIR:
    def test_reference_pin(self):
        # gdrivers/eir.py test_eir_1: checksum 1
        d = read_eir(D + "eir/fakeeir.hdr")
        assert d["bands"][0].shape == (1, 1)
        assert checksum_array(d["bands"][0]) == 1
