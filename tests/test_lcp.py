"""FARSITE LCP driver — reference-autotest pins."""

import numpy as np

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.lcp import read_lcp

D = "/root/reference/autotest/gdrivers/data/lcp/"


class TestLCP:
    def test_all_eight_band_pins(self):
        # gdrivers/lcp.py test_lcp_1's eight literal band checksums
        d = read_lcp(D + "test_FARSITE_UTM12.LCP")
        assert len(d["bands"]) == 8
        assert [checksum_array(b) for b in d["bands"]] == [
            18645, 16431, 18851, 26182, 30038, 22077, 30388, 23249]

    def test_dataset_metadata(self):
        d = read_lcp(D + "test_FARSITE_UTM12.LCP")
        assert d["latitude"] == 49
        assert d["linear_unit"] == "Meters"
        assert d["description"].startswith(
            "This is a test LCP file created with FARSITE 4.1.054")
        assert d["band_names"][:5] == ["ELEVATION", "SLOPE", "ASPECT",
                                       "FUEL_MODEL", "CANOPY_COV"]

    def test_geotransform(self):
        d = read_lcp(D + "test_FARSITE_UTM12.LCP")
        gt = d["geotransform"]
        west, cellx, _, north, _, ncelly = gt
        e, w, n, s = d["bounds"]
        assert w == west and n == north
        assert cellx > 0 and ncelly < 0
        nx = d["bands"][0].shape[1]
        assert w + nx * cellx == e

    def test_second_fixture_band_count(self):
        d = read_lcp(D + "test_USGS_LFNM_Alb83.lcp")
        assert len(d["bands"]) in (5, 7, 8, 10)
        assert all(b.dtype == np.int16 for b in d["bands"])
