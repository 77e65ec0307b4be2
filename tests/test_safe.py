"""Sentinel-1 SAFE reader — autotest pins (gdrivers/safe.py): VH
band cs 65372, VV band cs 3732, the literal FOOTPRINT string,
polarisation subdataset filters, annotation GCPs."""

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.safe import read_safe

S = "/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE"

FOOTPRINT = ("POLYGON((-8.407759 38.130520,-11.335915 38.535374,"
             "-11.026125 40.036644,-8.035001 39.633217,"
             " -8.407759 38.130520))")


class TestSAFE:
    def test_bands(self):
        d = read_safe(f"{S}/manifest.safe")
        assert len(d["bands"]) == 2
        assert checksum_array(d["bands"][0]) == 65372  # IW VH
        assert checksum_array(d["bands"][1]) == 3732   # IW VV
        assert d["band_metadata"][0] == {"SWATH": "IW",
                                         "POLARISATION": "VH"}

    def test_footprint(self):
        d = read_safe(f"{S}/manifest.safe")
        assert d["metadata"]["FOOTPRINT"] == FOOTPRINT

    def test_polarisation_filter(self):
        dv = read_safe(S, polarisation="VH")
        assert len(dv["bands"]) == 1
        assert checksum_array(dv["bands"][0]) == 65372
        dv2 = read_safe(S, polarisation="VV")
        assert checksum_array(dv2["bands"][0]) == 3732

    def test_gcps(self):
        d = read_safe(f"{S}/manifest.safe")
        assert d["gcps"]
        g = d["gcps"][0]
        assert abs(g["x"] - -8.0350007) < 1e-6
        assert abs(g["y"] - 39.6332162) < 1e-6
