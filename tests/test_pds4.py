"""PDS4 product reader — reference autotest pins (gdrivers/pds4.py):
all four cart-version labels at cs 4672 with the literal
geotransform, missing_constant 74, hexadecimal IEEE-754 special
constants, multi-array labels."""

import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.pds4 import _special_value, read_pds4

P = "/root/reference/autotest/gdrivers/data/pds4"


class TestPDS4:
    @pytest.mark.parametrize("f", [
        "byte_pds4_cart_1700.xml", "byte_pds4_cart_1b00.xml",
        "byte_pds4_cart_1d00_1933.xml",
        "byte_pds4_cart_1g00_1950.xml"])
    def test_cart_versions(self, f):
        d = read_pds4(f"{P}/{f}")
        assert checksum_array(d["bands"][0]) == 4672
        assert d["geotransform"] == (-59280.0, 60.0, 0.0,
                                     3751320.0, 0.0, -60.0)
        assert d["crs"] == "Transverse Mercator"

    def test_missing_constant(self):
        d = read_pds4(f"{P}/byte_pds4_cart_1700.xml")
        assert d["nodata"] == 74.0

    @pytest.mark.parametrize("f,val", [
        ("missing_constant_hexadecimal_float.xml",
         -3.4028226550889045e38),
        ("missing_constant_hexadecimal_double.xml",
         -1.7976931348623157e308)])
    def test_hexadecimal_constants(self, f, val):
        assert read_pds4(f"{P}/{f}")["nodata"] == val

    def test_special_value_forms(self):
        assert _special_value("74") == 74.0
        assert _special_value("16#FF7FFFFB#") == pytest.approx(
            -3.4028226550889045e38)

    def test_multi_array(self):
        d = read_pds4(f"{P}/byte_pds4_cart_1700_multi_sds.xml")
        assert d["arrays"] == 3
        d2 = read_pds4(f"{P}/byte_pds4_cart_1700_multi_sds.xml",
                       array_index=1)
        assert d2["bands"][0].shape[0] > 0

    def test_dispatch(self):
        # PDS4 labels share .xml with other drivers; the reader's
        # root-element guard is the identify rule
        with pytest.raises(ValueError):
            from gdal_ray.raster.pds4 import read_pds4 as r

            r("/root/reference/autotest/gdrivers/data/dimap2/"
              "single_component/VOL_PHR.XML")
