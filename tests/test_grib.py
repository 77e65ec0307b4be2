"""GRIB 1/2 reader (gdal_ray/raster/grib.py) vs the reference autotest
checksum/metadata pins (autotest/gdrivers/grib.py)."""
import os

import numpy as np
import pytest

from gdal_ray.raster import grib
from gdal_ray.raster.checksum import checksum_array

DATA = "/root/reference/autotest/gdrivers/data/grib"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent")


def cs(band):
    return checksum_array(band.data.astype(np.float64))


class TestGrib2:
    def test_complex_spatial_diff_order2(self):
        """ds.mint.bin: template 5.3 order 2, boustrophedon scan,
        K→C unit conversion (test_grib_1 pin)."""
        bands = grib.read_grib(f"{DATA}/ds.mint.bin")
        assert len(bands) == 2
        assert cs(bands[1]) == 46927
        assert bands[0].nodata == 9999.0
        assert bands[1].nodata == 9999.0
        assert bands[0].element == "TMIN"
        assert bands[0].unit == "C"
        assert bands[0].pdt == 8

    def test_spatial_diff_order1(self):
        b = grib.read_grib(f"{DATA}/spatial_differencing_order_1.grb2")[0]
        assert cs(b) == 46650

    def test_ieee754(self):
        for f in ("ieee754_single.grb2", "ieee754_double.grb2"):
            b = grib.read_grib(f"{DATA}/{f}")[0]
            assert cs(b) == 4727, f

    def test_png_packing(self):
        """MRMS EchoTop: template 5.41 with 16-bit grayscale PNG."""
        b = grib.read_grib(
            f"{DATA}/MRMS_EchoTop_18_00.50_20161015-133230.grib2")[0]
        assert cs(b) == 41854

    def test_nbits_zero_decimal_scaled(self):
        for f in ("simple_packing_nbits_zero_decimal_scaled.grb2",
                  "png_nbits_zero_decimal_scaled.grb2",
                  "jpeg2000_nbits_zero_decimal_scaled.grb2"):
            b = grib.read_grib(f"{DATA}/{f}")[0]
            assert cs(b) == 5, f

    def test_latlon_geotransform(self):
        b = grib.read_grib(f"{DATA}/minx_180.grib2")[0]
        gt = grib.geotransform(b)
        want = (-180.0625, 0.125, 0.0, 90.0625, 0.0, -0.125)
        assert max(abs(a - b_) for a, b_ in zip(gt, want)) <= 1e-6

    def test_constant_j2k_field(self):
        """CMC ICEC: template 5.40 with nbits=0 → constant, no J2K."""
        b = grib.read_grib(
            f"{DATA}/CMC_rdwps_lake-erie_ICEC_SFC_0_latlon0.05x0.05_"
            "2017111800_P000.grib2")[0]
        assert float(b.data.max()) == 0.0
        assert b.nx == 98 and b.ny == 35

    def test_one_value_and_nodata(self):
        b = grib.read_grib(f"{DATA}/one_value_and_nodata_points.grb2")[0]
        vals = sorted(np.unique(b.data).tolist())
        assert len(vals) == 2
        assert vals[0] == pytest.approx(0.01)
        assert vals[1] == 9999.0

    def test_jpeg2000_packing(self):
        """Template 5.40: J2K-packed fields decode through the in-repo
        T.800 codec — GDAL's test_grib_grib2_sidecar checksums."""
        bands = grib.read_grib(f"{DATA}/gfs.t06z.pgrb2.10p0.f010.grib2")
        assert len(bands) == 6
        assert cs(bands[0]) == 59985
        assert cs(bands[1]) == 59986
        assert cs(bands[5]) == 206

    def test_jpeg2000_satellite(self):
        """Template 4.32 HWRF brightness temperature, J2K packed —
        test_grib_grib2_read_template_4_32 pins."""
        import numpy as np

        bands = grib.read_grib(
            f"{DATA}/twenty-se27w.2017102006.hwrfsat.core.0p02."
            "f000_truncated.grb2")
        b = bands[0]
        assert (b.nx, b.ny) == (501, 501)
        assert cs(b) == 48230
        arr = np.asarray(b.data, dtype=float)
        assert float(np.nanmin(arr)) == pytest.approx(-9.765, rel=1e-3)
        assert float(np.nanmax(arr)) == pytest.approx(2.415, rel=1e-3)


class TestGrib1:
    def test_quikscat(self):
        """GRIB1: IBM floats, bitmap, degrib UNDEFINED=9.999e20 data /
        9999 nodata quirk (test_grib_2 pin)."""
        bands = grib.read_grib(f"{DATA}/Sample_QuikSCAT.grb")
        assert len(bands) == 4
        assert cs(bands[3]) == 50714
        assert bands[0].nodata == 9999.0

    def test_different_sizes(self):
        bands = grib.read_grib(f"{DATA}/bug3246.grb")
        assert len(bands) == 12
        sizes = {(b.nx, b.ny) for b in bands}
        assert len(sizes) > 1  # mixed grids survive


def test_tile_table():
    t = grib.load_grib(f"{DATA}/ds.mint.bin")
    assert t.num_rows >= 2
    assert set(t.column_names) >= {"band", "data"}
