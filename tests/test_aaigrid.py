"""AAIGrid driver (raster/aaigrid.py): reference-fixture checksum and
geotransform pins (autotest/gdrivers/aaigrid.py expectations) +
roundtrip + CLI integration."""

import numpy as np
import pytest

from gdal_ray.raster.aaigrid import (
    decode_aaigrid,
    encode_aaigrid,
    read_aaigrid,
)
from gdal_ray.raster.checksum import checksum_array

FIX = "/root/reference/autotest/gdrivers/data/aaigrid"


class TestReferenceFixtures:
    def test_byte_tif_grd_checksum(self):
        g = read_aaigrid(f"{FIX}/byte.tif.grd")
        assert checksum_array(g["bands"][0]) == 4672

    def test_pixel_per_line_checksum_and_gt(self):
        g = read_aaigrid(f"{FIX}/pixel_per_line.asc")
        assert checksum_array(g["bands"][0]) == 1123
        assert g["geotransform"] == (100000.0, 50.0, 0.0,
                                     650600.0, 0.0, -50.0)
        assert g["nodata"] == -99999.0

    def test_comma_decimal_variant(self):
        g = read_aaigrid(f"{FIX}/pixel_per_line_comma.asc")
        assert checksum_array(g["bands"][0]) == 1123

    def test_nan_nodata(self):
        g = read_aaigrid(f"{FIX}/nodata_nan.asc")
        assert np.isnan(g["nodata"])


class TestRoundtrip:
    def test_int_and_float(self):
        gt = (10.0, 2.0, 0.0, 20.0, 0.0, -2.0)
        ints = np.arange(12, dtype=np.int32).reshape(3, 4)
        g = decode_aaigrid(encode_aaigrid(ints, gt, nodata=-9999))
        np.testing.assert_array_equal(g["bands"][0], ints)
        assert g["geotransform"] == gt
        assert g["nodata"] == -9999.0
        floats = ints.astype(np.float64) / 3.0
        g2 = decode_aaigrid(encode_aaigrid(floats, gt))
        np.testing.assert_allclose(g2["bands"][0], floats, rtol=1e-5)

    def test_llcenter_offset(self):
        txt = ("ncols 2\nnrows 2\nxllcenter 10\nyllcenter 10\n"
               "cellsize 2\n1 2\n3 4\n")
        g = decode_aaigrid(txt)
        # center (10,10) -> corner (9,9); top y = 9 + 2*2 = 13
        assert g["geotransform"] == (9.0, 2.0, 0.0, 13.0, 0.0, -2.0)

    def test_rotation_rejected(self):
        with pytest.raises(ValueError):
            encode_aaigrid(np.zeros((2, 2)),
                           (0.0, 1.0, 0.1, 0.0, 0.0, -1.0))


class TestCLI:
    def test_dem_slope_from_asc(self, tmp_path):
        import subprocess
        import sys

        from gdal_ray.raster.aaigrid import write_aaigrid
        from gdal_ray.raster.gtiff import decode_geotiff

        y, x = np.mgrid[0:16, 0:16]
        dem = (x * 3.0).astype(np.float64)
        p = str(tmp_path / "dem.asc")
        write_aaigrid(p, dem, (0.0, 10.0, 0.0, 160.0, 0.0, -10.0))
        out = str(tmp_path / "s.tif")
        r = subprocess.run(
            [sys.executable, "-m", "gdal_ray.cli", "raster", "dem",
             "slope", p, out],
            capture_output=True,
            env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin"})
        assert r.returncode == 0, r.stderr
        g = decode_geotiff(open(out, "rb").read())
        want = np.degrees(np.arctan(0.3))
        np.testing.assert_allclose(g["bands"][0][1:-1, 1:-1], want,
                                   rtol=1e-6)


class TestFuzzRoundtrip:
    """Hypothesis: arbitrary grids survive the ASCII roundtrip."""

    from hypothesis import given, settings
    from hypothesis import strategies as st
    import hypothesis.extra.numpy as hnp

    @settings(max_examples=30, deadline=None)
    @given(hnp.arrays(np.int32, hnp.array_shapes(min_dims=2, max_dims=2,
                                                 min_side=1, max_side=12),
                      elements=st.integers(-10**6, 10**6)))
    def test_int_grids(self, arr):
        gt = (3.0, 0.5, 0.0, 9.0, 0.0, -0.5)
        g = decode_aaigrid(encode_aaigrid(arr, gt))
        np.testing.assert_array_equal(g["bands"][0], arr)
        assert g["geotransform"] == gt


class TestXYZ:
    """XYZ ASCII grid (frmts/xyz role): byte.tif cross-driver
    checksum pin (the reference's test_xyz_1 CreateCopy contract) +
    geotransform recovery."""

    def test_byte_tif_roundtrip(self):
        from gdal_ray.raster.aaigrid import decode_xyz, encode_xyz
        from gdal_ray.raster.gtiff import decode_geotiff

        g = decode_geotiff(open(
            "/root/reference/autotest/gcore/data/byte.tif", "rb").read())
        rt = decode_xyz(encode_xyz(g["bands"][0], g["geotransform"]))
        assert checksum_array(rt["bands"][0]) == 4672
        np.testing.assert_allclose(rt["geotransform"],
                                   g["geotransform"])

    def test_irregular_grid_rejected(self):
        from gdal_ray.raster.aaigrid import decode_xyz

        with pytest.raises(ValueError):
            decode_xyz("0 0 1\n1 0 2\n0 1 3\n")  # 2x2 minus a corner

    def test_header_lines_skipped(self):
        from gdal_ray.raster.aaigrid import decode_xyz

        g = decode_xyz("X Y Z\n0 0 5\n1 0 6\n0 1 7\n1 1 8\n")
        np.testing.assert_array_equal(g["bands"][0],
                                      [[7, 8], [5, 6]])
