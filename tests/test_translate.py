"""gdal_translate core ops (-b -srcwin -projwin -outsize -scale -ot)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_ray.raster.translate import translate

GT = (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)


def _bands():
    y, x = np.mgrid[0:40, 0:50]
    return [(x + 100 * y).astype(np.int32), (x * 2 + y).astype(np.int32)]


class TestTranslate:
    def test_band_select_and_order(self):
        b, gt = translate(_bands(), GT, band_list=[2, 1])
        assert np.array_equal(b[0], _bands()[1])
        assert np.array_equal(b[1], _bands()[0])
        assert gt == GT

    def test_srcwin(self):
        b, gt = translate(_bands(), GT, srcwin=(5, 3, 10, 8))
        assert b[0].shape == (8, 10)
        assert b[0][0, 0] == 5 + 100 * 3
        assert gt == (1050.0, 10.0, 0.0, 1970.0, 0.0, -10.0)

    def test_projwin_equals_srcwin(self):
        """-projwin over exact pixel edges == the pixel window."""
        want, wgt = translate(_bands(), GT, srcwin=(5, 3, 10, 8))
        # ulx=1000+5*10, uly=2000-3*10, lrx=ulx+10*10, lry=uly-8*10
        got, ggt = translate(
            _bands(), GT, projwin=(1050.0, 1970.0, 1150.0, 1890.0))
        assert np.array_equal(got[0], want[0])
        assert ggt == wgt

    def test_srcwin_out_of_bounds_raises(self):
        with pytest.raises(ValueError, match="outside raster"):
            translate(_bands(), GT, srcwin=(45, 0, 10, 5))

    def test_outsize_percent_nearest(self):
        b, gt = translate(_bands(), GT, outsize=("50%", "50%"))
        assert b[0].shape == (20, 25)
        assert gt[1] == 20.0 and gt[5] == -20.0
        # nearest at 2x decimation picks the center-covering pixel
        src = _bands()[0]
        assert b[0][0, 0] in (src[0, 0], src[0, 1], src[1, 0], src[1, 1])

    def test_outsize_keep_ratio(self):
        b, _ = translate(_bands(), GT, outsize=(25, 0))
        assert b[0].shape == (20, 25)

    def test_scale_and_ot(self):
        src = [np.array([[0.0, 0.5, 1.0]])]
        b, _ = translate(src, GT, scale=(0.0, 1.0, 0.0, 200.0), ot="uint8")
        assert b[0].dtype == np.uint8
        assert b[0].tolist() == [[0, 100, 200]]

    def test_ot_half_away_rounding(self):
        """GDALCopyWords rounds .5 away from zero (kernels.set_type)."""
        src = [np.array([[0.5, 1.5, 2.5, -0.5]])]
        b, _ = translate(src, GT, ot="int16")
        assert b[0].tolist() == [[1, 2, 3, -1]]

    def test_dataset_roundtrip(self, ray_session):
        import ray.data as rd

        from gdal_ray.raster import model
        from gdal_ray.raster.translate import translate_dataset

        arr = _bands()[0]
        t = model.from_array(arr, "EPSG:4326", GT, tile_size=16)
        ds = rd.from_arrow(t)
        out = translate_dataset(ds, srcwin=(5, 3, 20, 16), tile_size=16)
        got = model.to_array(
            __import__("pyarrow").concat_tables(
                out.iter_batches(batch_format="pyarrow", batch_size=None)
            )
        )
        assert np.array_equal(got, arr[3:19, 5:25])


class TestRasterCLI:
    """gdal_translate / gdalwarp / COG CLI commands over byte.tif."""

    SRC = "/root/reference/autotest/gcore/data/byte.tif"

    def _run(self, *args):
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "gdal_ray.cli", *args],
            capture_output=True, text=True, cwd="/root/repo", timeout=200,
        )
        assert out.returncode == 0, out.stderr[-500:]
        return out.stdout

    def test_translate_cli(self, tmp_path):
        import os

        import numpy as np

        from gdal_ray.raster.gtiff import decode_geotiff

        if not os.path.exists(self.SRC):
            import pytest

            pytest.skip("reference data absent")
        dst = tmp_path / "half.tif"
        self._run("raster", "translate", self.SRC, str(dst),
                  "--outsize", "50%", "50%")
        g = decode_geotiff(dst.read_bytes())
        assert g["bands"][0].shape == (10, 10)
        assert g["geotransform"][1] == 120.0  # 60m * 2

    def test_warp_cli(self, tmp_path):
        import os

        from gdal_ray.raster.gtiff import decode_geotiff

        if not os.path.exists(self.SRC):
            import pytest

            pytest.skip("reference data absent")
        dst = tmp_path / "merc.tif"
        self._run("raster", "warp", self.SRC, str(dst),
                  "--t_srs", "EPSG:3857")
        g = decode_geotiff(dst.read_bytes())
        assert g["crs"] == "EPSG:3857"
        # WebMercator scale factor at byte.tif's latitude (~33.9N)
        assert 70 < g["geotransform"][1] < 76

    def test_cog_cli(self, tmp_path):
        import os

        import numpy as np

        from gdal_ray.raster.gtiff import decode_geotiff

        if not os.path.exists(self.SRC):
            import pytest

            pytest.skip("reference data absent")
        dst = tmp_path / "c.tif"
        self._run("raster", "cog", self.SRC, str(dst))
        src = decode_geotiff(open(self.SRC, "rb").read())
        got = decode_geotiff(dst.read_bytes())
        assert np.array_equal(got["bands"][0], src["bands"][0])
        assert got["crs"] == src["crs"]
