"""STACTA reader — autotest parity (gdrivers/stacta.py
test_stacta_basic): test.json level 2 = 2048x1024x3, gt
(-180, 0.17578125, ...), bands equal to the direct two-tile mosaic;
pyramid levels."""

import numpy as np
import pytest

from gdal_ray.raster import gtiff
from gdal_ray.raster.stacta import read_stacta

S = "/root/reference/autotest/gdrivers/data/stacta"


class TestSTACTA:
    def test_basic(self):
        d = read_stacta(f"{S}/test.json")
        assert len(d["bands"]) == 3
        assert d["bands"][0].shape == (1024, 2048)
        assert d["crs"] == "EPSG:4326"
        assert d["nodata"] == 0.0
        assert d["levels"] == 3
        assert d["geotransform"] == pytest.approx(
            (-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125),
            rel=1e-8)

    def test_equals_direct_mosaic(self):
        d = read_stacta(f"{S}/test.json")
        t0 = gtiff.decode_geotiff(
            open(f"{S}/WorldCRS84Quad/2/0/0.tif", "rb").read())
        t1 = gtiff.decode_geotiff(
            open(f"{S}/WorldCRS84Quad/2/0/1.tif", "rb").read())
        for b in range(3):
            ref = np.hstack([t0["bands"][b], t1["bands"][b]])
            assert (d["bands"][b] == ref).all()

    def test_pyramid_levels(self):
        assert read_stacta(f"{S}/test.json",
                           level=1)["bands"][0].shape == (512, 1024)
        assert read_stacta(f"{S}/test.json",
                           level=0)["bands"][0].shape == (256, 512)
