"""VRT XML virtual raster (raster/vrt.py): gdalbuildvrt-style build,
parse, and distributed composed read (reference role: frmts/vrt +
apps/gdalbuildvrt_lib.cpp; format per the public VRT tutorial)."""

import os

import numpy as np
import pytest

from gdal_ray.raster import model
from gdal_ray.raster.gtiff import write_geotiff
from gdal_ray.raster.mosaic import mosaic_arrays
from gdal_ray.raster.vrt import build_vrt, parse_vrt, read_vrt


@pytest.fixture
def two_tifs(tmp_path):
    """Two overlapping same-height uint8 rasters whose union they
    fully cover (A left, B right, 20-px overlap)."""
    rng = np.random.default_rng(7)
    a = rng.integers(1, 255, size=(60, 80), dtype=np.uint8)
    b = rng.integers(1, 255, size=(60, 80), dtype=np.uint8)
    gt_a = (10.0, 0.1, 0.0, 50.0, 0.0, -0.1)
    gt_b = (16.0, 0.1, 0.0, 50.0, 0.0, -0.1)  # starts at px 60 of A
    pa_ = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    write_geotiff(pa_, [a], crs="EPSG:4326", geotransform=gt_a)
    write_geotiff(pb, [b], crs="EPSG:4326", geotransform=gt_b)
    return (pa_, a, gt_a), (pb, b, gt_b), tmp_path


class TestBuildParse:
    def test_union_layout_and_rects(self, two_tifs):
        (pa_, a, gt_a), (pb, b, gt_b), tmp = two_tifs
        vrt = str(tmp / "m.vrt")
        layout = build_vrt([pa_, pb], vrt)
        assert (layout["width"], layout["height"]) == (140, 60)
        assert layout["geotransform"][:2] == (10.0, 0.1)
        srcs = layout["bands"][0]["sources"]
        assert srcs[0]["dst_rect"] == (0, 0, 80, 60)
        assert srcs[1]["dst_rect"] == (60, 0, 80, 60)
        # relative filenames resolve against the VRT directory
        assert os.path.exists(srcs[0]["filename"])

    def test_mixed_resolution_rejected(self, two_tifs, tmp_path):
        (pa_, a, gt_a), _, tmp = two_tifs
        bad = str(tmp_path / "bad.tif")
        write_geotiff(bad, [a], crs="EPSG:4326",
                      geotransform=(0.0, 0.25, 0.0, 0.0, 0.0, -0.25))
        with pytest.raises(ValueError):
            build_vrt([pa_, bad], str(tmp_path / "x.vrt"))


class TestRead:
    def test_composed_read_matches_direct_mosaic(self, ray_session,
                                                 two_tifs):
        import pyarrow as pa

        (pa_, a, gt_a), (pb, b, gt_b), tmp = two_tifs
        vrt = str(tmp / "m.vrt")
        build_vrt([pa_, pb], vrt)
        ds = read_vrt(vrt, tile_size=64)
        table = pa.Table.from_pylist(ds.take_all())
        got = model.to_array(table, band=1)

        dst_gt = (10.0, 0.1, 0.0, 50.0, 0.0, -0.1)
        want = mosaic_arrays([(a, gt_a), (b, gt_b)], dst_gt, (60, 140))
        # to_array pads to the tile grid; compare the valid region
        np.testing.assert_array_equal(got[:60, :140], want)
        # later source painted over earlier in the 20-px overlap
        assert (got[:60, 60:80] == b[:, :20].astype(np.float64)).all()

    def test_foreign_vrt_subwindow_and_scaling(self, ray_session,
                                               two_tifs, tmp_path):
        import pyarrow as pa

        (pa_, a, gt_a), _, _ = two_tifs
        # SrcRect 20x10 window at (4,2), upsampled 2x into DstRect
        xml = f"""<VRTDataset rasterXSize="40" rasterYSize="20">
  <SRS>EPSG:4326</SRS>
  <GeoTransform>0, 1, 0, 0, 0, -1</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="0">{pa_}</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="4" yOff="2" xSize="20" ySize="10"/>
      <DstRect xOff="0" yOff="0" xSize="40" ySize="20"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>"""
        vp = str(tmp_path / "f.vrt")
        with open(vp, "w") as f:
            f.write(xml)
        ds = read_vrt(vp, tile_size=32)
        got = model.to_array(
            pa.Table.from_pylist(ds.take_all()), band=1)[:20, :40]
        # nearest 2x upsample of the source window
        want = np.kron(a[2:12, 4:24].astype(np.float64), np.ones((2, 2)))
        np.testing.assert_array_equal(got, want)

    def test_nodata_does_not_paint(self, ray_session, tmp_path):
        import pyarrow as pa

        base = np.full((32, 32), 7, dtype=np.uint8)
        top = np.full((32, 32), 9, dtype=np.uint8)
        top[:, :16] = 255  # nodata half
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        p1 = str(tmp_path / "base.tif")
        p2 = str(tmp_path / "top.tif")
        write_geotiff(p1, [base], crs="EPSG:4326", geotransform=gt,
                      nodata=255.0)
        write_geotiff(p2, [top], crs="EPSG:4326", geotransform=gt,
                      nodata=255.0)
        vrt = str(tmp_path / "n.vrt")
        build_vrt([p1, p2], vrt)
        got = model.to_array(pa.Table.from_pylist(
            read_vrt(vrt, tile_size=32).take_all()), band=1)
        assert (got[:, :16] == 7).all()   # top's nodata didn't paint
        assert (got[:, 16:] == 9).all()   # top painted over base


class TestCLI:
    def test_buildvrt_then_translate(self, tmp_path):
        import subprocess
        import sys

        from gdal_ray.raster.gtiff import decode_geotiff

        a = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
        p1 = str(tmp_path / "s.tif")
        write_geotiff(p1, [a], crs="EPSG:4326",
                      geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        vrt = str(tmp_path / "c.vrt")
        out = str(tmp_path / "o.tif")
        env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin"}
        r1 = subprocess.run(
            [sys.executable, "-m", "gdal_ray.cli", "raster", "buildvrt",
             vrt, p1], capture_output=True, env=env)
        assert r1.returncode == 0, r1.stderr
        r2 = subprocess.run(
            [sys.executable, "-m", "gdal_ray.cli", "raster", "translate",
             vrt, out, "--srcwin", "4", "4", "8", "8"],
            capture_output=True, env=env)
        assert r2.returncode == 0, r2.stderr
        g = decode_geotiff(open(out, "rb").read())
        np.testing.assert_array_equal(
            g["bands"][0], a[4:12, 4:12].astype(np.float64))


class TestComplexSource:
    def test_scale_ratio_offset(self, ray_session, tmp_path):
        import pyarrow as pa

        src = np.arange(64, dtype=np.uint8).reshape(8, 8)
        p = str(tmp_path / "s.tif")
        write_geotiff(p, [src], crs="EPSG:4326",
                      geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        xml = f"""<VRTDataset rasterXSize="8" rasterYSize="8">
  <SRS>EPSG:4326</SRS>
  <GeoTransform>0, 1, 0, 0, 0, -1</GeoTransform>
  <VRTRasterBand dataType="Float64" band="1">
    <ComplexSource>
      <SourceFilename relativeToVRT="0">{p}</SourceFilename>
      <SourceBand>1</SourceBand>
      <ScaleRatio>2.5</ScaleRatio>
      <ScaleOffset>100</ScaleOffset>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>"""
        vp = str(tmp_path / "c.vrt")
        with open(vp, "w") as f:
            f.write(xml)
        got = model.to_array(pa.Table.from_pylist(
            read_vrt(vp, tile_size=8).take_all()), band=1)
        np.testing.assert_allclose(got, src * 2.5 + 100.0)
        # single-process path agrees
        from gdal_ray.raster.vrt import read_vrt_array

        g = read_vrt_array(vp)
        np.testing.assert_allclose(g["bands"][0], src * 2.5 + 100.0)
