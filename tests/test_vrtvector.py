"""OGR VRT virtual vector driver — the reference's own
autotest/ogr/data/vrt fixtures (PointFromColumns / WKT geometry
fields, SrcSQL, field subset, FID renames, inline CDATA nested VRT)
plus warped- and union-layer documents."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as W
from gdal_ray.geom.wkt import to_wkt
from gdal_ray.vrtvector import read_vrt_vector, vrt_layers

V = "/root/reference/autotest/ogr/data/vrt"


def _tbl(path, layer=None):
    return pa.concat_tables(read_vrt_vector(path, layer=layer)
                            .iter_batches(batch_format="pyarrow",
                                          batch_size=None))


class TestFixtures:
    def test_layer_listing(self):
        assert vrt_layers(f"{V}/vrt_test.vrt") == [
            "test2", "test3", "test4", "test5", "test6", "test7",
            "test8"]

    def test_poly_passthrough(self):
        t = _tbl(f"{V}/poly_vrt.vrt")
        assert t.num_rows == 10
        from gdal_ray.shapefile import read_shapefile_local

        s = read_shapefile_local(
            "/root/reference/autotest/ogr/data/poly.shp")
        assert t.column("geometry").to_pylist() == \
            s.column("geometry").to_pylist()

    def test_point_from_columns(self):
        t = _tbl(f"{V}/vrt_test.vrt", "test2")
        assert to_wkt(t.column("geometry")[0].as_py()) == \
            "POINT Z (12.5 17 1.2)"
        assert to_wkt(t.column("geometry")[1].as_py()) == \
            "POINT Z (100 200 0)"

    def test_wkt_field(self):
        t = _tbl(f"{V}/vrt_test.vrt", "test3")
        assert to_wkt(t.column("geometry")[0].as_py()) == \
            "POINT Z (12.5 17 1.2)"
        # the WKT source column is consumed
        assert "wkt" not in t.schema.names

    def test_src_sql(self):
        t = _tbl(f"{V}/vrt_test.vrt", "test4")
        assert t.num_rows == 2
        assert to_wkt(t.column("geometry")[0].as_py()) == \
            "POINT Z (12.5 17 1.2)"

    def test_field_subset(self):
        t = _tbl(f"{V}/vrt_test.vrt", "test6")
        assert t.schema.names == ["fid", "x"]
        assert t.column("x").to_pylist() == [12.5, 100.0]

    def test_fid_rename(self):
        t = _tbl(f"{V}/vrt_test.vrt", "test7")
        assert t.schema.names == ["bar", "x"]
        assert t.column("bar").to_pylist() == [1, 2]

    def test_inline_cdata_nested_vrt(self):
        t = _tbl(f"{V}/vrt_test.vrt", "test8")
        assert t.num_rows == 2
        assert "bar" in t.schema.names


class TestComposed:
    def test_warped_layer(self, tmp_path):
        doc = f"""<OGRVRTDataSource>
  <OGRVRTWarpedLayer>
    <OGRVRTLayer name="pts">
      <SrcDataSource>{V}/../flat.dbf</SrcDataSource>
      <GeometryField encoding="PointFromColumns" x="x" y="y"/>
    </OGRVRTLayer>
    <TargetSRS>EPSG:3857</TargetSRS>
    <SrcSRS>EPSG:4326</SrcSRS>
  </OGRVRTWarpedLayer>
</OGRVRTDataSource>"""
        p = tmp_path / "warp.vrt"
        p.write_text(doc)
        t = _tbl(str(p))
        g = W.parse(t.column("geometry")[0].as_py())
        # closed-form WebMercator of (12.5, 17)
        from gdal_ray.proj.transformer import Transformer

        tr = Transformer.from_crs("EPSG:4326", "EPSG:3857")
        ex, ey = tr.transform(np.array([12.5]), np.array([17.0]))
        assert np.allclose(g["coords"][0], [ex[0], ey[0]])

    def test_union_layer(self, tmp_path):
        doc = f"""<OGRVRTDataSource>
  <OGRVRTUnionLayer name="u">
    <OGRVRTLayer name="a">
      <SrcDataSource>{V}/../poly.shp</SrcDataSource>
    </OGRVRTLayer>
    <OGRVRTLayer name="b">
      <SrcDataSource>{V}/../poly.shp</SrcDataSource>
    </OGRVRTLayer>
  </OGRVRTUnionLayer>
</OGRVRTDataSource>"""
        p = tmp_path / "union.vrt"
        p.write_text(doc)
        assert _tbl(str(p)).num_rows == 20

    def test_errors(self, tmp_path):
        p = tmp_path / "bad.vrt"
        p.write_text("<NotVRT/>")
        with pytest.raises(ValueError):
            read_vrt_vector(str(p))
        p2 = tmp_path / "nolayer.vrt"
        p2.write_text("<OGRVRTDataSource/>")
        with pytest.raises(ValueError):
            read_vrt_vector(str(p2))
