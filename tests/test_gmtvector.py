"""OGR GMT ASCII vector driver — reference-fixture parity."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as W
from gdal_ray.gmtvector import read_gmt, write_gmt


class TestRead:
    def test_multi_fixture_reference_expectations(self):
        # ogr_gmt.py test_ogr_gmt_multis: two MULTILINESTRING
        # features with the exact parts and attribute values
        t = read_gmt("/root/reference/autotest/ogr/data/gmt/"
                     "test_multi.gmt")
        assert t.num_rows == 2
        assert t["name"].to_pylist() == ["feature 1", "feature 2"]
        assert t["id"].to_pylist() == [1, 2]
        g = W.parse(t["geometry"][0].as_py())
        assert g["type"] == 5
        np.testing.assert_allclose(
            g["parts"][0]["coords"], [[175, -45], [176, -45]])
        np.testing.assert_allclose(
            g["parts"][1]["coords"], [[180.0, -45.3], [179.0, -45.4]])
        g2 = W.parse(t["geometry"][1].as_py())
        np.testing.assert_allclose(
            g2["parts"][0]["coords"], [[175.1, -45.0], [175.2, -45.1]])


class TestRoundtrip:
    def test_poly_shp_through_gmt(self, tmp_path):
        # the reference's test 2 shape: poly.shp → .gmt → re-read,
        # EAS_ID order preserved and ring coordinates exact
        from gdal_ray.shapefile import read_shapefile_local

        src = read_shapefile_local(
            "/root/reference/autotest/ogr/data/poly.shp")
        p = str(tmp_path / "tpoly.gmt")
        write_gmt(p, src)
        back = read_gmt(p)
        assert back.num_rows == src.num_rows
        assert back["EAS_ID"].to_pylist() == src["EAS_ID"].to_pylist()
        assert back["PRFEDEA"].to_pylist() == \
            src["PRFEDEA"].to_pylist()
        for i in range(src.num_rows):
            a = W.parse(src["geometry"][i].as_py())
            b = W.parse(back["geometry"][i].as_py())
            assert a["type"] == b["type"]
            ra = a["rings"] if a["type"] == 3 else \
                [r for pp in a["parts"] for r in pp["rings"]]
            rb = b["rings"] if b["type"] == 3 else \
                [r for pp in b["parts"] for r in pp["rings"]]
            assert len(ra) == len(rb)
            for x, y in zip(ra, rb):
                np.testing.assert_allclose(x, y, rtol=1e-12)

    def test_point_and_hole_roundtrip(self, tmp_path):
        shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                         np.float64)
        hole = np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]],
                        np.float64)
        t = pa.table({
            "n": pa.array([7], pa.int64()),
            "geometry": pa.array([W.polygon_wkb(shell, [hole])],
                                 pa.binary()),
        })
        p = str(tmp_path / "h.gmt")
        write_gmt(p, t)
        back = read_gmt(p)
        g = W.parse(back["geometry"][0].as_py())
        assert len(g["rings"]) == 2
        np.testing.assert_allclose(g["rings"][1], hole)
        assert back["n"].to_pylist() == [7]
