"""GeoPackage driver tests — autotest parity (poly_golden.gpkg is
the GPKG twin of poly.shp), write round-trip, sharded Dataset read."""

import glob
import os

import pyarrow as pa
import pytest

from gdal_ray import gpkg as G
from gdal_ray.geom import wkb as W

DATA = "/root/reference/autotest/ogr/data/gpkg"


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
class TestReferenceParity:
    def test_poly_golden(self):
        t = G.read_gpkg_local(f"{DATA}/poly_golden.gpkg")
        assert len(t) == 10
        assert (t.schema.metadata or {}).get(b"crs") == b"EPSG:27700"
        eas = t["EAS_ID"].to_pylist()
        assert sorted(e for e in eas if e < 170) == [158, 165, 166, 168, 169]
        assert all(
            g.as_py() is None or W.geometry_type(g.as_py()) == W.POLYGON
            for g in t["geometry"])

    def test_first_geometry_null(self):
        t = G.read_gpkg_local(f"{DATA}/first_geometry_null.gpkg")
        assert t["geometry"][0].as_py() is None

    def test_corpus(self):
        n = 0
        for p in sorted(glob.glob(f"{DATA}/*.gpkg")):
            for layer in G.feature_layers(p):
                G.read_gpkg_local(p, layer)
                n += 1
        assert n >= 8


class TestWrite:
    def _table(self):
        from gdal_ray.geom.wkb import point_wkb

        return pa.table({
            "name": pa.array(["a", "b", None]),
            "value": pa.array([1.5, 2.5, 3.5]),
            "geometry": pa.array(
                [point_wkb(1.0, 2.0), point_wkb(3.0, 4.0), None],
                pa.binary()),
        })

    def test_roundtrip(self, tmp_path):
        t = self._table()
        p = str(tmp_path / "out.gpkg")
        n = G.write_gpkg(t, p, layer="pts", crs="EPSG:4326")
        assert n == 3
        back = G.read_gpkg_local(p)
        assert back["name"].to_pylist() == ["a", "b", None]
        assert back["value"].to_pylist() == [1.5, 2.5, 3.5]
        assert back["geometry"].to_pylist() == t["geometry"].to_pylist()
        assert (back.schema.metadata or {}).get(b"crs") == b"EPSG:4326"
        import sqlite3

        con = sqlite3.connect(p)
        assert con.execute(
            "SELECT geometry_type_name FROM gpkg_geometry_columns"
        ).fetchone()[0] == "POINT"
        assert con.execute("PRAGMA application_id").fetchone()[0] == 1196444487

    def test_gpb_header_forms(self):
        from gdal_ray.geom.wkb import point_wkb

        wkb = point_wkb(7.0, 8.0)
        blob = G.make_gpb(wkb, 4326)
        assert blob[:2] == b"GP"
        assert G.parse_gpb(blob) == wkb
        # envelope indicator 1 (32-byte) headers strip correctly
        import struct

        env = struct.pack("<4d", 0, 0, 0, 0)
        blob2 = b"GP\x00\x03" + struct.pack("<i", 4326) + env + wkb
        assert G.parse_gpb(blob2) == wkb
        assert G.parse_gpb(None) is None


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
class TestDataset:
    def test_sharded_read(self, ray_session):
        ds = G.read_gpkg(f"{DATA}/poly_golden.gpkg", shards=4)
        rows = ds.take_all()
        assert len(rows) == 10
        assert sorted(r["EAS_ID"] for r in rows)[:3] == [158, 165, 166]

    def test_dataset_write(self, ray_session, tmp_path):
        import ray.data as rd
        from gdal_ray.geom.wkb import encode_points
        import numpy as np

        pts = rd.range(100).map_batches(
            lambda t: pa.table({
                "id": t["id"],
                "geometry": encode_points(
                    np.asarray(t["id"], float), np.asarray(t["id"], float)),
            }), batch_format="pyarrow")
        p = str(tmp_path / "pts.gpkg")
        n = G.write_gpkg(pts, p, layer="pts")
        assert n == 100
        assert G.read_gpkg_local(p).num_rows == 100
