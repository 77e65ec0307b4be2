"""GeoJSON / GeoJSONSeq / CSV driver tests — geometry conversion
round-trips and Dataset-level read/write."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray import formats as F
from gdal_ray.geom import wkb as W
from gdal_ray.geom.wkt import from_wkt, to_wkt

GEOMS = [
    {"type": "Point", "coordinates": [1.5, 2.5]},
    {"type": "Point", "coordinates": [1.0, 2.0, 3.0]},
    {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]},
    {"type": "Polygon",
     "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                     [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]},
    {"type": "MultiPoint", "coordinates": [[0, 0], [1, 2]]},
    {"type": "MultiLineString",
     "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]},
    {"type": "MultiPolygon",
     "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 0]]],
                     [[[5, 5], [6, 5], [6, 6], [5, 5]]]]},
    {"type": "GeometryCollection",
     "geometries": [{"type": "Point", "coordinates": [9, 9]},
                    {"type": "LineString",
                     "coordinates": [[0, 0], [1, 0]]}]},
]


def _norm(g):
    """Normalize coordinates to float lists for comparison."""
    return json.loads(json.dumps(g))


class TestGeometryConversion:
    @pytest.mark.parametrize("g", GEOMS, ids=lambda g: g["type"])
    def test_roundtrip(self, g):
        buf = F.geojson_geom_to_wkb(g)
        back = F.wkb_to_geojson_geom(buf)
        assert _norm(back) == _norm(g)

    def test_z_multipoint_iso_code(self):
        g = {"type": "MultiPoint", "coordinates": [[1, 2, 3], [4, 5, 6]]}
        buf = F.geojson_geom_to_wkb(g)
        assert int.from_bytes(buf[1:5], "little") == 1004  # ISO Z
        assert _norm(F.wkb_to_geojson_geom(buf)) == _norm(g)

    def test_curve_linearized_on_export(self):
        # CircularString via WKT → GeoJSON must come out as LineString
        buf = from_wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")
        g = F.wkb_to_geojson_geom(buf)
        assert g["type"] == "LineString"
        pts = np.array(g["coordinates"])
        # all points on the circle centered (1,0) radius 1
        r = np.hypot(pts[:, 0] - 1.0, pts[:, 1])
        np.testing.assert_allclose(r, 1.0, atol=1e-9)


class TestDatasetIO:
    def test_read_geojson(self, ray_session, tmp_path):
        fc = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "geometry": GEOMS[0],
                 "properties": {"name": "a", "v": 1}},
                {"type": "Feature", "geometry": GEOMS[3],
                 "properties": {"name": "b", "v": 2}},
                {"type": "Feature", "geometry": None,
                 "properties": {"name": "c", "v": 3}},
            ],
        }
        p = tmp_path / "fc.geojson"
        p.write_text(json.dumps(fc))
        ds = F.read_geojson(str(p))
        rows = sorted(ds.take_all(), key=lambda r: r["name"])
        assert [r["v"] for r in rows] == [1, 2, 3]
        assert rows[2]["geometry"] is None
        assert W.geometry_type(rows[1]["geometry"]) == W.POLYGON

    def test_seq_write_read_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "geometry": pa.array(
                [F.geojson_geom_to_wkb(GEOMS[0]),
                 F.geojson_geom_to_wkb(GEOMS[2]), None], pa.binary()),
        })
        out = str(tmp_path / "seq")
        n = F.write_geojson_seq(rd.from_arrow(t), out)
        assert n == 3
        back = F.read_geojson_seq(
            [os.path.join(out, f) for f in sorted(os.listdir(out))]
        )
        rows = sorted(back.take_all(), key=lambda r: r["id"])
        assert [r["id"] for r in rows] == [1, 2, 3]
        assert rows[0]["geometry"] == t["geometry"][0].as_py()
        assert rows[2]["geometry"] is None

    def test_write_geojson_single_file(self, ray_session, tmp_path):
        import ray.data as rd

        t = pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "geometry": pa.array(
                [F.geojson_geom_to_wkb(GEOMS[0]),
                 F.geojson_geom_to_wkb(GEOMS[4])], pa.binary()),
        })
        path = str(tmp_path / "out.geojson")
        n = F.write_geojson(rd.from_arrow(t), path)
        assert n == 2
        obj = json.loads(open(path).read())
        assert obj["type"] == "FeatureCollection"
        assert len(obj["features"]) == 2
        assert {f["properties"]["id"] for f in obj["features"]} == {1, 2}

    def test_csv_geom_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        wkts = ["POINT (1.5 2.5)", "LINESTRING (0 0, 1 1)", None]
        src = tmp_path / "in.csv"
        src.write_text(
            "id,WKT\n" + "\n".join(
                f"{i},\"{w}\"" if w else f"{i},"
                for i, w in enumerate(wkts)) + "\n")
        ds = F.read_csv_geom(str(src))
        rows = sorted(ds.take_all(), key=lambda r: r["id"])
        assert to_wkt(rows[0]["geometry"]) == "POINT (1.5 2.5)"
        assert rows[2]["geometry"] is None
        out = str(tmp_path / "outcsv")
        F.write_csv_geom(rd.from_arrow(pa.table({
            "id": [0, 1],
            "geometry": pa.array([rows[0]["geometry"],
                                  rows[1]["geometry"]], pa.binary()),
        })), out)
        import glob

        txt = "".join(open(f).read() for f in glob.glob(out + "/*"))
        assert "POINT (1.5 2.5)" in txt


class TestScanParquetFiles:
    """sources.scan_parquet_files == read_parquet on the same shards."""

    def test_matches_read_parquet(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from gdal_ray.sources import scan_parquet_files

        for s in range(3):
            t = pa.table(
                {"a": list(range(s * 10, s * 10 + 10)), "b": [f"x{i}" for i in range(10)]}
            )
            pq.write_table(t, tmp_path / f"p{s}.parquet")
        paths = sorted(str(tmp_path / f) for f in os.listdir(tmp_path))
        got = (
            scan_parquet_files(paths, columns=["a"], num_blocks=2)
            .to_pandas()
            .sort_values("a")
            .reset_index(drop=True)
        )
        want = (
            rd.read_parquet(paths, columns=["a"])
            .to_pandas()
            .sort_values("a")
            .reset_index(drop=True)
        )
        assert got.equals(want)

    def test_fuse_runs_inside_scan(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gdal_ray.sources import scan_parquet_files

        pq.write_table(pa.table({"a": [1, 2, 3]}), tmp_path / "one.parquet")

        def fuse(t, mult=1):
            import pyarrow.compute as pc

            return t.set_column(0, "a", pc.multiply(t["a"], mult))

        df = scan_parquet_files(
            [str(tmp_path / "one.parquet")], fuse=fuse, fuse_kwargs={"mult": 10}
        ).to_pandas()
        assert sorted(df["a"]) == [10, 20, 30]

    def test_filters_pushdown(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gdal_ray.sources import scan_parquet_files

        t = pa.table({"a": list(range(100)), "lang": ["en", "fr"] * 50})
        pq.write_table(t, tmp_path / "f.parquet", row_group_size=10)
        df = scan_parquet_files(
            [str(tmp_path / "f.parquet")],
            columns=["a"],
            filters=[("lang", "=", "en")],
        ).to_pandas()
        assert len(df) == 50 and (df["a"] % 2 == 0).all()
