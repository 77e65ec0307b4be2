"""TopoJSON driver — the reference's own expectations, verbatim."""

import math

import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as W
from gdal_ray.topojson import read_topojson, read_topojson_dataset

D = "/root/reference/autotest/ogr/data/topojson/"

_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
          5: "MULTILINESTRING", 6: "MULTIPOLYGON"}


def _fmt(v: float) -> str:
    return f"{int(v)}" if v == int(v) else f"{v:.15g}"


def _coords(c) -> str:
    return ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c)


def _wkt(buf: bytes) -> str:
    """Empty-aware 2-D WKT (GDAL EMPTY conventions)."""
    g = W.parse(bytes(buf))
    t = g["type"]
    name = _NAMES[t]
    if t == 1:
        x, y = g["coords"][0][:2]
        if math.isnan(x):
            return "POINT EMPTY"
        return f"POINT ({_coords([(x, y)])})"
    if t == 2:
        if len(g["coords"]) == 0:
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_coords(g['coords'])})"
    if t == 3:
        if not g["rings"]:
            return "POLYGON EMPTY"
        return "POLYGON (" + ",".join(
            f"({_coords(r)})" for r in g["rings"]) + ")"
    if not g["parts"]:
        return f"{name} EMPTY"
    if t == 4:
        return "MULTIPOINT (" + _coords(
            [p["coords"][0][:2] for p in g["parts"]]) + ")"
    if t == 5:
        return "MULTILINESTRING (" + ",".join(
            f"({_coords(p['coords'])})" for p in g["parts"]) + ")"
    return "MULTIPOLYGON (" + ",".join(
        "(" + ",".join(f"({_coords(r)})" for r in p["rings"]) + ")"
        for p in g["parts"]) + ")"


# test_ogr_topojson_objects_is_array's table, verbatim
EXPECTED = [
    ("foo", None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT (100 1010)"),
] + [(None, None, "LINESTRING EMPTY")] * 8 + [
    (None, "0", "LINESTRING EMPTY"),
    (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None, "POLYGON ((110 1100,110 1000,100 1000,100 1100,"
     "110 1100),(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON (((110 1100,110 1000,100 1000,"
     "100 1100,110 1100)),((101 1010,109 1010,109 1090,101 1090,"
     "101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000),(101 1010,101 1090,109 1090,109 1010,"
     "101 1010))"),
]


class TestTopoJSON:
    def test_objects_array_full_expectations_table(self):
        # ogr_topojson.py test_ogr_topojson_objects_is_array: two
        # layers, then all 35 (id, name, wkt) rows verbatim
        lyrs = read_topojson(D + "topojson1.topojson")
        assert list(lyrs) == ["a_layer", "TopoJSON"]
        a = lyrs["a_layer"]
        assert _wkt(a["geometry"][0].as_py()) == \
            "LINESTRING (100 1000,110 1000,110 1100)"
        t = lyrs["TopoJSON"]
        assert t.num_rows == len(EXPECTED)
        assert t.column_names[:2] == ["id", "name"]
        for i, (eid, ename, ewkt) in enumerate(EXPECTED):
            assert t["id"][i].as_py() == eid, i
            assert t["name"][i].as_py() == ename, i
            assert _wkt(t["geometry"][i].as_py()) == ewkt, i

    def test_objects_dict(self):
        # test_ogr_topojson_objects_is_dict
        lyrs = read_topojson(D + "topojson2.topojson")
        assert list(lyrs) == ["a_layer", "TopoJSON"]
        a = lyrs["a_layer"]
        assert a["id"][0].as_py() == "foo"
        assert a["name"][0].as_py() == "line"
        assert _wkt(a["geometry"][0].as_py()) == \
            "LINESTRING (100 1000,110 1000,110 1100)"
        assert _wkt(lyrs["TopoJSON"]["geometry"][0].as_py()) == \
            "LINESTRING (100 1000,110 1000,110 1100)"

    def test_no_transform_and_reversed_arc(self):
        # test_ogr_topojson_no_transform: raw positions, ~0 reversal
        lyrs = read_topojson(D + "topojson3.topojson")
        want = "LINESTRING (0 0,10 0,0 10,10 0,0 0)"
        assert _wkt(lyrs["a_layer"]["geometry"][0].as_py()) == want
        assert _wkt(lyrs["TopoJSON"]["geometry"][0].as_py()) == want

    def test_distributed_read(self, ray_session):
        ds = read_topojson_dataset([D + "topojson2.topojson",
                                    D + "topojson3.topojson"])
        t = pa.Table.from_pylist(ds.take_all())
        assert t.num_rows == 2
