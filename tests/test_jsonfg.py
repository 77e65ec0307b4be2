"""JSON-FG driver tests, pinned to the reference's autotest
expectations (autotest/ogr/ogr_jsonfg.py) over its own fixture files
(autotest/ogr/data/jsonfg/*)."""

import json
import os

import pyarrow as pa
import pytest

from gdal_ray.geom import wkt as gwkt
from gdal_ray.jsonfg import (jsonfg_layers, parse_coordrefsys,
                             parse_jsonfg, read_jsonfg, write_jsonfg)

DATA = "/root/reference/autotest/ogr/data/jsonfg"


def _norm(w):
    return w.replace(", ", ",")


def _read(name, layer=None):
    with open(os.path.join(DATA, name), "rb") as f:
        return parse_jsonfg(f.read(), layer=layer)


# ---------------------------------------------------------------------------
# coordRefSys parsing (ogr_jsonfg.py valid/invalid matrices)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("v,code,epoch", [
    ("[EPSG:32631]", 32631, None),
    ("http://www.opengis.net/def/crs/EPSG/0/32631", 32631, None),
    ({"type": "Reference", "href": "[EPSG:32631]"}, 32631, None),
    ({"type": "Reference",
      "href": "http://www.opengis.net/def/crs/EPSG/0/32631"}, 32631, None),
    ({"type": "Reference", "href": "[EPSG:4326]", "epoch": 2023.4},
     4326, 2023.4),
    (["[EPSG:4258]", "[EPSG:7837]"], 4258, None),
    (["http://www.opengis.net/def/crs/EPSG/0/4258", "[EPSG:7837]"],
     4258, None),
    ([{"type": "Reference", "href": "[EPSG:4258]", "epoch": 2023.4},
      "http://www.opengis.net/def/crs/EPSG/0/7837"], 4258, 2023.4),
])
def test_coordrefsys_valid(v, code, epoch):
    c, e, ok = parse_coordrefsys(v)
    assert ok and c == code and e == epoch


@pytest.mark.parametrize("v", [
    12, "", "[", "[]", "[EPSG]", "[EPSG:]", "[EPSG:0]",
    "http://www.opengis.net/def/crs/EPSG/0/0",
    {}, {"type": None}, {"type": 12}, {"type": "invalid"},
    {"type": "Reference"}, {"type": "Reference", "href": 12},
    {"type": "Reference", "href": "[EPSG:32631]", "epoch": "invalid"},
    [], ["[EPSG:32631]"], ["[EPSG:32631]", "[EPSG:32631]", "[EPSG:32631]"],
])
def test_coordrefsys_invalid(v):
    c, e, ok = parse_coordrefsys(v)
    assert not ok


# ---------------------------------------------------------------------------
# geometry vs place vs coordRefSys (the crs_* fixture matrix)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filename,crs,x,y", [
    ("crs_32631_fc_only.json", "EPSG:32631", 500000, 4500000),
    ("crs_32631_feat.json", "EPSG:32631", 500000, 4500000),
    ("crs_32631_fc_and_feat.json", "EPSG:32631", 500000, 4500000),
    ("crs_32631_fc_place_null.json", "EPSG:32631", 500000, 0),
    ("crs_32631_fc_geometry_null.json", "EPSG:32631", 500000, 4500000),
    ("crs_32631_fc_4326_feat.json", "EPSG:4326", 3, 0),
    ("crs_32631_feat_only.json", "EPSG:32631", 500000, 4500000),
    ("crs_32631_geom_only.json", "EPSG:32631", 500000, 4500000),
    ("crs_32631_fc_mixed_feat.json", "EPSG:32631",
     [500000, 0], [0, 0]),
    ("crs_none_fc_mixed_feat.json", None, [3, 0], [0, 10000000]),
    ("crs_4326_fc_only.json", "EPSG:4326", 2, 49),
    ("crs_4326_fc_and_feat.json", "EPSG:4326", 2, 49),
    ("crs_4326_fc_place_null.json", "EPSG:4326", 2, 49),
    ("crs_4326_fc_32631_feat.json", "EPSG:32631", 500000, 0),
    ("crs_4326_feat_only.json", "EPSG:4326", 2, 49),
    ("crs_none.json", "EPSG:4326", 2, 49),
    ("crs_none_fc_mixed_feat_no_conformsTo.json", "EPSG:4326", 2, 49),
])
def test_crs_matrix(filename, crs, x, y):
    t, meta = _read(filename)
    assert meta["crs"] == crs
    xs = x if isinstance(x, list) else [x]
    ys = y if isinstance(y, list) else [y]
    for i, (ex, ey) in enumerate(zip(xs, ys)):
        w = gwkt.to_wkt(t["geometry"][i].as_py())
        gx, gy = (float(v) for v in
                  w.split("(")[1].rstrip(")").split(",")[0].split())
        assert gx == pytest.approx(ex, abs=1e-6), filename
        assert gy == pytest.approx(ey, abs=1e-6), filename


def test_mixed_feat_crs_column():
    t, meta = _read("crs_none_fc_mixed_feat.json")
    assert meta["crs"] is None
    assert t["jsonfg_crs"].to_pylist() == ["EPSG:4326", "EPSG:32731"]


def test_invalid_crs_meta():
    doc = {"type": "FeatureCollection",
           "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
           "coordRefSys": "[EPSG:0]",
           "features": [{"type": "Feature", "properties": {},
                         "geometry": None}]}
    t, meta = parse_jsonfg(json.dumps(doc))
    assert not meta["crs_valid"]
    assert meta["crs"] is None


# ---------------------------------------------------------------------------
# featureType layers
# ---------------------------------------------------------------------------


def test_two_feature_types():
    _, meta = _read("two_feature_types.json", layer="type1")
    assert meta["layers"] == ["type1", "type2"]
    t, _ = _read("two_feature_types.json", layer="type1")
    assert t.num_rows == 2
    # mixed int/str promotes to string, the reference's field-type rule
    assert t["foo"].to_pylist() == ["1", "bar"]
    assert t["fid"].to_pylist() == [1, 2]
    t2, _ = _read("two_feature_types.json", layer="type2")
    assert t2.num_rows == 1
    assert t2["bar"].to_pylist() == ["baz"]
    with pytest.raises(ValueError):
        _read("two_feature_types.json")


def test_feature_type_top_level():
    assert jsonfg_layers(
        os.path.join(DATA, "feature_type_top_level.json")) == ["type1"]


# ---------------------------------------------------------------------------
# curve geometry table (ogr_jsonfg.py test_jsonfg_read_write_geoms)
# ---------------------------------------------------------------------------

CURVE_WKT = [
    ["CircularString", "CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5)"],
    ["CircularStringZ",
     "CIRCULARSTRING Z (2.5 49.5 10.5,3.5 50.5 11.5,4.5 49.5 12.5)"],
    ["CircularStringM",
     "CIRCULARSTRING M (2.5 49.5 100.5,3.5 50.5 101.5,4.5 49.5 102.5)"],
    ["CircularStringZM",
     "CIRCULARSTRING ZM (2.5 49.5 10.5 100.5,3.5 50.5 11.5 101.5,"
     "4.5 49.5 12.5 102.5)"],
    ["CompoundCurve",
     "COMPOUNDCURVE (CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5),"
     "(4.5 49.5,5.5 50.5))"],
    ["CompoundCurveZ",
     "COMPOUNDCURVE Z (CIRCULARSTRING Z (2.5 49.5 10.5,3.5 50.5 11.5,"
     "4.5 49.5 12.5),(4.5 49.5 12.5,5.5 50.5 13.5))"],
    ["MultiCurve",
     "MULTICURVE (CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5),"
     "(4.5 49.5,5.5 50.5),COMPOUNDCURVE ((2.5 49.5,3.5 50.5),"
     "(3.5 50.5,4.5 49.5)))"],
    ["MultiSurface",
     "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (10.5 10.5,10.5 20.5,"
     "20.5 20.5,20.5 10.5,10.5 10.5)),((100 100,100 200,200 200,"
     "100 100)))"],
    ["MultiSurfaceZ",
     "MULTISURFACE Z (CURVEPOLYGON Z (CIRCULARSTRING Z (10.5 10.5 11.5,"
     "10.5 20.5 12.5,20.5 20.5 13.5,20.5 10.5 14.5,10.5 10.5 11.5)),"
     "((100 100 10.5,100 200 11.5,200 200 12.5,100 100 10.5)))"],
    ["CurvePolygon",
     "CURVEPOLYGON ((10.5 10.5,10.5 20.5,20.5 20.5,20.5 10.5,10.5 10.5),"
     "CIRCULARSTRING (11.5 15.5,15.5 19.5,19.5 15.5,15.5 11.5,"
     "11.5 15.5),COMPOUNDCURVE ((13.5 13.5,13.5 17.5,17.5 17.5),"
     "(17.5 17.5,17.5 13.5,13.5 13.5)))"],
]


@pytest.mark.parametrize("filename,expected", CURVE_WKT)
def test_curve_geometries(filename, expected):
    t, _ = _read(filename + ".json")
    assert _norm(gwkt.to_wkt(t["geometry"][0].as_py())) == expected


@pytest.mark.parametrize("filename", [
    "CompoundCurveBadChild", "CurvePolygonBadChild", "MultiCurveBadChild",
    "MultiSurfaceBadChild"])
def test_curve_bad_children(filename):
    # invalid child type -> null geometry, feature still read
    # (the reference warns; test_jsonfg_read_bad_geoms)
    t, _ = _read(filename + ".json")
    assert t.num_rows == 1
    assert t["geometry"][0].as_py() is None


# ---------------------------------------------------------------------------
# Prism extrusion (pylon / fence / prism_with_polygon_base)
# ---------------------------------------------------------------------------


def test_prism_point_base():
    t, _ = _read("pylon.json")
    assert _norm(gwkt.to_wkt(t["geometry"][0].as_py())) == (
        "LINESTRING Z (81220.15 455113.71 2.02,81220.15 455113.71 8.02)")
    # open-ended interval: end is NULL
    assert t["time_start"].to_pylist() == ["2022/07/12 16:47:18+00"]
    assert t["time_end"].to_pylist() == [None]
    assert t["fid"].to_pylist() == ["pylon.1"]


def test_prism_line_base():
    t, _ = _read("fence.json")
    assert _norm(gwkt.to_wkt(t["geometry"][0].as_py())) == (
        "MULTIPOLYGON Z (((81220.15 455113.71 2.02,"
        "81223.15 455116.71 2.02,81223.15 455116.71 3.22,"
        "81220.15 455113.71 3.22,81220.15 455113.71 2.02)))")


def test_prism_polygon_base():
    t, _ = _read("prism_with_polygon_base.json")
    assert _norm(gwkt.to_wkt(t["geometry"][0].as_py())) == (
        "POLYHEDRALSURFACE Z (((0 0 10,1 0 10,0 2 10,0 0 10)),"
        "((0 0 10,1 0 10,1 0 20,0 0 20,0 0 10)),"
        "((1 0 10,0 2 10,0 2 20,1 0 20,1 0 10)),"
        "((0 2 10,0 0 10,0 0 20,0 2 20,0 2 10)),"
        "((0 0 20,1 0 20,0 2 20,0 0 20)))")


# ---------------------------------------------------------------------------
# time handling (ogr_jsonfg.py test_jsonfg_read_time matrix)
# ---------------------------------------------------------------------------


def _time_doc(time_values):
    return json.dumps({
        "type": "FeatureCollection",
        "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
        "features": [{"type": "Feature", "properties": {},
                      "geometry": None, "time": tv}
                     for tv in time_values]})


@pytest.mark.parametrize("time_values,expected_cols,expected", [
    ([{"date": "2023-06-05"}], ["time"], [{"time": "2023/06/05"}]),
    ([{"timestamp": "2023-06-05T12:34:56Z"}], ["time"],
     [{"time": "2023/06/05 12:34:56+00"}]),
    ([{"interval": ["2023-06-05", "2023-06-06"]}],
     ["time_start", "time_end"],
     [{"time_start": "2023/06/05", "time_end": "2023/06/06"}]),
    ([{"interval": ["2023-06-05", ".."]}], ["time_start", "time_end"],
     [{"time_start": "2023/06/05", "time_end": None}]),
    ([{"interval": ["..", "2023-06-06"]}], ["time_start", "time_end"],
     [{"time_start": None, "time_end": "2023/06/06"}]),
    ([{"interval": ["2023-06-05T12:34:56Z", "2023-06-06T12:34:56Z"]}],
     ["time_start", "time_end"],
     [{"time_start": "2023/06/05 12:34:56+00",
       "time_end": "2023/06/06 12:34:56+00"}]),
    ([{"date": "2023-06-05"}, {"timestamp": "2023-06-05T12:34:56Z"}],
     ["time"],
     [{"time": "2023/06/05 00:00:00"},
      {"time": "2023/06/05 12:34:56+00"}]),
    ([{"interval": ["2023-06-05", "2023-06-06"]},
      {"interval": ["2023-06-05T12:34:56Z", "2023-06-06T12:34:56Z"]}],
     ["time_start", "time_end"],
     [{"time_start": "2023/06/05 00:00:00",
       "time_end": "2023/06/06 00:00:00"},
      {"time_start": "2023/06/05 12:34:56+00",
       "time_end": "2023/06/06 12:34:56+00"}]),
])
def test_time_matrix(time_values, expected_cols, expected):
    t, _ = parse_jsonfg(_time_doc(time_values))
    for col in expected_cols:
        assert col in t.column_names
    for i, exp in enumerate(expected):
        for col, val in exp.items():
            assert t[col][i].as_py() == val


def test_time_name_collision():
    doc = json.dumps({
        "type": "FeatureCollection",
        "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
        "features": [{"type": "Feature",
                      "properties": {"time": "my_time"},
                      "geometry": None,
                      "time": {"date": "2023-06-05"}}]})
    t, _ = parse_jsonfg(doc)
    assert t["time"].to_pylist() == ["my_time"]
    assert t["jsonfg_time"].to_pylist() == ["2023/06/05"]


# ---------------------------------------------------------------------------
# writer round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wkt", [
    "POINT (1.5 2.5)",
    "POINT Z (1.5 2.5 3.5)",
    "POINT M (1.5 2.5 4.5)",
    "POINT ZM (1.5 2.5 3.5 4.5)",
    "LINESTRING (1 2,3 4)",
    "POLYGON ((0 0,0 1,1 1,0 0))",
    "CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5)",
    "COMPOUNDCURVE (CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5),"
    "(4.5 49.5,5.5 50.5))",
    "MULTICURVE (CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5),"
    "(4.5 49.5,5.5 50.5))",
    "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (10.5 10.5,10.5 20.5,"
    "20.5 20.5,20.5 10.5,10.5 10.5)),((100 100,100 200,200 200,"
    "100 100)))",
    "POLYHEDRALSURFACE Z (((0 0 10,0 1 10,1 1 10,0 0 10)))",
])
def test_write_read_roundtrip(tmp_path, wkt):
    t = pa.table({"name": ["a"],
                  "geometry": pa.array([gwkt.from_wkt(wkt)], pa.binary())})
    path = str(tmp_path / "out.json")
    assert write_jsonfg(t, path) == 1
    with open(path, "rb") as f:
        back, meta = parse_jsonfg(f.read())
    assert _norm(gwkt.to_wkt(back["geometry"][0].as_py())) == _norm(wkt)
    assert back["name"].to_pylist() == ["a"]


def test_write_projected_place(tmp_path):
    """Projected CRS: place carries native coords, geometry the CRS84
    reprojection (the reference writer's 32631 row: 500000,0 -> 3,0)."""
    t = pa.table({"geometry": pa.array(
        [gwkt.from_wkt("POINT (500000 0)")], pa.binary())})
    path = str(tmp_path / "out.json")
    write_jsonfg(t, path, crs="EPSG:32631")
    doc = json.load(open(path))
    assert doc["coordRefSys"] == (
        "http://www.opengis.net/def/crs/EPSG/0/32631")
    f = doc["features"][0]
    assert f["place"]["coordinates"] == [500000, 0]
    gx, gy = f["geometry"]["coordinates"]
    assert gx == pytest.approx(3, abs=1e-7)
    assert gy == pytest.approx(0, abs=1e-7)
    # and reading it back selects place in the declared CRS
    with open(path, "rb") as fh:
        back, meta = parse_jsonfg(fh.read())
    assert meta["crs"] == "EPSG:32631"
    w = gwkt.to_wkt(back["geometry"][0].as_py())
    assert w == "POINT (500000 0)"


def test_write_geographic_no_place(tmp_path):
    t = pa.table({"geometry": pa.array(
        [gwkt.from_wkt("POINT (2 49)")], pa.binary())})
    path = str(tmp_path / "out.json")
    write_jsonfg(t, path, crs="EPSG:4326")
    doc = json.load(open(path))
    f = doc["features"][0]
    assert f["place"] is None
    assert f["geometry"]["coordinates"] == [2, 49]


# ---------------------------------------------------------------------------
# Ray Dataset read
# ---------------------------------------------------------------------------


def test_read_jsonfg_dataset(ray_session):
    ds = read_jsonfg(os.path.join(DATA, "crs_32631_fc_and_feat.json"))
    t = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in ds.iter_batches(batch_format="pyarrow")])
    assert t.num_rows == 1
    assert gwkt.to_wkt(t["geometry"][0].as_py()).startswith(
        "POINT (500000 4500000)")


def test_cli_pipeline_jsonfg(ray_session, tmp_path):
    """CLI read sniffs JSON-FG by content; write dispatches .jsonfg."""
    from gdal_ray.cli import run_pipeline

    out = str(tmp_path / "out.jsonfg")
    run_pipeline(
        f"read {os.path.join(DATA, 'crs_32631_fc_and_feat.json')} "
        f"! write {out}")
    with open(out, "rb") as f:
        t, meta = parse_jsonfg(f.read())
    assert t.num_rows == 1
