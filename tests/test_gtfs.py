"""GTFS reader (gdal_ray/gtfs.py) vs the reference autotest
gtfs_extract.zip literal expectations (ogr_gtfs.py)."""
import os

import pytest

from gdal_ray import gtfs
from gdal_ray.geom import wkt as gwkt

FEED = "/root/reference/autotest/ogr/data/gtfs/gtfs_extract.zip"
pytestmark = pytest.mark.skipif(
    not os.path.exists(FEED), reason="reference data absent")


def test_layer_count():
    layers = gtfs.list_layers(FEED)
    assert len(layers) == 9  # 8 headered .txt files + shapes_geom
    assert "shapes_geom" in layers
    assert "error_warning" not in layers  # headerless file skipped


def test_agency():
    t = gtfs.read_gtfs_local(FEED, "agency")
    assert len(t) == 1
    assert t["agency_name"][0].as_py() == "SOLEA"


def test_calendar_dates_typed():
    t = gtfs.read_gtfs_local(FEED, "calendar")
    assert len(t) == 1
    assert str(t["start_date"][0].as_py()) == "2023-01-02"
    assert t["monday"][0].as_py() is True
    assert t["saturday"][0].as_py() is False


def test_routes_type_filter():
    t = gtfs.read_gtfs_local(FEED, "routes")
    assert sum(1 for v in t["route_type"].to_pylist() if v == 3) == 30


def test_stops_geometry():
    t = gtfs.read_gtfs_local(FEED, "stops")
    assert t["arrival_time"][0].as_py() == "05:37:00"
    assert gwkt.to_wkt(t["geometry"][0].as_py()) == \
        "POINT (7.280823 47.763704)"


def test_trips_linestring():
    t = gtfs.read_gtfs_local(FEED, "trips")
    w = gwkt.to_wkt(t["geometry"][0].as_py())
    assert w.startswith("LINESTRING (7.280823 47.763704, 7.278051 "
                        "47.762217, 7.278683 47.760148")
    assert w.rstrip(")").endswith("7.336407 47.809084")


def test_shapes_geom():
    t = gtfs.read_gtfs_local(FEED, "shapes_geom")
    assert len(t) == 1
    assert t["shape_id"][0].as_py() == "80013"
    w = gwkt.to_wkt(t["geometry"][0].as_py())
    assert w.startswith("LINESTRING (7.28084 47.763684, 7.28073 47.76364")
    assert w.rstrip(")").endswith("7.336401 47.809094")


def test_ray_dataset(ray_session):
    ds = gtfs.read_gtfs(FEED, "routes")
    assert ds.count() >= 30
