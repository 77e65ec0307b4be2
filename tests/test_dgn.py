"""MicroStation DGN v7 reader (gdal_ray/dgn.py) vs the reference
autotest smalltest.dgn literal expectations (ogr_dgn.py tests 2-6)."""
import os
import struct

import numpy as np
import pytest

from gdal_ray import dgn
from gdal_ray.geom import wkt as gwkt

FIX = "/root/reference/autotest/ogr/data/dgn/smalltest.dgn"
pytestmark = pytest.mark.skipif(
    not os.path.exists(FIX), reason="reference data absent")


@pytest.fixture(scope="module")
def table():
    return dgn.read_dgn_local(FIX)


def test_feature1_text(table):
    """ogr_dgn.py test 2: text element."""
    assert table["Type"][0].as_py() == 17
    assert table["Level"][0].as_py() == 1
    assert table["Text"][0].as_py() == "Demo Text"
    w = gwkt.to_wkt(table["geometry"][0].as_py())
    assert w.startswith("POINT (0.7365 4.2198")


def test_feature2_circle(table):
    """ogr_dgn.py test 3: ellipse stroked to >= 15 points with the
    reference's exact envelope."""
    assert table["Type"][1].as_py() == 15
    assert table["Level"][1].as_py() == 2
    g = table["geometry"][1].as_py()
    n = struct.unpack_from("<I", g, 5)[0]
    assert n >= 15
    pts = np.frombuffer(g, "<f8", count=2 * n, offset=9).reshape(-1, 2)
    xmin, xmax = pts[:, 0].min(), pts[:, 0].max()
    ymin, ymax = pts[:, 1].min(), pts[:, 1].max()
    assert 0.328593 <= xmin <= 0.328594
    assert 9.68780 <= xmax <= 9.68781
    assert -0.09611 <= ymin <= -0.09610
    assert 9.26310 <= ymax <= 9.26311


def test_feature3_polygon(table):
    """ogr_dgn.py test 4: filled shape with ColorIndex 83."""
    assert table["Type"][2].as_py() == 6
    assert table["Level"][2].as_py() == 2
    assert table["ColorIndex"][2].as_py() == 83
    w = gwkt.to_wkt(table["geometry"][2].as_py())
    want = [(4.5355, 3.317), (4.3832, 2.6517), (4.9441, 2.5235),
            (4.832, 3.3331), (4.5355, 3.317)]
    g = table["geometry"][2].as_py()
    nrings = struct.unpack_from("<I", g, 5)[0]
    assert nrings == 1 and w.startswith("POLYGON")
    n = struct.unpack_from("<I", g, 9)[0]
    pts = np.frombuffer(g, "<f8", count=2 * n, offset=13).reshape(-1, 2)
    assert np.allclose(pts, np.array(want), atol=1e-9)


def test_type15_level2_selection(table):
    """ogr_dgn.py tests 5/6: exactly one Type=15 Level=2 element."""
    sel = [i for i in range(len(table))
           if table["Type"][i].as_py() == 15
           and table["Level"][i].as_py() == 2]
    assert len(sel) == 1


def test_ray_dataset(ray_session):
    ds = dgn.read_dgn(FIX)
    rows = ds.take_all()
    assert len(rows) == 4
    assert rows[0]["Text"] == "Demo Text"
