"""GML reader tests — reference autotest pins (ogr/ogr_gml.py:
test_ogr_gml_1 ionic_wfs Name/polygon, test_ogr_gml_3 rnf_eg
ngd_id/type/linestring, test_ogr_gml_4 bom.gml 3 features,
test_ogr_gml_20 archsites gml_id/cat-int64/str1-string) plus axis
order and multi-geometry cases.  Reference role: ogr/ogrsf_frmts/gml.
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as W
from gdal_ray.gml import gml_layers, parse_gml, read_gml, read_gml_local

D = "/root/reference/autotest/ogr/data/gml/"


def test_ionic_wfs_pin():
    # test_ogr_gml_1 role
    layers = parse_gml(open(D + "ionic_wfs.gml", "rb").read())
    assert list(layers) == ["GEM"]
    t = layers["GEM"]
    assert t.num_rows == 1
    assert t["Name"][0].as_py() == "Aartselaar"
    g = W.parse(t["geometry"][0].as_py())
    assert g["type"] == 3  # polygon
    assert g["rings"][0][0].tolist() == [44038.0, 511549.0]


def test_rnf_eg_pin():
    # test_ogr_gml_3 role
    t = read_gml_local(D + "rnf_eg.gml")
    assert t.num_rows == 1
    assert t["ngd_id"][0].as_py() == 817792
    assert t["type"][0].as_py() == "HWY"
    g = W.parse(t["geometry"][0].as_py())
    assert g["type"] == 2
    np.testing.assert_allclose(
        g["coords"][0], [-63.500411040289066, 46.240122507771368])
    np.testing.assert_allclose(
        g["coords"][-1], [-63.509946573455622, 46.241745397977233])


def test_bom_pin():
    # test_ogr_gml_4 role: BOM + custom *Member containers
    layers = parse_gml(open(D + "bom.gml", "rb").read())
    assert list(layers) == ["CartographicText"]
    assert layers["CartographicText"].num_rows == 3


def test_archsites_types():
    # test_ogr_gml_20 role: gml_id present, cat int64, str1 string
    t = read_gml_local(D + "archsites.gml")
    assert t["gml_id"][0].as_py() == "archsites.3951"
    assert t.schema.field("cat").type == pa.int64()
    assert t.schema.field("str1").type == pa.string()
    g = W.parse(t["geometry"][0].as_py())
    # projected urn (EPSG:26713): NO axis swap — easting first
    assert g["coords"][0].tolist() == [593493.0, 4914730.0]


def test_urn_geographic_axis_swap():
    # GML3 urn:…EPSG::4326 puts lat first on the wire
    t = parse_gml(open(D + "expected_gml_gml3.gml", "rb").read())[
        "firstlayer"]
    g = W.parse(t["geometry"][0].as_py())
    assert g["coords"][0].tolist() == [2.0, 49.0]  # x=lon


def test_gnis_multi_feature():
    t = read_gml_local(D + "gnis_pop_100.gml")
    assert t.num_rows == 20
    assert t.schema.field("population").type == pa.int64()
    assert "geometry" in t.column_names
    assert gml_layers(D + "gnis_pop_100.gml") == ["gnis_pop"]


def test_gml2_coordinates_and_multipolygon():
    data = b"""<FeatureCollection xmlns:gml="http://www.opengis.net/gml">
  <featureMember>
    <f><geom><gml:MultiPolygon><gml:polygonMember>
      <gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
        <gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates>
      </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
    </gml:polygonMember></gml:MultiPolygon></geom>
    <name>sq</name></f>
  </featureMember>
</FeatureCollection>"""
    t = parse_gml(data)["f"]
    g = W.parse(t["geometry"][0].as_py())
    assert g["type"] == 6
    assert t["name"][0].as_py() == "sq"


def test_read_gml_dataset(ray_session):
    ds = read_gml([D + "gnis_pop_100.gml", D + "gnis_pop_110.gml"])
    rows = ds.take_all()
    assert len(rows) == read_gml_local(
        D + "gnis_pop_100.gml").num_rows + read_gml_local(
        D + "gnis_pop_110.gml").num_rows
