"""Arc/Info Coverage (AVCE00 + AVCBin) driver — reference-fixture
parity with autotest/ogr/ogr_avc.py's exact expectations."""

import os

import numpy as np
import pytest

from gdal_ray.avc import list_layers, read_avc, read_avc_local
from gdal_ray.geom import wkb as W

D = "/root/reference/autotest/ogr/data/avc/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference data absent")


def _check_content(t):
    # test_ogr_avc_1/2: ARC layer, UserID 1..7, first arc geometry
    assert t["UserId"].to_pylist() == [1, 2, 3, 4, 5, 6, 7]
    g = W.parse(t["geometry"][0].as_py())
    want = np.array([[340099.875, 4100200.0], [340400.0625, 4100399.5],
                     [340900.125, 4100200.0], [340700.03125, 4100199.5]])
    np.testing.assert_allclose(g["coords"], want, atol=0.01)


class TestE00:
    def test_arc_layer(self):
        t = read_avc_local(D + "test.e00", "ARC")
        assert t.num_rows == 7
        _check_content(t)
        # PRJ section surfaced (SRS non-null in the reference test)
        assert b"avc_prj" in t.schema.metadata
        assert b"UTM" in t.schema.metadata[b"avc_prj"]

    def test_point_coverage(self):
        # test_ogr_avc_4: 80 wells, 7 fields, ValueId/WELLS-ID == 80
        t = read_avc_local(D + "testpoint.e00", "LAB")
        assert t.num_rows == 80
        assert len(t.column_names) - 1 == 7
        assert t["ValueId"][-1].as_py() == 80
        assert t["WELLS-ID"][-1].as_py() == 80
        g = W.parse(t["geometry"][0].as_py())
        np.testing.assert_allclose(
            g["coords"][0], [5049407.0, 442008.09], atol=0.01)

    def test_poly_coverage(self):
        # test_ogr_avc_5: universe skipped, ArcIds, AREA, ring WKT
        t = read_avc_local(D + "testpoly.e00", "PAL")
        assert t.num_rows == 3
        assert len(t.column_names) - 1 == 5
        assert t["ArcIds"][-1].as_py() == [-4, -5]
        assert t["AREA"][-1].as_py() == pytest.approx(9939.059, abs=1e-3)
        ring = W.parse(t["geometry"][-1].as_py())["rings"][0]
        want = np.array([[340700.03, 4100199.5], [340500.0, 4100199.8],
                         [340599.97, 4100100.2], [340700.03, 4100199.5]])
        np.testing.assert_allclose(ring, want, rtol=1e-12)

    def test_compressed_rejected(self):
        # test_ogr_avc_3: compressed E00 must fail to open
        with pytest.raises(ValueError):
            read_avc_local(D + "compressed.e00", "ARC")

    def test_layers(self):
        assert list_layers(D + "testpoly.e00") == \
            ["ARC", "CNT", "LAB", "PAL"]


class TestBin:
    def test_arc_layer(self):
        t = read_avc_local(D + "testavc/testavc", "ARC")
        assert t.num_rows == 7
        _check_content(t)
        assert b"avc_prj" in t.schema.metadata

    def test_point_coverage_external_pat(self):
        # external XX table: info/arc0001.dat redirects to pat.adf
        t = read_avc_local(D + "testpointavc/testpointavc", "LAB")
        assert t.num_rows == 80
        assert len(t.column_names) - 1 == 7
        assert t["ValueId"][-1].as_py() == 80
        assert t["TESTPOINTAVC-ID"][-1].as_py() == 80

    def test_poly_coverage(self):
        t = read_avc_local(D + "testpolyavc/testpolyavc", "PAL")
        assert t.num_rows == 3
        assert t["ArcIds"][-1].as_py() == [-4, -5]
        assert t["AREA"][-1].as_py() == pytest.approx(9939.059, abs=1e-3)
        ring = W.parse(t["geometry"][-1].as_py())["rings"][0]
        want = np.array([
            [340700.03125, 4100199.5], [340500.0, 4100199.75],
            [340599.96875, 4100100.25], [340700.03125, 4100199.5]])
        np.testing.assert_allclose(ring, want, rtol=1e-12)

    def test_binary_ascii_parity(self):
        """E00 and binary decode of the same coverage agree to f32."""
        a = read_avc_local(D + "testpoly.e00", "PAL")
        b = read_avc_local(D + "testpolyavc/testpolyavc", "PAL")
        assert a["ArcIds"].to_pylist() == b["ArcIds"].to_pylist()
        np.testing.assert_allclose(
            a["AREA"].to_numpy(), b["AREA"].to_numpy(), rtol=1e-6)


class TestRay:
    def test_dataset_read(self, ray_session):
        ds = read_avc([D + "test.e00", D + "testpoly.e00"], "ARC")
        assert ds.count() == 14
        cols = set(ds.schema().names)
        assert {"UserId", "FNODE_", "geometry"} <= cols
