"""WKT read/write tests: round-trip identity across all geometry
types, numeric precision, and malformed-input errors."""

import numpy as np
import pytest

from gdal_ray.geom import wkb as gwkb
from gdal_ray.geom import wkt as W

CASES = [
    "POINT (1 2)",
    "LINESTRING (0 0, 1 1, 2 0.5)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTIPOINT (1 2, 3 4)",          # bare-coordinate variant
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
]


@pytest.mark.parametrize("wkt", CASES)
def test_roundtrip(wkt):
    buf = W.from_wkt(wkt)
    assert W.from_wkt(W.to_wkt(buf)) == buf


def test_precision():
    buf = W.from_wkt("POINT (1.2345678901234567 -9.87654321e-05)")
    g = gwkb.parse(buf)
    assert g["coords"][0][0] == 1.2345678901234567
    assert g["coords"][0][1] == -9.87654321e-05
    assert W.from_wkt(W.to_wkt(buf)) == buf


@pytest.mark.parametrize("v", [
    1.5e-10, 2.5e20, 1e16, 1e-16, 5e-324, 1.7976931348623157e308,
    -3.0000000000000004e-10, 1.0, -0.0, 123456789.123456789,
])
def test_fmt_exponent_edges(v):
    # ADVICE r2: rstrip('0') on %.17g corrupted sci-notation values
    # whose exponent ends in 0 (1.5e-10 -> '1.5e-1').
    assert float(W._fmt(v)) == v


def test_roundtrip_extreme_coords():
    buf = W.from_wkt("POINT (1.5e-10 2.5e+20)")
    g = gwkb.parse(W.from_wkt(W.to_wkt(buf)))
    assert g["coords"][0][0] == 1.5e-10
    assert g["coords"][0][1] == 2.5e20


def test_wkb_cross_consistency():
    ring = np.array([(0, 0), (3, 0), (3, 2), (0, 2), (0, 0)], float)
    buf = gwkb.polygon_wkb(ring)
    assert W.from_wkt(W.to_wkt(buf)) == buf


def test_errors():
    for bad in ("POINT 1 2", "POLYGON ((0 0, 1 1)", "TRIANGLE ((0 0))",
                "LINESTRING (a b)"):
        with pytest.raises(ValueError):
            W.from_wkt(bad)


def test_vectorized_points_wkt_matches_scalar():
    """points_to_wkt/points_from_wkt (Arrow kernels) round-trip the
    exact doubles and agree with the scalar to_wkt path semantically
    (both shortest-round-trip formats; parsed values identical)."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.geom import wkb as gwkb
    from gdal_ray.geom import wkt as gwkt

    rng = np.random.default_rng(11)
    lon = np.concatenate([rng.uniform(-180, 180, 2000),
                          [1.5e-10, 2.5e20, -0.0, 42.0]])
    lat = np.concatenate([rng.uniform(-90, 90, 2000),
                          [-1.5e-10, 1e-300, 0.1, -7.0]])
    s = gwkt.points_to_wkt(lon, lat)
    lon2, lat2 = gwkt.points_from_wkt(s)
    assert np.array_equal(lon2.to_numpy(), lon)
    assert np.array_equal(lat2.to_numpy(), lat)
    # scalar path parses the vectorized strings to the same doubles
    for i in (0, 1, 2000, 2001, 2002, 2003):
        g = gwkb.parse(gwkt.from_wkt(s[i].as_py()))
        x, y = g["coords"][0]
        assert x == lon[i] and y == lat[i]


def test_vectorized_points_wkt_speedup():
    import time

    import numpy as np

    from gdal_ray.geom import wkb as gwkb
    from gdal_ray.geom import wkt as gwkt

    n = 100_000
    rng = np.random.default_rng(12)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    t0 = time.perf_counter()
    s = gwkt.points_to_wkt(lon, lat)
    gwkt.points_from_wkt(s)
    batched = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n // 100):
        gwkb.parse(gwkt.from_wkt(gwkt.to_wkt(gwkb.point_wkb(lon[i], lat[i]))))
    per_row = (time.perf_counter() - t0) * 100.0
    assert per_row > 5.0 * batched, (per_row, batched)


class TestZMAndCurves:
    """Z/M/ZM variants + ISO curve types (r3 verdict item 6):
    reference ogr/ogr_core.h:422-512 type set,
    ogrgeometryfactory.cpp curveToLineString linearization."""

    @pytest.mark.parametrize("wkt", [
        "POINT Z (1 2 3)",
        "POINT M (1 2 4)",
        "POINT ZM (1 2 3 4)",
        "LINESTRING Z (0 0 1, 1 1 2, 2 0 3)",
        "LINESTRING ZM (0 0 1 10, 1 1 2 20)",
        "POLYGON Z ((0 0 5, 4 0 5, 4 4 5, 0 4 5, 0 0 5))",
        "MULTIPOINT Z ((1 2 3), (4 5 6))",
        "MULTILINESTRING M ((0 0 1, 1 0 2), (2 2 3, 3 3 4))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))",
        "GEOMETRYCOLLECTION (POINT Z (1 2 3), LINESTRING (0 0, 1 1))",
        "CIRCULARSTRING (0 0, 1 1, 2 0)",
        "CIRCULARSTRING Z (0 0 1, 1 1 2, 2 0 3)",
        "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 4 0))",
        "CURVEPOLYGON (CIRCULARSTRING (0 0, 4 0, 0 0))",
        "CURVEPOLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "MULTICURVE ((0 0, 1 1), CIRCULARSTRING (0 0, 1 1, 2 0))",
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0, 4 0, 0 0)), ((0 0, 1 0, 1 1, 0 0)))",
    ])
    def test_roundtrip(self, wkt):
        from gdal_ray.geom import wkt as gwkt

        buf = gwkt.from_wkt(wkt)
        assert gwkt.to_wkt(buf) == wkt
        # WKB survives a re-parse too
        assert gwkt.to_wkt(gwkt.from_wkt(gwkt.to_wkt(buf))) == wkt

    def test_untokened_xyz_inference(self):
        from gdal_ray.geom import wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        g = gwkb.parse(gwkt.from_wkt("POINT (1 2 3)"))
        assert g["dims"] == "xyz" and g["z"][0] == 3.0

    def test_zm_wkb_codes(self):
        import struct

        from gdal_ray.geom import wkt as gwkt

        for wkt, code in [("POINT Z (1 2 3)", 1001),
                          ("POINT M (1 2 3)", 2001),
                          ("POINT ZM (1 2 3 4)", 3001),
                          ("CIRCULARSTRING (0 0, 1 1, 2 0)", 8)]:
            buf = gwkt.from_wkt(wkt)
            assert struct.unpack_from("<I", buf, 1)[0] == code

    def test_ewkb_flags_parse(self):
        import struct

        from gdal_ray.geom import wkb as gwkb

        # PostGIS-style EWKB: flag bits instead of +1000 offsets
        buf = struct.pack("<BIddd", 1, 1 | 0x80000000, 1.0, 2.0, 3.0)
        g = gwkb.parse(buf)
        assert g["dims"] == "xyz" and g["z"][0] == 3.0


class TestLinearize:
    def test_semicircle_points_on_circle(self):
        """CIRCULARSTRING (0 0, 1 1, 2 0) is the upper semicircle of
        the unit circle centered at (1,0): every linearized vertex
        must satisfy (x-1)^2 + y^2 = 1 and the step must respect the
        4-degree default."""
        import numpy as np

        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        buf = gwkt.from_wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")
        lin = curves.linearize(buf)
        g = gwkb.parse(lin)
        assert g["type"] == gwkb.LINESTRING
        c = g["coords"]
        r = np.hypot(c[:, 0] - 1.0, c[:, 1])
        np.testing.assert_allclose(r, 1.0, atol=1e-12)
        # endpoints exact, midpoint present on the arc's top
        assert tuple(c[0]) == (0.0, 0.0) and tuple(c[-1]) == (2.0, 0.0)
        # 180 deg at 4 deg/step -> >= 45 segments
        assert len(c) >= 46
        ang = np.degrees(np.abs(np.diff(np.arctan2(c[:, 1], c[:, 0] - 1.0))))
        assert ang.max() <= 4.0 + 1e-9

    def test_analytic_arc_vertices(self):
        """Quarter arc (1 0, cos45 sin45, 0 1): linearized vertices are
        exactly cos/sin of the uniform angle grid."""
        import numpy as np

        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        s2 = np.sqrt(0.5)
        buf = gwkb.circularstring_wkb(
            np.array([[1.0, 0.0], [s2, s2], [0.0, 1.0]]))
        lin = curves.linearize(buf, max_angle_deg=30.0)
        c = gwkb.parse(lin)["coords"]
        # 90deg / 30deg -> 3 segments, angles 0,30,60,90
        assert len(c) == 4
        exp = np.column_stack([np.cos(np.radians([0, 30, 60, 90])),
                               np.sin(np.radians([0, 30, 60, 90]))])
        np.testing.assert_allclose(c, exp, atol=1e-12)

    def test_collinear_arc_straight(self):
        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        buf = gwkt.from_wkt("CIRCULARSTRING (0 0, 1 1, 2 2)")
        c = gwkb.parse(curves.linearize(buf))["coords"]
        assert len(c) == 3
        np.testing.assert_allclose(c, [[0, 0], [1, 1], [2, 2]])

    def test_compound_curve_joins(self):
        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        buf = gwkt.from_wkt(
            "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 4 0))")
        g = gwkb.parse(curves.linearize(buf))
        assert g["type"] == gwkb.LINESTRING
        c = g["coords"]
        # no duplicated joint vertex; ends exact
        assert tuple(c[-1]) == (4.0, 0.0)
        d = np.diff(c, axis=0)
        assert (np.hypot(d[:, 0], d[:, 1]) > 1e-12).all()

    def test_curvepolygon_full_circle_area(self):
        """CURVEPOLYGON of a full circle (radius 2): linearized polygon
        area -> pi r^2 within the 4-degree chord deficit."""
        import numpy as np

        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt
        from gdal_ray.geom.ops import ring_area

        buf = gwkt.from_wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 4 0, 0 0))")
        g = gwkb.parse(curves.linearize(buf))
        assert g["type"] == gwkb.POLYGON
        ring = g["rings"][0]
        assert tuple(ring[0]) == tuple(ring[-1])  # closed
        n = len(ring) - 1
        exact = np.pi * 4.0
        poly = 0.5 * n * 4.0 * np.sin(2 * np.pi / n)  # inscribed n-gon
        assert abs(abs(ring_area(ring)) - poly) < 1e-9
        assert abs(poly - exact) / exact < 1e-3

    def test_z_interpolated_on_arc(self):
        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        buf = gwkt.from_wkt("CIRCULARSTRING Z (0 0 0, 1 1 5, 2 0 10)")
        g = gwkb.parse(curves.linearize(buf))
        assert g["dims"] == "xyz"
        z = g["z"]
        assert z[0] == 0.0 and z[-1] == 10.0
        assert (np.diff(z) > 0).all()  # monotone linear-in-angle

    def test_multicurve_multisurface(self):
        from gdal_ray.geom import curves, wkb as gwkb
        from gdal_ray.geom import wkt as gwkt

        mc = curves.linearize(gwkt.from_wkt(
            "MULTICURVE ((0 0, 1 1), CIRCULARSTRING (0 0, 1 1, 2 0))"))
        assert gwkb.parse(mc)["type"] == gwkb.MULTILINESTRING
        ms = curves.linearize(gwkt.from_wkt(
            "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0, 4 0, 0 0)))"))
        assert gwkb.parse(ms)["type"] == gwkb.MULTIPOLYGON

    def test_linear_passthrough(self):
        from gdal_ray.geom import curves
        from gdal_ray.geom import wkt as gwkt

        buf = gwkt.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")
        assert curves.linearize(buf) == buf


def test_linearize_vector_stage(ray_session):
    """Dataset-level curve linearization (ogr2ogr linearize-on-read)."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.geom import wkb as gwkb
    from gdal_ray.geom import wkt as gwkt
    from gdal_ray.stages.vector import linearize

    geoms = [
        gwkt.from_wkt("CIRCULARSTRING (0 0, 1 1, 2 0)"),
        gwkt.from_wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 4 0, 0 0))"),
        gwkt.from_wkt("POINT (3 4)"),
        None,
    ]
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(4), pa.int64()),
        "geometry": pa.array(geoms, pa.binary()),
    }))
    out = linearize(ds).to_pandas().sort_values("id")
    types = [None if b is None else gwkb.geometry_type(b)
             for b in out["geometry"]]
    assert types[0] == gwkb.LINESTRING
    assert types[1] == gwkb.POLYGON
    assert types[2] == gwkb.POINT
    assert types[3] is None
