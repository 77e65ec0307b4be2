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
