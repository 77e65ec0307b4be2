"""CRS transform tests — WebMercator closed form + UTM Krüger series."""

import numpy as np
import pytest

from gdal_ray import tiles
from gdal_ray.proj import Transformer, transform_points, webmercator
from gdal_ray.proj.transverse_mercator import WGS84, utm


def test_webmercator_matches_tile_math():
    # EPSG:3857 forward must agree exactly with the gdal2tiles spherical
    # formula (FIXTURES.md §7 cross-check)
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85.05112878, 85.05112878, 2000)
    x1, y1, ok = webmercator.forward(lon, lat)
    x2, y2 = tiles.lonlat_to_meters(lon, lat)
    assert ok.all()
    np.testing.assert_allclose(x1, x2, rtol=1e-15)
    np.testing.assert_allclose(y1, y2, rtol=1e-12)


def test_webmercator_roundtrip():
    # 21×21 grid per FIXTURES.md §7, tolerance 1e-6 m / 1e-9 deg
    lon = np.linspace(-180, 180, 21)
    lat = np.linspace(-85.05112878, 85.05112878, 21)
    LON, LAT = np.meshgrid(lon, lat)
    x, y, ok = webmercator.forward(LON.ravel(), LAT.ravel())
    assert ok.all()
    lon2, lat2, ok2 = webmercator.inverse(x, y)
    assert ok2.all()
    np.testing.assert_allclose(lon2, LON.ravel(), atol=1e-9)
    np.testing.assert_allclose(lat2, LAT.ravel(), atol=1e-9)


def test_webmercator_known_values():
    x, y, _ = webmercator.forward(180.0, 0.0)
    assert x == pytest.approx(20037508.342789244, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-6)
    # independent scalar evaluation: y = R*ln(tan(pi/4 + phi/2))
    import math

    x, y, _ = webmercator.forward(2.2945, 48.8584)
    assert x == pytest.approx(2.2945 * math.pi / 180.0 * 6378137.0, rel=1e-15)
    assert y == pytest.approx(
        6378137.0 * math.log(math.tan(math.pi / 4 + math.radians(48.8584) / 2)),
        rel=1e-15,
    )


def test_webmercator_out_of_domain():
    x, y, ok = webmercator.forward([0.0, 200.0, np.nan], [95.0, 0.0, 0.0])
    assert not ok[0] and not ok[1] and not ok[2]
    assert np.isnan(x[0]) and np.isnan(y[0])


def test_utm_central_meridian():
    p = utm(31)  # lon0 = 3E
    x, y, ok = p.forward(np.array([3.0]), np.array([0.0]))
    assert ok.all()
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_utm_meridian_scale():
    # at the central meridian the scale is k0: northing difference over a
    # small latitude step ≈ k0 * meridian arc length
    p = utm(31)
    lat = np.array([45.0, 45.000001])
    _, y, _ = p.forward(np.array([3.0, 3.0]), lat)
    # meridian radius of curvature at 45N for WGS84
    e2 = WGS84.e2
    phi = np.deg2rad(45.0)
    M = WGS84.a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    darc = M * np.deg2rad(0.000001)
    assert (y[1] - y[0]) == pytest.approx(0.9996 * darc, rel=1e-6)


def test_utm_roundtrip():
    rng = np.random.default_rng(3)
    p = utm(11)  # byte.tif zone (EPSG:26711 is zone 11 on Clarke 1866)
    lon = rng.uniform(-120, -114, 500)
    lat = rng.uniform(20, 70, 500)
    x, y, ok = p.forward(lon, lat)
    assert ok.all()
    lon2, lat2, ok2 = p.inverse(x, y)
    assert ok2.all()
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_known_value():
    # well-known UTM reference point: (lat 43.642567, lon -79.387139)
    # = zone 17N, easting ≈ 630084, northing ≈ 4833438 (CN Tower)
    p = utm(17)
    x, y, _ = p.forward(np.array([-79.387139]), np.array([43.642567]))
    assert x[0] == pytest.approx(630084.0, abs=1.0)
    assert y[0] == pytest.approx(4833438.0, abs=1.0)


def test_transformer_4326_3857():
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    x, y, ok = t.transform_with_errors([0.0, 10.0], [0.0, 50.0])
    assert ok.all()
    x2, y2 = tiles.lonlat_to_meters(np.array([0.0, 10.0]), np.array([0.0, 50.0]))
    np.testing.assert_allclose(x, x2, atol=1e-9)
    np.testing.assert_allclose(y, y2, atol=1e-6)
    # inverse direction
    ti = Transformer.from_crs("EPSG:3857", "EPSG:4326")
    lon, lat, ok = ti.transform_with_errors(x, y)
    np.testing.assert_allclose(lon, [0.0, 10.0], atol=1e-9)
    np.testing.assert_allclose(lat, [0.0, 50.0], atol=1e-9)


def test_transformer_composite_utm_to_webmercator():
    # EPSG:26711 → EPSG:3857 (byte.tif corner): composite src→geo→dst
    # (CompositeCT semantics, apps/ogr2ogr_lib.cpp:1234)
    x, y, ok = transform_points("EPSG:26711", "EPSG:3857", [440720.0], [3751320.0])
    assert ok.all()
    # sanity: result lies in the UTM zone 11 longitude band (-120..-114)
    lon, lat, _ = transform_points("EPSG:3857", "EPSG:4326", x, y)
    assert -120.0 < lon[0] < -114.0
    assert 30.0 < lat[0] < 35.0


def test_transformer_cached():
    a = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    b = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    assert a is b


def test_transformer_unsupported():
    with pytest.raises(ValueError):
        Transformer.from_crs("EPSG:9999", "EPSG:4326")
