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


class TestConicProjections:
    """LCC/Albers validated against Snyder PP 1395 worked examples
    (Clarke 1866, pp. 292/296) and machine-precision round-trips."""

    CLARKE = None

    @classmethod
    def _clarke(cls):
        from gdal_ray.proj.transverse_mercator import Ellipsoid

        return Ellipsoid(a=6378206.4, f=1 - 6356583.8 / 6378206.4)

    def test_albers_snyder_example(self):
        from gdal_ray.proj.conic import AlbersEqualArea

        aea = AlbersEqualArea(29.5, 45.5, 23.0, -96.0,
                              ellipsoid=self._clarke())
        x, y = aea.forward(-75.0, 35.0)
        assert abs(x - 1885472.7) < 1.0
        assert abs(y - 1535925.0) < 1.0
        lon, lat = aea.inverse(x, y)
        assert abs(lon - (-75.0)) < 1e-9 and abs(lat - 35.0) < 1e-9

    def test_lcc_snyder_example(self):
        from gdal_ray.proj.conic import LambertConformalConic

        lcc = LambertConformalConic(33.0, 45.0, 23.0, -96.0,
                                    ellipsoid=self._clarke())
        x, y = lcc.forward(-75.0, 35.0)
        assert abs(x - 1894410.9) < 1.0
        assert abs(y - 1564649.5) < 1.0
        lon, lat = lcc.inverse(x, y)
        assert abs(lon - (-75.0)) < 1e-9 and abs(lat - 35.0) < 1e-9

    def test_transformer_dispatch_roundtrip(self):
        from gdal_ray.proj.transformer import Transformer

        rng = np.random.default_rng(3)
        lon = rng.uniform(-120, -75, 500)
        lat = rng.uniform(25, 48, 500)
        for crs in ("EPSG:5070", "ESRI:102004"):
            fwd = Transformer.from_crs("EPSG:4326", crs)
            x, y, ok = fwd.transform_with_errors(lon, lat)
            assert ok.all()
            inv = Transformer.from_crs(crs, "EPSG:4326")
            lo, la, ok2 = inv.transform_with_errors(x, y)
            assert ok2.all()
            assert np.abs(lo - lon).max() < 1e-10
            assert np.abs(la - lat).max() < 1e-10

    def test_albers_preserves_area(self):
        """Equal-area property: the projected area of a spherical quad
        equals its ellipsoidal area (checked via a fine ring)."""
        from gdal_ray.proj.conic import EPSG_5070

        # 1-degree cell in the CONUS; ellipsoidal area via the
        # authalic q function the projection itself is built on
        lon0, lat0 = -100.0, 40.0
        t = np.linspace(0, 1, 201)
        ring_lon = np.concatenate([
            lon0 + t, np.full(201, lon0 + 1), lon0 + 1 - t,
            np.full(201, lon0),
        ])
        ring_lat = np.concatenate([
            np.full(201, lat0), lat0 + t, np.full(201, lat0 + 1),
            lat0 + 1 - t,
        ])
        x, y = EPSG_5070.forward(ring_lon, ring_lat)
        proj_area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        e = EPSG_5070.ellipsoid
        q1 = EPSG_5070._q(np.radians(lat0))
        q2 = EPSG_5070._q(np.radians(lat0 + 1))
        true_area = (e.a**2 / 2.0) * (q2 - q1) * np.radians(1.0)
        assert proj_area == pytest.approx(true_area, rel=1e-6)
