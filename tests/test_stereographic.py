"""Polar/Oblique Stereographic + Krovak (proj/stereographic.py),
pinned against the IOGP GN7-2 worked examples and EPSG-registry
resolution (reference role: PROJ stere/sterea/krovak;
ogrspatialreference.cpp importFromEPSG)."""

import numpy as np
import pytest

from gdal_ray.proj.stereographic import (
    Krovak,
    ObliqueStereographic,
    PolarStereographic,
)
from gdal_ray.proj.transverse_mercator import WGS84, Ellipsoid

BESSEL = Ellipsoid(a=6377397.155, f=1.0 / 299.1528128)


class TestPolarStereographic:
    def test_gn72_variant_b_australian_antarctic(self):
        """GN7-2 §3.2.3 worked example (EPSG:3032): 75°S 120°E →
        E 7255380.79, N 7053389.56."""
        ps = PolarStereographic(lat0=-90, lon0=70.0, lat_ts=-71.0,
                                x0=6000000.0, y0=6000000.0,
                                ellipsoid=WGS84)
        x, y = ps.forward(np.array([120.0]), np.array([-75.0]))
        assert x[0] == pytest.approx(7255380.79, abs=0.02)
        assert y[0] == pytest.approx(7053389.56, abs=0.02)
        lo, la = ps.inverse(x, y)
        assert lo[0] == pytest.approx(120.0, abs=1e-9)
        assert la[0] == pytest.approx(-75.0, abs=1e-9)

    def test_gn72_variant_a_ups_north(self):
        """GN7-2 worked example (UPS North): 73°N 44°E →
        E 3320416.75, N 632668.43."""
        ups = PolarStereographic(lat0=90, lon0=0.0, k0=0.994,
                                 x0=2000000.0, y0=2000000.0,
                                 ellipsoid=WGS84)
        x, y = ups.forward(np.array([44.0]), np.array([73.0]))
        assert x[0] == pytest.approx(3320416.75, abs=0.02)
        assert y[0] == pytest.approx(632668.43, abs=0.02)
        lo, la = ups.inverse(x, y)
        assert lo[0] == pytest.approx(44.0, abs=1e-9)
        assert la[0] == pytest.approx(73.0, abs=1e-9)

    def test_epsg3031_properties(self):
        """EPSG:3031: pole maps to the origin; the standard parallel
        is true-to-scale (k=1 at 71°S)."""
        ps = PolarStereographic(lat0=-90, lon0=0.0, lat_ts=-71.0,
                                ellipsoid=WGS84)
        x, y = ps.forward(np.array([37.0]), np.array([-90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        # numeric scale along the parallel at -71
        lon = np.array([10.0, 10.0001])
        lat = np.array([-71.0, -71.0])
        x, y = ps.forward(lon, lat)
        proj_d = np.hypot(x[1] - x[0], y[1] - y[0])
        es = WGS84.e * np.sin(np.radians(-71.0))
        nu = WGS84.a / np.sqrt(1 - es * es)
        true_d = np.radians(0.0001) * nu * np.cos(np.radians(-71.0))
        assert proj_d / true_d == pytest.approx(1.0, abs=1e-9)

    def test_roundtrip_both_aspects(self):
        rng = np.random.default_rng(4)
        south = PolarStereographic(lat0=-90, lon0=0.0, lat_ts=-71.0,
                                   ellipsoid=WGS84)
        lons = rng.uniform(-180, 180, 500)
        lats = rng.uniform(-89.9, -60.0, 500)
        lo, la = south.inverse(*south.forward(lons, lats))
        assert np.abs(((lo - lons + 180) % 360) - 180).max() < 1e-9
        assert np.abs(la - lats).max() < 1e-9
        north = PolarStereographic(lat0=90, lon0=-45.0, lat_ts=70.0,
                                   ellipsoid=WGS84)
        lats = rng.uniform(60.0, 89.9, 500)
        lo, la = north.inverse(*north.forward(lons, lats))
        assert np.abs(((lo - lons + 180) % 360) - 180).max() < 1e-9
        assert np.abs(la - lats).max() < 1e-9


class TestObliqueStereographic:
    def test_gn72_rd_new(self):
        """GN7-2 §3.2.4 worked example (EPSG:28992): 53°N 6°E →
        E 196105.283, N 557057.739."""
        rd = ObliqueStereographic(
            lat0=52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
            lon0=5.0 + 23.0 / 60.0 + 15.5 / 3600.0,
            k0=0.9999079, x0=155000.0, y0=463000.0, ellipsoid=BESSEL,
        )
        x, y = rd.forward(np.array([6.0]), np.array([53.0]))
        assert x[0] == pytest.approx(196105.283, abs=0.01)
        assert y[0] == pytest.approx(557057.739, abs=0.01)
        lo, la = rd.inverse(x, y)
        assert lo[0] == pytest.approx(6.0, abs=1e-9)
        assert la[0] == pytest.approx(53.0, abs=1e-9)

    def test_origin_maps_to_false_origin(self):
        rd = ObliqueStereographic(lat0=52.15616055555556,
                                  lon0=5.38763888888889,
                                  k0=0.9999079, x0=155000.0,
                                  y0=463000.0, ellipsoid=BESSEL)
        x, y = rd.forward(np.array([5.38763888888889]),
                          np.array([52.15616055555556]))
        assert x[0] == pytest.approx(155000.0, abs=1e-6)
        assert y[0] == pytest.approx(463000.0, abs=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        rd = ObliqueStereographic(lat0=52.15616055555556,
                                  lon0=5.38763888888889,
                                  k0=0.9999079, x0=155000.0,
                                  y0=463000.0, ellipsoid=BESSEL)
        lons = rng.uniform(3.2, 7.3, 1000)
        lats = rng.uniform(50.7, 53.6, 1000)
        lo, la = rd.inverse(*rd.forward(lons, lats))
        assert np.abs(lo - lons).max() < 1e-10
        assert np.abs(la - lats).max() < 1e-10


class TestKrovak:
    LAT = 50 + 12 / 60 + 32.4416 / 3600
    LON = 16 + 50 / 60 + 59.1790 / 3600

    def test_gn72_worked_example(self):
        """GN7-2 §3.2.9 (S-JTSK): 50°12'32.4416"N 16°50'59.1790"E →
        Southing X 1050538.63, Westing Y 568990.97 (±5 cm: the GN
        rounds intermediate constants)."""
        kr = Krovak(east_north=False)
        X, Y = kr.forward(np.array([self.LON]), np.array([self.LAT]))
        assert X[0] == pytest.approx(1050538.63, abs=0.05)
        assert Y[0] == pytest.approx(568990.97, abs=0.05)

    def test_east_north_axes(self):
        kr = Krovak(east_north=True)
        x, y = kr.forward(np.array([self.LON]), np.array([self.LAT]))
        assert x[0] == pytest.approx(-568990.97, abs=0.05)
        assert y[0] == pytest.approx(-1050538.63, abs=0.05)

    def test_roundtrip_over_czechia(self):
        kr = Krovak()
        rng = np.random.default_rng(3)
        lons = rng.uniform(12.0, 18.9, 1000)
        lats = rng.uniform(48.5, 51.1, 1000)
        lo, la = kr.inverse(*kr.forward(lons, lats))
        assert np.abs(lo - lons).max() < 1e-10
        assert np.abs(la - lats).max() < 1e-10


class TestRegistry:
    def test_codes_resolve(self):
        from gdal_ray.proj import epsg_db

        for code in (3031, 3032, 3413, 3976, 3995, 5041, 5042,
                     32661, 32761, 28992, 5514, 5513, 2065,
                     32633, 32733, 26711, 26918):
            kind, obj = epsg_db.resolve(code)
            assert kind in ("raw", "tmerc")

    def test_known_codes_count(self):
        from gdal_ray.proj import epsg_db

        assert len(epsg_db.known_codes()) >= 300

    def test_transformer_end_to_end_3031(self, ray_session):
        from gdal_ray.proj.transformer import Transformer

        tr = Transformer.from_crs("EPSG:4326", "EPSG:3031")
        x, y, ok = tr.transform_with_errors(np.array([120.0]),
                                            np.array([-75.0]))
        assert ok[0]
        ps = PolarStereographic(lat0=-90, lon0=0.0, lat_ts=-71.0,
                                ellipsoid=WGS84)
        ex, ey = ps.forward(np.array([120.0]), np.array([-75.0]))
        assert x[0] == pytest.approx(ex[0], abs=1e-6)
        assert y[0] == pytest.approx(ey[0], abs=1e-6)

    def test_transformer_28992_with_datum(self, ray_session):
        """EPSG:4326 → 28992 applies the Amersfoort towgs84 (result
        differs from the no-datum projection by ~50-100 m)."""
        from gdal_ray.proj.transformer import Transformer

        tr = Transformer.from_crs("EPSG:4326", "EPSG:28992")
        x, y, ok = tr.transform_with_errors(np.array([5.387639]),
                                            np.array([52.156161]))
        assert ok[0]
        rd = ObliqueStereographic(lat0=52.15616055555556,
                                  lon0=5.38763888888889, k0=0.9999079,
                                  x0=155000.0, y0=463000.0,
                                  ellipsoid=BESSEL)
        nx, ny = rd.forward(np.array([5.387639]), np.array([52.156161]))
        d = np.hypot(x[0] - nx[0], y[0] - ny[0])
        assert 10.0 < d < 200.0
