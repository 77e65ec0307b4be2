"""Datum transformation tests — geocentric conversion, position-vector
Helmert (pinned to the IOGP GN 7-2 worked example), and the
cross-datum Transformer pipeline."""

import numpy as np
import pytest

from gdal_ray.proj import datum as dt
from gdal_ray.proj.transformer import Transformer, transform_points
from gdal_ray.proj.transverse_mercator import WGS84


class TestGeocentric:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-89.5, 89.5, 500)
        h = rng.uniform(-100, 9000, 500)
        x, y, z = dt.geodetic_to_geocentric(WGS84, lon, lat, h)
        lon2, lat2, h2 = dt.geocentric_to_geodetic(WGS84, x, y, z)
        dl = (lon2 - lon + 180.0) % 360.0 - 180.0
        assert np.abs(dl * np.cos(np.radians(lat))).max() < 1e-11
        assert np.abs(lat2 - lat).max() < 1e-11
        assert np.abs(h2 - h).max() < 1e-6

    def test_poles(self):
        x, y, z = dt.geodetic_to_geocentric(WGS84, [0.0, 0.0], [90.0, -90.0])
        b = WGS84.a * (1.0 - WGS84.f)
        np.testing.assert_allclose(z, [b, -b], atol=1e-6)
        lon2, lat2, h2 = dt.geocentric_to_geodetic(WGS84, x, y, z)
        np.testing.assert_allclose(lat2, [90.0, -90.0], atol=1e-12)
        np.testing.assert_allclose(h2, [0.0, 0.0], atol=1e-6)

    def test_equator_prime_meridian(self):
        x, y, z = dt.geodetic_to_geocentric(WGS84, 0.0, 0.0)
        assert x == pytest.approx(WGS84.a)
        assert y == pytest.approx(0.0, abs=1e-9)
        assert z == pytest.approx(0.0, abs=1e-9)


class TestHelmert:
    def test_gn72_position_vector_worked_example(self):
        """IOGP Guidance Note 7-2 §4.4.3 worked example: WGS 72 →
        WGS 84 (EPSG transformation 1238: tz=4.5 m, rz=0.554",
        ds=0.219 ppm) on geocentric (3657660.66, 255768.55,
        5201382.11) → (3657660.78, 255778.43, 5201387.75)."""
        h = dt.WGS72_DATUM.to_wgs84
        x, y, z = h.apply(3657660.66, 255768.55, 5201382.11)
        assert x == pytest.approx(3657660.78, abs=0.01)
        assert y == pytest.approx(255778.43, abs=0.01)
        assert z == pytest.approx(5201387.75, abs=0.01)

    def test_exact_inverse(self):
        for d in dt.DATUMS.values():
            if d.to_wgs84 is None:
                continue
            x, y, z = d.to_wgs84.apply(3657660.66, 255768.55, 5201382.11)
            x2, y2, z2 = d.to_wgs84.apply_inverse(x, y, z)
            assert x2 == pytest.approx(3657660.66, abs=1e-8)
            assert y2 == pytest.approx(255768.55, abs=1e-8)
            assert z2 == pytest.approx(5201382.11, abs=1e-8)


class TestCrossDatumTransformer:
    def test_greenwich_transit_circle(self):
        """The Airy transit circle (lon exactly 0 in OSGB36) lies
        ~102 m east of the WGS84 zero meridian — WGS84 longitude
        ≈ −0.0015° (≈ 5.3″ W), the well-published Greenwich offset."""
        lon, lat, ok = transform_points(
            "EPSG:4277", "EPSG:4326", [0.0], [51.4775]
        )
        assert ok.all()
        assert lon[0] == pytest.approx(-0.0015, abs=3e-4)
        # latitude shift is smaller (~55 m north at Greenwich)
        assert abs(lat[0] - 51.4775) < 1e-3

    def test_ed50_shift_magnitude_europe(self):
        """ED50→WGS84 over central Europe is a 100–250 m shift."""
        lon, lat, ok = transform_points("EPSG:4230", "EPSG:4326", [12.0], [50.0])
        assert ok.all()
        dx = (lon[0] - 12.0) * 111320.0 * np.cos(np.radians(50.0))
        dy = (lat[0] - 50.0) * 110574.0
        d = (dx * dx + dy * dy) ** 0.5
        assert 80.0 < d < 300.0

    def test_roundtrip_all_datums(self):
        """geographic → geographic round trips through every datum
        stay < 1e-6° (~10 cm).  The residual is the 2-D path dropping
        ellipsoidal height between the two Helmert legs (PROJ's 2-D
        towgs84 pipeline has the same irreducible cm-level loss); the
        Helmert inverse itself is exact (TestHelmert)."""
        cases = [
            ("EPSG:4277", -1.0, 52.0), ("EPSG:4230", 10.0, 48.0),
            ("EPSG:4267", -100.0, 40.0), ("EPSG:4301", 139.0, 36.0),
            ("EPSG:4322", 20.0, -30.0), ("EPSG:4202", 145.0, -37.0),
            ("EPSG:4299", -8.0, 53.3),
        ]
        for crs, lon, lat in cases:
            f = Transformer.from_crs("EPSG:4326", crs)
            x, y, ok = f.transform_with_errors([lon], [lat])
            assert ok.all(), crs
            g = Transformer.from_crs(crs, "EPSG:4326")
            lon2, lat2, ok2 = g.transform_with_errors(x, y)
            assert ok2.all(), crs
            assert abs(lon2[0] - lon) < 1e-6, crs
            assert abs(lat2[0] - lat) < 1e-6, crs

    def test_projected_cross_datum_roundtrip(self):
        """NAD27 UTM → WGS84 UTM and back (byte.tif's EPSG:26711)."""
        f = Transformer.from_crs("EPSG:26711", "EPSG:32611")
        x, y, ok = f.transform_with_errors([440720.0], [3751320.0])
        assert ok.all()
        # NAD27→WGS84 moves the point ~100-250 m in zone 11
        d = ((x[0] - 440720.0) ** 2 + (y[0] - 3751320.0) ** 2) ** 0.5
        assert 50.0 < d < 300.0
        g = Transformer.from_crs("EPSG:32611", "EPSG:26711")
        x2, y2, ok2 = g.transform_with_errors(x, y)
        assert ok2.all()
        assert x2[0] == pytest.approx(440720.0, abs=0.05)
        assert y2[0] == pytest.approx(3751320.0, abs=0.05)

    def test_same_datum_projected_unaffected(self):
        """Within one datum no shift applies: 4326→3857 keeps the
        spherical formula bit-exact (oracle queries depend on it)."""
        t = Transformer.from_crs("EPSG:4326", "EPSG:3857")
        assert t._datums is None
        x, y, ok = t.transform_with_errors([10.0], [50.0])
        R = 6378137.0
        assert x[0] == pytest.approx(np.radians(10.0) * R, abs=1e-9)

    def test_nad83_etrs89_null_shift(self):
        """Modern frames are WGS84-equivalent: identity lon/lat."""
        for crs in ("EPSG:4269", "EPSG:4258"):
            lon, lat, ok = transform_points(crs, "EPSG:4326", [7.25], [46.5])
            assert ok.all()
            assert lon[0] == 7.25 and lat[0] == 46.5
