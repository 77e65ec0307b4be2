"""EPSG parameter-table registry tests (gdal_ray/proj/epsg_db.py) —
the importFromEPSG role (reference: ogr/ogrspatialreference.cpp
delegating to the PROJ db; here literal parameter rows).

Pinned values are published worked examples:
- OSGB36 / British National Grid: OS "A guide to coordinate systems
  in Great Britain", Annex C worked example.
- ETRS89 / LAEA Europe (EPSG:3035): IOGP Guidance Note 7-2, Lambert
  Azimuthal Equal Area (oblique) example (lat 50N lon 5E).
- GDA94 / MGA zone 55: ICSM GDA technical manual worked example
  (Flinders Peak).
- Snyder PP 1395 LAEA ellipsoidal example (p. 334, Clarke 1866).
"""

import numpy as np
import pytest

from gdal_ray.proj import epsg_db
from gdal_ray.proj.transformer import Transformer, transform_points


def _center(kind, obj):
    """A (lon, lat) inside the projection's useful domain."""
    if kind == "tmerc":
        return obj.lon0, 45.0 if obj.fn == 0.0 else -30.0
    p = obj  # raw projection dataclass
    lon0 = p.lon0
    lat1 = getattr(p, "lat1", None)
    if lat1 is not None:
        return lon0, 0.5 * (p.lat1 + p.lat2)
    lat0 = getattr(p, "lat0", 0.0)
    return lon0, float(np.clip(lat0, -70.0, 70.0))


class TestRegistryRoundtrip:
    def test_every_code_resolves(self):
        codes = epsg_db.known_codes()
        assert len(codes) >= 150
        for code in codes:
            kind, obj = epsg_db.resolve(code)
            assert kind in ("geographic", "tmerc", "raw")

    def test_every_projected_code_roundtrips(self):
        """Forward→inverse to < 1e-8 deg on a 5×5 grid around each
        projection's own center — catches any bad parameter row."""
        for code in epsg_db.known_codes():
            kind, obj = epsg_db.resolve(code)
            if kind == "geographic":
                continue
            clon, clat = _center(kind, obj)
            dlon, dlat = np.meshgrid(np.linspace(-2, 2, 5), np.linspace(-2, 2, 5))
            lon = clon + dlon.ravel()
            lat = np.clip(clat + dlat.ravel(), -85.0, 85.0)
            if kind == "tmerc":
                x, y, ok = obj.forward(lon, lat)
                assert ok.all(), f"EPSG:{code}"
                lon2, lat2, ok2 = obj.inverse(x, y)
                assert ok2.all(), f"EPSG:{code}"
            else:
                x, y = obj.forward(lon, lat)
                assert np.isfinite(x).all() and np.isfinite(y).all(), f"EPSG:{code}"
                lon2, lat2 = obj.inverse(x, y)
            # wrap lon difference (polar LAEA near lon0±180)
            dl = (np.asarray(lon2) - lon + 180.0) % 360.0 - 180.0
            assert np.abs(dl * np.cos(np.radians(lat))).max() < 1e-8, f"EPSG:{code}"
            assert np.abs(np.asarray(lat2) - lat).max() < 1e-8, f"EPSG:{code}"

    def test_transformer_dispatch(self):
        """Transformer.from_crs works for registry codes end-to-end."""
        for crs in ("EPSG:27700", "EPSG:2154", "EPSG:3035", "EPSG:3577",
                    "EPSG:25832", "EPSG:28355", "EPSG:3395", "EPSG:5070"):
            t = Transformer.from_crs("EPSG:4326", crs)
            code = int(crs.split(":")[1])
            kind, obj = (t._dst if code != 4326 else t._src)
            clon, clat = (0.0, 0.0) if kind == "geographic" else _center(
                kind, obj.p if hasattr(obj, "p") else obj)
            x, y, ok = t.transform_with_errors([clon + 1.0], [clat + 1.0])
            assert ok.all(), crs
            inv = Transformer.from_crs(crs, "EPSG:4326")
            lon, lat, ok2 = inv.transform_with_errors(x, y)
            assert ok2.all(), crs
            # cross-datum CRSs pay the 2-D datum pipeline's cm-level
            # height-drop residual; same-datum stays 1e-8
            tol = 1e-8 if t._datums is None else 1e-6
            assert abs(lon[0] - (clon + 1.0)) < tol
            assert abs(lat[0] - (clat + 1.0)) < tol


class TestPinnedValues:
    def test_osgb_worked_example(self):
        # OS Guide Annex C: 52°39'27.2531"N 1°43'4.5177"E (OSGB36
        # latitude/longitude, EPSG:4277)
        #   -> E 651409.903  N 313177.270  (TM on Airy 1830)
        lat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
        lon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0
        x, y, ok = transform_points("EPSG:4277", "EPSG:27700", [lon], [lat])
        assert ok.all()
        assert x[0] == pytest.approx(651409.903, abs=0.002)
        assert y[0] == pytest.approx(313177.270, abs=0.002)
        # from WGS84 the same numeric lon/lat lands ~120 m away — the
        # OSGB36 Helmert datum shift is applied (round-3 datum path)
        xw, yw, okw = transform_points("EPSG:4326", "EPSG:27700", [lon], [lat])
        assert okw.all()
        d = ((xw[0] - x[0]) ** 2 + (yw[0] - y[0]) ** 2) ** 0.5
        assert 80.0 < d < 180.0

    def test_laea_europe_epsg_guidance_example(self):
        # IOGP GN 7-2 (LAEA oblique): 50°N 5°E -> N 2999718.85, E 3962799.45
        x, y, ok = transform_points("EPSG:4326", "EPSG:3035", [5.0], [50.0])
        assert ok.all()
        assert x[0] == pytest.approx(3962799.45, abs=0.02)
        assert y[0] == pytest.approx(2999718.85, abs=0.02)

    def test_laea_natural_origin(self):
        # at (lon0, lat0) the LAEA forward is exactly (FE, FN)
        x, y, ok = transform_points("EPSG:4326", "EPSG:3035", [10.0], [52.0])
        assert ok.all()
        assert x[0] == pytest.approx(4321000.0, abs=1e-6)
        assert y[0] == pytest.approx(3210000.0, abs=1e-6)

    def test_lcc_natural_origin(self):
        # Lambert-93: at (3E, 46.5N) forward is exactly (700000, 6600000)
        x, y, ok = transform_points("EPSG:4326", "EPSG:2154", [3.0], [46.5])
        assert ok.all()
        assert x[0] == pytest.approx(700000.0, abs=1e-6)
        assert y[0] == pytest.approx(6600000.0, abs=1e-6)

    def test_mga55_flinders_peak(self):
        # GDA94 technical manual: Flinders Peak
        #   37°57'03.7203"S 144°25'29.5244"E -> E 273741.297 N 5796489.777
        lat = -(37.0 + 57.0 / 60.0 + 3.7203 / 3600.0)
        lon = 144.0 + 25.0 / 60.0 + 29.5244 / 3600.0
        x, y, ok = transform_points("EPSG:4326", "EPSG:28355", [lon], [lat])
        assert ok.all()
        assert x[0] == pytest.approx(273741.297, abs=0.002)
        assert y[0] == pytest.approx(5796489.777, abs=0.002)

    def test_snyder_laea_ellipsoidal_example(self):
        # Snyder PP 1395 p. 334: Clarke 1866, lat0=40 lon0=-100,
        # point (30N, 110W) -> x=-965932.1  y=-1056814.9
        from gdal_ray.proj.azimuthal import LambertAzimuthalEqualArea
        from gdal_ray.proj.transverse_mercator import Ellipsoid

        clarke = Ellipsoid(a=6378206.4, f=1 - 6356583.8 / 6378206.4)
        laea = LambertAzimuthalEqualArea(lat0=40.0, lon0=-100.0,
                                         ellipsoid=clarke)
        x, y = laea.forward(-110.0, 30.0)
        assert x == pytest.approx(-965932.1, abs=0.5)
        assert y == pytest.approx(-1056814.9, abs=0.5)

    def test_mercator_3395_closed_form(self):
        # engine EPSG:3395 vs an independently-written scalar formula
        import math

        a = 6378137.0
        e = math.sqrt(1.0 / 298.257223563 * (2.0 - 1.0 / 298.257223563))
        lon, lat = 12.5, 55.75
        phi = math.radians(lat)
        es = e * math.sin(phi)
        y_ref = a * math.log(
            math.tan(math.pi / 4.0 + phi / 2.0)
            * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
        )
        x, y, ok = transform_points("EPSG:4326", "EPSG:3395", [lon], [lat])
        assert ok.all()
        assert x[0] == pytest.approx(math.radians(lon) * a, rel=1e-14)
        assert y[0] == pytest.approx(y_ref, rel=1e-12)

    def test_southern_albers_quadrant(self):
        # EPSG:3577 (std parallels -18/-36 => n < 0): points north and
        # south of the origin must land on the correct side and invert
        x, y, ok = transform_points("EPSG:4326", "EPSG:3577",
                                    [132.0, 140.0, 120.0],
                                    [-25.0, -12.0, -40.0])
        assert ok.all()
        assert y[0] < 0  # south of lat0=0 -> negative northing
        lon, lat, ok2 = transform_points("EPSG:3577", "EPSG:4326", x, y)
        assert ok2.all()
        np.testing.assert_allclose(lon, [132.0, 140.0, 120.0], atol=1e-8)
        np.testing.assert_allclose(lat, [-25.0, -12.0, -40.0], atol=1e-8)

    def test_polar_laea_roundtrip(self):
        # EASE-Grid 2.0 North/South (polar aspect)
        for crs, lats in (("EPSG:6931", [60.0, 75.0, 89.0]),
                          ("EPSG:6932", [-60.0, -75.0, -89.0])):
            lons = [-120.0, 30.0, 179.0]
            x, y, ok = transform_points("EPSG:4326", crs, lons, lats)
            assert ok.all(), crs
            lon2, lat2, ok2 = transform_points(crs, "EPSG:4326", x, y)
            assert ok2.all(), crs
            dl = (np.asarray(lon2) - lons + 180.0) % 360.0 - 180.0
            np.testing.assert_allclose(dl, 0.0, atol=1e-8)
            np.testing.assert_allclose(lat2, lats, atol=1e-8)

    def test_sphere_laea_us_atlas(self):
        # EPSG:2163 / 9311 use an authalic sphere (e = 0 analytic limit)
        x, y, ok = transform_points("EPSG:4326", "EPSG:9311",
                                    [-100.0, -80.0], [45.0, 30.0])
        assert ok.all()
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        lon, lat, ok2 = transform_points("EPSG:9311", "EPSG:4326", x, y)
        assert ok2.all()
        np.testing.assert_allclose(lon, [-100.0, -80.0], atol=1e-8)
        np.testing.assert_allclose(lat, [45.0, 30.0], atol=1e-8)

    def test_geographic_codes_identity(self):
        x, y, ok = transform_points("EPSG:4258", "EPSG:4326", [5.5], [50.5])
        assert ok.all() and x[0] == 5.5 and y[0] == 50.5
