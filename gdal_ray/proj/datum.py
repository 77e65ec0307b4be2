"""Geodetic datum transformation — the OGRCoordinateTransformation
datum-pipeline role (reference: ogr/ogrct.cpp builds a PROJ pipeline
``inv proj → geog → cart → helmert → inv cart → geog → proj``; PROJ's
classic ``+towgs84`` path does geographic → geocentric (src ellipsoid)
→ 7-parameter Helmert into WGS84 → inverse Helmert → geocentric →
geographic (dst ellipsoid)).

Implemented here with the EPSG **Position Vector** convention
(EPSG method 9606, the towgs84 convention; IOGP Guidance Note 7-2
§4.4.3):

    [X']   [tx]            [  1   -rz   ry ] [X]
    [Y'] = [ty] + (1+ds) · [  rz   1   -rx ] [Y]
    [Z']   [tz]            [ -ry   rx   1  ] [Z]

with rotations in arc-seconds and ds in ppm.  The inverse solves the
same linear system exactly (PROJ's approximate negated-parameter
inverse differs by < 1 mm at these rotation magnitudes; the exact
solve gives clean round-trips).

The parameter table carries the nominal national ``towgs84`` values
published in the public EPSG registry / PROJ datum defaults — the
transformation the reference applies when no grid-shift file covers a
point.  Grid-based shifts ARE implemented: NTv2 ``.gsb`` grids
(``proj/ntv2.py``, round 4) registered in ``GRID_SHIFTS`` below take
precedence over the Helmert path wherever a grid covers the point,
matching PROJ's ``hgridshift``-before-``helmert`` pipeline order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gdal_ray.proj.transverse_mercator import (
    CLARKE1866,
    GRS80,
    WGS84,
    Ellipsoid,
)

# ---------------------------------------------------------------------------
# geodetic <-> geocentric (EPSG method 9602)
# ---------------------------------------------------------------------------


def geodetic_to_geocentric(ell: Ellipsoid, lon_deg, lat_deg, h=0.0):
    """Geographic (degrees, ellipsoidal height m) → geocentric X,Y,Z (m)."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * sphi * sphi)
    x = (nu + h) * cphi * np.cos(lam)
    y = (nu + h) * cphi * np.sin(lam)
    z = (nu * (1.0 - ell.e2) + h) * sphi
    return x, y, z


def geocentric_to_geodetic(ell: Ellipsoid, x, y, z):
    """Geocentric X,Y,Z (m) → (lon_deg, lat_deg, h).  Fixed-point
    iteration on latitude (sub-micrometer after 6 rounds away from the
    exact pole; the polar column is handled in closed form)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p = np.hypot(x, y)
    lam = np.arctan2(y, x)
    polar = p < 1e-9
    p_safe = np.where(polar, 1.0, p)
    phi = np.arctan2(z, p_safe * (1.0 - ell.e2))
    h = np.zeros_like(p)
    for _ in range(6):
        sphi = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * sphi * sphi)
        h = p_safe / np.cos(phi) - nu
        phi = np.arctan2(z, p_safe * (1.0 - ell.e2 * nu / (nu + h)))
    # exact pole: lat = ±90, h measured from the semi-minor axis
    b = ell.a * (1.0 - ell.f)
    phi = np.where(polar, np.copysign(np.pi / 2.0, z), phi)
    h = np.where(polar, np.abs(z) - b, h)
    lam = np.where(polar, 0.0, lam)
    return np.degrees(lam), np.degrees(phi), h


# ---------------------------------------------------------------------------
# 7-parameter Helmert (EPSG method 9606, position vector)
# ---------------------------------------------------------------------------


_AS2RAD = np.pi / (180.0 * 3600.0)


@dataclass(frozen=True)
class Helmert:
    """towgs84 parameters: translations m, rotations arc-sec, scale ppm."""

    tx: float = 0.0
    ty: float = 0.0
    tz: float = 0.0
    rx: float = 0.0
    ry: float = 0.0
    rz: float = 0.0
    ds: float = 0.0

    @property
    def is_identity(self) -> bool:
        return not any((self.tx, self.ty, self.tz, self.rx, self.ry,
                        self.rz, self.ds))

    def _matrix(self) -> np.ndarray:
        rx, ry, rz = (self.rx * _AS2RAD, self.ry * _AS2RAD, self.rz * _AS2RAD)
        s = 1.0 + self.ds * 1e-6
        return s * np.array(
            [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]], dtype=np.float64
        )

    def apply(self, x, y, z):
        """Source datum geocentric → WGS84 geocentric."""
        m = self._matrix()
        xo = self.tx + m[0, 0] * x + m[0, 1] * y + m[0, 2] * z
        yo = self.ty + m[1, 0] * x + m[1, 1] * y + m[1, 2] * z
        zo = self.tz + m[2, 0] * x + m[2, 1] * y + m[2, 2] * z
        return xo, yo, zo

    def apply_inverse(self, x, y, z):
        """WGS84 geocentric → source datum geocentric (exact solve)."""
        mi = np.linalg.inv(self._matrix())
        dx, dy, dz = x - self.tx, y - self.ty, z - self.tz
        xo = mi[0, 0] * dx + mi[0, 1] * dy + mi[0, 2] * dz
        yo = mi[1, 0] * dx + mi[1, 1] * dy + mi[1, 2] * dz
        zo = mi[2, 0] * dx + mi[2, 1] * dy + mi[2, 2] * dz
        return xo, yo, zo


@dataclass(frozen=True)
class Datum:
    """A geodetic datum: its ellipsoid + nominal shift into WGS84
    (``to_wgs84 is None`` ⇒ WGS84-equivalent, no shift)."""

    name: str
    ellipsoid: Ellipsoid
    to_wgs84: Helmert | None = None

    @property
    def is_wgs84_equivalent(self) -> bool:
        return self.to_wgs84 is None or self.to_wgs84.is_identity


# Nominal national towgs84 values (public EPSG registry / PROJ datum
# defaults — the grid-less transformation path).
from gdal_ray.proj.epsg_db import (  # noqa: E402  (table constants)
    AIRY1830,
    AIRY_MODIFIED,
    BESSEL1841,
    INTL1924,
    WGS72 as WGS72_ELL,
)

WGS84_DATUM = Datum("WGS84", WGS84)
NAD83 = Datum("NAD83", GRS80)          # towgs84 = 0 (classic treatment)
ETRS89 = Datum("ETRS89", GRS80)
OSGB36 = Datum(
    "OSGB36", AIRY1830,
    Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
)
ED50 = Datum("ED50", INTL1924, Helmert(-87.0, -98.0, -121.0))
NAD27 = Datum("NAD27", CLARKE1866, Helmert(-8.0, 160.0, 176.0))
TOKYO = Datum("TOKYO", BESSEL1841, Helmert(-146.414, 507.337, 680.507))
DHDN = Datum(
    "DHDN", BESSEL1841,
    Helmert(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7),
)
TM65 = Datum(
    "TM65", AIRY_MODIFIED,
    Helmert(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15),
)
WGS72_DATUM = Datum(
    "WGS72", WGS72_ELL, Helmert(0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219)
)
GGRS87 = Datum("GGRS87", GRS80, Helmert(-199.87, 74.79, 246.62))
BD72 = Datum(
    "BD72", INTL1924,
    Helmert(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747),
)
AGD66 = Datum(
    "AGD66", Ellipsoid(a=6378160.0, f=1.0 / 298.25),  # Australian National
    Helmert(-117.808, -51.536, 137.784, 0.303, 0.446, 0.234, -0.29),
)
AMERSFOORT = Datum(
    "AMERSFOORT", BESSEL1841,
    Helmert(565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774,
            4.0725),
)
SJTSK = Datum("SJTSK", BESSEL1841, Helmert(589.0, 76.0, 480.0))

DATUMS = {
    d.name: d
    for d in (
        WGS84_DATUM, NAD83, ETRS89, OSGB36, ED50, NAD27, TOKYO, DHDN,
        TM65, WGS72_DATUM, GGRS87, BD72, AGD66, AMERSFOORT, SJTSK,
    )
}


# NTv2 grid-shift registry: datum name → NTv2Grid whose forward
# direction is datum → WGS84-equivalent (NAD27→NAD83, OSGB36→ETRS89).
# When a grid is registered it takes precedence over the nominal
# Helmert for in-grid points, exactly like PROJ prefers installed
# +nadgrids over +towgs84; out-of-grid points fall back to the Helmert
# (documented deviation from PROJ's hard error — a streaming pipeline
# must not poison a whole batch for one offshore point).
GRID_SHIFTS: dict = {}


def register_grid(datum_name: str, grid) -> None:
    GRID_SHIFTS[datum_name] = grid


def unregister_grid(datum_name: str) -> None:
    GRID_SHIFTS.pop(datum_name, None)


def _helmert_path(src: Datum, dst: Datum, lon, lat):
    if src.is_wgs84_equivalent and dst.is_wgs84_equivalent:
        return lon, lat
    x, y, z = geodetic_to_geocentric(src.ellipsoid, lon, lat)
    if src.to_wgs84 is not None and not src.to_wgs84.is_identity:
        x, y, z = src.to_wgs84.apply(x, y, z)
    if dst.to_wgs84 is not None and not dst.to_wgs84.is_identity:
        x, y, z = dst.to_wgs84.apply_inverse(x, y, z)
    lon2, lat2, _h = geocentric_to_geodetic(dst.ellipsoid, x, y, z)
    return lon2, lat2


def shift_geographic(src: Datum, dst: Datum, lon, lat):
    """Transform geographic lon/lat (degrees, h=0) between datums.

    Grid path first: a registered NTv2 grid on either side shifts
    in-grid points directly on the ellipsoid (sub-meter national
    accuracy); remaining points and remaining datum legs go through
    the geocentric 7-parameter Helmert pipeline (heights assumed 0,
    the 2-D ogr2ogr path)."""
    import numpy as np

    gsrc = GRID_SHIFTS.get(src.name)
    if gsrc is not None:
        glon, glat, inside = gsrc.apply(lon, lat)
        if bool(np.all(inside)):
            lon, lat = glon, glat
        else:
            flon, flat = _helmert_path(src, WGS84_DATUM, lon, lat)
            lon = np.where(inside, glon, flon)
            lat = np.where(inside, glat, flat)
        src = WGS84_DATUM
    gdst = GRID_SHIFTS.get(dst.name)
    if gdst is not None:
        lon, lat = _helmert_path(src, WGS84_DATUM, lon, lat)
        glon, glat, inside = gdst.apply_inverse(lon, lat)
        if bool(np.all(inside)):
            return glon, glat
        flon, flat = _helmert_path(WGS84_DATUM, dst, lon, lat)
        return np.where(inside, glon, flon), np.where(inside, glat, flat)
    return _helmert_path(src, dst, lon, lat)
