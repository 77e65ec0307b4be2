"""Conic projections, pure numpy: Lambert Conformal Conic (2SP) and
Albers Equal Area — the PROJ ``+proj=lcc`` / ``+proj=aea`` formulas
(Snyder, "Map Projections — A Working Manual", USGS PP 1395,
pp. 107-109 and 101-102; the same equations PROJ implements and the
reference's OGRProjCT applies for CRSs like EPSG:5070 / 102004).

Forward and inverse, ellipsoidal form; vectorized."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gdal_ray.proj.transverse_mercator import Ellipsoid, GRS80


def _msnyder(phi, e):
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


def _tsnyder(phi, e):
    es = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - es) / (1.0 + es)
    ) ** (e / 2.0)


@dataclass(frozen=True)
class LambertConformalConic:
    """LCC 2SP (Snyder eq. 15-1..15-11)."""

    lat1: float  # first standard parallel (deg)
    lat2: float  # second standard parallel (deg)
    lat0: float  # latitude of origin (deg)
    lon0: float  # central meridian (deg)
    x0: float = 0.0
    y0: float = 0.0
    ellipsoid: Ellipsoid = GRS80

    def _params(self):
        e = self.ellipsoid.e
        a = self.ellipsoid.a
        p1, p2, p0 = map(np.radians, (self.lat1, self.lat2, self.lat0))
        m1 = _msnyder(p1, e)
        m2 = _msnyder(p2, e)
        t1 = _tsnyder(p1, e)
        t2 = _tsnyder(p2, e)
        t0 = _tsnyder(p0, e)
        if abs(self.lat1 - self.lat2) < 1e-12:
            n = np.sin(p1)
        else:
            n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        F = m1 / (n * t1**n)
        rho0 = a * F * t0**n
        return a, e, n, F, rho0

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, np.float64))
        lat = np.radians(np.asarray(lat, np.float64))
        a, e, n, F, rho0 = self._params()
        t = _tsnyder(lat, e)
        rho = a * F * t**n
        theta = n * (lon - np.radians(self.lon0))
        x = self.x0 + rho * np.sin(theta)
        y = self.y0 + rho0 - rho * np.cos(theta)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64) - self.x0
        y = np.asarray(y, np.float64)
        a, e, n, F, rho0 = self._params()
        yp = rho0 - (y - self.y0)
        rho = np.sign(n) * np.hypot(x, yp)
        theta = np.arctan2(np.sign(n) * x, np.sign(n) * yp)
        t = (rho / (a * F)) ** (1.0 / n)
        # iterate Snyder 7-9 for phi
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            es = e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
            )
        lon = np.degrees(theta / n + np.radians(self.lon0))
        return lon, np.degrees(phi)


@dataclass(frozen=True)
class AlbersEqualArea:
    """Albers equal-area conic 2SP (Snyder eq. 14-1..14-21)."""

    lat1: float
    lat2: float
    lat0: float
    lon0: float
    x0: float = 0.0
    y0: float = 0.0
    ellipsoid: Ellipsoid = GRS80

    def _q(self, phi):
        e = self.ellipsoid.e
        s = np.sin(phi)
        es = e * s
        return (1.0 - e * e) * (
            s / (1.0 - es * es)
            - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
        )

    def _params(self):
        e = self.ellipsoid.e
        a = self.ellipsoid.a
        p1, p2, p0 = map(np.radians, (self.lat1, self.lat2, self.lat0))
        m1 = _msnyder(p1, e)
        m2 = _msnyder(p2, e)
        q1 = self._q(p1)
        q2 = self._q(p2)
        q0 = self._q(p0)
        if abs(self.lat1 - self.lat2) < 1e-12:
            n = np.sin(p1)
        else:
            n = (m1 * m1 - m2 * m2) / (q2 - q1)
        C = m1 * m1 + n * q1
        rho0 = a * np.sqrt(C - n * q0) / n
        return a, e, n, C, rho0

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, np.float64))
        lat = np.radians(np.asarray(lat, np.float64))
        a, e, n, C, rho0 = self._params()
        q = self._q(lat)
        rho = a * np.sqrt(C - n * q) / n
        theta = n * (lon - np.radians(self.lon0))
        x = self.x0 + rho * np.sin(theta)
        y = self.y0 + rho0 - rho * np.cos(theta)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64) - self.x0
        y = np.asarray(y, np.float64)
        a, e, n, C, rho0 = self._params()
        yp = rho0 - (y - self.y0)
        rho = np.hypot(x, yp)
        # Snyder p. 102: for n < 0 (southern standard parallels) rho
        # is negative and theta comes from the reflected quadrant
        if n < 0:
            theta = np.arctan2(-x, -yp)
        else:
            theta = np.arctan2(x, yp)
        q = (C - (rho * n / a) ** 2) / n
        # iterate Snyder 3-16 for phi
        e2 = e * e
        beta_arg = np.clip(q / (1.0 - (1.0 - e2) / (2.0 * e) * np.log(
            (1.0 - e) / (1.0 + e)
        )), -1.0, 1.0)
        phi = np.arcsin(beta_arg)
        for _ in range(10):
            s = np.sin(phi)
            es = e * s
            phi = phi + ((1.0 - es * es) ** 2 / (2.0 * np.cos(phi))) * (
                q / (1.0 - e2)
                - s / (1.0 - es * es)
                + (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
            )
        lon = np.degrees(theta / n + np.radians(self.lon0))
        return lon, np.degrees(phi)


# Named CRS instances (the two most common North-American conic CRSs)
EPSG_5070 = AlbersEqualArea(  # NAD83 / Conus Albers
    lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0, x0=0.0, y0=0.0,
    ellipsoid=GRS80,
)
ESRI_102004 = LambertConformalConic(  # USA Contiguous LCC
    lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0, x0=0.0, y0=0.0,
    ellipsoid=GRS80,
)
