"""Ellipsoidal Mercator (1SP/2SP) and Lambert Azimuthal Equal Area,
pure numpy — the PROJ ``+proj=merc`` / ``+proj=laea`` formulas
(Snyder, USGS PP 1395, pp. 41-47 and 182-190; EPSG methods 9804/9805
and 9820), the methods OGRProjCT applies for CRSs like EPSG:3395 and
EPSG:3035.  Forward and inverse, vectorized; sphere (e = 0) handled
as the analytic limit (EPSG:2163 / 9311 use an authalic sphere)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gdal_ray.proj.transverse_mercator import Ellipsoid, WGS84


def _t_snyder(phi, e):
    es = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - es) / (1.0 + es)
    ) ** (e / 2.0)


def _m_snyder(phi, e):
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


@dataclass(frozen=True)
class Mercator:
    """Mercator variant A (k0 given) / variant B (pass the standard
    parallel via ``lat_ts``) — Snyder eq. 7-6..7-10 ellipsoidal."""

    lon0: float = 0.0
    k0: float = 1.0
    lat_ts: float | None = None
    x0: float = 0.0
    y0: float = 0.0
    ellipsoid: Ellipsoid = WGS84

    def _k(self) -> float:
        if self.lat_ts is not None:
            return float(_m_snyder(np.radians(self.lat_ts), self.ellipsoid.e))
        return self.k0

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        a, e = self.ellipsoid.a, self.ellipsoid.e
        k = self._k()
        x = self.x0 + a * k * np.radians(lon - self.lon0)
        t = _t_snyder(np.radians(lat), e)
        with np.errstate(divide="ignore", invalid="ignore"):
            y = self.y0 - a * k * np.log(t)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        a, e = self.ellipsoid.a, self.ellipsoid.e
        k = self._k()
        lon = self.lon0 + np.degrees((x - self.x0) / (a * k))
        t = np.exp(-(y - self.y0) / (a * k))
        # Snyder eq. 7-9: fixed-point for phi (converges in ~4 iters)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            es = e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
            )
        return lon, np.degrees(phi)


def _q_auth(phi, e):
    """Snyder eq. 3-12: authalic q.  e = 0 → 2 sin(phi)."""
    s = np.sin(phi)
    if e == 0.0:
        return 2.0 * s
    es = e * s
    return (1.0 - e * e) * (
        s / (1.0 - es * es) - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
    )


@dataclass(frozen=True)
class LambertAzimuthalEqualArea:
    """LAEA, oblique/polar aspect, ellipsoidal (Snyder eq. 24-2..24-16,
    3-11/3-12/3-18; EPSG method 9820)."""

    lat0: float
    lon0: float
    x0: float = 0.0
    y0: float = 0.0
    ellipsoid: Ellipsoid = WGS84

    def _params(self):
        a, e = self.ellipsoid.a, self.ellipsoid.e
        qp = _q_auth(np.pi / 2.0, e)
        p0 = np.radians(self.lat0)
        q0 = _q_auth(p0, e)
        beta0 = np.arcsin(np.clip(q0 / qp, -1.0, 1.0))
        rq = a * np.sqrt(qp / 2.0)
        polar = abs(abs(self.lat0) - 90.0) < 1e-12
        if polar:
            d = 1.0
        else:
            d = a * _m_snyder(p0, e) / (rq * np.cos(beta0))
        return a, e, qp, beta0, rq, d, polar

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        a, e, qp, beta0, rq, d, polar = self._params()
        lam = np.radians(lon - self.lon0)
        # wrap to [-180, 180)
        lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
        q = _q_auth(np.radians(lat), e)
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        if polar:
            north = self.lat0 > 0
            with np.errstate(invalid="ignore"):
                rho = a * np.sqrt(qp - q) if north else a * np.sqrt(qp + q)
            x = self.x0 + rho * np.sin(lam)
            y = self.y0 + (-rho if north else rho) * np.cos(lam)
            return x, y
        sb0, cb0 = np.sin(beta0), np.cos(beta0)
        sb, cb = np.sin(beta), np.cos(beta)
        cl = np.cos(lam)
        denom = 1.0 + sb0 * sb + cb0 * cb * cl
        with np.errstate(divide="ignore", invalid="ignore"):
            b = rq * np.sqrt(2.0 / denom)
        x = self.x0 + b * d * cb * np.sin(lam)
        y = self.y0 + (b / d) * (cb0 * sb - sb0 * cb * cl)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        a, e, qp, beta0, rq, d, polar = self._params()
        xp = x - self.x0
        yp = y - self.y0
        if polar:
            north = self.lat0 > 0
            rho = np.hypot(xp, yp)
            with np.errstate(divide="ignore", invalid="ignore"):
                q = qp - (rho / a) ** 2 if north else (rho / a) ** 2 - qp
            lam = (np.arctan2(xp, -yp) if north else np.arctan2(xp, yp))
            beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                rho = np.hypot(xp / d, d * yp)
                ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
                sce, cce = np.sin(ce), np.cos(ce)
                sb0, cb0 = np.sin(beta0), np.cos(beta0)
                beta = np.arcsin(
                    np.clip(
                        cce * sb0
                        + np.where(rho == 0, 0.0, d * yp * sce * cb0 / np.where(rho == 0, 1.0, rho)),
                        -1.0, 1.0,
                    )
                )
                lam = np.arctan2(
                    xp * sce, d * rho * cb0 * cce - d * d * yp * sb0 * sce
                )
        # authalic → geodetic latitude (Snyder eq. 3-18)
        e2 = e * e
        phi = beta + (
            (e2 / 3.0 + 31.0 * e2**2 / 180.0 + 517.0 * e2**3 / 5040.0)
            * np.sin(2.0 * beta)
            + (23.0 * e2**2 / 360.0 + 251.0 * e2**3 / 3780.0)
            * np.sin(4.0 * beta)
            + (761.0 * e2**3 / 45360.0) * np.sin(6.0 * beta)
        )
        return self.lon0 + np.degrees(lam), np.degrees(phi)
