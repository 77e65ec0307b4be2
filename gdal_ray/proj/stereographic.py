"""Polar Stereographic (EPSG methods 9810 variant A / 9829 variant B),
Oblique ("Double") Stereographic (EPSG 9809) and Krovak (EPSG 9819),
pure numpy — the remaining reference projection families
(ogr/ogrspatialreference.cpp importFromEPSG role; PROJ ``+proj=stere``
/ ``+proj=sterea`` / ``+proj=krovak``). Formulas from IOGP Guidance
Note 7-2 §3.2.3 / §3.2.4 / §3.2.9 and Snyder PP 1395 ch. 21; each
class is pinned against the GN7-2 worked example in
tests/test_stereographic.py. Forward and inverse, vectorized."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gdal_ray.proj.transverse_mercator import Ellipsoid, WGS84


def _t_polar(phi, e, south: bool):
    """GN7-2 polar t. North: tan(π/4 − φ/2)·[(1+e sinφ)/(1−e sinφ)]^(e/2);
    south aspect works on the negated sphere."""
    if south:
        phi = -phi
    es = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) * (
        (1.0 + es) / (1.0 - es)
    ) ** (e / 2.0)


def _chi_to_phi(chi, e):
    """Conformal → geodetic latitude (Snyder eq. 3-5 series)."""
    e2 = e * e
    return chi + (
        (e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0
         + 13.0 * e2**4 / 360.0) * np.sin(2.0 * chi)
        + (7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0
           + 811.0 * e2**4 / 11520.0) * np.sin(4.0 * chi)
        + (7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0) * np.sin(6.0 * chi)
        + (4279.0 * e2**4 / 161280.0) * np.sin(8.0 * chi)
    )


@dataclass(frozen=True)
class PolarStereographic:
    """Variant A (``k0`` given, natural origin at the pole) or
    variant B (``lat_ts`` standard parallel given) — pass one of the
    two. ``lat0`` = +90 (north aspect) or −90 (south aspect)."""

    lat0: float
    lon0: float
    k0: float | None = None
    lat_ts: float | None = None
    x0: float = 0.0
    y0: float = 0.0
    ellipsoid: Ellipsoid = WGS84

    @property
    def south(self) -> bool:
        return self.lat0 < 0

    def _k0(self) -> float:
        if self.k0 is not None:
            return self.k0
        # variant B: k0 from the standard parallel (GN7-2 §3.2.3.2);
        # both aspects reduce to the north-equivalent sphere
        e = self.ellipsoid.e
        phi = np.radians(self.lat_ts)
        if self.south:
            phi = -phi
        es = e * np.sin(phi)
        m_f = np.cos(phi) / np.sqrt(1.0 - es * es)
        t_f = np.tan(np.pi / 4.0 - phi / 2.0) * (
            (1.0 + es) / (1.0 - es)) ** (e / 2.0)
        big = np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        return float(m_f * big / (2.0 * t_f))

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        a, e = self.ellipsoid.a, self.ellipsoid.e
        k0 = self._k0()
        lam = np.radians(lon - self.lon0)
        lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
        t = _t_polar(np.radians(lat), e, self.south)
        big = np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        rho = 2.0 * a * k0 * t / big
        if self.south:
            # GN7-2 south: θ measured from the λ0 direction, N = FN + ρcosθ
            x = self.x0 + rho * np.sin(lam)
            y = self.y0 + rho * np.cos(lam)
        else:
            x = self.x0 + rho * np.sin(lam)
            y = self.y0 - rho * np.cos(lam)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        a, e = self.ellipsoid.a, self.ellipsoid.e
        k0 = self._k0()
        xp = x - self.x0
        yp = y - self.y0
        rho = np.hypot(xp, yp)
        big = np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        t = rho * big / (2.0 * a * k0)
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = _chi_to_phi(chi, e)
        if self.south:
            lam = np.arctan2(xp, yp)
            phi = -phi
        else:
            lam = np.arctan2(xp, -yp)
        return self.lon0 + np.degrees(lam), np.degrees(phi)


@dataclass(frozen=True)
class ObliqueStereographic:
    """EPSG 9809 Oblique Stereographic ("double" stereographic via the
    conformal sphere) — the RD New / Amersfoort method (GN7-2
    §3.2.4)."""

    lat0: float
    lon0: float
    k0: float = 1.0
    x0: float = 0.0
    y0: float = 0.0
    ellipsoid: Ellipsoid = WGS84

    def _consts(self):
        a, e = self.ellipsoid.a, self.ellipsoid.e
        e2 = e * e
        p0 = np.radians(self.lat0)
        s0 = np.sin(p0)
        rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
        nu0 = a / np.sqrt(1.0 - e2 * s0 * s0)
        R = np.sqrt(rho0 * nu0)
        n = np.sqrt(1.0 + e2 * np.cos(p0) ** 4 / (1.0 - e2))
        S1 = (1.0 + s0) / (1.0 - s0)
        S2 = (1.0 - e * s0) / (1.0 + e * s0)
        w1 = (S1 * S2**e) ** n
        sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
        c = ((n + s0) * (1.0 - sin_chi0)) / ((n - s0) * (1.0 + sin_chi0))
        w2 = c * w1
        chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
        return R, n, c, chi0

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        e = self.ellipsoid.e
        R, n, c, chi0 = self._consts()
        phi = np.radians(lat)
        s = np.sin(phi)
        Sa = (1.0 + s) / (1.0 - s)
        Sb = (1.0 - e * s) / (1.0 + e * s)
        w = c * (Sa * Sb**e) ** n
        chi = np.arcsin((w - 1.0) / (w + 1.0))
        dlam = n * np.radians(lon - self.lon0)
        dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
        B = 1.0 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(
            chi0) * np.cos(dlam)
        x = self.x0 + 2.0 * R * self.k0 * np.cos(chi) * np.sin(dlam) / B
        y = self.y0 + 2.0 * R * self.k0 * (
            np.sin(chi) * np.cos(chi0)
            - np.cos(chi) * np.sin(chi0) * np.cos(dlam)
        ) / B
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        e = self.ellipsoid.e
        R, n, c, chi0 = self._consts()
        xp = x - self.x0
        yp = y - self.y0
        g = 2.0 * R * self.k0 * np.tan(np.pi / 4.0 - chi0 / 2.0)
        h = 4.0 * R * self.k0 * np.tan(chi0) + g
        i = np.arctan2(xp, h + yp)
        j = np.arctan2(xp, g - yp) - i
        chi = chi0 + 2.0 * np.arctan(
            (yp - xp * np.tan(j / 2.0)) / (2.0 * R * self.k0)
        )
        dlam = j + 2.0 * i
        lon = np.degrees(dlam / n) + self.lon0
        # isometric latitude iteration (GN7-2 inverse, ~4 rounds)
        psi = 0.5 * np.log(
            (1.0 + np.sin(chi)) / (c * (1.0 - np.sin(chi)))
        ) / n
        phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
        e2 = e * e
        for _ in range(6):
            es = e * np.sin(phi)
            psi_i = np.log(
                np.tan(phi / 2.0 + np.pi / 4.0)
                * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
            )
            phi = phi - (psi_i - psi) * np.cos(phi) * (
                1.0 - es * es) / (1.0 - e2)
        return lon, np.degrees(phi)


@dataclass(frozen=True)
class Krovak:
    """EPSG 9819 Krovak oblique conformal conic (S-JTSK, GN7-2
    §3.2.9). ``lon0`` is Greenwich-referenced: the EPSG definition's
    longitude of origin 42°30' East of Ferro = 24°50' East of
    Greenwich (Ferro = 17°40' W). ``east_north=True`` emits the
    EPSG:5514 Krovak East North axes (x = −westing, y = −southing);
    False emits (southing X, westing Y)."""

    lat0: float = 49.5
    lon0: float = 24.0 + 50.0 / 60.0
    alpha: float = 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0
    lat_ps: float = 78.5          # pseudo standard parallel
    k0: float = 0.9999
    x0: float = 0.0
    y0: float = 0.0
    east_north: bool = True
    ellipsoid: Ellipsoid = Ellipsoid(a=6377397.155, f=1.0 / 299.1528128)

    def _consts(self):
        a, e = self.ellipsoid.a, self.ellipsoid.e
        e2 = e * e
        pC = np.radians(self.lat0)
        sC = np.sin(pC)
        A_ = a * np.sqrt(1.0 - e2) / (1.0 - e2 * sC * sC)
        B = np.sqrt(1.0 + e2 * np.cos(pC) ** 4 / (1.0 - e2))
        g0 = np.arcsin(sC / B)
        t0 = (
            np.tan(np.pi / 4.0 + g0 / 2.0)
            * ((1.0 + e * sC) / (1.0 - e * sC)) ** (e * B / 2.0)
            / np.tan(np.pi / 4.0 + pC / 2.0) ** B
        )
        n = np.sin(np.radians(self.lat_ps))
        r0 = self.k0 * A_ / np.tan(np.radians(self.lat_ps))
        return e, B, g0, t0, n, r0

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        e, B, g0, t0, n, r0 = self._consts()
        phi = np.radians(lat)
        es = e * np.sin(phi)
        # conformal latitude on the Krovak sphere
        U = 2.0 * (
            np.arctan(
                t0 * np.tan(phi / 2.0 + np.pi / 4.0) ** B
                / ((1.0 + es) / (1.0 - es)) ** (e * B / 2.0)
            )
            - np.pi / 4.0
        )
        V = B * np.radians(self.lon0 - lon)   # westward positive
        aC = np.radians(self.alpha)
        T = np.arcsin(
            np.cos(aC) * np.sin(U) + np.sin(aC) * np.cos(U) * np.cos(V)
        )
        D = np.arcsin(np.cos(U) * np.sin(V) / np.cos(T))
        theta = n * D
        r = r0 * np.tan(np.pi / 4.0 + np.radians(self.lat_ps) / 2.0) ** n \
            / np.tan(T / 2.0 + np.pi / 4.0) ** n
        X = r * np.cos(theta) + self.x0   # southing
        Y = r * np.sin(theta) + self.y0   # westing
        if self.east_north:
            return -Y, -X
        return X, Y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        if self.east_north:
            X, Y = -y, -x
        else:
            X, Y = x, y
        e, B, g0, t0, n, r0 = self._consts()
        Xp = X - self.x0
        Yp = Y - self.y0
        r = np.hypot(Xp, Yp)
        theta = np.arctan2(Yp, Xp)
        D = theta / n
        sp = np.radians(self.lat_ps)
        T = 2.0 * (
            np.arctan(
                (r0 / r) ** (1.0 / n) * np.tan(sp / 2.0 + np.pi / 4.0)
            )
            - np.pi / 4.0
        )
        aC = np.radians(self.alpha)
        U = np.arcsin(
            np.cos(aC) * np.sin(T) - np.sin(aC) * np.cos(T) * np.cos(D)
        )
        V = np.arcsin(np.cos(T) * np.sin(D) / np.cos(U))
        lon = self.lon0 - np.degrees(V / B)
        # invert the conformal latitude by fixed point (~5 rounds)
        phi = U.copy()
        for _ in range(8):
            es = e * np.sin(phi)
            phi = 2.0 * (
                np.arctan(
                    t0 ** (-1.0 / B)
                    * np.tan(U / 2.0 + np.pi / 4.0) ** (1.0 / B)
                    * ((1.0 + es) / (1.0 - es)) ** (e / 2.0)
                )
                - np.pi / 4.0
            )
        return lon, np.degrees(phi)
