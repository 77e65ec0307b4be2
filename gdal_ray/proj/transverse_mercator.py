"""Transverse Mercator (UTM) via the Krüger/Karney series, pure numpy.

Implements the exact-to-nanometers series from Karney, "Transverse
Mercator with an accuracy of a few nanometers" (J. Geodesy 85, 2011) —
the same algorithm PROJ's ``+proj=tmerc`` (and therefore the
reference's OGRProjCT path for UTM CRSs like byte.tif's EPSG:26711,
ogr/ogrct.cpp) uses by default ("poder_engsager" kernel).

6th-order series in the third flattening n; forward/inverse round-trip
agrees to < 1e-9 degrees inside the UTM domain.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Ellipsoid:
    a: float  # semi-major axis (m)
    f: float  # flattening

    @property
    def e2(self) -> float:  # first eccentricity squared
        return self.f * (2.0 - self.f)

    @property
    def e(self) -> float:
        return self.e2**0.5

    @property
    def n(self) -> float:  # third flattening
        return self.f / (2.0 - self.f)


WGS84 = Ellipsoid(a=6378137.0, f=1.0 / 298.257223563)
GRS80 = Ellipsoid(a=6378137.0, f=1.0 / 298.257222101)
# Clarke 1866 is defined by a and b (NAD27 datum ellipsoid).
_CLARKE_A, _CLARKE_B = 6378206.4, 6356583.8
CLARKE1866 = Ellipsoid(a=_CLARKE_A, f=(_CLARKE_A - _CLARKE_B) / _CLARKE_A)


def _series_coeffs(n: float):
    """Karney 2011 eqs. (35)/(36): alpha (forward), beta (inverse), A."""
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    A = (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0) / (1.0 + n)
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
            + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
            - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
            + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
            + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
            - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    return A, alpha, beta


class TransverseMercator:
    """One (ellipsoid, lon0, k0, false easting/northing) projection.

    Build once per worker/actor (OGRProjCT-style cached transformer,
    ogr/ogrct.cpp:665) and apply vectorized.
    """

    def __init__(
        self,
        ellipsoid: Ellipsoid = WGS84,
        lon0: float = 0.0,
        k0: float = 0.9996,
        false_easting: float = 500000.0,
        false_northing: float = 0.0,
    ):
        self.ell = ellipsoid
        self.lon0 = lon0
        self.k0 = k0
        self.fe = false_easting
        self.fn = false_northing
        A, self.alpha, self.beta = _series_coeffs(ellipsoid.n)
        self.A = ellipsoid.a * A
        self._j2 = 2.0 * np.arange(1, 7)  # 2j for j=1..6

    def forward(self, lon, lat):
        """lon/lat degrees → (easting, northing) meters + success mask."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        ok = (
            np.isfinite(lon)
            & np.isfinite(lat)
            & (np.abs(lat) <= 90.0)
        )
        e = self.ell.e
        phi = np.deg2rad(np.where(ok, lat, 0.0))
        lam = np.deg2rad(
            ((np.where(ok, lon, 0.0) - self.lon0 + 180.0) % 360.0) - 180.0
        )
        sphi = np.sin(phi)
        # conformal latitude tau' (Karney eq. 7-9)
        t = np.sinh(
            np.arctanh(np.clip(sphi, -1.0, 1.0))
            - e * np.arctanh(e * np.clip(sphi, -1.0, 1.0))
        )
        clam = np.cos(lam)
        xi_p = np.arctan2(t, clam)
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + clam * clam))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j in range(6):
            a = self.alpha[j]
            xi += a * np.sin(self._j2[j] * xi_p) * np.cosh(self._j2[j] * eta_p)
            eta += a * np.cos(self._j2[j] * xi_p) * np.sinh(self._j2[j] * eta_p)
        x = self.fe + self.k0 * self.A * eta
        y = self.fn + self.k0 * self.A * xi
        return np.where(ok, x, np.nan), np.where(ok, y, np.nan), ok

    def inverse(self, x, y):
        """(easting, northing) meters → lon/lat degrees + success mask."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        ok = np.isfinite(x) & np.isfinite(y)
        eta = (np.where(ok, x, 0.0) - self.fe) / (self.k0 * self.A)
        xi = (np.where(ok, y, 0.0) - self.fn) / (self.k0 * self.A)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j in range(6):
            b = self.beta[j]
            xi_p -= b * np.sin(self._j2[j] * xi) * np.cosh(self._j2[j] * eta)
            eta_p -= b * np.cos(self._j2[j] * xi) * np.sinh(self._j2[j] * eta)
        sheta = np.sinh(eta_p)
        cxi = np.cos(xi_p)
        tau_p = np.sin(xi_p) / np.sqrt(sheta * sheta + cxi * cxi)
        lam = np.arctan2(sheta, cxi)
        # invert tau' -> tau by Newton iteration (Karney eq. 19-21;
        # identical to GeographicLib Math::tauf)
        e = self.ell.e
        e2m = 1.0 - self.ell.e2
        tau = tau_p / e2m  # initial guess
        for _ in range(6):
            tau1 = np.sqrt(1.0 + tau * tau)
            sig = np.sinh(e * np.arctanh(e * tau / tau1))
            taupa = np.sqrt(1.0 + sig * sig) * tau - sig * tau1
            dtau = (
                (tau_p - taupa)
                * (1.0 + e2m * tau * tau)
                / (e2m * tau1 * np.sqrt(1.0 + taupa * taupa))
            )
            tau = tau + dtau
        phi = np.arctan(tau)
        lon = self.lon0 + np.rad2deg(lam)
        lat = np.rad2deg(phi)
        return np.where(ok, lon, np.nan), np.where(ok, lat, np.nan), ok


def utm(zone: int, north: bool = True, ellipsoid: Ellipsoid = WGS84) -> TransverseMercator:
    """Standard UTM zone projection: k0=0.9996, FE=500km, lon0=6·zone−183."""
    return TransverseMercator(
        ellipsoid=ellipsoid,
        lon0=6.0 * zone - 183.0,
        k0=0.9996,
        false_easting=500000.0,
        false_northing=0.0 if north else 10000000.0,
    )
