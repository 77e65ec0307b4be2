"""EPSG:4326 ↔ EPSG:3857 closed-form transform.

EPSG:3857 ("Pseudo-Mercator") is by definition the *spherical* Mercator
on the WGS84 semi-major axis (R = 6378137), which is exactly the
formula the reference's tiling code uses (gdal2tiles.py:422-430) and
what PROJ computes for +proj=webmerc — so this path and
``gdal_ray.tiles`` agree bit-for-bit.

Out-of-domain handling mirrors OGRProjCT::TransformWithErrorCodes
(ogr/ogrct.cpp:2359): each point carries a success flag; failed points
become NaN with success=False instead of raising.
"""

from __future__ import annotations

import numpy as np

R = 6378137.0
MAX_LAT = 85.05112877980659  # atan(sinh(pi)) in degrees — |y| <= pi*R


def forward(lon, lat):
    """lon/lat degrees → (x, y) EPSG:3857 meters, with success mask."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ok = (
        np.isfinite(lon)
        & np.isfinite(lat)
        & (np.abs(lon) <= 180.0)
        & (np.abs(lat) < 90.0)
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        x = np.where(ok, lon * np.pi / 180.0 * R, np.nan)
        y = np.where(
            ok, R * np.log(np.tan(np.pi / 4.0 + lat * np.pi / 360.0)), np.nan
        )
    return x, y, ok


def inverse(x, y):
    """EPSG:3857 meters → lon/lat degrees, with success mask."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ok = np.isfinite(x) & np.isfinite(y)
    with np.errstate(invalid="ignore", over="ignore"):
        lon = np.where(ok, x / R * 180.0 / np.pi, np.nan)
        lat = np.where(
            ok, (2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0) * 180.0 / np.pi, np.nan
        )
    return lon, lat, ok
