"""Cached CRS→CRS transformer — the OGRProjCT analogue.

Reference semantics reproduced here:
- expensive construction, cheap vectorized application
  (``OGRProjCT`` builds a PROJ pipeline once, then calls
  ``TransformWithErrorCodes(n, x[], y[], …, success[])`` in bulk,
  ogr/ogrct.cpp:665, :1793, :2359) — we build numpy projection
  objects once and cache them per process;
- per-point success flags instead of exceptions (ogr/ogrct.cpp:2359);
- ``always_xy`` lon/lat axis order (what ogr2ogr uses via
  ``OAMS_TRADITIONAL_GIS_ORDER``).

Supported CRS ids (enough for the north-star pipelines; the full PROJ
database is deliberately out of scope — SURVEY.md Appendix B):
- ``EPSG:4326`` (WGS84 lon/lat), ``EPSG:4269`` (NAD83), ``EPSG:4267``
  (NAD27) — geographic
- ``EPSG:3857`` — spherical WebMercator
- ``EPSG:326xx`` / ``EPSG:327xx`` — WGS84 UTM north/south
- ``EPSG:267xx`` — NAD27 (Clarke 1866) UTM north
- ``EPSG:269xx`` — NAD83 (GRS80) UTM north

Datum shifts: cross-datum transforms apply NTv2 ``.gsb`` grid shifts
(``proj/ntv2.py``, round 4 — bilinear, multi-subgrid, fixed-point
inverse) wherever a registered grid covers the point, and otherwise
fall back to the nominal national towgs84 Helmert via
``proj/datum.py`` (geographic → geocentric → position-vector
7-parameter → geographic) — PROJ's ``hgridshift``-then-``helmert``
precedence.  NADCON ``.los/.las`` and OSTN15 remain unparsed grid
FORMATS (they would feed the same ``GRID_SHIFTS`` registry).
"""

from __future__ import annotations

import functools

import numpy as np

from gdal_ray.proj import webmercator
from gdal_ray.proj.transverse_mercator import (
    CLARKE1866,
    GRS80,
    WGS84,
    TransverseMercator,
    utm,
)

_GEOGRAPHIC = {"EPSG:4326", "EPSG:4267", "EPSG:4269", "CRS:84", "OGC:CRS84"}


def _norm(crs: str) -> str:
    c = str(crs).strip().upper()
    if c in ("WGS84", "CRS:84", "OGC:CRS84"):
        return "EPSG:4326"
    if c.isdigit():
        return f"EPSG:{c}"
    return c


@functools.lru_cache(maxsize=256)
class _ConicAdapter:
    """Wrap a conic projection object with the (x, y, ok) contract."""

    def __init__(self, proj):
        self.p = proj

    def forward(self, lon, lat):
        x, y = self.p.forward(lon, lat)
        ok = np.isfinite(x) & np.isfinite(y)
        return x, y, ok

    def inverse(self, x, y):
        lon, lat = self.p.inverse(x, y)
        ok = np.isfinite(lon) & np.isfinite(lat)
        return lon, lat, ok


def _projection(crs: str):
    """Return (kind, obj): kind ∈ {geographic, webmercator, tmerc,
    conic}."""
    c = _norm(crs)
    if c in _GEOGRAPHIC:
        return ("geographic", None)
    if c in ("EPSG:3857", "EPSG:900913", "EPSG:3785"):
        return ("webmercator", None)
    if c in ("EPSG:5070", "ESRI:102003"):
        from gdal_ray.proj.conic import EPSG_5070

        return ("conic", _ConicAdapter(EPSG_5070))
    if c == "ESRI:102004":
        from gdal_ray.proj.conic import ESRI_102004

        return ("conic", _ConicAdapter(ESRI_102004))
    if c.startswith("EPSG:"):
        code = int(c.split(":")[1])
        if 32601 <= code <= 32660:
            return ("tmerc", utm(code - 32600, north=True, ellipsoid=WGS84))
        if 32701 <= code <= 32760:
            return ("tmerc", utm(code - 32700, north=False, ellipsoid=WGS84))
        if 26701 <= code <= 26722:  # NAD27 UTM (byte.tif is 26711)
            return ("tmerc", utm(code - 26700, north=True, ellipsoid=CLARKE1866))
        if 26901 <= code <= 26923:  # NAD83 UTM
            return ("tmerc", utm(code - 26900, north=True, ellipsoid=GRS80))
        # general parameter-table registry (proj/epsg_db.py): named
        # national grids, LCC/Albers/LAEA/Mercator CRSs, more UTM
        # datum families — the importFromEPSG role for the method
        # families this engine implements
        from gdal_ray.proj import epsg_db

        try:
            kind, obj = epsg_db.resolve(code)
        except KeyError:
            pass
        else:
            if kind == "raw":
                return ("conic", _ConicAdapter(obj))
            return (kind, obj)
    raise ValueError(f"unsupported CRS: {crs!r}")


def _datum_for(crs: str):
    """CRS id → Datum (ellipsoid + nominal towgs84).  Non-EPSG ids and
    unlisted codes are WGS84-equivalent (null shift)."""
    from gdal_ray.proj import datum as _dt
    from gdal_ray.proj import epsg_db

    c = _norm(crs)
    if not c.startswith("EPSG:"):
        return _dt.WGS84_DATUM
    try:
        code = int(c.split(":")[1])
    except ValueError:
        return _dt.WGS84_DATUM
    return _dt.DATUMS.get(epsg_db.datum_name(code), _dt.WGS84_DATUM)


class Transformer:
    """pyproj.Transformer-shaped API over the pure-numpy projections.

    ``Transformer.from_crs(src, dst)`` is cached per process: build
    cost is paid once per worker (the actor-pool / per-worker-global
    pattern from SURVEY.md §2.3), application is vectorized.
    """

    def __init__(self, src: str, dst: str):
        self.src = _norm(src)
        self.dst = _norm(dst)
        self._src = _projection(self.src)
        self._dst = _projection(self.dst)
        # datum pipeline (None = same datum / both WGS84-equivalent)
        sd, dd = _datum_for(self.src), _datum_for(self.dst)
        self._datums = None
        if sd.name != dd.name and not (
            sd.is_wgs84_equivalent and dd.is_wgs84_equivalent
        ):
            self._datums = (sd, dd)

    @classmethod
    @functools.lru_cache(maxsize=256)
    def from_crs(cls, src: str, dst: str, always_xy: bool = True) -> "Transformer":
        if not always_xy:
            raise ValueError("only always_xy=True (lon/lat order) is supported")
        return cls(src, dst)

    def transform(self, x, y):
        """Transform arrays; failed points → NaN (success via isfinite)."""
        xo, yo, _ = self.transform_with_errors(x, y)
        return xo, yo

    def transform_with_errors(self, x, y):
        """OGRProjCT::TransformWithErrorCodes analogue: returns
        (x, y, success_mask)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if self.src == self.dst:
            ok = np.isfinite(x) & np.isfinite(y)
            return x, y, ok
        # src → geographic lon/lat
        kind, obj = self._src
        if kind == "geographic":
            lon, lat, ok1 = x, y, np.isfinite(x) & np.isfinite(y)
        elif kind == "webmercator":
            lon, lat, ok1 = webmercator.inverse(x, y)
        else:
            lon, lat, ok1 = obj.inverse(x, y)
        # cross-datum: geocentric Helmert pipeline (h=0, 2-D path)
        if self._datums is not None:
            from gdal_ray.proj import datum as _dt

            lon, lat = _dt.shift_geographic(*self._datums, lon, lat)
        # geographic → dst
        kind, obj = self._dst
        if kind == "geographic":
            xo, yo, ok2 = lon, lat, np.isfinite(lon) & np.isfinite(lat)
        elif kind == "webmercator":
            xo, yo, ok2 = webmercator.forward(lon, lat)
        else:
            xo, yo, ok2 = obj.forward(lon, lat)
        ok = ok1 & ok2
        return (
            np.where(ok, xo, np.nan),
            np.where(ok, yo, np.nan),
            ok,
        )


def transform_points(src: str, dst: str, x, y):
    """One-shot helper (cached transformer under the hood)."""
    return Transformer.from_crs(src, dst).transform_with_errors(x, y)
