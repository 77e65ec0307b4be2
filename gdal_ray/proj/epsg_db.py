"""Parameter-table EPSG registry — the OGRSpatialReference
``importFromEPSG`` role for the projection methods this engine
implements (reference: ogr/ogrspatialreference.cpp delegating to the
PROJ database; here the needed parameter rows are literal constants,
sourced from the public EPSG registry definitions and validated by
Snyder worked examples + structural tests in tests/test_proj.py).

Coverage: geographic CRSs, UTM/TM national grids, Gauss-Krüger,
Lambert Conformal Conic (2SP), Albers, Lambert Azimuthal Equal Area,
ellipsoidal Mercator, Polar Stereographic A/B, Oblique ("double")
Stereographic and Krovak — 400+ codes via known_codes() (explicit
rows + enumerated UTM/zone ranges).  Datum shifts use the nominal
national towgs84 Helmert (proj/datum.py) plus any registered NTv2
grids (proj/ntv2.py); without grids this matches a grid-less PROJ
install."""

from __future__ import annotations

from gdal_ray.proj.azimuthal import LambertAzimuthalEqualArea, Mercator
from gdal_ray.proj.conic import AlbersEqualArea, LambertConformalConic
from gdal_ray.proj.transverse_mercator import (
    CLARKE1866,
    GRS80,
    WGS84,
    Ellipsoid,
    TransverseMercator,
    utm,
)

# additional datum ellipsoids (a, 1/f — EPSG ellipsoid definitions)
AIRY1830 = Ellipsoid(a=6377563.396, f=1.0 / 299.3249646)
AIRY_MODIFIED = Ellipsoid(a=6377340.189, f=1.0 / 299.3249646)
INTL1924 = Ellipsoid(a=6378388.0, f=1.0 / 297.0)
BESSEL1841 = Ellipsoid(a=6377397.155, f=1.0 / 299.1528128)
KRASSOWSKY1940 = Ellipsoid(a=6378245.0, f=1.0 / 298.3)
WGS72 = Ellipsoid(a=6378135.0, f=1.0 / 298.26)
# authalic sphere used by US National Atlas (EPSG:2163 / 9311)
SPHERE_CLARKE_AUTHALIC = Ellipsoid(a=6370997.0, f=0.0)

# --- geographic CRSs (lon/lat degrees; datum shift = identity) ---------

GEOGRAPHIC_CODES = {
    4326,  # WGS 84
    4267,  # NAD27
    4269,  # NAD83
    4258,  # ETRS89
    4283,  # GDA94
    7844,  # GDA2020
    4277,  # OSGB36
    4171,  # RGF93 v1
    4230,  # ED50
    4301,  # Tokyo
    4612,  # JGD2000
    6668,  # JGD2011
    4619,  # SWEREF99
    4167,  # NZGD2000
    4490,  # CGCS2000
    4322,  # WGS 72
    4188,  # OSNI 1952
    4299,  # TM65
    4203,  # AGD84
    4202,  # AGD66
}

# --- Transverse Mercator rows: (ellipsoid, lat0, lon0, k0, fe, fn) -----

_TM = {
    27700: (AIRY1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0),   # British National Grid
    29902: (AIRY_MODIFIED, 53.5, -8.0, 1.000035, 200000.0, 250000.0),   # TM65 / Irish Grid
    29903: (AIRY_MODIFIED, 53.5, -8.0, 1.000035, 200000.0, 250000.0),   # TM75 / Irish Grid
    2157: (GRS80, 53.5, -8.0, 0.99982, 600000.0, 750000.0),             # IRENET95 / ITM
    2193: (GRS80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0),           # NZTM2000
    3414: (WGS84, 1.366666666666667, 103.83333333333333, 1.0,
           28001.642, 38744.572),                                        # SVY21 / Singapore TM
    2100: (GRS80, 0.0, 24.0, 0.9996, 500000.0, 0.0),                    # GGRS87 / Greek Grid
    3067: (GRS80, 0.0, 27.0, 0.9996, 500000.0, 0.0),                    # ETRS89 / TM35FIN
    3006: (GRS80, 0.0, 15.0, 0.9996, 500000.0, 0.0),                    # SWEREF99 TM
    2180: (GRS80, 0.0, 19.0, 0.9993, 500000.0, -5300000.0),             # ETRS89 / Poland CS92
    # DHDN / Gauss-Krüger zones 2-5 (Bessel 1841, 3° zones)
    31466: (BESSEL1841, 0.0, 6.0, 1.0, 2500000.0, 0.0),
    31467: (BESSEL1841, 0.0, 9.0, 1.0, 3500000.0, 0.0),
    31468: (BESSEL1841, 0.0, 12.0, 1.0, 4500000.0, 0.0),
    31469: (BESSEL1841, 0.0, 15.0, 1.0, 5500000.0, 0.0),
}

# --- LCC 2SP rows: (ell, lat1, lat2, lat0, lon0, fe, fn) ---------------

_LCC = {
    2154: (GRS80, 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),          # RGF93 / Lambert-93
    31370: (INTL1924, 51.16666723333333, 49.8333339, 90.0,
            4.367486666666666, 150000.013, 5400088.438),                 # Belgian Lambert 72
    3347: (GRS80, 49.0, 77.0, 63.390675, -91.86666666666666,
           6200000.0, 3000000.0),                                        # Statistics Canada Lambert
    3978: (GRS80, 49.0, 77.0, 49.0, -95.0, 0.0, 0.0),                   # NAD83 / Canada Atlas Lambert
    3979: (GRS80, 49.0, 77.0, 49.0, -95.0, 0.0, 0.0),                   # NAD83(CSRS) / Canada Atlas
}

# --- Albers rows: (ell, lat1, lat2, lat0, lon0, fe, fn) ----------------

_AEA = {
    5070: (GRS80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),                   # NAD83 / Conus Albers
    6350: (GRS80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),                   # NAD83(2011) / Conus Albers
    3577: (GRS80, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),                  # GDA94 / Australian Albers
    9473: (GRS80, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),                  # GDA2020 / Australian Albers
    3310: (GRS80, 34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0),            # NAD83 / California Albers
}

# --- LAEA rows: (ell, lat0, lon0, fe, fn) ------------------------------

_LAEA = {
    3035: (GRS80, 52.0, 10.0, 4321000.0, 3210000.0),                    # ETRS89-extended / LAEA Europe
    6931: (WGS84, 90.0, 0.0, 0.0, 0.0),                                 # WGS84 / NSIDC EASE-Grid 2.0 North
    6932: (WGS84, -90.0, 0.0, 0.0, 0.0),                                # EASE-Grid 2.0 South
    3571: (WGS84, 90.0, 180.0, 0.0, 0.0),                               # North Pole LAEA Bering Sea
    3572: (WGS84, 90.0, -150.0, 0.0, 0.0),                              # … Alaska
    3573: (WGS84, 90.0, -100.0, 0.0, 0.0),                              # … Canada
    3574: (WGS84, 90.0, -40.0, 0.0, 0.0),                               # … Atlantic
    3575: (WGS84, 90.0, 10.0, 0.0, 0.0),                                # … Europe
    3576: (WGS84, 90.0, 90.0, 0.0, 0.0),                                # … Russia
    2163: (SPHERE_CLARKE_AUTHALIC, 45.0, -100.0, 0.0, 0.0),             # US National Atlas Equal Area
    9311: (SPHERE_CLARKE_AUTHALIC, 45.0, -100.0, 0.0, 0.0),             # (2163's non-deprecated twin)
}

# --- Mercator rows: (ell, lon0, k0, lat_ts, fe, fn) --------------------

_MERC = {
    3395: (WGS84, 0.0, 1.0, None, 0.0, 0.0),                            # WGS 84 / World Mercator
}

# --- Polar Stereographic rows: (ell, lat0, lon0, k0, lat_ts, fe, fn) ---
# k0 set → variant A (EPSG 9810); lat_ts set → variant B (EPSG 9829)

_PS = {
    3031: (WGS84, -90.0, 0.0, None, -71.0, 0.0, 0.0),        # Antarctic Polar Stereographic
    3032: (WGS84, -90.0, 70.0, None, -71.0, 6000000.0, 6000000.0),  # Australian Antarctic
    3976: (WGS84, -90.0, 0.0, None, -70.0, 0.0, 0.0),        # NSIDC Sea Ice South
    3413: (WGS84, 90.0, -45.0, None, 70.0, 0.0, 0.0),        # NSIDC Sea Ice North
    3995: (WGS84, 90.0, 0.0, None, 71.0, 0.0, 0.0),          # Arctic Polar Stereographic
    5041: (WGS84, 90.0, 0.0, 0.994, None, 2000000.0, 2000000.0),    # UPS North (E,N)
    5042: (WGS84, -90.0, 0.0, 0.994, None, 2000000.0, 2000000.0),   # UPS South (E,N)
    32661: (WGS84, 90.0, 0.0, 0.994, None, 2000000.0, 2000000.0),   # UPS North (legacy code)
    32761: (WGS84, -90.0, 0.0, 0.994, None, 2000000.0, 2000000.0),  # UPS South (legacy code)
}

# --- Oblique ("double") Stereographic rows (EPSG 9809):
#     (ell, lat0, lon0, k0, fe, fn)

_STEREA = {
    28992: (BESSEL1841, 52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
            5.0 + 23.0 / 60.0 + 15.5 / 3600.0, 0.9999079,
            155000.0, 463000.0),                              # Amersfoort / RD New
}

# --- Krovak rows (EPSG 9819): code → east_north axis convention -------

_KROVAK = {
    5514: True,    # S-JTSK / Krovak East North (x = −westing, y = −southing)
    5513: False,   # S-JTSK / Krovak (southing X, westing Y)
    2065: False,   # S-JTSK (Ferro) / Krovak
}


def _tm_with_lat0(ell, lat0, lon0, k0, fe, fn) -> TransverseMercator:
    """EPSG natural-origin TM: northing is measured from lat0 — fold
    the meridian-arc offset into the false northing (exact: along the
    central meridian the series IS the scaled meridian arc)."""
    base = TransverseMercator(ellipsoid=ell, lon0=lon0, k0=k0,
                              false_easting=fe, false_northing=0.0)
    if lat0 != 0.0:
        import numpy as np

        _x, y0, _ok = base.forward(np.array([lon0]), np.array([lat0]))
        fn = fn - float(y0[0])
    return TransverseMercator(ellipsoid=ell, lon0=lon0, k0=k0,
                              false_easting=fe, false_northing=fn)


def resolve(code: int):
    """EPSG code → ('geographic', None) | ('tmerc', obj) |
    ('conic', raw-projection) — raises KeyError when the code is not
    in the registry."""
    if code in GEOGRAPHIC_CODES:
        return ("geographic", None)
    if code in _TM:
        return ("tmerc", _tm_with_lat0(*_TM[code]))
    if code in _LCC:
        ell, lat1, lat2, lat0, lon0, fe, fn = _LCC[code]
        return ("raw", LambertConformalConic(
            lat1=lat1, lat2=lat2, lat0=lat0, lon0=lon0,
            x0=fe, y0=fn, ellipsoid=ell))
    if code in _AEA:
        ell, lat1, lat2, lat0, lon0, fe, fn = _AEA[code]
        return ("raw", AlbersEqualArea(
            lat1=lat1, lat2=lat2, lat0=lat0, lon0=lon0,
            x0=fe, y0=fn, ellipsoid=ell))
    if code in _LAEA:
        ell, lat0, lon0, fe, fn = _LAEA[code]
        return ("raw", LambertAzimuthalEqualArea(
            lat0=lat0, lon0=lon0, x0=fe, y0=fn, ellipsoid=ell))
    if code in _MERC:
        ell, lon0, k0, lat_ts, fe, fn = _MERC[code]
        return ("raw", Mercator(lon0=lon0, k0=k0, lat_ts=lat_ts,
                                x0=fe, y0=fn, ellipsoid=ell))
    if code in _PS:
        from gdal_ray.proj.stereographic import PolarStereographic

        ell, lat0, lon0, k0, lat_ts, fe, fn = _PS[code]
        return ("raw", PolarStereographic(
            lat0=lat0, lon0=lon0, k0=k0, lat_ts=lat_ts,
            x0=fe, y0=fn, ellipsoid=ell))
    if code in _STEREA:
        from gdal_ray.proj.stereographic import ObliqueStereographic

        ell, lat0, lon0, k0, fe, fn = _STEREA[code]
        return ("raw", ObliqueStereographic(
            lat0=lat0, lon0=lon0, k0=k0, x0=fe, y0=fn, ellipsoid=ell))
    if code in _KROVAK:
        from gdal_ray.proj.stereographic import Krovak

        return ("raw", Krovak(east_north=_KROVAK[code]))
    # UTM zone ranges (the WGS84/NAD ranges are also short-circuited in
    # transformer.py; listed here too so known_codes() is the one
    # complete registry accounting)
    if 32601 <= code <= 32660:   # WGS 84 / UTM north
        return ("tmerc", utm(code - 32600, north=True, ellipsoid=WGS84))
    if 32701 <= code <= 32760:   # WGS 84 / UTM south
        return ("tmerc", utm(code - 32700, north=False, ellipsoid=WGS84))
    if 26701 <= code <= 26722:   # NAD27 / UTM north
        return ("tmerc", utm(code - 26700, north=True, ellipsoid=CLARKE1866))
    if 26901 <= code <= 26923:   # NAD83 / UTM north
        return ("tmerc", utm(code - 26900, north=True, ellipsoid=GRS80))
    if 25828 <= code <= 25838:   # ETRS89 / UTM 28N-38N
        return ("tmerc", utm(code - 25800, north=True, ellipsoid=GRS80))
    if 23028 <= code <= 23038:   # ED50 / UTM 28N-38N
        return ("tmerc", utm(code - 23000, north=True, ellipsoid=INTL1924))
    if 28348 <= code <= 28358:   # GDA94 / MGA zones 48-58 (south)
        return ("tmerc", utm(code - 28300, north=False, ellipsoid=GRS80))
    if 7846 <= code <= 7859:     # GDA2020 / MGA zones 46-59 (south)
        return ("tmerc", utm(code - 7800, north=False, ellipsoid=GRS80))
    if 32201 <= code <= 32260:   # WGS 72 / UTM north
        return ("tmerc", utm(code - 32200, north=True, ellipsoid=WGS72))
    if 32301 <= code <= 32360:   # WGS 72 / UTM south
        return ("tmerc", utm(code - 32300, north=False, ellipsoid=WGS72))
    if 2443 <= code <= 2461:     # JGD2000 / Japan Plane Rectangular I-XIX
        return ("tmerc", _japan_prcs(code - 2442, GRS80))
    raise KeyError(f"EPSG:{code} not in the parameter registry")


# Japan Plane Rectangular CS origins (zones I–XIX, JGD2000/GRS80;
# public survey-act constants: lat0/lon0 per zone, k0=0.9999, fe=fn=0)
_JAPAN_PRCS = [
    (33.0, 129.5), (33.0, 131.0), (36.0, 132.1666666666667),
    (33.0, 133.5), (36.0, 134.3333333333333), (36.0, 136.0),
    (36.0, 137.1666666666667), (36.0, 138.5), (36.0, 139.8333333333333),
    (40.0, 140.8333333333333), (44.0, 140.25), (44.0, 142.25),
    (44.0, 144.25), (26.0, 142.0), (26.0, 127.5), (26.0, 124.0),
    (26.0, 131.0), (20.0, 136.0), (26.0, 154.0),
]


def _japan_prcs(zone: int, ell) -> TransverseMercator:
    lat0, lon0 = _JAPAN_PRCS[zone - 1]
    return _tm_with_lat0(ell, lat0, lon0, 0.9999, 0.0, 0.0)


# --- datum assignment (name keys into gdal_ray.proj.datum.DATUMS) ------
# Codes not listed (and zero-shift modern frames) resolve to "WGS84",
# i.e. the classic towgs84=0 null transform.

_DATUM_NAME = {
    # geographic CRSs
    4267: "NAD27", 4269: "NAD83", 4258: "ETRS89", 4277: "OSGB36",
    4230: "ED50", 4301: "TOKYO", 4322: "WGS72", 4299: "TM65",
    4202: "AGD66",
    # projected rows
    27700: "OSGB36", 29902: "TM65", 29903: "TM65", 2100: "GGRS87",
    31466: "DHDN", 31467: "DHDN", 31468: "DHDN", 31469: "DHDN",
    31370: "BD72",
    28992: "AMERSFOORT", 5514: "SJTSK", 5513: "SJTSK", 2065: "SJTSK",
}


def datum_name(code: int) -> str:
    """EPSG code → datum key (the towgs84 lookup role).  Range-based
    codes (UTM families) resolve by zone family; everything else not
    explicitly listed is a WGS84-equivalent modern frame."""
    if code in _DATUM_NAME:
        return _DATUM_NAME[code]
    if 23028 <= code <= 23038:
        return "ED50"
    if 32201 <= code <= 32260 or 32301 <= code <= 32360:
        return "WGS72"
    if 26701 <= code <= 26722:
        return "NAD27"
    if 26901 <= code <= 26923:
        return "NAD83"
    return "WGS84"


def known_codes() -> list[int]:
    """All explicitly-registered codes (ranges enumerated)."""
    codes = sorted(
        set(GEOGRAPHIC_CODES) | set(_TM) | set(_LCC) | set(_AEA)
        | set(_LAEA) | set(_MERC) | set(_PS) | set(_STEREA) | set(_KROVAK)
    )
    for lo, hi in ((25828, 25838), (23028, 23038), (28348, 28358),
                   (7846, 7859), (32201, 32260), (32301, 32360),
                   (2443, 2461), (32601, 32660), (32701, 32760),
                   (26701, 26722), (26901, 26923)):
        codes.extend(range(lo, hi + 1))
    return sorted(set(codes))
