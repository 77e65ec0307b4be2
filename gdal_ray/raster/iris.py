"""Vaisala Sigmet IRIS weather-radar product reader — reference role
frmts/iris/irisdataset.cpp, re-derived from the published IRIS
Programmer's Manual product-file layout:

  12-byte structure header (id 27) | 12-byte product-configuration
  id (26) + product code | product configuration (sizes at +100/+104,
  scales at +88/+92, radar offsets at +112/+116 — all relative to the
  +12 record start) | product end at +320+12 (site names, ellipsoid
  at +220/+224, center lat/lon at +108/+112, projection ref at
  +240/+244 as 2^32 binary angles) | data from offset 640, bottom-up
  rows, band-sequential.

Data-type value transforms (float32 output, −9999 nodata): dBZ/DBT
(v−64)/2, 2-byte (v−32768)/100, FLIQUID2 4.12 mantissa/exponent,
HEIGHT/VIL variants, VEL Nyquist scaling — the reference's
per-code IReadBlock arms.

Georeference: Mercator products run the Vincenty direct geodesic
(the reference ports Chris Veness' public implementation of
T. Vincenty 1975) east/north over one pixel, then the Mercator
forward; azimuthal-equidistant and other projections use the radar
offset × scale directly.

Pinned against the reference autotest (gdrivers/iris.py):
fakeiris.dat checksum 65532; iristest.dat checksum 52872 + literal
Mercator geotransform to 1e-5 relative."""

from __future__ import annotations

import math
import struct

import numpy as np

PRODUCTS = [
    "", "PPI", "RHI", "CAPPI", "CROSS", "TOPS", "TRACK",
    "RAIN1", "RAINN", "VVP", "VIL", "SHEAR", "WARN", "CATCH",
    "RTI", "RAW", "MAX", "USER", "USERV", "OTHER", "STATUS",
    "SLINE", "WIND", "BEAM", "TEXT", "FCAST", "NDOP", "IMAGE",
    "COMP", "TDWR", "GAGE", "DWELL", "SRI", "BASE", "HMAX"]
PROJECTIONS = [
    "Azimutal equidistant", "Mercator", "Polar Stereographic", "UTM",
    "Perspective from geosync", "Equidistant cylindrical", "Gnomonic",
    "Gauss conformal", "Lambert conformal conic"]


def _vincenty_direct(lat: float, lon: float, bearing: float,
                     dist: float, a: float, b: float,
                     f: float) -> tuple[float, float]:
    """Vincenty direct solution (T. Vincenty 1975, public formula):
    start point + bearing/distance → (lon2, lat2) degrees."""
    if f == 0.0:
        # sphere: closed-form great-circle
        ang = dist / a
        lat1 = math.radians(lat)
        br = math.radians(bearing)
        lat2 = math.asin(math.sin(lat1) * math.cos(ang)
                         + math.cos(lat1) * math.sin(ang) * math.cos(br))
        lon2 = math.radians(lon) + math.atan2(
            math.sin(br) * math.sin(ang) * math.cos(lat1),
            math.cos(ang) - math.sin(lat1) * math.sin(lat2))
        return math.degrees(lon2), math.degrees(lat2)
    alpha1 = math.radians(bearing)
    s = dist
    sin_a1, cos_a1 = math.sin(alpha1), math.cos(alpha1)
    tan_u1 = (1 - f) * math.tan(math.radians(lat))
    cos_u1 = 1 / math.sqrt(1 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    sigma1 = math.atan2(tan_u1, cos_a1)
    sin_alpha = cos_u1 * sin_a1
    cos_sq_alpha = 1 - sin_alpha * sin_alpha
    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    big_a = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq *
                                               (320 - 175 * u_sq)))
    big_b = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    sigma = s / (b * big_a)
    while True:
        cos2sm = math.cos(2 * sigma1 + sigma)
        sin_s, cos_s = math.sin(sigma), math.cos(sigma)
        d_sigma = (big_b * sin_s *
                   (cos2sm + big_b / 4 *
                    (cos_s * (-1 + 2 * cos2sm ** 2)
                     - big_b / 6 * cos2sm * (-3 + 4 * sin_s ** 2)
                     * (-3 + 4 * cos2sm ** 2))))
        new_sigma = s / (b * big_a) + d_sigma
        if abs(new_sigma - sigma) < 1e-12:
            sigma = new_sigma
            break
        sigma = new_sigma
    cos2sm = math.cos(2 * sigma1 + sigma)
    sin_s, cos_s = math.sin(sigma), math.cos(sigma)
    tmp = sin_u1 * sin_s - cos_u1 * cos_s * cos_a1
    lat2 = math.atan2(sin_u1 * cos_s + cos_u1 * sin_s * cos_a1,
                      (1 - f) * math.sqrt(sin_alpha ** 2 + tmp ** 2))
    lam = math.atan2(sin_s * sin_a1,
                     cos_u1 * cos_s - sin_u1 * sin_s * cos_a1)
    c = f / 16 * cos_sq_alpha * (4 + f * (4 - 3 * cos_sq_alpha))
    big_l = lam - (1 - c) * f * sin_alpha * (
        sigma + c * sin_s * (cos2sm + c * cos_s *
                             (-1 + 2 * cos2sm ** 2)))
    lon2 = math.radians(lon) + big_l
    return math.degrees(lon2), math.degrees(lat2)


def _mercator_forward(lon, lat, a: float, inv_f: float, lon0: float):
    """Mercator 1SP forward (scale 1) on sphere or ellipsoid."""
    lam = math.radians(lon - lon0)
    phi = math.radians(lat)
    x = a * lam
    if inv_f == 0.0:
        y = a * math.log(math.tan(math.pi / 4 + phi / 2))
    else:
        f = 1.0 / inv_f
        e = math.sqrt(f * (2 - f))
        es = e * math.sin(phi)
        y = a * math.log(math.tan(math.pi / 4 + phi / 2)
                         * ((1 - es) / (1 + es)) ** (e / 2))
    return x, y


def decode_iris(data: bytes) -> dict:
    if len(data) < 640:
        raise ValueError("IRIS: file too short")
    h = data[:640]
    if (struct.unpack_from("<h", h, 0)[0] != 27
            or struct.unpack_from("<h", h, 12)[0] != 26):
        raise ValueError("IRIS: bad structure ids")
    product_code = struct.unpack_from("<H", h, 12 + 12)[0]
    if not (0 < product_code < len(PRODUCTS)):
        raise ValueError("IRIS: bad product code")
    xsize = struct.unpack_from("<i", h, 100 + 12)[0]
    ysize = struct.unpack_from("<i", h, 104 + 12)[0]
    nbands = max(1, struct.unpack_from("<i", h, 108 + 12)[0])
    dtype_code = struct.unpack_from("<H", h, 130 + 12)[0]
    proj_code = h[146 + 12]
    scale_x = struct.unpack_from("<i", h, 88 + 12)[0] / 100.0
    scale_y = struct.unpack_from("<i", h, 92 + 12)[0] / 100.0
    radar_x = struct.unpack_from("<i", h, 112 + 12)[0] / 1000.0
    radar_y = struct.unpack_from("<i", h, 116 + 12)[0] / 1000.0
    # wavelength/PRF → Nyquist velocity (reference :985)
    wavelength = struct.unpack_from("<i", h, 148 + 12)[0] / 100.0
    prf = struct.unpack_from("<i", h, 120 + 320 + 12)[0]
    nyquist = wavelength * prf / 10000.0 if prf else 0.0

    size = {2: 1, 8: 2, 9: 2, 37: 2, 33: 2, 32: 1}.get(dtype_code, 1)
    n = xsize * ysize
    bands = []
    for b in range(nbands):
        off = 640 + size * n * b
        if size == 1:
            raw = np.frombuffer(data, np.uint8, n, off).astype(
                np.float32)
        else:
            raw = np.frombuffer(data, "<u2", n, off).astype(np.float32)
        if dtype_code in (1, 2):
            vals = (raw - 64.0) / 2.0
            vals[vals == 95.5] = -9999.0
        elif dtype_code in (8, 9):
            vals = (raw - 32768.0) / 100.0
            vals[vals == 327.67] = -9999.0
        elif dtype_code == 37:  # FLIQUID2 4.12 float
            iv = raw.astype(np.uint32)
            exp = iv >> 12
            mant = iv & 0xFFF
            vals = np.where(exp == 0, mant / 1000.0,
                            ((mant + 4096) << np.maximum(exp, 1) - 1)
                            / 1000.0).astype(np.float32)
            vals[iv == 65535] = -9999.0
        elif dtype_code == 33:  # HEIGHT16
            vals = (raw - 1) / 1000.0
            vals[raw == 65535] = -9999.0
            vals[raw == 0] = -1.0
        elif dtype_code == 32:  # VIL
            vals = (raw - 1.0) / 10.0
            vals[raw == 255] = -9999.0
            vals[raw == 0] = -1.0
        elif dtype_code == 3:  # VEL, Nyquist scaled
            vals = nyquist * (raw - 128.0) / 127.0
            vals[raw == 0] = -9997.0
            vals[raw == 1] = -9998.0
            vals[raw == 255] = -9999.0
        else:
            vals = raw
        bands.append(np.ascontiguousarray(
            vals.reshape(ysize, xsize)[::-1]))  # bottom-up rows

    # ---- georeference ----
    umax = 0xFFFFFFFF
    eq_radius = struct.unpack_from("<I", h, 220 + 320 + 12)[0] / 100.0
    inv_flat = struct.unpack_from("<I", h, 224 + 320 + 12)[0] / 1e6
    if eq_radius == 0.0:
        eq_radius, inv_flat = 6371000.0, 0.0
    flat = 1.0 / inv_flat if inv_flat else 0.0
    polar_radius = eq_radius * (1.0 - flat)
    center_lat = struct.unpack_from("<I", h, 108 + 320 + 12)[0] \
        * 360.0 / umax
    center_lon = struct.unpack_from("<I", h, 112 + 320 + 12)[0] \
        * 360.0 / umax
    ref_lat = struct.unpack_from("<I", h, 240 + 320 + 12)[0] \
        * 360.0 / umax
    ref_lon = struct.unpack_from("<I", h, 244 + 320 + 12)[0] \
        * 360.0 / umax
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    proj_name = PROJECTIONS[proj_code] if proj_code < len(PROJECTIONS) \
        else ""
    if (proj_name == "Mercator" and 0 < scale_x < polar_radius
            and 0 < scale_y < polar_radius):
        lon2, _ = _vincenty_direct(center_lat, center_lon, 90.0,
                                   scale_x, eq_radius, polar_radius,
                                   flat)
        _, lat2 = _vincenty_direct(center_lat, center_lon, 0.0,
                                   scale_y, eq_radius, polar_radius,
                                   flat)
        x, y = _mercator_forward(center_lon, center_lat, eq_radius,
                                 inv_flat, ref_lon)
        x2, y2 = _mercator_forward(lon2, lat2, eq_radius, inv_flat,
                                   ref_lon)
        gt = (x - radar_x * (x2 - x), x2 - x, 0.0,
              y + radar_y * (y2 - y), 0.0, -(y2 - y))
    elif 0 < scale_x < polar_radius and 0 < scale_y < polar_radius:
        gt = (-radar_x * scale_x, scale_x, 0.0,
              radar_y * scale_y, 0.0, -scale_y)
    return {
        "bands": bands,
        "crs": None,
        "geotransform": gt,
        "nodata": -9999.0,
        "metadata": {
            "PRODUCT": PRODUCTS[product_code],
            "PROJECTION": proj_name,
            "CENTER_LON": center_lon,
            "CENTER_LAT": center_lat,
        },
    }


def read_iris(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_iris(vsi_read_bytes(path))
