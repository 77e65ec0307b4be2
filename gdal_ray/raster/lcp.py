"""FARSITE v.4 landscape (.lcp) driver — reference role
frmts/raw/lcpdataset.cpp, re-derived from the published FARSITE LCP
layout: a 7316-byte little-endian header —

  @0 crown-fuels flag (21 = present), @4 ground-fuels flag,
  @8 latitude, @4164/@4168 width/height, @4172..4203 E/W/N/S f64
  bounds, @4204 linear-unit code (0 m / 1 ft), @4208/@4216 f64 cell
  sizes, @6804 description text

— then pixel-interleaved (BIP) int16 bands: ELEVATION, SLOPE,
ASPECT, FUEL MODEL, CANOPY COVER [, CANOPY HEIGHT, CANOPY BASE
HEIGHT, CANOPY BULK DENSITY][, DUFF, COARSE WOODY]: 5/7/8/10 bands
by the two flags.  Geotransform (west, cellx, 0, north, 0, -celly).
Pinned against the reference autotest (gdrivers/lcp.py test_lcp_1:
8 bands, the eight literal band checksums, LATITUDE/LINEAR_UNIT/
DESCRIPTION metadata)."""

from __future__ import annotations

import struct

import numpy as np

HEADER = 7316
BAND_NAMES_10 = ["ELEVATION", "SLOPE", "ASPECT", "FUEL_MODEL",
                 "CANOPY_COV", "CANOPY_HT", "CBH", "CBD",
                 "DUFF", "CWD"]


def read_lcp(path: str) -> dict:
    data = open(path, "rb").read()
    h = data[:HEADER]
    crown = struct.unpack("<i", h[0:4])[0] == 21
    ground = struct.unpack("<i", h[4:8])[0] == 21
    nbands = (10 if ground else 8) if crown else (7 if ground else 5)
    lat = struct.unpack("<i", h[8:12])[0]
    nx = struct.unpack("<i", h[4164:4168])[0]
    ny = struct.unpack("<i", h[4168:4172])[0]
    east, west, north, south = struct.unpack("<4d", h[4172:4204])
    unit = struct.unpack("<i", h[4204:4208])[0]
    cellx, celly = struct.unpack("<2d", h[4208:4224])
    desc = h[6804:].split(b"\0")[0].decode("latin-1", "ignore")
    arr = np.frombuffer(
        data[HEADER:HEADER + nx * ny * nbands * 2], "<i2") \
        .reshape(ny, nx, nbands)
    names = ([BAND_NAMES_10[i] for i in range(5)]
             + (BAND_NAMES_10[5:8] if crown else [])
             + (BAND_NAMES_10[8:] if ground else []))
    return {
        "bands": [np.ascontiguousarray(arr[:, :, b])
                  for b in range(nbands)],
        "band_names": names,
        "crs": None,
        "geotransform": (west, cellx, 0.0, north, 0.0, -celly),
        "latitude": lat,
        "linear_unit": "Meters" if unit == 0 else "Feet",
        "description": desc,
        "bounds": (east, west, north, south),
    }
