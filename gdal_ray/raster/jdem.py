"""Japanese DEM (.mem) driver — reference role
frmts/jdem/jdemdataset.cpp, re-derived from the Japan Geographical
Survey Institute's published fixed-column ASCII layout: a 1011-byte
header record, then one 1011-ish-byte record per row (record size =
xsize·5 + 9 + 2).

Header columns (0-based): [23:26] xsize, [26:29] ysize, [29:36] /
[36:43] lower-left lat/lon, [43:50] / [50:57] upper-right lat/lon —
angles as DDDMMSS integers (degree + min/60 + sec/3600).  Each data
record repeats the header's first 6 bytes, then a 3-digit 1-based
row number, then xsize 5-char integers that scale by 0.1 to metres
(float32).  Geotransform: (ll_lon, (ur_lon-ll_lon)/xsize, 0, ur_lat,
0, -(ur_lat-ll_lat)/ysize).  Pinned against the reference autotest
(gdrivers/jdem.py: fakejdem.mem checksum 15)."""

from __future__ import annotations

import numpy as np


def _angle(field: bytes) -> float:
    v = int(field[:7].decode("ascii", "ignore").strip() or 0)
    return v // 10000 + (v // 100 % 100) / 60.0 + (v % 100) / 3600.0


def decode_jdem(data: bytes) -> dict:
    hdr = data[:1011]
    xsize = int(hdr[23:26])
    ysize = int(hdr[26:29])
    ll_lat = _angle(hdr[29:36])
    ll_lon = _angle(hdr[36:43])
    ur_lat = _angle(hdr[43:50])
    ur_lon = _angle(hdr[50:57])
    rec = xsize * 5 + 9 + 2
    grid = np.full((ysize, xsize), np.nan, np.float32)
    for y in range(ysize):
        r = data[1011 + rec * y:1011 + rec * (y + 1)]
        if len(r) < xsize * 5 + 9 or r[:6] != hdr[:6]:
            raise ValueError("JDEM: scanline corrupt")
        if int(r[6:9]) != y + 1:
            raise ValueError("JDEM: scanline out of order")
        vals = np.array([int(r[9 + 5 * i:14 + 5 * i]) for i in
                         range(xsize)], np.float32)
        grid[y] = vals * np.float32(0.1)
    return {
        "bands": [grid],
        "crs": "EPSG:4326",  # Tokyo datum in the reference; axis-only
        "geotransform": (ll_lon, (ur_lon - ll_lon) / xsize, 0.0,
                         ur_lat, 0.0, -(ur_lat - ll_lat) / ysize),
        "units": "m",
    }


def read_jdem(path: str) -> dict:
    with open(path, "rb") as f:
        return decode_jdem(f.read())
