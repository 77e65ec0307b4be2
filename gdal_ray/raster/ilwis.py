"""ILWIS raster driver — reference role
frmts/ilwis/ilwisdataset.cpp, re-derived from ITC's published ILWIS
3.x object layout: an INI-style ``.mpr`` map header ([MapStore]
Data/Type/RowLength/SwapBytes) referencing a raw ``.mp#`` pixel file
and a ``.grf`` georeference ([GeoRefCorners] MinX/MinY/MaxX/MaxY
with CornersOfCorners = Yes meaning the bounds are pixel EDGES —
else cell centers, half-pixel shift; ilwisdataset.cpp:505).

Store types: Byte (u8), Int (i2), Long (i4), Float (f4), Real (f8),
little-endian unless SwapBytes=Yes; rows top-down.  Pinned against
the reference autotest (gdrivers/ilwis.py: LanduseSmall.mpr checksum
2351)."""

from __future__ import annotations

import os

import numpy as np

_TYPES = {"byte": "u1", "int": "i2", "long": "i4",
          "float": "f4", "real": "f8"}


def parse_ini(path: str) -> dict:
    sec = None
    out: dict[str, dict] = {}
    for line in open(path, encoding="latin-1"):
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            sec = line[1:-1]
            out.setdefault(sec, {})
        elif "=" in line and sec is not None:
            k, v = line.split("=", 1)
            out[sec][k.strip()] = v.strip()
    return out


def read_ilwis(path: str) -> dict:
    mpr = parse_ini(path)
    base_dir = os.path.dirname(path)
    store = mpr.get("MapStore", {})
    size = mpr.get("Map", {}).get("Size", "").split()
    ny, nx = int(size[0]), int(size[1])
    tname = store.get("Type", "Byte").lower()
    if tname not in _TYPES:
        raise ValueError(f"ILWIS: unhandled store type {tname}")
    bo = ">" if store.get("SwapBytes", "No").lower() == "yes" else "<"
    dt = np.dtype(bo + _TYPES[tname])
    data_name = store.get("Data",
                          os.path.basename(path)[:-4] + ".mp#")
    raw = open(os.path.join(base_dir, data_name), "rb").read()
    off = int(store.get("StartOffset", "0") or 0)
    arr = np.frombuffer(raw[off:off + nx * ny * dt.itemsize], dt) \
        .reshape(ny, nx)
    gt = None
    grf_name = mpr.get("Map", {}).get("GeoRef")
    if grf_name and os.path.exists(os.path.join(base_dir, grf_name)):
        grf = parse_ini(os.path.join(base_dir, grf_name))
        gc = grf.get("GeoRefCorners")
        if gc:
            minx, miny = float(gc["MinX"]), float(gc["MinY"])
            maxx, maxy = float(gc["MaxX"]), float(gc["MaxY"])
            px = (maxx - minx) / nx
            py = (maxy - miny) / ny
            if gc.get("CornersOfCorners", "No").lower() == "yes":
                x0, y0 = minx, maxy
            else:
                x0, y0 = minx - px / 2.0, maxy + py / 2.0
            gt = (x0, px, 0.0, y0, 0.0, -py)
    return {"bands": [np.ascontiguousarray(arr)], "crs": None,
            "geotransform": gt}
