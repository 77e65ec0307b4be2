"""Idrisi/TerrSet RST raster driver — reference role
frmts/idrisi/IdrisiDataset.cpp, re-derived from the published IDRISI
Raster A.1 documentation layout: a ``.rdc`` ASCII "key : value"
header describing a raw top-down ``.rst`` array —

  data type    byte (u8) / integer (i2 LE) / real (f4 LE) /
               rgb24 (3 bytes/pixel stored B,G,R; band 1 = R)
  columns/rows, ref. system / ref. units, unit dist. (multiplier)
  min./max. X/Y — cell EDGES, so the geotransform is direct:
  (minX·unit, (maxX-minX)·unit/cols, 0, maxY·unit, 0,
   (minY-maxY)·unit/rows)  — no half-cell shift
  flag value   nodata ("none" = unset)

Pinned against the reference autotest (gdrivers/idrisi.py: byte.rst
checksum 5044, real.rst checksum 5275)."""

from __future__ import annotations

import os

import numpy as np


def parse_rdc(text: str) -> dict:
    hdr = {}
    for line in text.splitlines():
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        hdr[k.strip().lower()] = v.strip()
    return hdr


def read_rst(path: str) -> dict:
    base = os.path.splitext(path)[0]
    hdr = parse_rdc(open(base + ".rdc", encoding="latin-1").read())
    cols = int(hdr["columns"])
    rows = int(hdr["rows"])
    dtype = hdr.get("data type", "byte").lower()
    unit = float(hdr.get("unit dist.", "1") or 1.0)
    minx = float(hdr["min. x"]) * unit
    maxx = float(hdr["max. x"]) * unit
    miny = float(hdr["min. y"]) * unit
    maxy = float(hdr["max. y"]) * unit
    gt = (minx, (maxx - minx) / cols, 0.0,
          maxy, 0.0, (miny - maxy) / rows)
    raw = open(base + ".rst", "rb").read()
    if dtype == "byte":
        arr = np.frombuffer(raw[:rows * cols], np.uint8)
        bands = [arr.reshape(rows, cols)]
    elif dtype == "integer":
        arr = np.frombuffer(raw[:rows * cols * 2], "<i2")
        bands = [arr.reshape(rows, cols)]
    elif dtype == "real":
        arr = np.frombuffer(raw[:rows * cols * 4], "<f4")
        bands = [arr.reshape(rows, cols)]
    elif dtype == "rgb24":
        arr = np.frombuffer(raw[:rows * cols * 3], np.uint8) \
            .reshape(rows, cols * 3)
        # per-pixel storage order is B,G,R; band 1 is red
        # (IdrisiDataset.cpp:1437: j = 3 - nBand)
        bands = [np.ascontiguousarray(arr[:, 2::3]),
                 np.ascontiguousarray(arr[:, 1::3]),
                 np.ascontiguousarray(arr[:, 0::3])]
    else:
        raise ValueError(f"RST: unknown data type {dtype!r}")
    flag = hdr.get("flag value", "none")
    nodata = None if flag in ("none", "") else float(flag)
    crs = "EPSG:4326" if hdr.get("ref. system", "") == "latlong" \
        else None
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata}


_DT_NAME = {np.dtype(np.uint8): ("byte", np.uint8),
            np.dtype(np.int16): ("integer", "<i2"),
            np.dtype(np.float32): ("real", "<f4")}


def write_rst(path: str, bands: list, geotransform,
              ref_system: str = "plane", ref_units: str = "m") -> None:
    """Write the .rst/.rdc pair (byte / integer / real / rgb24)."""
    base = os.path.splitext(path)[0]
    arrs = [np.asarray(b) for b in bands]
    rows, cols = arrs[0].shape
    gt = geotransform
    if len(arrs) == 3:
        name = "rgb24"
        inter = np.empty((rows, cols * 3), np.uint8)
        inter[:, 2::3] = arrs[0]  # R at byte 2
        inter[:, 1::3] = arrs[1]
        inter[:, 0::3] = arrs[2]
        payload = inter.tobytes()
        vmin, vmax = 0, 255
    else:
        if arrs[0].dtype not in _DT_NAME:
            raise ValueError(f"RST: unsupported dtype {arrs[0].dtype}")
        name, store = _DT_NAME[arrs[0].dtype]
        payload = np.ascontiguousarray(arrs[0].astype(store)).tobytes()
        vmin, vmax = float(arrs[0].min()), float(arrs[0].max())
    minx, maxy = gt[0], gt[3]
    maxx = gt[0] + gt[1] * cols
    miny = gt[3] + gt[5] * rows
    hdr = (f"file format : IDRISI Raster A.1\n"
           f"file title  : {os.path.basename(base)}\n"
           f"data type   : {name}\nfile type   : binary\n"
           f"columns     : {cols}\nrows        : {rows}\n"
           f"ref. system : {ref_system}\nref. units  : {ref_units}\n"
           f"unit dist.  : 1.0000000\n"
           f"min. X      : {minx:.7f}\nmax. X      : {maxx:.7f}\n"
           f"min. Y      : {miny:.7f}\nmax. Y      : {maxy:.7f}\n"
           f"pos`n error : unknown\nresolution  : unknown\n"
           f"min. value  : {vmin:g}\nmax. value  : {vmax:g}\n"
           f"display min : {vmin:g}\ndisplay max : {vmax:g}\n"
           f"value units : unspecified\nvalue error : unknown\n"
           f"flag value  : none\nflag def`n  : none\n"
           f"legend cats : 0\n")
    with open(base + ".rst", "wb") as f:
        f.write(payload)
    with open(base + ".rdc", "w", encoding="ascii") as f:
        f.write(hdr)
