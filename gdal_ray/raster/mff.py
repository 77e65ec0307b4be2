"""Vexcel MFF raster driver — reference role
frmts/raw/mffdataset.cpp, re-derived from the documented MFF 1.x
layout: an ASCII ``.hdr`` of KEY=VALUE lines (IMAGE_LINES,
LINE_SAMPLES, BYTE_ORDER LSB/MSB, optional tile_size_rows/columns,
corner latitudes/longitudes, GCPn=pixel,line,lon,lat) with sibling
raw band files named <basename>.<type-letter><band#>: letter b=u8,
i=u16, j=CInt16, r=f32, x=CFloat32, z=CFloat64 (mffdataset.cpp:788's
"bBcCiIjJrRxXzZ" probe).  Tiled files store whole tiles row-major
(tile_size_rows × tile_size_columns each) and crop to the image
size.  Pinned against the reference autotest (gdrivers/mff.py:
fakemff 1, fakemfftiled 1 — the tiled 1×1 crop — and bytemff 4672)."""

from __future__ import annotations

import math
import os
import re

import numpy as np

_LETTER_DT = {"b": "u1", "i": "u2", "j": "c_i2", "r": "f4",
              "x": "c8", "z": "c16"}


def _parse_hdr(path: str) -> dict:
    hdr = {}
    for line in open(path, encoding="latin-1"):
        if "=" in line:
            k, v = line.split("=", 1)
            hdr[k.strip().lower()] = v.strip()
    return hdr


def read_mff(path: str) -> dict:
    hdr = _parse_hdr(path)
    ny = int(hdr["image_lines"])
    nx = int(hdr["line_samples"])
    bo = ">" if hdr.get("byte_order", "LSB").upper() == "MSB" else "<"
    base = os.path.splitext(os.path.basename(path))[0]
    d = os.path.dirname(path) or "."
    band_files = []
    pat = re.compile(r"^([bBiIjJrRxXzZ])(\d+)$")
    for f in sorted(os.listdir(d)):
        stem, ext = os.path.splitext(f)
        m = pat.match(ext[1:]) if ext else None
        if stem == base and m:
            band_files.append((int(m.group(2)), m.group(1).lower(),
                               os.path.join(d, f)))
    band_files.sort()
    if not band_files:
        raise ValueError("MFF: no band files found")
    tsr = int(hdr.get("tile_size_rows", "0") or 0)
    tsc = int(hdr.get("tile_size_columns", "0") or 0)
    bands = []
    for _num, letter, f in band_files:
        dts = _LETTER_DT[letter]
        if dts == "c_i2":  # complex int16: expose as CFloat via pairs
            dt = np.dtype(bo + "i2")
            complex_pairs = True
        else:
            dt = np.dtype(bo + dts)
            complex_pairs = False
        raw = open(f, "rb").read()
        if tsr and tsc:
            ntx = math.ceil(nx / tsc)
            nty = math.ceil(ny / tsr)
            full = np.zeros((nty * tsr, ntx * tsc), dt)
            want = nty * ntx * tsr * tsc
            flat = np.zeros(want, dt)
            have = np.frombuffer(
                raw[:want * dt.itemsize], dt)  # truncated files pad 0
            flat[:len(have)] = have
            tiles = flat.reshape(nty, ntx, tsr, tsc)
            for ty in range(nty):
                for tx in range(ntx):
                    full[ty * tsr:(ty + 1) * tsr,
                         tx * tsc:(tx + 1) * tsc] = tiles[ty, tx]
            arr = full[:ny, :nx]
        else:
            n = nx * ny * (2 if complex_pairs else 1)
            arr = np.frombuffer(raw[:n * dt.itemsize], dt)
            if complex_pairs:
                arr = (arr[0::2].astype(np.float32)
                       + 1j * arr[1::2].astype(np.float32))
            arr = arr.reshape(ny, nx)
        bands.append(np.ascontiguousarray(arr))
    gcps = []
    for k, v in hdr.items():
        if re.match(r"^gcp\d+$", k):
            p = [float(t) for t in v.split(",")]
            gcps.append(tuple(p))
    return {"bands": bands, "crs": hdr.get("projection_name"),
            "geotransform": None, "gcps": gcps, "header": hdr}
