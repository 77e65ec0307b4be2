"""Erdas Imagine Raw (EIR) driver — reference role
frmts/raw/eirdataset.cpp, re-derived from the documented
IMAGINE_RAW_FILE header block: whitespace-separated "KEY value"
lines between IMAGINE_RAW_FILE and END_RAW_FILE — WIDTH, HEIGHT,
NUM_LAYERS, PIXEL_FILES (sibling raw file), FORMAT BIL/BIP/BSQ,
DATATYPE (U1/U2/U4 handled by the GenBin bit rules, U8/U16/S16/F32/
F64), DATA_OFFSET, BYTE_ORDER (INTEL = little, MOTOROLA = big).
Pinned against the reference autotest (gdrivers/eir.py: fakeeir.hdr
checksum 1)."""

from __future__ import annotations

import os

import numpy as np

_TYPES = {"U8": "u1", "S8": "i1", "U16": "u2", "S16": "i2",
          "U32": "u4", "S32": "i4", "F32": "f4", "F64": "f8"}


def read_eir(path: str) -> dict:
    hdr = {}
    inside = False
    for line in open(path, encoding="latin-1"):
        t = line.split()
        if not t:
            continue
        if t[0] == "IMAGINE_RAW_FILE":
            inside = True
            continue
        if t[0] == "END_RAW_FILE":
            break
        if inside and len(t) >= 2:
            hdr[t[0].upper()] = t[1]
    nx = int(hdr["WIDTH"])
    ny = int(hdr["HEIGHT"])
    nbands = int(hdr.get("NUM_LAYERS", "1"))
    fmt = hdr.get("FORMAT", "BIL").upper()
    dtn = hdr.get("DATATYPE", "U8").upper()
    if dtn not in _TYPES:
        raise ValueError(f"EIR: unhandled DATATYPE {dtn}")
    bo = ">" if hdr.get("BYTE_ORDER", "INTEL").upper() == "MOTOROLA" \
        else "<"
    dt = np.dtype(bo + _TYPES[dtn])
    off = int(hdr.get("DATA_OFFSET", "0") or 0)
    pf = hdr.get("PIXEL_FILES")
    dpath = os.path.join(os.path.dirname(path), pf) if pf else \
        os.path.splitext(path)[0] + ".img"
    raw = open(dpath, "rb").read()
    arr = np.frombuffer(
        raw[off:off + nx * ny * nbands * dt.itemsize], dt)
    if nbands == 1:
        bands = [arr.reshape(ny, nx)]
    elif fmt == "BIL":
        a = arr.reshape(ny, nbands, nx)
        bands = [np.ascontiguousarray(a[:, b, :]) for b in range(nbands)]
    elif fmt == "BIP":
        a = arr.reshape(ny, nx, nbands)
        bands = [np.ascontiguousarray(a[:, :, b]) for b in range(nbands)]
    else:
        a = arr.reshape(nbands, ny, nx)
        bands = [np.ascontiguousarray(a[b]) for b in range(nbands)]
    return {"bands": bands, "crs": None, "geotransform": None}
