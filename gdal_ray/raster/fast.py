"""EOSAT FAST Format driver — reference role
frmts/raw/fastdataset.cpp, re-derived from the published EOSAT FAST
Rev B/C and Euromap FAST descriptions: a fixed-field ASCII
administrative header ("NAME =value" pairs scanned at documented
value widths — PIXELS PER LINE(5), LINES PER BAND|IMAGE(5), OUTPUT
BITS PER PIXEL(2), BANDS PRESENT(32), SATELLITE(10), SENSOR(10),
FILENAME(29) repeated) naming raw single-band files.

Band-file resolution follows the reference's chain: explicit
FILENAME= entries; else the Euromap IRS-1C/1D channel-letter
conventions (PAN header suffix a–j → digit 0–9, k–m → n–p; LISS3
header letter → its 4-channel letter row per em_names.pdf); else
Cartosat BANDF/BANDA; else IRS-P6 BANDn.DAT from BANDS PRESENT; else
bandN.dat patterns.  Corner coordinates live after the word
"PROJECTION" as "UL " + 28 chars + 13-char X, "," + 13-char Y (UTM
eastings ≥ 10⁶ carry a zone-number prefix that is stripped); the
geotransform is the order-1 least-squares GCP fit over the four
corners at pixel centers (GDALGCPsToGeoTransform role — the repo's
raster/warp.py GCPTransformer).  Reads are windowed so truncated
fixtures behave like the reference tests.  Pinned against the
reference autotest (gdrivers/fast.py: HPN 5000×1 checksum 60323,
HTM band 2 7000×1 checksum 19110, PAN .1ah literal axis-aligned gt,
LISS3 .0fl literal rotated gt)."""

from __future__ import annotations

import os
import re

import numpy as np


def _value(header: str, name: str, size: int) -> str | None:
    i = header.find(name)
    if i < 0:
        return None
    i += len(name)
    while i < len(header) and header[i] == " ":
        i += 1
    while i < len(header) and header[i] == "=":
        i += 1
    return header[i:i + size].strip()


def _filenames(header: str) -> list[str]:
    out = []
    for m in re.finditer("FILENAME", header):
        i = m.end()
        while i < len(header) and header[i] in " =":
            i += 1
        v = header[i:i + 29].strip()
        if v:
            out.append(v)
    return out


_LISS3 = ["023456789abcdefghijklmnopqrstuvwxyz"[i:i + 5]
          for i in range(0, 35, 5)]
_LISS3 = [("0", "2345"), ("6", "789a"), ("b", "cdef"), ("g", "hijk"),
          ("l", "mnop"), ("q", "rstu"), ("v", "wxyz")]


def _euromap_channels(path: str, sensor: str) -> list[str]:
    d = os.path.dirname(path)
    last = path[-1]
    if sensor == "PAN":
        c = last.lower() if "A" <= last <= "M" else last
        if "a" <= c <= "j":
            cand = path[:-1] + chr(ord(c) - ord("a") + ord("0"))
            return [cand] if os.path.exists(cand) else []
        if "k" <= c <= "m":
            ch = chr(ord(c) - ord("k") + ord("n"))
            for v in (ch, ch.upper()):
                cand = path[:-1] + v
                if os.path.exists(cand):
                    return [cand]
        return []
    if sensor == "LISS3":
        for head, row in _LISS3:
            if last.lower() == head or last == head:
                out = []
                for ch in row:
                    cand = path[:-1] + ch
                    if os.path.exists(cand):
                        out.append(cand)
                return out
    return []


def read_fast(path: str, window=None, band: int | None = None) -> dict:
    header = open(path, "rb").read().decode("latin-1", "ignore")
    nx = int(_value(header, "PIXELS PER LINE", 5))
    lines = _value(header, "LINES PER BAND", 5) or \
        _value(header, "LINES PER IMAGE", 5)
    ny = int(lines.split("/")[0] if "/" in lines else lines)
    bits = int(_value(header, "OUTPUT BITS PER PIXEL", 2) or 8)
    dt = np.dtype("u1" if bits == 8 else ">i2")
    sat = _value(header, "SATELLITE", 10) or ""
    sensor = (_value(header, "SENSOR", 10) or "").strip()
    dirname = os.path.dirname(path)
    files = [os.path.join(dirname, f) for f in _filenames(header)]
    files = [f for f in files if os.path.exists(f)]
    if not files and sat.upper().replace(" ", "") in ("IRS1C", "IRS1D"):
        files = _euromap_channels(path, sensor.upper())
    if not files:
        bp = _value(header, "BANDS PRESENT", 32) or ""
        for ch in bp:
            if ch.isdigit():
                cand = os.path.join(dirname, f"BAND{ch}.DAT")
                if os.path.exists(cand) and os.path.getsize(cand):
                    files.append(cand)
    if not files:
        raise ValueError("FAST: no band files found")
    xo, yo, xs, ys = window or (0, 0, nx, ny)
    band_ids = range(len(files)) if band is None else [band - 1]
    bands = []
    for b in band_ids:
        raw = open(files[b], "rb").read()
        out = np.zeros((ys, xs), dt)
        for r in range(ys):
            start = ((yo + r) * nx + xo) * dt.itemsize
            row = np.frombuffer(raw[start:start + xs * dt.itemsize], dt)
            out[r, :len(row)] = row
        bands.append(out)
    # corners → order-1 GCP fit
    gt = None
    geom = header[header.find("PROJECTION"):] \
        if "PROJECTION" in header else ""
    corners = {}
    for key in ("UL ", "UR ", "LL ", "LR "):
        i = geom.find(key)
        if i >= 0 and len(geom) >= i + len(key) + 28 + 14:
            j = i + len(key) + 28
            x = float(geom[j:j + 13])
            y = float(geom[j + 14:j + 27])
            corners[key.strip()] = (x, y)
    if len(corners) == 4 and all(v != (0.0, 0.0)
                                 for v in corners.values()):
        zone = int(_value(header, "USGS MAP ZONE", 6) or 0)
        pts = {}
        for k, (x, y) in corners.items():
            if x >= 1000000.0:
                x -= zone * 1000000.0
            pts[k] = (x, y)
        from gdal_ray.raster.warp import GCPTransformer

        gcps = [
            (0.5, 0.5, *pts["UL"]),
            (nx - 0.5, 0.5, *pts["UR"]),
            (nx - 0.5, ny - 0.5, *pts["LR"]),
            (0.5, ny - 0.5, *pts["LL"]),
        ]
        gt = GCPTransformer(gcps, order=1).as_geotransform()
    return {
        "bands": bands,
        "crs": None,
        "geotransform": gt,
        "satellite": sat,
        "sensor": sensor,
        "window": (xo, yo, xs, ys),
        "files": files,
    }
