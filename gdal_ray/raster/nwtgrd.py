"""Northwood / Vertical Mapper GRD driver — reference role
frmts/northwood/{northwood.cpp,grddataset.cpp}, re-derived from the
published Vertical Mapper grid layout:

  1024-byte header — magic "HGPC", format char ('1' = continuous
  surface), f32 version @5, u16 (or u32 @128/@132 when zero) grid
  sides @9/@11, f64 min/max X/Y @13..44, f32 zmin/zmax @45/@49,
  MapInfo CoordSys string @256, display flags @513, color
  inflections (count @516, 7-byte zVal+RGB entries from @518),
  bits-per-pixel byte @1023.

  Data: u16 little-endian rows, top-down; 0 = nodata, else
  value = zmin + (raw-1)·(zmax-zmin)/65534.

The dataset exposes FOUR bands like the reference: 1-3 = R/G/B from
a 4096-entry color ramp indexed by raw/16, 4 = the Float32 surface.
The ramp replicates nwt_LoadColors/createIP/linearColor with C
float32 arithmetic (slopes and lerps in np.float32, the final +0.5
in float64 as the C double promotion does) so the byte ramp — and
hence the reference's band checksums — reproduce exactly.
Geotransform: (minX - step/2, step, 0, maxY + step/2, 0, -step) with
step = (maxX-minX)/(nx-1).  Pinned against the reference autotest
(gdrivers/nwt_grd.py: bands 1-4 checksums 28093/33690/20365/25856)."""

from __future__ import annotations

import struct

import numpy as np

NODATA = -1.0e37
_SCALE16 = 65534.0
f32 = np.float32


def _parse_header(h: bytes) -> dict:
    if h[:4] != b"HGPC":
        raise ValueError("NWT: bad magic")
    if h[4:5] != b"1":
        raise ValueError("NWT: only the GRD surface type is handled")
    nx = struct.unpack("<H", h[9:11])[0]
    if nx == 0:
        nx = struct.unpack("<I", h[128:132])[0]
    ny = struct.unpack("<H", h[11:13])[0]
    if ny == 0:
        ny = struct.unpack("<I", h[132:136])[0]
    minx, maxx, miny, maxy = struct.unpack("<4d", h[13:45])
    zmin, zmax = struct.unpack("<2f", h[45:53])
    n_infl = struct.unpack("<H", h[516:518])[0]
    if n_infl > 32:
        raise ValueError("NWT: corrupt header")
    infl = []
    for i in range(n_infl):
        z = struct.unpack("<f", h[518 + 7 * i:522 + 7 * i])[0]
        r, g, b = h[522 + 7 * i], h[523 + 7 * i], h[524 + 7 * i]
        infl.append((f32(z), r, g, b))
    return {"nx": nx, "ny": ny, "minx": minx, "maxx": maxx,
            "miny": miny, "maxy": maxy,
            "zmin": f32(zmin), "zmax": f32(zmax),
            "inflections": infl,
            "coordsys": h[256:512].split(b"\0")[0].decode(
                "latin-1", "ignore")}


def _create_ip(index: int, r: int, g: int, b: int,
               cmap: np.ndarray, wm: list) -> None:
    """createIP (northwood.cpp:352): fill map[wm+1..index-1] along a
    float32 slope from map[wm] to (r,g,b), then set map[index]."""
    if index == 0:
        cmap[0] = (r, g, b)
        wm[0] = 0
        return
    if index <= wm[0]:
        return
    w = wm[0]
    span = f32(index - w)
    for c, v in enumerate((r, g, b)):
        slope = f32(f32(v - int(cmap[w, c])) / span)
        for i in range(w + 1, index):
            # C: (uchar)(map[wm].c + ((i-wm)*slope) + 0.5) — the
            # product/add run in float32, the +0.5 promotes to double
            val = float(f32(int(cmap[w, c]) + f32(f32(i - w) * slope)))
            cmap[i, c] = int(val + 0.5) & 0xFF
    cmap[index] = (r, g, b)
    wm[0] = index


def _linear_color(lo, hi, fmid: np.float32) -> tuple:
    zlo, rlo, glo, blo = lo
    zhi, rhi, ghi, bhi = hi
    if fmid < zlo:
        return rlo, glo, blo
    if fmid > zhi:
        return rhi, ghi, bhi
    scale = f32(f32(fmid - zlo) / f32(zhi - zlo))
    out = []
    for a, b in ((rlo, rhi), (glo, ghi), (blo, bhi)):
        out.append(int(float(f32(f32(scale * f32(b - a)) + f32(a)))
                       + 0.5) & 0xFF)
    return tuple(out)


def load_colors(hdr: dict, map_size: int = 4096) -> np.ndarray:
    """nwt_LoadColors (northwood.cpp:242) with exact C float math."""
    cmap = np.zeros((map_size, 3), np.int32)
    wm = [0]
    _create_ip(0, 255, 255, 255, cmap, wm)
    infl = hdr["inflections"]
    if not infl:
        return cmap.astype(np.uint8)
    zmin, zmax = hdr["zmin"], hdr["zmax"]
    if zmin <= infl[0][0]:
        _create_ip(1, infl[0][1], infl[0][2], infl[0][3], cmap, wm)
    i = 1
    while i < len(infl):
        if zmin < infl[i][0]:
            r, g, b = _linear_color(infl[i - 1], infl[i], zmin)
            _create_ip(1, r, g, b, cmap, wm)
            break
        i += 1
    if i >= len(infl):
        last = infl[-1]
        _create_ip(1, last[1], last[2], last[3], cmap, wm)
        _create_ip(map_size - 1, last[1], last[2], last[3], cmap, wm)
    else:
        index = 0
        while i < len(infl):
            if zmax < infl[i][0]:
                r, g, b = _linear_color(infl[i - 1], infl[i], zmax)
                index = map_size - 1
                _create_ip(index, r, g, b, cmap, wm)
                break
            index = int(f32(f32(f32(infl[i][0] - zmin)
                                / f32(zmax - zmin)) * f32(map_size)))
            if index >= map_size:
                index = map_size - 1
            _create_ip(index, infl[i][1], infl[i][2], infl[i][3],
                       cmap, wm)
            i += 1
        if index < map_size - 1:
            last = infl[-1]
            _create_ip(map_size - 1, last[1], last[2], last[3],
                       cmap, wm)
    return cmap.astype(np.uint8)


def read_nwt_grc(path: str) -> dict:
    """Northwood classified grid (format char '8', grcdataset.cpp
    role): raw u8/u16/u32 class ids top-down after the 1024-byte
    header (bits = 16 when header[1023] is 0, else header[1023]·4),
    then the class dictionary — u16 count, items of (u16 pix val,
    u8 res, RGB, u8 res, u16 name length, name bytes).  Pinned:
    gdrivers/nwt_grc.py checksum 46760."""
    data = open(path, "rb").read()
    h = data[:1024]
    if h[:4] != b"HGPC" or h[4:5] != b"8":
        raise ValueError("NWT: not a classified GRC grid")
    nx = struct.unpack("<H", h[9:11])[0] or \
        struct.unpack("<I", h[128:132])[0]
    ny = struct.unpack("<H", h[11:13])[0] or \
        struct.unpack("<I", h[132:136])[0]
    minx, maxx, miny, maxy = struct.unpack("<4d", h[13:45])
    bits = 16 if h[1023] == 0 else h[1023] * 4
    dt = {8: "u1", 16: "<u2", 32: "<u4"}[bits]
    n = nx * ny
    grid = np.frombuffer(
        data[1024:1024 + n * bits // 8], dt).reshape(ny, nx)
    # class dictionary follows the pixel block
    pos = 1024 + n * bits // 8
    n_items = struct.unpack("<H", data[pos:pos + 2])[0]
    pos += 2
    classes = []
    for _ in range(n_items):
        pix, = struct.unpack("<H", data[pos:pos + 2])
        r, g, b = data[pos + 3], data[pos + 4], data[pos + 5]
        ln, = struct.unpack("<H", data[pos + 7:pos + 9])
        name = data[pos + 9:pos + 9 + ln].decode("latin-1", "ignore")
        classes.append({"value": pix, "rgb": (r, g, b), "name": name})
        pos += 9 + ln
    step = (maxx - minx) / (nx - 1)
    return {
        "bands": [np.ascontiguousarray(grid)],
        "crs": h[256:512].split(b"\0")[0].decode("latin-1", "ignore")
        or None,
        "geotransform": (minx - step * 0.5, step, 0.0,
                         maxy + step * 0.5, 0.0, -step),
        "classes": classes,
    }


def read_nwt_grd(path: str) -> dict:
    data = open(path, "rb").read()
    hdr = _parse_header(data[:1024])
    nx, ny = hdr["nx"], hdr["ny"]
    raw = np.frombuffer(data[1024:1024 + nx * ny * 2], "<u2") \
        .reshape(ny, nx)
    cmap = load_colors(hdr)
    idx = raw // 16
    zmin, zmax = float(hdr["zmin"]), float(hdr["zmax"])
    scale = (zmax - zmin) / _SCALE16
    z = (zmin + (raw.astype(np.float64) - 1) * scale).astype(np.float32)
    z[raw == 0] = np.float32(NODATA)
    step = (hdr["maxx"] - hdr["minx"]) / (nx - 1)
    return {
        "bands": [np.ascontiguousarray(cmap[idx, 0]),
                  np.ascontiguousarray(cmap[idx, 1]),
                  np.ascontiguousarray(cmap[idx, 2]),
                  z],
        "crs": hdr["coordsys"] or None,
        "geotransform": (hdr["minx"] - step * 0.5, step, 0.0,
                         hdr["maxy"] + step * 0.5, 0.0, -step),
        "nodata": NODATA,
        "scale": scale,
        "offset": zmin,
    }
