"""USGS ASCII DEM driver — reference role
frmts/usgsdem/usgsdemdataset.cpp, re-derived from the published USGS
"Standards for Digital Elevation Models" record layout: a 1024-byte
ASCII A-record header followed by one B-record per PROFILE (profiles
are COLUMNS, each running south→north), numbers in Fortran notation
with D exponents.

Header fields live at fixed byte offsets (the reference's exact
reads): 156 coord system + UTM zone, 528 ground/vertical units, 546
four corners (SW,NW,NE,SE as 24+24-char pairs) then elev min/max
(48-char), 816 dx/dy/vres (12-char), 858 profile count, 890
horizontal datum.  Data-start detection replicates the reference's
probe chain — 1024 (new format), 1025 (newline-terminated records,
OSGeo/gdal#5007), 893 (undocumented 39109h1 layout), 918 (fema06
layout), 864 (old format).  Each profile: row, col, npoints, ncols,
xstart, ystart, elev-offset, zmin, zmax, then npoints elevations;
value = stored·vres + offset, nodata −32767; float32 when vertical
units are feet or vres < 1, else int16 with clamp.  After each
profile the reader snaps to the next 1024-byte record boundary (some
files carry junk values past the declared count).  UTM/StatePlane
grids anchor X at the first profile's xstart and snap Y extents to
the pixel size; geographic grids convert arc-seconds to degrees.

Pinned against all seven reference-autotest read fixtures
(gdrivers/usgsdem.py checksums 1583 / 53864+gt / 61424 / 39443 /
56679 / 61078 / 14172)."""

from __future__ import annotations

import math
import re

import numpy as np

NODATA = -32767
_INT = re.compile(rb"[+-]?\d+")


def _read_int(data: bytes, pos: int) -> tuple[int, int]:
    m = _INT.search(data, pos)
    if m is None:
        raise EOFError("USGSDEM: out of data")
    return int(m.group()), m.end()


def _dconvert(data: bytes, pos: int, n: int) -> tuple[float, int]:
    s = data[pos:pos + n].replace(b"D", b"E").strip()
    return (float(s) if s else 0.0), pos + n


def decode_usgsdem(data: bytes) -> dict:
    # --- format / data-start detection (usgsdemdataset.cpp:585) ---
    nrow, p = _read_int(data, 864)
    ncol, p = _read_int(data, p)
    new_format = p >= 1024 or nrow != 1 or ncol != 1
    if new_format:
        i, p2 = _read_int(data, 1024)
        j = _read_int(data, p2)[0] if p2 < len(data) else -1
        if i == 1 and j in (0, 1):
            start = 1024
            if (len(data) > 2049 and data[1024:1025] == b"\n"
                    and data[2049:2050] == b"\n"):
                start = 1025
        else:
            i, p2 = _read_int(data, 893)
            j = _read_int(data, p2)[0]
            if i == 1 and j == 1:
                start = 893
            else:
                i, p2 = _read_int(data, 918)
                j = _read_int(data, p2)[0]
                if i != 1 or j != 1:
                    raise ValueError("USGSDEM: not a USGS DEM file")
                start = 918
    else:
        start = 864

    coordsys, p = _read_int(data, 156)
    utm_zone, p = _read_int(data, p)
    gunit, p = _read_int(data, 528)
    vunit, p = _read_int(data, p)
    dxdelta, p = _dconvert(data, 816, 12)
    dydelta, p = _dconvert(data, p, 12)
    vres, p = _dconvert(data, p, 12)
    if dydelta == 0:
        raise ValueError("USGSDEM: zero y resolution")
    as_float = vunit == 1 or vres < 1.0

    corners = []
    p = 546
    for _ in range(4):  # SW, NW, NE, SE
        x, p = _dconvert(data, p, 24)
        y, p = _dconvert(data, p, 24)
        corners.append((x, y))
    ext_min_x = min(corners[0][0], corners[1][0])
    ext_max_y = max(corners[1][1], corners[2][1])
    ext_min_y = min(corners[0][1], corners[3][1])
    nprofiles, p = _read_int(data, 858)

    geographic = coordsys not in (1, 2, -9999)
    if not geographic:
        ext_min_y = math.floor(ext_min_y / dydelta) * dydelta
        ext_max_y = math.ceil(ext_max_y / dydelta) * dydelta
        # X anchored at the first profile's xstart
        pp = start
        for _ in range(4):
            _, pp = _read_int(data, pp)
        dx_start, pp = _dconvert(data, pp, 24)
        ny = int((ext_max_y - ext_min_y) / dydelta + 1.5)
        nx = nprofiles
        gt = (dx_start - dxdelta / 2.0, dxdelta, 0.0,
              ext_max_y + dydelta / 2.0, 0.0, -dydelta)
    else:
        ny = int((ext_max_y - ext_min_y) / dydelta + 1.5)
        nx = nprofiles
        gt = ((ext_min_x - dxdelta / 2.0) / 3600.0, dxdelta / 3600.0,
              0.0, (ext_max_y + dydelta / 2.0) / 3600.0, 0.0,
              -dydelta / 3600.0)

    grid = np.full((ny, nx), float(NODATA), np.float64)
    y_min_center = gt[3] + (ny - 0.5) * gt[5]
    pos = start
    for i in range(nx):
        try:
            _row, pos = _read_int(data, pos)
            _col, pos = _read_int(data, pos)
            npts, pos = _read_int(data, pos)
            _ncols, pos = _read_int(data, pos)
            _xs, pos = _dconvert(data, pos, 24)
            ys, pos = _dconvert(data, pos, 24)
            elev_off, pos = _dconvert(data, pos, 24)
            _zmin, pos = _dconvert(data, pos, 24)
            _zmax, pos = _dconvert(data, pos, 24)
        except (EOFError, ValueError):
            break  # truncated file: remaining columns stay nodata
        if geographic:
            ys /= 3600.0
        lygap = int((y_min_center - ys) / gt[5] + 0.5)
        ok = True
        if npts > 0:
            vals = np.empty(npts, np.int64)
            for k in range(npts):
                try:
                    vals[k], pos = _read_int(data, pos)
                except EOFError:
                    vals = vals[:k]
                    ok = False
                    break
            j = np.arange(lygap, lygap + len(vals))
            iy = ny - j - 1
            keep = (iy >= 0) & (iy < ny) & (vals != NODATA)
            grid[iy[keep], i] = vals[keep] * vres + elev_off
        if not ok:
            break
        if start == 1024:
            # snap to the next 1024-byte record boundary: some files
            # carry junk values past the declared profile count
            pos = (pos + 1023) // 1024 * 1024

    if as_float:
        band = grid.astype(np.float32)
    else:
        band = np.clip(np.round(grid), -32768, 32767).astype(np.int16)
        band[grid == NODATA] = NODATA
    crs = {1: f"UTM:{utm_zone}", 2: f"SP:{utm_zone}"}.get(
        coordsys, "EPSG:4326" if geographic else None)
    return {
        "bands": [band],
        "crs": crs,
        "geotransform": gt,
        "nodata": float(NODATA),
        "units": "ft" if vunit == 1 else "m",
        "ground_units": gunit,
    }


def read_usgsdem(path: str) -> dict:
    with open(path, "rb") as f:
        return decode_usgsdem(f.read())
