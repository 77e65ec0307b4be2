"""ZMap Plus ASCII grid driver — reference role
frmts/zmap/zmapdataset.cpp, re-derived from the public Landmark
ZMap+ grid layout:

  ! comment lines
  @<name>, GRID, <valuesPerLine>
  <fieldSize>, <nodata>, <blank>, <decimalCount>, <columnNumber=1>
  <nRows>, <nCols>, <minX>, <maxX>, <minY>, <maxY>
  <ignored line>
  @
  values ... (fixed-width fields, COLUMN-major: each column runs
              north->south; lines hold up to valuesPerLine fields)

Values are parsed as fixed-width ``fieldSize`` fields per line (the
line length must be a multiple of the field size); a field without a
'.' is an integer scaled by 10^decimalCount (zmapdataset.cpp
IReadBlock dfExp rule).  The default georeference is pixel-is-area:
min/max describe the full cell extent over nCols/nRows.

The writer reproduces the reference CreateCopy byte layout exactly
(field size 20, 4 values per line, 7 decimals, %g->E nodata
fallback, ``0.0, 0.0, 0.0`` fourth line) — pinned against the
autotest's literal expected stream in
autotest/gdrivers/zmap.py::test_zmap_no_flush_end_of_column."""

from __future__ import annotations

import numpy as np


def _parse_values(lines: list[str], field_size: int,
                  decimal_count: int, n: int) -> np.ndarray:
    """Flatten fixed-width fields across data lines into n floats."""
    exp = 10.0 ** decimal_count
    out = np.empty(n, np.float64)
    k = 0
    for line in lines:
        line = line.rstrip("\r\n")
        if not line:
            continue
        if len(line) % field_size != 0:
            raise ValueError(
                f"ZMap: line length {len(line)} not a multiple of "
                f"field size {field_size}")
        for i in range(0, len(line), field_size):
            if k >= n:
                break
            tok = line[i:i + field_size]
            out[k] = float(tok) if "." in tok else int(tok) * exp
            k += 1
    if k < n:
        raise ValueError(f"ZMap: truncated values ({k} < {n})")
    return out


def decode_zmap(data: bytes) -> dict:
    text = data.decode("ascii", "replace")
    lines = text.splitlines()
    i = 0
    while i < len(lines) and lines[i].startswith("!"):
        i += 1
    if i >= len(lines) or not lines[i].startswith("@"):
        raise ValueError("ZMap: missing @ header line")
    toks = [t.strip() for t in lines[i][1:].split(",")]
    if len(toks) != 3 or not toks[1].startswith("GRID"):
        raise ValueError("ZMap: first header line is not a GRID header")
    values_per_line = int(toks[2])
    t2 = [t.strip() for t in lines[i + 1].split(",")]
    if len(t2) != 5:
        raise ValueError("ZMap: bad second header line")
    field_size = int(t2[0])
    nodata = float(t2[1])
    decimal_count = int(t2[3])
    if int(t2[4]) != 1:
        raise ValueError("ZMap: only columnNumber=1 supported")
    if not (0 < field_size < 40) or not (0 < decimal_count < field_size):
        raise ValueError("ZMap: bad field size / decimal count")
    t3 = [t.strip() for t in lines[i + 2].split(",")]
    if len(t3) != 6:
        raise ValueError("ZMap: bad third header line")
    nrows, ncols = int(t3[0]), int(t3[1])
    minx, maxx, miny, maxy = (float(v) for v in t3[2:6])
    if nrows <= 1 or ncols <= 1:
        raise ValueError("ZMap: degenerate grid")
    # fourth line ignored; fifth must start with '@'
    if not lines[i + 4].startswith("@"):
        raise ValueError("ZMap: missing @ data sentinel")
    vals = _parse_values(lines[i + 5:], field_size, decimal_count,
                         nrows * ncols)
    del values_per_line  # layout hint only; parse is free-flowing
    # column-major: each column top->bottom
    arr = vals.reshape(ncols, nrows).T
    return {
        "bands": [np.ascontiguousarray(arr)],
        "crs": None,
        "geotransform": (minx, (maxx - minx) / ncols, 0.0,
                         maxy, 0.0, -(maxy - miny) / nrows),
        "nodata": nodata,
    }


def read_zmap(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_zmap(vsi_read_bytes(path))


def _fmt(value: float, width: int, decimals: int) -> str:
    """Right-justified %.Nf with the reference's %.Ng + e->E overflow
    fallback (zmapdataset.cpp WriteRightJustified)."""
    s = f"%.{decimals}f" % value
    if len(s) > width:
        s = (f"%.{decimals}g" % value).replace("e", "E")
    return s.rjust(width)


def encode_zmap(arr: np.ndarray, geotransform,
                nodata: float | None = None,
                eol_at_end_of_column: bool = True) -> bytes:
    """CreateCopy-parity writer: field size 20, 4 values/line,
    7 decimals, column-major emit."""
    ny, nx = arr.shape
    gt = geotransform
    if nodata is None:
        nodata = 1.0e30
    field, vpl, dec = 20, 4, 7
    out = ["!\n! Created by GDAL.\n!\n",
           f"@GRID FILE, GRID, {vpl}\n",
           "%s,%s,%s,%s,%s\n" % (
               str(field).rjust(10), _fmt(nodata, field, dec),
               "".rjust(10), str(dec).rjust(10), "1".rjust(10)),
           "%s,%s,%s,%s,%s,%s\n" % (
               str(ny).rjust(10), str(nx).rjust(10),
               _fmt(gt[0], 14, 7), _fmt(gt[0] + gt[1] * nx, 14, 7),
               _fmt(gt[3] + gt[5] * ny, 14, 7), _fmt(gt[3], 14, 7)),
           "0.0, 0.0, 0.0\n@\n"]
    vals = np.asarray(arr, np.float64)
    n_this_line = 0
    eol_printed = False
    for i in range(nx):
        col = vals[:, i]
        for v in col:
            out.append(_fmt(float(v), field, dec))
            n_this_line += 1
            if n_this_line == vpl:
                out.append("\n")
                n_this_line = 0
                eol_printed = True
            else:
                eol_printed = False
        if eol_at_end_of_column and not eol_printed:
            out.append("\n")
            n_this_line = 0
            eol_printed = True
    if not eol_printed:
        out.append("\n")
    return "".join(out).encode("ascii")


def write_zmap(path: str, arr: np.ndarray, geotransform,
               nodata: float | None = None,
               eol_at_end_of_column: bool = True) -> None:
    with open(path, "wb") as f:
        f.write(encode_zmap(arr, geotransform, nodata,
                            eol_at_end_of_column))
