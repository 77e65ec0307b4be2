"""Geosoft GXF (Grid eXchange File) driver — reference role
frmts/gxf/gxfopen.c + gxfdataset.cpp, re-derived from Geosoft's
published GXF Rev 3 spec: an ASCII file of ``#TITLE`` sections —
#POINts (row length), #ROWS, #PTSEPARATION / #RWSEPARATION (pixel
sizes, default 1), #XORIGIN / #YORIGIN, #ROTATION, #SENSE (±1..±4,
default 1 = lower-left, rows bottom-up), #DUMMY, #TRANSFORM
"scale offset" (stored = (value-offset)/scale), #GTYPE n (0 = plain
ASCII values; n ≥ 2 = base-90 packed: each value is n chars of
(c-37) base-90 digits, scaled; '!'-prefixed = dummy; '"'-prefixed =
run: next n chars = count (unscaled), next n = the repeated value,
with line-boundary continuation exactly as the reference reads it),
then #GRID and the data.

Geotransform (gxfdataset.cpp:165): pixel-center origin per #SENSE
(LL senses shift the Y origin up by (rows-1)·dy), rotated axes, then
the half-pixel corner shift.  Pinned against the reference autotest
(gdrivers/gxf.py: small.gxf checksum 90 plain, small2.gxf checksum
65042 GTYPE-3 compressed + Lambert header)."""

from __future__ import annotations

import math

import numpy as np

DUMMY_DEFAULT = -1e12


def _parse_sections(text: str) -> tuple[dict, list]:
    """→ ({TITLE: [value lines]}, grid data lines)."""
    sections: dict[str, list] = {}
    grid_lines: list[str] = []
    title = None
    in_grid = False
    for line in text.splitlines():
        if line.startswith("#"):
            title = line.strip().upper()
            in_grid = title.startswith("#GRID")
            if not in_grid:
                sections[title] = []
            continue
        if in_grid:
            grid_lines.append(line)
        elif title is not None:
            sections[title].append(line)
    return sections, grid_lines


def _sec(sections: dict, prefix: str):
    for k, v in sections.items():
        if k.startswith(prefix):
            return v
    return None


def decode_gxf(text: str) -> dict:
    sections, grid_lines = _parse_sections(text)

    def first(prefix, default=None):
        v = _sec(sections, prefix)
        return v[0].strip() if v else default

    nx = int(float(first("#POIN")))
    ny = int(float(first("#ROWS")))
    gtype = int(first("#GTYP", "0") or 0)
    dummy_str = first("#DUMM")
    dummy = float(dummy_str) if dummy_str else DUMMY_DEFAULT
    scale, offset = 1.0, 0.0
    tr = _sec(sections, "#TRAN")
    if tr:
        f = tr[0].split()
        scale, offset = float(f[0]), float(f[1])
    dx = float(first("#PTSE", "1") or 1)
    dy = float(first("#RWSE", "1") or 1)
    x0 = float(first("#XORI", "0") or 0)
    y0 = float(first("#YORI", "0") or 0)
    rot = float(first("#ROTA", "0") or 0)
    sense = int(first("#SENS", "1") or 1)

    vals = np.empty(nx * ny, np.float64)
    n_read = 0
    if gtype == 0:
        for line in grid_lines:
            for tok in line.split():
                if n_read >= vals.size:
                    break
                if dummy_str is not None and tok == dummy_str:
                    vals[n_read] = dummy
                else:
                    vals[n_read] = float(tok)
                n_read += 1
    else:
        li = 0

        def next_line():
            nonlocal li
            if li >= len(grid_lines):
                raise ValueError("GXF: ran out of compressed data")
            s = grid_lines[li]
            li += 1
            return s

        def b90(chunk: str) -> int:
            v = 0
            for c in chunk:
                v = v * 90 + (ord(c) - 37)
            return v

        line = ""
        while n_read < vals.size:
            if len(line) < gtype:
                line = next_line()
            c = line[0]
            if c == "!":
                vals[n_read] = dummy
                n_read += 1
                line = line[gtype:]
            elif c == '"':
                line = line[gtype:]
                if len(line) < gtype:
                    line = next_line()
                count = b90(line[:gtype])
                line = line[gtype:]
                if len(line) < gtype:
                    line = next_line()
                if line[0] == "!":
                    v = dummy
                else:
                    v = b90(line[:gtype]) * scale + offset
                if n_read + count > vals.size:
                    raise ValueError("GXF: wrong run count")
                vals[n_read:n_read + count] = v
                n_read += count
                line = line[gtype:]
            else:
                vals[n_read] = b90(line[:gtype]) * scale + offset
                n_read += 1
                line = line[gtype:]
    if n_read < vals.size:
        raise ValueError("GXF: truncated grid")

    grid = vals.reshape(ny, nx)
    if sense in (1, -4):          # LL_RIGHT / LR_LEFT: bottom-up
        grid = grid[::-1]
        cy0 = y0 + (ny - 1) * dy
    elif sense in (-2, 3):        # UL_RIGHT / UR_LEFT: top-down
        cy0 = y0
    else:
        raise ValueError(f"GXF: vertically organized sense {sense} "
                         "not supported (same as the reference)")
    if sense in (-4, 3):          # *_LEFT: mirror columns
        grid = grid[:, ::-1]
        cx0 = x0 - (nx - 1) * dx
    else:
        cx0 = x0
    r = math.radians(rot)
    g1 = dx * math.cos(r)
    g2 = dy * math.sin(r)
    g4 = dx * math.sin(r)
    g5 = -dy * math.cos(r)
    gt = (cx0 - 0.5 * g1 - 0.5 * g2, g1, g2,
          cy0 - 0.5 * g4 - 0.5 * g5, g4, g5)
    return {
        "bands": [np.ascontiguousarray(grid.astype(np.float32))],
        "crs": None,
        "geotransform": gt,
        "nodata": dummy,
    }


def read_gxf(path: str) -> dict:
    return decode_gxf(open(path, encoding="latin-1").read())
