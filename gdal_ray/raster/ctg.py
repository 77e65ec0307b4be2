"""USGS LULC Composite Theme Grid driver — reference role
frmts/ctg/ctgdataset.cpp, re-derived from the USGS GIRAS/CTG
published card layout: 80-column ASCII records — a 5-card header
(rows @0:10, cols @20:30, cell size @35:40, UTM zone @50:55 on card
1; NW corner easting/northing @40:50/@50:60 on card 4; title card 5)
— then one card per CELL: UTM zone @0:3, cell-center easting @3:11
and northing @11:19 (converted to the NW corner by ±cellsize/2), and
SIX 10-char LULC theme values (values ≥ 2·10⁹ read as 0).  Cells may
arrive in any order; each is placed by its coordinates.  Six int32
bands, nodata 0; geotransform (NWEasting, cell, 0, NWNorthing, 0,
-cell); CRS = UTM zone (WGS84 family code 32600+zone, as the
reference imports).  Pinned against the reference autotest
(gdrivers/ctg.py: fake_grid_cell checksum 21)."""

from __future__ import annotations

import gzip
import os

import numpy as np


def _field(line: str, off: int, ln: int) -> str:
    return line[off:off + ln]


def read_ctg(path: str) -> dict:
    name = os.path.basename(path).lower()
    if name.endswith(".gz"):
        text = gzip.open(path, "rt", encoding="latin-1").read()
    else:
        text = open(path, encoding="latin-1").read()
    cards = [text[i:i + 80] for i in range(0, len(text), 80)]
    if len(cards) < 5:
        raise ValueError("CTG: truncated header")
    h = cards[0]
    nrows = int(_field(h, 0, 10))
    ncols = int(_field(h, 20, 10))
    cell = int(_field(h, 35, 5))
    zone = int(_field(h, 50, 5))
    if not (0 < cell < 10000) or not (0 < zone <= 60):
        raise ValueError("CTG: implausible header")
    nwe = int(_field(cards[3], 40, 10))
    nwn = int(_field(cards[3], 50, 10))
    title = cards[4].strip()
    grid = np.zeros((6, nrows, ncols), np.int32)
    for line in cards[5:]:
        if len(line) < 80 or not line.strip():
            break
        if int(_field(line, 0, 3)) != zone:
            raise ValueError("CTG: unexpected UTM zone in cell card")
        x = int(_field(line, 3, 8)) - cell // 2
        y = int(_field(line, 11, 8)) + cell // 2
        dx, dy = x - nwe, nwn - y
        if dx < 0 or dx % cell or dy < 0 or dy % cell:
            raise ValueError("CTG: unexpected cell coordinates")
        cx, cy = dx // cell, dy // cell
        if cx >= ncols or cy >= nrows:
            raise ValueError("CTG: cell out of grid")
        for i in range(6):
            v = int(_field(line, 20 + 10 * i, 10))
            grid[i, cy, cx] = 0 if v >= 2000000000 else v
    return {
        "bands": [np.ascontiguousarray(grid[i]) for i in range(6)],
        "crs": f"EPSG:{32600 + zone}",
        "geotransform": (float(nwe), float(cell), 0.0,
                         float(nwn), 0.0, -float(cell)),
        "nodata": 0.0,
        "title": title,
    }
