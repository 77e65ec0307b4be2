"""USGS LULC Composite Theme Grid (CTG) reader — reference role
frmts/ctg (ctgdataset.cpp ReadImagery/Open/GetGeoTransform),
re-derived from the published USGS GIRAS grid-cell layout:

  5 × 80-char header records — record 0: rows [0:10], cols [20:30],
  cell size [35:40], UTM zone [50:55]; record 3: NW-corner easting
  [40:50] / northing [50:60]; record 4: title.  Then one 80-char
  record per cell: zone [0:3], cell-centre easting [3:11] /
  northing [11:19], and six 10-char integer samples at [20+10i]
  (values ≥ 2e9 read as 0).  Grid origin = NW corner shifted half a
  cell; CRS = EPSG:326<zone>.

Pinned against autotest gdrivers/ctg.py: fake_grid_cell band-1
checksum 21, the literal geotransform and UTM 14N, band-1 LULC
category names + nodata 0."""

from __future__ import annotations

import numpy as np

_LULC = {
    1: "Urban or Built-Up Land", 2: "Agricultural Land", 3: "Rangeland",
    4: "Forest Land", 5: "Water", 6: "Wetland", 7: "Barren Land",
    8: "Tundra", 9: "Perennial Snow and Ice", 11: "Residential",
    12: "Commercial Services", 13: "Industrial",
    14: "Transportation, Communications", 15: "Industrial and Commercial",
    16: "Mixed Urban or Built-Up Land", 17: "Other Urban or Built-Up Land",
    21: "Cropland and Pasture",
    22: "Orchards, Groves, Vineyards, Nurseries",
    23: "Confined Feeding Operations", 24: "Other Agricultural Land",
    31: "Herbaceous Rangeland", 32: "Shrub and Brush Rangeland",
    33: "Mixed Rangeland", 41: "Deciduous Forest Land",
    42: "Evergreen Forest Land", 43: "Mixed Forest Land",
    51: "Streams and Canals", 52: "Lakes", 53: "Reservoirs",
    54: "Bays and Estuaries", 61: "Forested Wetlands",
    62: "Nonforested Wetlands", 71: "Dry Salt Flats", 72: "Beaches",
    73: "Sandy Areas Other than Beaches", 74: "Bare Exposed Rock",
    75: "Strip Mines, Quarries, and Gravel Pits", 76: "Transitional Areas",
    77: "Mixed Barren Land", 81: "Shrub and Brush Tundra",
    82: "Herbaceous Tundra", 83: "Bare Ground", 84: "Wet Tundra",
    85: "Mixed Tundra", 91: "Perennial Snowfields", 92: "Glaciers",
}

BAND_DESCRIPTIONS = [
    "Land Use and Land Cover Code",
    "Political units Code",
    "Census county subdivisions and SMSA tracts Code",
    "Hydrologic units Code",
    "Federal land ownership Code",
    "State land ownership Code",
]


def _field(line: str, start: int, width: int) -> int:
    txt = line[start:start + width].strip()
    try:
        return int(txt)
    except ValueError:
        return 0


def category_names() -> list[str]:
    n = max(_LULC) + 1
    return [_LULC.get(i, "") for i in range(n)]


def decode_ctg(data: bytes) -> dict:
    text = data.decode("latin-1")
    if len(text) < 5 * 80:
        raise ValueError("CTG: truncated header")
    hdr = [text[i * 80:(i + 1) * 80] for i in range(5)]
    rows = _field(hdr[0], 0, 10)
    cols = _field(hdr[0], 20, 10)
    cell = _field(hdr[0], 35, 5)
    zone = _field(hdr[0], 50, 5)
    if not (0 < cell < 10000) or not (0 < zone <= 60):
        raise ValueError("CTG: bad cell size / UTM zone")
    nw_e = _field(hdr[3], 40, 10)
    nw_n = _field(hdr[3], 50, 10)
    title = hdr[4].rstrip()
    bands = np.zeros((6, rows, cols), np.int32)
    pos = 5 * 80
    while pos + 80 <= len(text):
        line = text[pos:pos + 80]
        pos += 80
        if _field(line, 0, 3) != zone:
            raise ValueError("CTG: unexpected UTM zone in cell record")
        x = _field(line, 3, 8) - cell // 2
        y = _field(line, 11, 8) + cell // 2
        dx, dy = x - nw_e, nw_n - y
        if dx < 0 or dy < 0 or dx % cell or dy % cell:
            raise ValueError("CTG: unexpected cell coordinates")
        cx, cy = dx // cell, dy // cell
        if cx >= cols or cy >= rows:
            raise ValueError("CTG: cell outside grid")
        for i in range(6):
            v = _field(line, 20 + 10 * i, 10)
            bands[i, cy, cx] = 0 if v >= 2000000000 else v
    gt = (float(nw_e - cell // 2), float(cell), 0.0,
          float(nw_n + cell // 2), 0.0, float(-cell))
    return {"bands": list(bands), "crs": f"EPSG:{32600 + zone}",
            "geotransform": gt, "nodata": 0.0,
            "metadata": {"TITLE": title},
            "band_descriptions": BAND_DESCRIPTIONS,
            "category_names": {1: category_names()}}


def read_ctg(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    if path.lower().endswith(".gz"):
        path = "/vsigzip/" + path
    return decode_ctg(vsi_read_bytes(path))
