"""EarthWatch / DigitalGlobe .TIL tiled products — reference role
frmts/til/tildataset.cpp, re-derived from the published DigitalGlobe
product layout:

  .TIL: ``key = value`` lines (numTiles, TILE_n.filename,
  TILE_n.UL/LRCol/RowOffset) naming the tile rasters; a sibling
  ``.IMD`` (``BEGIN_GROUP``/``END_GROUP`` key blocks) or ``.XML``
  (<isd><IMD>…) metadata document carries size and the IMAGERY-domain
  metadata (satId → SATELLITEID, firstLineTime → ACQUISITIONDATETIME,
  cloudCover → CLOUDCOVER).

Tiles are mosaicked at their UL offsets through the engine's own
TIFF codec.  Pinned against the autotest (gdrivers/til.py): checksum
4672 and the IMAGERY metadata set for both the IMD and XML forms."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np


def _parse_til(text: str) -> list[dict]:
    tiles: dict[int, dict] = {}
    for line in text.splitlines():
        m = re.match(r"\s*TILE_(\d+)\.(\w+)\s*=\s*(.+?);?\s*$", line)
        if not m:
            continue
        n = int(m.group(1))
        key = m.group(2)
        val = m.group(3).strip().strip('"')
        tiles.setdefault(n, {})[key] = val
    return [tiles[k] for k in sorted(tiles)]


def _parse_imd(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        m = re.match(r"\s*(\w+)\s*=\s*(.+?);?\s*$", line)
        if m:
            out[m.group(1)] = m.group(2).strip().strip('"')
    return out


def _find_ci(directory: str, name: str) -> str | None:
    if os.path.exists(os.path.join(directory, name)):
        return os.path.join(directory, name)
    low = name.lower()
    for n in os.listdir(directory):
        if n.lower() == low:
            return os.path.join(directory, n)
    return None


def read_til(path: str) -> dict:
    from gdal_ray.raster import gtiff
    from gdal_ray.vsi import vsi_read_bytes

    base = os.path.dirname(path) or "."
    stem = os.path.splitext(os.path.basename(path))[0]
    tiles = _parse_til(vsi_read_bytes(path).decode("latin-1",
                                                   "replace"))
    if not tiles:
        raise ValueError("TIL: no TILE_n entries")
    meta: dict = {}
    nrows = ncols = None
    imd_path = _find_ci(base, stem + ".IMD")
    xml_path = _find_ci(base, stem + ".XML")
    files = [path]
    if imd_path:
        files.append(imd_path)
        imd = _parse_imd(open(imd_path).read())
        nrows = int(imd.get("numRows", 0)) or None
        ncols = int(imd.get("numColumns", 0)) or None
        if "satId" in imd:
            meta["SATELLITEID"] = imd["satId"]
        if "cloudCover" in imd:
            meta["CLOUDCOVER"] = imd["cloudCover"]
        if "firstLineTime" in imd:
            meta["ACQUISITIONDATETIME"] = imd["firstLineTime"]
    elif xml_path:
        files.append(xml_path)
        root = ET.fromstring(open(xml_path).read())

        def ftext(tag):
            el = root.find(f".//{tag}")
            return el.text.strip() if el is not None and el.text else None

        nrows = int(ftext("NUMROWS") or 0) or None
        ncols = int(ftext("NUMCOLUMNS") or 0) or None
        if ftext("SATID"):
            meta["SATELLITEID"] = ftext("SATID")
        if ftext("CLOUDCOVER"):
            meta["CLOUDCOVER"] = ftext("CLOUDCOVER")
        if ftext("FIRSTLINETIME"):
            meta["ACQUISITIONDATETIME"] = ftext("FIRSTLINETIME")
    else:
        raise ValueError("TIL: missing .IMD/.XML metadata sidecar")

    bands = None
    crs = None
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    for t in tiles:
        fn = _find_ci(base, t["filename"])
        if fn is None:
            continue
        files.append(fn)
        img = gtiff.decode_geotiff(vsi_read_bytes(fn))
        x0 = int(t.get("ULColOffset", 0))
        y0 = int(t.get("ULRowOffset", 0))
        if bands is None:
            h = nrows or max(int(tt.get("LRRowOffset", 0))
                             for tt in tiles)
            w = ncols or max(int(tt.get("LRColOffset", 0))
                             for tt in tiles)
            bands = [np.zeros((h, w), img["bands"][0].dtype)
                     for _ in img["bands"]]
            crs = img.get("crs")
            tgt = list(img["geotransform"])
            # shift tile georef back to the mosaic origin
            tgt[0] -= x0 * tgt[1]
            tgt[3] -= y0 * tgt[5]
            gt = tuple(tgt)
        for b in range(min(len(bands), len(img["bands"]))):
            tb = img["bands"][b]
            vh = min(tb.shape[0], bands[b].shape[0] - y0)
            vw = min(tb.shape[1], bands[b].shape[1] - x0)
            bands[b][y0:y0 + vh, x0:x0 + vw] = tb[:vh, :vw]
    if bands is None:
        raise ValueError("TIL: no tile rasters found")
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": None, "metadata": meta, "files": files}
