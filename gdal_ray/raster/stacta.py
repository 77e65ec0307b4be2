"""STACTA (STAC Tiled Assets) reader — reference role frmts/stacta
(stactadataset.cpp), re-derived from the public STAC tiled-assets
extension:

  item JSON with ``tiles:tile_matrix_sets`` (OGC TMS tile matrices:
  scaleDenominator, topLeftCorner, tileWidth/Height,
  matrixWidth/Height), per-level ``tiles:tile_matrix_links`` limits,
  and ``asset_templates`` hrefs with {TileMatrixSet}/{TileMatrix}/
  {TileRow}/{TileCol} substitutions pointing at GeoTIFF tiles.

Pixel size follows the OGC TMS rule: scaleDenominator × 0.28 mm at
the CRS scale (degrees: /semi-major·180/π).  Levels expose the TMS
pyramid; missing tiles within the limits window read as nodata.

Pinned against the reference autotest (gdrivers/stacta.py): test.json
level 2 = 2048×1024×3 with gt (-180, 0.17578125, …) equal to the
direct VRT mosaic of its two tiles."""

from __future__ import annotations

import json
import math
import os

import numpy as np


def _pixel_size_deg(scale_denominator: float) -> float:
    # OGC TMS: 0.28 mm/pixel at scale, converted to degrees on the
    # WGS84 sphere (6378137 m semi-major)
    return scale_denominator * 0.28e-3 / (math.pi * 6378137) * 180.0


def read_stacta(path: str, level: int | None = None,
                asset: str | None = None,
                tms_name: str | None = None) -> dict:
    from gdal_ray.raster import gtiff
    from gdal_ray.vsi import vsi_read_bytes

    j = json.loads(vsi_read_bytes(path))
    props = j.get("properties", {})
    links = props.get("tiles:tile_matrix_links", {})
    sets = props.get("tiles:tile_matrix_sets", {})
    if not links or not sets:
        raise ValueError("STACTA: no tiles:tile_matrix_links/sets")
    if tms_name is None:
        tms_name = sorted(links)[0]
    tms = sets[tms_name]
    limits = links[tms_name].get("limits", {})
    matrices = {m["identifier"]: m for m in tms["tileMatrix"]}
    level_ids = sorted(limits or matrices, key=lambda s: float(s))
    if level is None:
        level_id = level_ids[-1]  # finest
    else:
        level_id = level_ids[level]
    m = matrices[level_id]
    lim = limits.get(level_id, {})
    min_col = lim.get("min_tile_col", 0)
    max_col = lim.get("max_tile_col", m["matrixWidth"] - 1)
    min_row = lim.get("min_tile_row", 0)
    max_row = lim.get("max_tile_row", m["matrixHeight"] - 1)
    tw, th = m["tileWidth"], m["tileHeight"]
    px = _pixel_size_deg(m["scaleDenominator"])
    tlx, tly = m["topLeftCorner"]

    templates = j.get("asset_templates") or {}
    if not templates:
        raise ValueError("STACTA: no asset_templates")
    if asset is None:
        asset = sorted(templates)[0]
    href = templates[asset]["href"]
    base = os.path.dirname(path) or "."

    w = (max_col - min_col + 1) * tw
    h = (max_row - min_row + 1) * th
    bands = None
    for row in range(min_row, max_row + 1):
        for col in range(min_col, max_col + 1):
            rel = (href.replace("{TileMatrixSet}", tms_name)
                   .replace("{TileMatrix}", level_id)
                   .replace("{TileRow}", str(row))
                   .replace("{TileCol}", str(col)))
            if rel.startswith("./"):
                rel = rel[2:]
            tile_path = os.path.join(base, rel)
            if not os.path.exists(tile_path):
                continue
            img = gtiff.decode_geotiff(vsi_read_bytes(tile_path))
            if bands is None:
                bands = [np.zeros((h, w), b.dtype)
                         for b in img["bands"]]
            y0 = (row - min_row) * th
            x0 = (col - min_col) * tw
            for b in range(min(len(bands), len(img["bands"]))):
                tb = img["bands"][b]
                vh = min(tb.shape[0], h - y0)
                vw = min(tb.shape[1], w - x0)
                bands[b][y0:y0 + vh, x0:x0 + vw] = tb[:vh, :vw]
    if bands is None:
        raise ValueError("STACTA: no tiles found")
    gt = (tlx + min_col * tw * px, px, 0.0,
          tly - min_row * th * px, 0.0, -px)
    crs = "EPSG:4326" if "CRS84" in str(
        tms.get("boundingBox", {}).get("crs", "")) or \
        "CRS84" in tms_name else None
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": 0.0, "levels": len(level_ids)}
