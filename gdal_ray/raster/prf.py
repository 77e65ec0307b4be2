"""Racurs PHOTOMOD PRF / x-dem driver — reference role
frmts/prf/phprfdataset.cpp, re-derived from the PHOTOMOD phini XML
layout:

  <phini> of <i|d|s|x n=... v=...> entries: Width/Height/QChans,
  ChannelsInfo (type U/F + bytes_ps → dtype), GeoRef A_0..B_2
  (gt[3] -= gt[4] + gt[5], the PH_GEOREF_SHIFT_Y=1 rule), parts_ext,
  and one <x n="{base}_{r}_{c}"> block per tile with
  Width/Height/DispX/DispY[/Scale].

Tiles live at ``{dir}/{basename}/{elementname}{parts_ext}`` and are
TIFFs (decoded with the in-repo codec).  ``.x-dem`` products
(parts_ext .demtif) add XR/YR/ZR ranges (node-registered geotransform
with the −0.5 px shift + optional DemShift), BadZ nodata, metre
units, and scaled Pyramid tiles exposed as overview levels.
``.prj`` sidecars carry WKT.

Pinned against the reference autotest (gdrivers/prf.py): ph.prf
checksum 43190 + literal geotransform and EPSG:32601; dem.x-dem
size/dtype/unit, overview 1082×1165, gt (1.5,1,0,9329,0,-2)."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def _entries(el: ET.Element):
    for child in el:
        yield child.get("n", ""), child.get("v", ""), child


def read_prf(path: str, level: int = 0) -> dict:
    """PRF/x-dem product → raster dict; ``level`` 0 = full
    resolution, 1.. = pyramid scales in increasing-scale order."""
    from gdal_ray.raster import gtiff
    from gdal_ray.vsi import vsi_read_bytes

    root = ET.fromstring(vsi_read_bytes(path))
    if root.tag != "phini":
        raise ValueError("PRF: not a phini document")
    is_dem = path.lower().endswith(".x-dem")
    parts_ext = ".demtif" if is_dem else ".tif"
    width = height = nbands = 0
    dtype = None
    gt = None
    dem = {}
    dem_shift = None
    tiles = []
    for name, value, el in _entries(root):
        if name == "Width":
            width = int(value)
        elif name == "Height":
            height = int(value)
        elif name == "QChans":
            nbands = int(value)
        elif name == "parts_ext":
            parts_ext = "." + value
        elif name == "ChannelsInfo":
            t = by = None
            for n2, v2, _ in _entries(el):
                if n2 == "type":
                    t = v2
                elif n2 == "bytes_ps":
                    by = int(v2)
            dtype = {("U", 1): np.uint8, ("U", 2): np.uint16,
                     ("U", 4): np.uint32, ("F", 4): np.float32,
                     ("F", 8): np.float64}.get((t, by))
        elif name == "GeoRef":
            vals = {n2: float(v2) for n2, v2, _ in _entries(el)}
            if all(k in vals for k in
                   ("A_0", "A_1", "A_2", "B_0", "B_1", "B_2")):
                g = [vals["A_0"], vals["A_1"], vals["A_2"],
                     vals["B_0"], vals["B_1"], vals["B_2"]]
                # PH_GEOREF_SHIFT_Y = 1 (phprfdataset.cpp:258)
                g[3] -= g[4] + g[5]
                gt = tuple(g)
        elif name == "DemShift":
            vals = {n2: float(v2) for n2, v2, _ in _entries(el)}
            if {"x", "y", "z"} <= set(vals):
                dem_shift = (vals["x"], vals["y"], vals["z"])
        elif name in ("XR_0", "XR_1", "YR_0", "YR_1", "ZR_0", "ZR_1",
                      "BadZ"):
            dem[name] = float(value)
        elif el.tag == "x" and name:
            info = {n2: v2 for n2, v2, _ in _entries(el)}
            if "Width" in info and "Height" in info:
                tiles.append({
                    "name": name,
                    "w": int(info["Width"]),
                    "h": int(info["Height"]),
                    "x": int(info.get("DispX", 0)),
                    "y": int(info.get("DispY", 0)),
                    "scale": int(info.get("Scale", 0)),
                })
    if dtype is None or width <= 0 or height <= 0 or nbands <= 0:
        raise ValueError("PRF: missing dimensions/ChannelsInfo")

    base = os.path.splitext(path)[0]
    scales = sorted({t["scale"] for t in tiles if t["scale"] > 1})
    levels = 1 + len(scales)
    if level == 0:
        scale = 0
        xsize, ysize = width, height
        use = [t for t in tiles if t["scale"] <= 1]
    else:
        # an overview IS its pyramid tile (AddOverview of the tile
        # band, phprfdataset.cpp:140) — the declared Width/Height
        # are the level's raster size
        scale = scales[level - 1]
        use = [t for t in tiles if t["scale"] == scale]
        xsize, ysize = use[0]["w"], use[0]["h"]
    bands = [np.zeros((ysize, xsize), dtype) for _ in range(nbands)]
    for t in use:
        tile_path = f"{base}/{t['name']}{parts_ext}"
        try:
            img = gtiff.decode_geotiff(vsi_read_bytes(tile_path))
        except (OSError, ValueError):
            continue  # missing tiles read as zeros (reference parity)
        x0, y0 = (0, 0) if scale else (t["x"], t["y"])
        for b in range(min(nbands, len(img["bands"]))):
            tb = img["bands"][b]
            vh = min(tb.shape[0], ysize - y0)
            vw = min(tb.shape[1], xsize - x0)
            if vh > 0 and vw > 0:
                bands[b][y0:y0 + vh, x0:x0 + vw] = tb[:vh, :vw]

    out = {"bands": bands, "crs": None, "nodata": None,
           "geotransform": gt or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
           "levels": levels}
    if is_dem:
        out["units"] = "m"
        if all(k in dem for k in ("XR_0", "XR_1", "YR_0", "YR_1")) \
                and width > 1 and height > 1:
            px = (dem["XR_1"] - dem["XR_0"]) / (width - 1)
            py = (dem["YR_0"] - dem["YR_1"]) / (height - 1)
            g0 = dem["XR_0"] - 0.5 * px
            g3 = dem["YR_1"] - 0.5 * py
            if dem_shift:
                g0 += dem_shift[0]
                g3 += dem_shift[1]
            out["geotransform"] = (g0, px, 0.0, g3, 0.0, py)
        if "ZR_0" in dem and "ZR_1" in dem:
            out["stats_min"] = dem["ZR_0"]
            out["stats_max"] = dem["ZR_1"]
        if "BadZ" in dem:
            out["nodata"] = dem["BadZ"]
        if dem_shift:
            out["offset"] = dem_shift[2]
    prj = os.path.splitext(path)[0] + ".prj"
    if os.path.exists(prj):
        import re

        text = open(prj).read()
        codes = re.findall(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]', text)
        if codes:
            out["crs"] = f"EPSG:{codes[-1]}"
        else:
            from gdal_ray.shapefile import parse_prj

            out["crs"] = parse_prj(text)
    return out
