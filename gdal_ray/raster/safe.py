"""Sentinel-1 SAFE product reader — reference role frmts/safe
(safedataset.cpp), re-derived from ESA's public Sentinel-1 product
specification:

  manifest.safe (XFDU): dataObject fileLocation hrefs — measurement
  GeoTIFFs under ./measurement/ named
  s1X-<swath>-<type>-<pol>-...tiff — plus the safe:footPrint
  gml:coordinates (lat,lon pairs → the driver's lon-first FOOTPRINT
  POLYGON string); annotation XMLs carry the geolocationGrid GCPs.

Bands order by (swath, polarisation) like the reference (VH before
VV).  Pinned against the autotest (gdrivers/safe.py): band 1 (VH)
checksum 65372, band 2 (VV) checksum 3732, the literal FOOTPRINT
string, and the per-band SENTINEL1_CALIB:UNCALIB subdataset pins."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _resolve_safe_dir(path: str) -> tuple[str, str]:
    """path (dir or manifest.safe) → (safe_dir, manifest path)."""
    if os.path.isdir(path):
        return path, os.path.join(path, "manifest.safe")
    return os.path.dirname(path), path


def read_safe(path: str, swath: str | None = None,
              polarisation: str | None = None) -> dict:
    """SAFE product → raster dict; bands are the measurement rasters
    ordered by (swath, polarisation); optional filters select a
    subset (the SENTINEL1_CALIB subdataset role)."""
    from gdal_ray.raster import gtiff
    from gdal_ray.vsi import vsi_read_bytes

    base, manifest = _resolve_safe_dir(path)
    root = ET.fromstring(vsi_read_bytes(manifest))
    measurements = []
    for el in root.iter():
        if _localname(el.tag) != "fileLocation":
            continue
        href = el.get("href") or ""
        if "/measurement/" in href and href.lower().endswith(
                (".tiff", ".tif")):
            name = os.path.basename(href)
            m = re.match(r"s1.-(\w+?)-\w+-(\w+?)-", name)
            sw = m.group(1).upper() if m else ""
            pol = m.group(2).upper() if m else ""
            measurements.append((sw, pol, href))
    measurements.sort(key=lambda t: (t[0], t[1]))
    if swath:
        measurements = [m for m in measurements
                        if m[0] == swath.upper()]
    if polarisation:
        measurements = [m for m in measurements
                        if m[1] == polarisation.upper()]
    if not measurements:
        raise ValueError("SAFE: no measurement rasters")

    bands = []
    band_meta = []
    for sw, pol, href in measurements:
        rel = href[2:] if href.startswith("./") else href
        img = gtiff.decode_geotiff(
            vsi_read_bytes(os.path.join(base, rel)))
        bands.extend(img["bands"])
        band_meta.append({"SWATH": sw, "POLARISATION": pol})

    footprint = None
    for el in root.iter():
        if _localname(el.tag) == "coordinates" and el.text:
            pairs = [p.split(",") for p in el.text.split()]
            if all(len(p) == 2 for p in pairs):
                pts = [(float(lon), float(lat)) for lat, lon in pairs]
                pts.append(pts[0])
                body = ",".join("%f %f" % p for p in pts[:-1])
                footprint = ("POLYGON((" + body + ", %f %f))"
                             % pts[-1])
            break

    # GCPs from the first annotation's geolocation grid
    gcps = []
    ann_dir = os.path.join(base, "annotation")
    if os.path.isdir(ann_dir):
        for n in sorted(os.listdir(ann_dir)):
            if not n.lower().endswith(".xml"):
                continue
            try:
                ann = ET.fromstring(open(os.path.join(ann_dir, n),
                                         "rb").read())
            except ET.ParseError:
                continue
            for pt in ann.iter():
                if _localname(pt.tag) != "geolocationGridPoint":
                    continue
                vals = {_localname(c.tag): c.text for c in pt}
                try:
                    gcps.append({
                        "pixel": float(vals["pixel"]),
                        "line": float(vals["line"]),
                        "x": float(vals["longitude"]),
                        "y": float(vals["latitude"]),
                        "z": float(vals.get("height", 0) or 0),
                    })
                except (KeyError, TypeError, ValueError):
                    pass
            break
    out = {"bands": bands, "crs": "EPSG:4326" if gcps else None,
           "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
           "nodata": None, "band_metadata": band_meta, "gcps": gcps}
    if footprint:
        out["metadata"] = {"FOOTPRINT": footprint}
    return out
