"""RADARSAT-2 product reader — reference role frmts/rs2
(rs2dataset.cpp), re-derived from the public RADARSAT-2 product
format specification:

  product.xml → imageAttributes/fullResolutionImageData (pole
  attribute) naming the per-polarisation GeoTIFFs,
  geographicInformation/geolocationGrid imageTiePoints (GCPs),
  rationalFunctions → the GDAL RPC metadata names, and lookupTable
  elements (incidenceAngleCorrection Beta/Sigma/Gamma Nought) naming
  the calibration LUTs.

Calibration (RADARSAT_2_CALIB role): detected (Mag) products
calibrate as (DN² + offset) / gains[column] → float32, the
RS2CalibRasterBand arms.  Pinned against the autotest
(gdrivers/rs2.py): band 1 cs 4672, BETA0 cs 4848 and the verbatim
RPC name mapping."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

_RPC_MAP = {
    "ERR_BIAS": "biasError", "ERR_RAND": "randomError",
    "HEIGHT_OFF": "heightOffset", "HEIGHT_SCALE": "heightScale",
    "LAT_OFF": "latitudeOffset", "LAT_SCALE": "latitudeScale",
    "LINE_DEN_COEFF": "lineDenominatorCoefficients",
    "LINE_NUM_COEFF": "lineNumeratorCoefficients",
    "LINE_OFF": "lineOffset", "LINE_SCALE": "lineScale",
    "LONG_OFF": "longitudeOffset", "LONG_SCALE": "longitudeScale",
    "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
    "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
    "SAMP_OFF": "pixelOffset", "SAMP_SCALE": "pixelScale",
}
_CALIB_NAMES = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
                "GAMMA": "Gamma"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def read_rs2(path: str, calibration: str | None = None) -> dict:
    """RADARSAT-2 product.xml (or RADARSAT_2_CALIB:<calib>:<path>)
    → raster dict; calibration BETA0/SIGMA0/GAMMA applies the LUT."""
    from gdal_ray.raster import gtiff
    from gdal_ray.vsi import vsi_read_bytes

    if path.startswith("RADARSAT_2_CALIB:"):
        _, calib, rest = path.split(":", 2)
        if calib.upper() != "UNCALIB":
            calibration = calib.upper()
        path = rest
    if os.path.isdir(path):
        path = os.path.join(path, "product.xml")
    base = os.path.dirname(path) or "."
    root = ET.fromstring(vsi_read_bytes(path))
    if _local(root.tag) != "product":
        raise ValueError("RS2: not a product document")

    images = []
    luts = {}
    for el in root.iter():
        name = _local(el.tag)
        if name == "fullResolutionImageData" and el.text:
            images.append((el.get("pole", ""), el.text.strip()))
        elif name == "lookupTable" and el.text:
            luts[el.get("incidenceAngleCorrection", "")] = \
                el.text.strip()
    if not images:
        raise ValueError("RS2: no fullResolutionImageData")

    gains = None
    offset = 0.0
    if calibration:
        lut_name = luts.get(_CALIB_NAMES.get(calibration, ""))
        if lut_name is None:
            raise ValueError(f"RS2: no LUT for {calibration}")
        lut = ET.fromstring(
            vsi_read_bytes(os.path.join(base, lut_name)))
        for el in lut.iter():
            if _local(el.tag) == "offset":
                offset = float(el.text)
            elif _local(el.tag) == "gains":
                gains = np.array([float(v)
                                  for v in el.text.split()],
                                 np.float32)

    bands = []
    band_meta = []
    for pole, fname in images:
        img = gtiff.decode_geotiff(
            vsi_read_bytes(os.path.join(base, fname)))
        for b in img["bands"]:
            if gains is not None:
                # RS2CalibRasterBand detected-product arm:
                # (DN² + offset) / gains[column]
                g = gains
                if len(g) < b.shape[1]:
                    g = np.resize(g, b.shape[1])
                b = ((b.astype(np.float32) ** 2 + offset)
                     / g[:b.shape[1]])
            bands.append(b)
            band_meta.append({"POLARIMETRIC_INTERP": pole})

    gcps = []
    for pt in root.iter():
        if _local(pt.tag) != "imageTiePoint":
            continue
        vals = {}
        for c in pt.iter():
            if c.text and c.text.strip():
                vals[_local(c.tag)] = c.text.strip()
        try:
            gcps.append({
                "pixel": float(vals["pixel"]),
                "line": float(vals["line"]),
                "x": float(vals["longitude"]),
                "y": float(vals["latitude"]),
                "z": float(vals.get("height", 0) or 0),
            })
        except (KeyError, ValueError):
            pass

    rpc = {}
    rf = None
    for el in root.iter():
        if _local(el.tag) == "rationalFunctions":
            rf = el
            break
    if rf is not None:
        vals = {_local(c.tag): (c.text or "").strip() for c in rf}
        for out_name, in_name in _RPC_MAP.items():
            if in_name in vals:
                rpc[out_name] = vals[in_name]

    return {"bands": bands, "crs": "EPSG:4326" if gcps else None,
            "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
            "nodata": None, "gcps": gcps, "rpc": rpc,
            "band_metadata": band_meta}
