"""SPOT / Pléiades DIMAP raster driver (v1 + v2) — reference role
frmts/dimap/dimapdataset.cpp + the Pléiades RPC reader
(gcore/mdreader/reader_pleiades.cpp), re-derived from the published
DIMAP dictionary (Airbus/CNES):

- DIMAP v1: ``METADATA.DIM`` wrapping one raster file
  (``Data_Access.Data_File.DATA_FILE_PATH href``); tie-point GCPs
  from ``Geoposition.Geoposition_Points.Tie_Point`` (the +0.5
  raster-CS convention), Horizontal_CS_CODE SRS, and the v1 metadata
  translation (Production / FACILITY_ / Scene_Source /
  Data_Processing / SPECTRAL_ Spectral_Band_Info).
- DIMAP v2: ``VOL_*.XML`` volumes resolving ``COMPONENT_PATH`` to
  ``DIM_*.XML`` components; ``Raster_Dimensions`` + ``Data_Files``
  R{r}C{c} tile mosaics; the v2 metadata translation tables (DATASET_
  / Strip_Source / FACILITY_ / Product_Settings / GEOMETRIC_ /
  RADIOMETRIC_ / CLOUDCOVER_ from the DIM doc, CLOUDCOVER_/EPHEMERIS_
  from the STRIP doc, LOCATION_TYPE=Center Located_Geometric_Values);
  RPC_*.XML Inverse_Model coefficients with the reference's 1-based →
  0-based SAMP_OFF/LINE_OFF shift.

Tiles decode through the engine's own GeoTIFF/JPEG 2000 codecs.
Pinned against the reference autotest (gdrivers/dimap.py): v1
window checksum 21586 + literal GCPs/metadata; v2 single_component's
full expected metadata + RPC dictionaries and band checksum 7024."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

# (xml dotted path, metadata prefix) pairs — dimapdataset.cpp:979
_V1_TRANSLATION = [
    ("Production", ""),
    ("Production/Facility", "FACILITY_"),
    ("Dataset_Sources/Source_Information/Scene_Source", ""),
    ("Data_Processing", ""),
    ("Image_Interpretation/Spectral_Band_Info", "SPECTRAL_"),
]
# dimapdataset.cpp:1533
_V2_TRANSLATION = [
    ("Product_Information/Delivery_Identification", "DATASET_"),
    ("Product_Information/Producer_Information", "DATASET_"),
    ("Dataset_Sources/Source_Identification/Strip_Source", ""),
    ("Processing_Information/Production_Facility", "FACILITY_"),
    ("Processing_Information/Product_Settings", ""),
    ("Processing_Information/Product_Settings/Geometric_Settings",
     "GEOMETRIC_"),
    ("Processing_Information/Product_Settings/Radiometric_Settings",
     "RADIOMETRIC_"),
    ("Quality_Assessment/Imaging_Quality_Measurement", "CLOUDCOVER_"),
]
# dimapdataset.cpp:1559
_STRIP_TRANSLATION = [
    ("Catalog/Full_Strip/Notations/Cloud_And_Quality_Notation/"
     "Data_Strip_Notation", "CLOUDCOVER_"),
    ("Acquisition_Configuration/Platform_Configuration/"
     "Ephemeris_Configuration", "EPHEMERIS_"),
]
# Located_Geometric_Values (LOCATION_TYPE=Center) — :1601
_LGV_TRANSLATION = [
    ("SATELLITE_ALTITUDE", ""),
    ("Acquisition_Angles", ""),
    ("Solar_Incidences", ""),
    ("Ground_Sample_Distance", ""),
]


def _translate(md: dict, doc: ET.Element, table, from_root=True):
    """The reference's SetMetadataFromXML: each (path, prefix) either
    names a single text element (prefix+path-leaf) or a parent whose
    element children become prefix+child entries."""
    for path, prefix in table:
        el = doc.find(path) if from_root else doc.find(path)
        if el is None and not from_root:
            el = doc.find(path)
        if el is None:
            continue
        text = (el.text or "").strip()
        if text and not len(el):
            name = prefix + path.split("/")[-1]
            if len(name) < 128:
                md[name] = text
            continue
        for child in el:
            if len(child):
                continue
            v = (child.text or "").strip()
            if v != "" or child.text is not None:
                name = prefix + child.tag
                if len(name) < 128 and child.text is not None:
                    md[name] = child.text.strip()


def _read_xml(path: str) -> ET.Element:
    from gdal_ray.vsi import vsi_read_bytes

    return ET.fromstring(vsi_read_bytes(path))


def _resolve_document(path: str) -> str:
    """Directory / VOL / DIM → the component DIM (or v1 .DIM) path."""
    low = path.lower().rstrip("/")
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        for pat in ("VOL_.*\\.xml$", "DIM_.*\\.xml$", "METADATA.DIM$",
                    "metadata.dim$"):
            for n in names:
                if re.match(pat, n, re.IGNORECASE):
                    return _resolve_document(os.path.join(path, n))
        raise ValueError(f"DIMAP: no VOL_/DIM_/METADATA.DIM in {path}")
    if os.path.basename(low).startswith("vol_"):
        root = _read_xml(path)
        comp = root.find(".//Component/COMPONENT_PATH")
        if comp is None:
            raise ValueError("DIMAP: volume without components")
        return os.path.join(os.path.dirname(path), comp.get("href"))
    return path


def dimap_components(path: str) -> list[str]:
    """All component DIM paths of a volume/directory (subdatasets)."""
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        for n in names:
            if re.match(r"VOL_.*\.xml$", n, re.IGNORECASE):
                path = os.path.join(path, n)
                break
        else:
            return [_resolve_document(path)]
    root = _read_xml(path)
    out = []
    for comp in root.findall(".//Component/COMPONENT_PATH"):
        out.append(os.path.join(os.path.dirname(path), comp.get("href")))
    return out or [path]


def _load_image(path: str) -> dict:
    low = path.lower()
    if low.endswith((".jp2", ".j2k")):
        from gdal_ray.raster.jp2 import decode_jp2
        from gdal_ray.vsi import vsi_read_bytes

        return decode_jp2(vsi_read_bytes(path))
    from gdal_ray.raster import gtiff
    from gdal_ray.vsi import vsi_read_bytes

    data = vsi_read_bytes(path)
    if data[:4] == b"<VRT":
        # the autotest's IMAGERY.TIF is a raster VRT in disguise;
        # the reference opens it through GDALOpen's magic dispatch
        from gdal_ray.raster.vrt import read_vrt_array

        return read_vrt_array(path)
    return gtiff.decode_geotiff(data)


def _read_v1(doc: ET.Element, dim_path: str) -> dict:
    base = os.path.dirname(dim_path)
    href = doc.find(".//Data_Access/Data_File/DATA_FILE_PATH")
    img_path = os.path.join(base, href.get("href"))
    img = _load_image(img_path)
    md: dict = {}
    _translate(md, doc, _V1_TRANSLATION)
    # tie-point GCPs: DATA coords get the raster-CS +0.5 shift
    gcps = []
    for tp in doc.findall(".//Geoposition_Points/Tie_Point"):
        gcps.append({
            # 1-based DATA coords → GDAL pixel centers (:939)
            "pixel": float(tp.findtext("TIE_POINT_DATA_X")) - 0.5,
            "line": float(tp.findtext("TIE_POINT_DATA_Y")) - 0.5,
            "x": float(tp.findtext("TIE_POINT_CRS_X")),
            "y": float(tp.findtext("TIE_POINT_CRS_Y")),
            "z": float(tp.findtext("TIE_POINT_CRS_Z") or 0),
        })
    code = doc.findtext(".//Coordinate_Reference_System/Horizontal_CS/"
                        "HORIZONTAL_CS_CODE") or ""
    img["crs"] = code.replace("epsg:", "EPSG:") if code else img.get(
        "crs")
    img["metadata"] = md
    img["gcps"] = gcps
    return img


def _read_rpc(rpc_path: str) -> dict:
    doc = _read_xml(rpc_path)
    g = doc.find(".//Global_RFM")
    if g is None:
        return {}
    inv = g.find("Inverse_Model")
    out = {}
    for kind in ("SAMP_NUM", "SAMP_DEN", "LINE_NUM", "LINE_DEN"):
        vals = []
        for i in range(1, 21):
            v = inv.findtext(f"{kind}_COEFF_{i}")
            if v is None:
                break
            vals.append(v.strip())
        if vals:
            out[f"{kind}_COEFF"] = "".join(" " + v for v in vals)
    val = g.find("RFM_Validity")
    src = val if val is not None else g
    for name in ("LONG_SCALE", "LONG_OFF", "LAT_SCALE", "LAT_OFF",
                 "HEIGHT_SCALE", "HEIGHT_OFF", "SAMP_SCALE",
                 "LINE_SCALE"):
        v = src.findtext(f".//{name}")
        if v is not None:
            out[name] = v.strip()
    # Pléiades RPCs are 1-based; GDAL's RPC convention is 0-based
    for name in ("SAMP_OFF", "LINE_OFF"):
        v = src.findtext(f".//{name}")
        if v is not None:
            try:
                out[name] = repr(int(v.strip()) - 1)
            except ValueError:
                out[name] = v.strip()
    return out


def _read_v2(doc: ET.Element, dim_path: str) -> dict:
    base = os.path.dirname(dim_path)
    rd = doc.find("Raster_Data")
    dims = rd.find("Raster_Dimensions")
    ncols = int(dims.findtext("NCOLS"))
    nrows = int(dims.findtext("NROWS"))
    nbands = int(dims.findtext("NBANDS"))
    # tile mosaic
    tiles = []
    for df in rd.findall(".//Data_Files/Data_File"):
        r = int(df.get("tile_R", "1"))
        c = int(df.get("tile_C", "1"))
        href = df.find("DATA_FILE_PATH").get("href")
        tiles.append((r, c, os.path.join(base, href)))
    if not tiles:
        raise ValueError("DIMAP2: no Data_File entries")
    bands = None
    row_off = {}
    col_off = {}
    y = 0
    for r in sorted({t[0] for t in tiles}):
        row_off[r] = y
        first = _load_image([t for t in tiles if t[0] == r][0][2])
        y += first["bands"][0].shape[0]
    x = 0
    for c in sorted({t[1] for t in tiles}):
        col_off[c] = x
        first = _load_image([t for t in tiles if t[1] == c][0][2])
        x += first["bands"][0].shape[1]
    for r, c, p in sorted(tiles):
        img = _load_image(p)
        tb = img["bands"]
        if bands is None:
            dt = tb[0].dtype
            bands = [np.zeros((nrows, ncols), dt)
                     for _ in range(max(nbands, len(tb)))]
        y0, x0 = row_off[r], col_off[c]
        th, tw = tb[0].shape
        vh = min(th, nrows - y0)
        vw = min(tw, ncols - x0)
        for b in range(min(len(bands), len(tb))):
            bands[b][y0:y0 + vh, x0:x0 + vw] = tb[b][:vh, :vw]
    md: dict = {}
    _translate(md, doc, _V2_TRANSLATION)
    # strip metadata document (Source_Component DATA_STRIP ... href)
    for comp in doc.findall(".//Component_Information/Source_Component"
                            "/COMPONENT_PATH"):
        href = comp.get("href") or ""
        if "STRIP" in href.upper():
            strip = _read_xml(os.path.join(base, href))
            _translate(md, strip, _STRIP_TRANSLATION)
    else:
        # fallback: sibling STRIP_*.XML
        for n in sorted(os.listdir(base)):
            if re.match(r"STRIP_.*\.xml$", n, re.IGNORECASE):
                _translate(md, _read_xml(os.path.join(base, n)),
                           _STRIP_TRANSLATION)
                break
    # LOCATION_TYPE=Center located geometric values
    for lgv in doc.findall(".//Use_Area/Located_Geometric_Values"):
        if (lgv.findtext("LOCATION_TYPE") or "").lower() != "center":
            continue
        _translate(md, lgv, _LGV_TRANSLATION, from_root=False)
        break
    rpc = {}
    for n in sorted(os.listdir(base)):
        if re.match(r"RPC_.*\.xml$", n, re.IGNORECASE):
            rpc = _read_rpc(os.path.join(base, n))
            break
    # geotransform from Geoposition_Insert when present
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    gp = doc.find(".//Geoposition/Geoposition_Insert")
    if gp is not None:
        gt = (float(gp.findtext("ULXMAP")),
              float(gp.findtext("XDIM")), 0.0,
              float(gp.findtext("ULYMAP")), 0.0,
              -float(gp.findtext("YDIM")))
    code = doc.findtext(".//Coordinate_Reference_System/Projected_CRS/"
                        "PROJECTED_CRS_CODE") or doc.findtext(
        ".//Coordinate_Reference_System/Geodetic_CRS/GEODETIC_CRS_CODE")
    crs = None
    if code:
        m = re.search(r"(\d+)", code)
        if m:
            crs = f"EPSG:{m.group(1)}"
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": None, "metadata": md, "rpc": rpc}


def read_dimap(path: str) -> dict:
    """DIMAP product (directory, VOL_*.XML, DIM_*.XML or v1
    METADATA.DIM) → raster dict with flattened ``metadata`` (and
    ``rpc`` / ``gcps`` where the product carries them)."""
    dim = _resolve_document(path)
    doc = _read_xml(dim)
    if doc.tag not in ("Dimap_Document", "PHR_DIMAP_Document"):
        raise ValueError("DIMAP: not a Dimap_Document")
    fmt = doc.find(".//METADATA_FORMAT")
    version = (fmt.get("version", "1") if fmt is not None else "1")
    if version.startswith("2") or version.startswith("3"):
        return _read_v2(doc, dim)
    return _read_v1(doc, dim)
