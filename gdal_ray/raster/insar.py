"""InSAR stack raw-raster drivers: ROI_PAC and ISCE — reference
roles frmts/raw/roipacdataset.cpp and frmts/raw/iscedataset.cpp,
re-derived from the projects' published header conventions.

ROI_PAC (JPL/Caltech): a ``.rsc`` "KEY  value" sidecar next to the
data file; the EXTENSION fixes layout (roipacdataset.cpp:277) —
  .int/.slc  CFloat32 ×1      .amp        Float32 ×2 pixel-interleaved
  .cor/.hgt/.unw/.msk/.trans  Float32 ×2 LINE-interleaved (band 1 =
  first half of each row)     .dem  Int16 ×1     .flg  UInt8 ×1
Georeference: gt = (X_FIRST, X_STEP, 0, Y_FIRST, 0, Y_STEP) taken
verbatim from the .rsc; Z_SCALE/Z_OFFSET become the band scale and
offset.

ISCE (isce.slc.xml): an ``<imageFile>`` XML of <property name=X>
<value>…</value> pairs — WIDTH, LENGTH, NUMBER_BANDS, DATA_TYPE
(BYTE/SHORT/INT/LONG/FLOAT/DOUBLE/CBYTE/CSHORT/CINT/CLONG/CFLOAT/
CDOUBLE), SCHEME (BIL/BIP/BSQ), BYTE_ORDER (l/b).

Pinned against the reference autotests (gdrivers/roipac.py: srtm.dem
checksum 64074; gdrivers/isce.py: isce.slc checksum 350 — complex
checksums follow GDAL's interleave-re/im-then-float rule,
alg/gdalchecksum.cpp:140)."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

# extension → (numpy dtype, nbands, interleave)
_ROIPAC = {
    "int": ("c8", 1, "PIXEL"), "slc": ("c8", 1, "PIXEL"),
    "amp": ("f4", 2, "PIXEL"),
    "cor": ("f4", 2, "LINE"), "hgt": ("f4", 2, "LINE"),
    "unw": ("f4", 2, "LINE"), "msk": ("f4", 2, "LINE"),
    "trans": ("f4", 2, "LINE"),
    "dem": ("i2", 1, "PIXEL"), "flg": ("u1", 1, "PIXEL"),
}


def parse_rsc(text: str) -> dict:
    hdr = {}
    for line in text.splitlines():
        parts = line.split(None, 1)
        if len(parts) == 2:
            hdr[parts[0].upper()] = parts[1].strip()
    return hdr


def read_roipac(path: str) -> dict:
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    if ext not in _ROIPAC:
        raise ValueError(f"ROI_PAC: unknown extension .{ext}")
    hdr = parse_rsc(open(path + ".rsc", encoding="latin-1").read())
    w = int(hdr["WIDTH"])
    h = int(hdr["FILE_LENGTH"])
    dts, nbands, inter = _ROIPAC[ext]
    dt = np.dtype("<" + dts)
    raw = open(path, "rb").read()
    arr = np.frombuffer(raw[:w * h * nbands * dt.itemsize], dt)
    if nbands == 1:
        bands = [arr.reshape(h, w)]
    elif inter == "PIXEL":
        a = arr.reshape(h, w, nbands)
        bands = [np.ascontiguousarray(a[:, :, b]) for b in range(nbands)]
    else:  # LINE: band 1 = first half of each row
        a = arr.reshape(h, nbands, w)
        bands = [np.ascontiguousarray(a[:, b, :]) for b in range(nbands)]
    gt = None
    if "X_FIRST" in hdr and "X_STEP" in hdr:
        gt = (float(hdr["X_FIRST"]), float(hdr["X_STEP"]), 0.0,
              float(hdr["Y_FIRST"]), 0.0, float(hdr["Y_STEP"]))
    crs = "EPSG:4326" if hdr.get("PROJECTION", "").upper() == "LL" \
        else None
    return {
        "bands": bands, "crs": crs, "geotransform": gt,
        "scale": float(hdr["Z_SCALE"]) if "Z_SCALE" in hdr else None,
        "offset": float(hdr["Z_OFFSET"]) if "Z_OFFSET" in hdr else None,
        "rsc": hdr,
    }


def write_roipac(path: str, bands: list, geotransform=None,
                 extra: dict | None = None) -> None:
    """Write data + .rsc per the extension's fixed layout."""
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    if ext not in _ROIPAC:
        raise ValueError(f"ROI_PAC: unknown extension .{ext}")
    dts, nbands, inter = _ROIPAC[ext]
    arrs = [np.asarray(b) for b in bands]
    if len(arrs) != nbands:
        raise ValueError(f"ROI_PAC: .{ext} needs {nbands} band(s)")
    h, w = arrs[0].shape
    dt = np.dtype("<" + dts)
    if nbands == 1:
        payload = arrs[0].astype(dt).tobytes()
    elif inter == "PIXEL":
        payload = np.ascontiguousarray(
            np.stack(arrs, axis=2).astype(dt)).tobytes()
    else:
        payload = np.ascontiguousarray(
            np.stack(arrs, axis=1).astype(dt)).tobytes()
    lines = [f"{'WIDTH':<40} {w}", f"{'FILE_LENGTH':<40} {h}"]
    if geotransform is not None:
        gt = geotransform
        lines += [f"{'X_FIRST':<40} {gt[0]:.16g}",
                  f"{'X_STEP':<40} {gt[1]:.16g}",
                  f"{'Y_FIRST':<40} {gt[3]:.16g}",
                  f"{'Y_STEP':<40} {gt[5]:.16g}"]
    for k, v in (extra or {}).items():
        lines.append(f"{k:<40} {v}")
    with open(path, "wb") as f:
        f.write(payload)
    with open(path + ".rsc", "w", encoding="ascii") as f:
        f.write("\n".join(lines) + "\n")


_ISCE_DT = {"BYTE": "u1", "SHORT": "i2", "INT": "i4", "LONG": "i8",
            "FLOAT": "f4", "DOUBLE": "f8",
            "CSHORT": None, "CINT": None, "CLONG": None,  # CInt unsup
            "CFLOAT": "c8", "CDOUBLE": "c16"}


def read_isce(path: str) -> dict:
    xmlp = path + ".xml"
    root = ET.parse(xmlp).getroot()
    props = {}
    for prop in root.iter("property"):
        name = prop.get("name", "").upper()
        val = prop.findtext("value")
        if name and val is not None:
            props[name] = val.strip()
    w = int(props["WIDTH"])
    h = int(props["LENGTH"])
    nbands = int(props.get("NUMBER_BANDS", "1"))
    dtname = props["DATA_TYPE"].upper()
    dts = _ISCE_DT.get(dtname)
    if dts is None:
        raise ValueError(f"ISCE: unsupported DATA_TYPE {dtname}")
    bo = ">" if props.get("BYTE_ORDER", "l").lower().startswith("b") \
        else "<"
    dt = np.dtype(bo + dts)
    scheme = props.get("SCHEME", "BIL").upper()
    raw = open(path, "rb").read()
    arr = np.frombuffer(raw[:w * h * nbands * dt.itemsize], dt)
    if nbands == 1:
        bands = [arr.reshape(h, w)]
    elif scheme == "BIL":
        a = arr.reshape(h, nbands, w)
        bands = [np.ascontiguousarray(a[:, b, :]) for b in range(nbands)]
    elif scheme == "BIP":
        a = arr.reshape(h, w, nbands)
        bands = [np.ascontiguousarray(a[:, :, b]) for b in range(nbands)]
    elif scheme == "BSQ":
        a = arr.reshape(nbands, h, w)
        bands = [np.ascontiguousarray(a[b]) for b in range(nbands)]
    else:
        raise ValueError(f"ISCE: unknown SCHEME {scheme}")
    return {"bands": bands, "crs": None, "geotransform": None,
            "properties": props}


def complex_checksum_view(arr: np.ndarray) -> np.ndarray:
    """GDAL checksums complex bands over interleaved re/im values
    (alg/gdalchecksum.cpp: nValsPerIter = 2) — expose that view so
    the shared float checksum applies."""
    h, w = arr.shape
    out = np.empty((h, 2 * w), np.float64)
    out[:, 0::2] = arr.real
    out[:, 1::2] = arr.imag
    return out
