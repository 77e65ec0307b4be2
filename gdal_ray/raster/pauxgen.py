"""PCI .aux-labelled raw (PAux) and Generic Binary (.hdr) drivers —
reference roles frmts/raw/pauxdataset.cpp and
frmts/raw/genbindataset.cpp, re-derived from the formats' published
header conventions.

PAux: an ASCII ``.aux`` next to a raw file —
  AuxilaryTarget: <raw name>       RawDefinition: xsize ysize nbands
  ChanDefinition-N: TYPE byte_offset pixel_offset line_offset
                    [Swapped|Unswapped]   (TYPE ∈ 8U/16U/16S/32R;
                    Swapped = little-endian data, the PCI convention)
  UpLeftX/Y + LoRightX/Y: EDGE coordinates → direct geotransform.

Generic Binary: an ESRI-style ``.hdr`` of "KEY: value" lines —
BANDS/ROWS/COLS, DATATYPE (U1/U2/U4 bit-packed single band, U8, U16,
S16, F32, F64), BYTE_ORDER (LSB else MSB), INTERLEAVING BSQ/BIL/BIP,
UL/LR coordinates as CELL CENTERS (pixel = (LR-UL)/(size-1), then a
half-pixel corner shift — genbindataset.cpp:703).  Reads support a
window so the reference's truncated autotest fixture (checksum over
a 500×1 window with RAW_CHECK_FILE_SIZE=NO) is honored.

Pinned against the reference autotests (gdrivers/paux.py: small16.raw
band 2 checksum 12816; gdrivers/genbin.py: tm4628_96.bil window
checksum 5738 + the literal geotransform)."""

from __future__ import annotations

import os

import numpy as np

_PAUX_TYPES = {"8U": "u1", "16U": "u2", "16S": "i2", "32R": "f4"}


def read_paux(path: str) -> dict:
    """``path`` = the raw file (with .aux sidecar) or the .aux."""
    if path.lower().endswith(".aux"):
        aux, raw_path = path, None
    else:
        raw_path = path
        aux = path + ".aux"
        if not os.path.exists(aux):  # small16.raw → small16.aux
            aux = os.path.splitext(path)[0] + ".aux"
    hdr: dict[str, str] = {}
    chans = []
    for line in open(aux, encoding="latin-1"):
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        k, v = k.strip(), v.strip()
        if k.startswith("ChanDefinition-"):
            chans.append(v.split())
        else:
            hdr[k] = v
    xsize, ysize, _nb = (int(t) for t in hdr["RawDefinition"].split())
    if raw_path is None:
        raw_path = os.path.join(os.path.dirname(aux),
                                hdr["AuxilaryTarget"].split()[0])
    raw = open(raw_path, "rb").read()
    bands = []
    for tok in chans:
        if len(tok) < 4:
            continue
        dts = _PAUX_TYPES.get(tok[0].upper(), "u1")
        bo = "<" if (len(tok) > 4 and tok[4].lower() == "swapped") \
            else ">"
        dt = np.dtype(bo + dts)
        off = int(tok[1])
        pix = int(tok[2])
        lin = int(tok[3])
        a = np.frombuffer(raw, np.uint8)
        rows = []
        for y in range(ysize):
            row = np.frombuffer(
                a[off + y * lin:off + y * lin + pix * xsize]
                .tobytes(), dt)
            rows.append(row[::pix // dt.itemsize]
                        if pix != dt.itemsize else row[:xsize])
        bands.append(np.vstack([r[:xsize] for r in rows]))
    gt = None
    if "UpLeftX" in hdr and "LoRightX" in hdr:
        ulx, uly = float(hdr["UpLeftX"]), float(hdr["UpLeftY"])
        lrx, lry = float(hdr["LoRightX"]), float(hdr["LoRightY"])
        gt = (ulx, (lrx - ulx) / xsize, 0.0,
              uly, 0.0, (lry - uly) / ysize)
    return {"bands": bands, "crs": hdr.get("MapUnits"),
            "geotransform": gt}


_GENBIN_TYPES = {"U8": "u1", "U16": "u2", "S16": "i2",
                 "F32": "f4", "F64": "f8"}


def read_genbin(path: str, window=None, band: int | None = None) -> dict:
    """``window`` = (xoff, yoff, xsize, ysize) or None for the full
    grid; ``band`` = 1-based single band or None for all (the data
    file must cover whatever is requested)."""
    base = os.path.splitext(path)[0]
    hdr: dict[str, str] = {}
    key = None
    for line in open(base + ".hdr", encoding="latin-1"):
        if ":" in line:
            k, v = line.split(":", 1)
            key = k.strip().upper()
            hdr[key] = v.strip()
        elif key and line.strip():
            hdr[key] += " " + line.strip()
    nbands = int(hdr.get("BANDS", "1"))
    nrows = int(hdr["ROWS"])
    ncols = int(hdr["COLS"])
    dtname = hdr.get("DATATYPE", "U8").upper()
    inter = hdr.get("INTERLEAVING", "BIL").upper()
    bo = "<" if hdr.get("BYTE_ORDER", "LSB").upper() == "LSB" else ">"
    xo, yo, xs, ys = window or (0, 0, ncols, nrows)

    data = open(base + os.path.splitext(path)[1], "rb").read() \
        if os.path.exists(path) else open(path, "rb").read()
    if dtname in ("U1", "U2", "U4"):
        nbits = int(dtname[1])
        if nbands != 1:
            raise ValueError("GenBin: U1/U2/U4 supports one band")
        bits = np.unpackbits(np.frombuffer(data, np.uint8))
        per_row = ncols * nbits
        out = np.zeros((ys, xs), np.uint8)
        for r in range(ys):
            rowbits = bits[(yo + r) * per_row:(yo + r + 1) * per_row]
            vals = rowbits.reshape(-1, nbits)
            v = np.zeros(len(vals), np.uint8)
            for b in range(nbits):
                v = (v << 1) | vals[:, b]
            out[r] = v[xo:xo + xs]
        bands = [out]
    else:
        dt = np.dtype(bo + _GENBIN_TYPES.get(dtname, "u1"))
        isz = dt.itemsize
        bands = []
        band_ids = range(nbands) if band is None else [band - 1]
        for b in band_ids:
            out = np.zeros((ys, xs), dt.newbyteorder("="))
            for r in range(ys):
                y = yo + r
                if inter == "BSQ":
                    start = (b * nrows * ncols + y * ncols + xo) * isz
                elif inter == "BIL":
                    start = ((y * nbands + b) * ncols + xo) * isz
                else:  # BIP
                    start = ((y * ncols + xo) * nbands + b) * isz
                if inter == "BIP":
                    row = np.frombuffer(
                        data[start:start + xs * nbands * isz], dt)
                    out[r] = row[::nbands][:xs]
                else:
                    out[r] = np.frombuffer(
                        data[start:start + xs * isz], dt)
            bands.append(out)
    gt = None
    if "UL_X_COORDINATE" in hdr:
        ulx = float(hdr["UL_X_COORDINATE"])
        uly = float(hdr["UL_Y_COORDINATE"])
        lrx = float(hdr["LR_X_COORDINATE"])
        lry = float(hdr["LR_Y_COORDINATE"])
        g1 = (lrx - ulx) / (ncols - 1)
        g5 = (lry - uly) / (nrows - 1)
        gt = (ulx - g1 * 0.5, g1, 0.0, uly - g5 * 0.5, 0.0, g5)
    return {"bands": bands, "crs": hdr.get("PROJECTION_NAME"),
            "geotransform": gt, "window": (xo, yo, xs, ys)}
