"""R 'raster' package native grid driver — reference role
frmts/raw/rrasterdataset.cpp, re-derived from the R raster package's
documented .grd/.gri pair: an INI-style ``.grd`` header
([georeference] nrows/ncols/xmin/ymin/xmax/ymax + projection,
[data] datatype/byteorder/nbands/bandorder/nodatavalue) describing a
raw top-down ``.gri`` array.

Datatype names are R conventions — INT1S/INT2S/INT4S, INT1U/INT2U/
INT4U, FLT4S/FLT8S, LOG1S (read as u8).  Band order BIL/BIP/BSQ.
xmin/xmax/ymin/ymax are cell EDGES: geotransform
``(xmin, (xmax-xmin)/ncols, 0, ymax, 0, (ymin-ymax)/nrows)``
(rrasterdataset.cpp:754 writes exactly these back).  nodatavalue
"NA" means unset.  Pinned against the reference autotest
(gdrivers/rraster.py: checksum 4672 on the byte fixtures, RGBA
fixture band order)."""

from __future__ import annotations

import os

import numpy as np

_DTYPES = {"LOG1S": "u1", "INT1S": "i1", "INT2S": "i2", "INT4S": "i4",
           "INT1U": "u1", "INT2U": "u2", "INT4U": "u4",
           "FLT4S": "f4", "FLT8S": "f8"}


def parse_rgrd(text: str) -> dict:
    hdr = {}
    for line in text.splitlines():
        line = line.strip()
        if "=" in line and not line.startswith("["):
            k, v = line.split("=", 1)
            hdr[k.strip().lower()] = v.strip()
    return hdr


def read_rraster(path: str) -> dict:
    base = os.path.splitext(path)[0]
    hdr = parse_rgrd(open(base + ".grd", encoding="latin-1").read())
    nrows = int(hdr["nrows"])
    ncols = int(hdr["ncols"])
    xmin, xmax = float(hdr["xmin"]), float(hdr["xmax"])
    ymin, ymax = float(hdr["ymin"]), float(hdr["ymax"])
    name = hdr.get("datatype", "FLT4S").upper()
    if name not in _DTYPES:
        raise ValueError(f"RRASTER: unhandled datatype {name}")
    bo = ">" if hdr.get("byteorder", "little").lower() == "big" else "<"
    dt = np.dtype(bo + _DTYPES[name])
    nbands = int(hdr.get("nbands", "1"))
    order = hdr.get("bandorder", "BIL").upper()
    raw = open(base + ".gri", "rb").read()
    n = nrows * ncols * nbands
    arr = np.frombuffer(raw[:n * dt.itemsize], dt)
    if nbands == 1:
        bands = [arr.reshape(nrows, ncols)]
    elif order == "BIL":
        a = arr.reshape(nrows, nbands, ncols)
        bands = [np.ascontiguousarray(a[:, b, :]) for b in range(nbands)]
    elif order == "BIP":
        a = arr.reshape(nrows, ncols, nbands)
        bands = [np.ascontiguousarray(a[:, :, b]) for b in range(nbands)]
    elif order == "BSQ":
        a = arr.reshape(nbands, nrows, ncols)
        bands = [np.ascontiguousarray(a[b]) for b in range(nbands)]
    else:
        raise ValueError(f"RRASTER: unknown bandorder {order}")
    nv = hdr.get("nodatavalue", "NA")
    return {
        "bands": bands,
        "crs": hdr.get("projection") or None,
        "geotransform": (xmin, (xmax - xmin) / ncols, 0.0,
                         ymax, 0.0, (ymin - ymax) / nrows),
        "nodata": None if nv.upper() == "NA" else float(nv),
        "band_names": [s.strip() for s in
                       hdr.get("layername", "").split(":")]
        if hdr.get("layername") else None,
    }


_NAME_OF = {np.dtype("u1"): "INT1U", np.dtype("i1"): "INT1S",
            np.dtype("i2"): "INT2S", np.dtype("u2"): "INT2U",
            np.dtype("i4"): "INT4S", np.dtype("u4"): "INT4U",
            np.dtype("f4"): "FLT4S", np.dtype("f8"): "FLT8S"}


def write_rraster(path: str, bands: list, geotransform,
                  projection: str = "", nodata=None) -> None:
    """Write the .grd/.gri pair (little-endian BIL)."""
    base = os.path.splitext(path)[0]
    arrs = [np.asarray(b) for b in bands]
    nrows, ncols = arrs[0].shape
    name = _NAME_OF.get(np.dtype(arrs[0].dtype.str[-2:]))
    if name is None:
        raise ValueError(f"RRASTER: unsupported dtype {arrs[0].dtype}")
    gt = geotransform
    xmin, ymax = gt[0], gt[3]
    xmax = gt[0] + gt[1] * ncols
    ymin = gt[3] + gt[5] * nrows
    stacked = np.stack(arrs, axis=1)  # rows, bands, cols (BIL)
    hdr = ("[general]\ncreator=gdal_ray\n[georeference]\n"
           f"nrows={nrows}\nncols={ncols}\n"
           f"xmin={xmin:.17g}\nymin={ymin:.17g}\n"
           f"xmax={xmax:.17g}\nymax={ymax:.17g}\n"
           f"projection={projection}\n[data]\n"
           f"datatype={name}\nbyteorder=little\n"
           f"nbands={len(arrs)}\nbandorder=BIL\n"
           f"nodatavalue={'NA' if nodata is None else repr(nodata)}\n")
    with open(base + ".grd", "w", encoding="ascii") as f:
        f.write(hdr)
    with open(base + ".gri", "wb") as f:
        f.write(np.ascontiguousarray(
            stacked.astype(stacked.dtype.newbyteorder("<"))).tobytes())
