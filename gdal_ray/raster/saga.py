"""SAGA GIS binary grid driver — reference role
frmts/saga/sagadataset.cpp, re-derived from the public SAGA grid
layout: a ``.sgrd`` ASCII key=value header describing a raw
``.sdat`` array —

  DATAFORMAT       BIT/BYTE_UNSIGNED/BYTE/SHORTINT_UNSIGNED/SHORTINT/
                   INTEGER_UNSIGNED/INTEGER/FLOAT/DOUBLE
  BYTEORDER_BIG    TRUE/FALSE       DATAFILE_OFFSET  bytes to skip
  POSITION_XMIN/YMIN   cell-CENTER of the lower-left cell
  CELLCOUNT_X/Y, CELLSIZE, NODATA_VALUE, Z_FACTOR
  TOPTOBOTTOM      FALSE = rows stored bottom-up (the SAGA default)

Corner geotransform ``(xmin - c/2, c, 0, ymin + c·(ny-1) + c/2, 0,
-c)``.  ``.sg-grd-z`` is a zip of the three files (read through the
in-repo /vsizip/).  Pinned against the reference autotest
(gdrivers/saga.py: checksum 108 on 4byteFloat.sdat and on the zipped
variant)."""

from __future__ import annotations

import os

import numpy as np

_DTYPES = {
    "BYTE_UNSIGNED": "u1", "BYTE": "i1",
    "SHORTINT_UNSIGNED": "u2", "SHORTINT": "i2",
    "INTEGER_UNSIGNED": "u4", "INTEGER": "i4",
    "FLOAT": "f4", "DOUBLE": "f8",
}


def parse_sgrd(text: str) -> dict:
    hdr = {}
    for line in text.splitlines():
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        hdr[k.strip().upper()] = v.strip()
    return hdr


def read_saga(path: str) -> dict:
    """``path`` may be the .sgrd, the .sdat, or a .sg-grd-z zip."""
    from gdal_ray.vsi import vsi_read_bytes

    low = path.lower()
    if low.endswith(".sg-grd-z"):
        import io
        import zipfile

        zf = zipfile.ZipFile(io.BytesIO(vsi_read_bytes(path)))
        names = zf.namelist()
        sgrd = next(n for n in names if n.lower().endswith(".sgrd"))
        sdat = next(n for n in names if n.lower().endswith(".sdat"))
        hdr = parse_sgrd(zf.read(sgrd).decode("ascii", "ignore"))
        raw = zf.read(sdat)
    else:
        base = os.path.splitext(path)[0]
        hdr = parse_sgrd(open(base + ".sgrd", encoding="ascii",
                              errors="ignore").read())
        raw = vsi_read_bytes(base + ".sdat")
    fmt = hdr.get("DATAFORMAT", "FLOAT").upper()
    if fmt == "BIT":
        raise NotImplementedError("SAGA: BIT grids not supported")
    if fmt not in _DTYPES:
        raise ValueError(f"SAGA: unknown DATAFORMAT {fmt}")
    bo = ">" if hdr.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE" \
        else "<"
    nx = int(hdr["CELLCOUNT_X"])
    ny = int(hdr["CELLCOUNT_Y"])
    off = int(hdr.get("DATAFILE_OFFSET", "0") or 0)
    cell = float(hdr["CELLSIZE"])
    xmin = float(hdr["POSITION_XMIN"])
    ymin = float(hdr["POSITION_YMIN"])
    nodata = float(hdr.get("NODATA_VALUE", "-99999"))
    zf_ = float(hdr.get("Z_FACTOR", "1") or 1.0)
    dt = np.dtype(bo + _DTYPES[fmt])
    arr = np.frombuffer(
        raw[off:off + nx * ny * dt.itemsize], dt).reshape(ny, nx)
    if hdr.get("TOPTOBOTTOM", "FALSE").upper() != "TRUE":
        arr = arr[::-1]
    return {
        "bands": [np.ascontiguousarray(arr)],
        "crs": None,
        "geotransform": (xmin - cell / 2.0, cell, 0.0,
                         ymin + cell * (ny - 1) + cell / 2.0,
                         0.0, -cell),
        "nodata": nodata,
        "z_factor": zf_,
    }


_FMT_OF = {np.dtype("u1"): "BYTE_UNSIGNED", np.dtype("i1"): "BYTE",
           np.dtype("u2"): "SHORTINT_UNSIGNED",
           np.dtype("i2"): "SHORTINT",
           np.dtype("u4"): "INTEGER_UNSIGNED",
           np.dtype("i4"): "INTEGER",
           np.dtype("f4"): "FLOAT", np.dtype("f8"): "DOUBLE"}


def write_saga(path: str, arr: np.ndarray, geotransform,
               nodata: float = -99999.0) -> None:
    """Write the .sgrd/.sdat pair (little-endian, bottom-up)."""
    base = os.path.splitext(path)[0]
    ny, nx = arr.shape
    dt = np.dtype(arr.dtype).newbyteorder("<")
    fmt = _FMT_OF.get(np.dtype(arr.dtype.str[-2:]))
    if fmt is None:
        raise ValueError(f"SAGA: unsupported dtype {arr.dtype}")
    cell = abs(geotransform[1])
    xmin = geotransform[0] + cell / 2.0
    # corner gt → lower-left cell center
    ymin = geotransform[3] + geotransform[5] * ny + cell / 2.0
    hdr = (f"NAME\t= {os.path.basename(base)}\n"
           f"DESCRIPTION\t= \nUNIT\t= \nDATAFILE_OFFSET\t= 0\n"
           f"DATAFORMAT\t= {fmt}\nBYTEORDER_BIG\t= FALSE\n"
           f"POSITION_XMIN\t= {xmin:.10f}\n"
           f"POSITION_YMIN\t= {ymin:.10f}\n"
           f"CELLCOUNT_X\t= {nx}\nCELLCOUNT_Y\t= {ny}\n"
           f"CELLSIZE\t= {cell:.10f}\nZ_FACTOR\t= 1.000000\n"
           f"NODATA_VALUE\t= {nodata:f}\nTOPTOBOTTOM\t= FALSE\n")
    with open(base + ".sgrd", "w", encoding="ascii") as f:
        f.write(hdr)
    with open(base + ".sdat", "wb") as f:
        f.write(np.ascontiguousarray(arr[::-1].astype(dt)).tobytes())
