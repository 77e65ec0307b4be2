"""ER Mapper ERS driver — reference role frmts/ers/{ersdataset.cpp,
ershdrnode.cpp}, re-derived from ER Mapper's published .ers header
grammar: a hierarchical ASCII document of ``Name Begin … Name End``
blocks and ``Key = value`` lines, '#' comments (NOT inside quoted
strings or { } brace groups — the reference's own srtm.ers fixture
pins exactly that), values either bare, "quoted", or { grouped }.

Raster semantics: CellType (Unsigned8BitInteger … IEEE8ByteReal),
ByteOrder MSBFirst/LSBFirst, NrOfCellsPerLine/NrOfLines/NrOfBands,
BIL interleave, data in the sibling file named by DataFile or the
header path minus ``.ers``.  Geotransform: RegistrationCoord
Eastings/Northings verbatim, or Latitude/Longitude in D:M:S, cell
sizes from CellInfo, then the RegistrationCellX/Y shift
(ersdataset.cpp:1197: gt[0] -= cellX·gt[1], gt[3] -= cellY·gt[5]).
NullCellValue → nodata; RegionInfo "All" stats → band statistics
metadata.  Pinned against the reference autotest (gdrivers/ers.py:
srtm.ers checksum 64074 + the exact four statistics strings)."""

from __future__ import annotations

import os

import numpy as np

_TYPES = {
    "unsigned8bitinteger": "u1", "signed8bitinteger": "i1",
    "unsigned16bitinteger": "u2", "signed16bitinteger": "i2",
    "unsigned32bitinteger": "u4", "signed32bitinteger": "i4",
    "ieee4bytereal": "f4", "ieee8bytereal": "f8",
}


def _tokenize(text: str):
    """ERS lexer: strips # comments outside quotes/braces, yields
    logical 'Key = value' / 'Name Begin' / 'Name End' items."""
    out = []
    buf = []
    in_q = False
    brace = 0
    i = 0
    while i < len(text):
        c = text[i]
        if in_q:
            buf.append(c)
            if c == "\\" and i + 1 < len(text):
                buf.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_q = False
        elif c == '"':
            in_q = True
            buf.append(c)
        elif c == "{":
            brace += 1
            buf.append(c)
        elif c == "}":
            brace -= 1
            buf.append(c)
        elif c == "#":
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        elif c == "\n" and brace == 0:
            line = "".join(buf).strip()
            if line:
                out.append(line)
            buf = []
        else:
            buf.append(c)
        i += 1
    line = "".join(buf).strip()
    if line:
        out.append(line)
    return out


def parse_ers(text: str) -> dict:
    """→ flat dict of dotted paths (DatasetHeader root implied)."""
    flat: dict[str, str] = {}
    stack: list[str] = []
    for line in _tokenize(text):
        low = line.lower()
        if low.endswith(" begin"):
            stack.append(line[:-6].strip().lower())
            continue
        if low.endswith(" end"):
            if stack:
                stack.pop()
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            v = v.strip()
            if v.startswith('"') and v.endswith('"'):
                v = v[1:-1]
            elif v.startswith("{") and v.endswith("}"):
                v = v[1:-1].strip()
                if v.startswith('"') and v.endswith('"'):
                    v = v[1:-1]
            path = (".".join(stack[1:] + [k.strip().lower()])
                    if len(stack) > 1 else k.strip().lower())
            # first value wins (duplicate NrOfBands in the fixture)
            flat.setdefault(path, v)
    return flat


def _dms(s: str) -> float:
    parts = s.strip().split(":")
    sign = -1.0 if parts[0].strip().startswith("-") else 1.0
    vals = [abs(float(p)) for p in parts]
    while len(vals) < 3:
        vals.append(0.0)
    return sign * (vals[0] + vals[1] / 60.0 + vals[2] / 3600.0)


def read_ers(path: str) -> dict:
    hdr = parse_ers(open(path, encoding="latin-1").read())
    nx = int(hdr["rasterinfo.nrofcellsperline"])
    ny = int(hdr["rasterinfo.nroflines"])
    nbands = int(hdr.get("rasterinfo.nrofbands", "1"))
    ct = hdr.get("rasterinfo.celltype", "Unsigned8BitInteger").lower()
    if ct not in _TYPES:
        raise ValueError(f"ERS: unhandled CellType {ct}")
    bo = ">" if hdr.get("byteorder", "LSBFirst").upper().startswith(
        "MSB") else "<"
    dt = np.dtype(bo + _TYPES[ct])
    datafile = hdr.get("datafile")
    if datafile:
        dpath = os.path.join(os.path.dirname(path), datafile)
    else:
        dpath = path[:-4] if path.lower().endswith(".ers") else path
    raw = open(dpath, "rb").read()
    arr = np.frombuffer(raw[:nx * ny * nbands * dt.itemsize], dt)
    if nbands == 1:
        bands = [arr.reshape(ny, nx)]
    else:  # BIL
        a = arr.reshape(ny, nbands, nx)
        bands = [np.ascontiguousarray(a[:, b, :]) for b in range(nbands)]
    dx = float(hdr.get("rasterinfo.cellinfo.xdimension", "1"))
    dy = float(hdr.get("rasterinfo.cellinfo.ydimension", "1"))
    gt = None
    if "rasterinfo.registrationcoord.eastings" in hdr:
        gt = [float(hdr["rasterinfo.registrationcoord.eastings"]), dx,
              0.0, float(hdr["rasterinfo.registrationcoord.northings"]),
              0.0, -dy]
    elif "rasterinfo.registrationcoord.latitude" in hdr:
        gt = [_dms(hdr["rasterinfo.registrationcoord.longitude"]), dx,
              0.0, _dms(hdr["rasterinfo.registrationcoord.latitude"]),
              0.0, -dy]
    if gt is not None:
        cx = float(hdr.get("rasterinfo.registrationcellx", "0"))
        cy = float(hdr.get("rasterinfo.registrationcelly", "0"))
        gt[0] -= cx * gt[1] + cy * gt[2]
        gt[3] -= cx * gt[4] + cy * gt[5]
        gt = tuple(gt)
    nodata = hdr.get("rasterinfo.nullcellvalue")
    _STAT_NAMES = {"minimumvalue": "STATISTICS_MINIMUM",
                   "maximumvalue": "STATISTICS_MAXIMUM",
                   "meanvalue": "STATISTICS_MEAN",
                   "medianvalue": "STATISTICS_MEDIAN"}
    stats = {_STAT_NAMES[k.rsplit(".", 1)[-1]]: v
             for k, v in hdr.items()
             if k.startswith("rasterinfo.regioninfo.stats.")
             and k.rsplit(".", 1)[-1] in _STAT_NAMES}
    return {
        "bands": bands,
        "crs": hdr.get("coordinatespace.projection"),
        "geotransform": gt,
        "nodata": float(nodata) if nodata is not None else None,
        "stats": stats or None,
        "header": hdr,
    }
