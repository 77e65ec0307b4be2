"""ENVI raster driver (.hdr + raw .img/.dat) — read/write.

Reference role: frmts/envi (ENVI driver); format per the public ENVI
header documentation. Header is `key = value` lines with `{...}`
brace blocks; the raw payload is typed by `data type`, laid out by
`interleave` (bsq = band-sequential, bil = line-interleaved, bip =
pixel-interleaved) and `byte order` (0 little, 1 big). `map info`
anchors a 1-based reference pixel to map coordinates.

Checksum parity pinned on the reference's own fixtures in
tests/test_envi.py: aea.dat → 14823 with its exact geotransform;
envi_rgbsmall_{bsq,bil,bip}.img → per-band 20718/20669/20895 across
all three interleaves.
"""

from __future__ import annotations

import os

import numpy as np

_DTYPES = {
    1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8",
    12: "u2", 13: "u4", 14: "i8", 15: "u8",
}
_INV_DTYPES = {np.dtype(v).name: k for k, v in _DTYPES.items()}


def parse_envi_header(text: str) -> dict:
    """ENVI .hdr → dict (keys lowercased; brace blocks joined)."""
    if not text.lstrip().startswith("ENVI"):
        raise ValueError("not an ENVI header")
    out: dict[str, str] = {}
    lines = text.splitlines()
    i = 1
    while i < len(lines):
        line = lines[i]
        i += 1
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        val = val.strip()
        if val.startswith("{") and "}" not in val:
            parts = [val]
            while i < len(lines) and "}" not in lines[i]:
                parts.append(lines[i])
                i += 1
            if i < len(lines):
                parts.append(lines[i])
                i += 1
            val = " ".join(p.strip() for p in parts)
        out[key.strip().lower()] = val.strip("{} ").strip()
    return out


def _header_path(path: str) -> str:
    base, _ = os.path.splitext(path)
    for cand in (base + ".hdr", path + ".hdr",
                 base + ".HDR", path + ".HDR"):
        from gdal_ray.vsi import vsi_exists

        try:
            if vsi_exists(cand):
                return cand
        except Exception:
            if os.path.exists(cand):
                return cand
    raise FileNotFoundError(f"no ENVI header for {path}")


def read_envi(path: str) -> dict:
    """→ decode_geotiff-shaped dict. ``path`` is the raw file
    (.img/.dat); the header is found by the ENVI naming convention."""
    from gdal_ray.vsi import vsi_read_bytes

    hdr = parse_envi_header(
        vsi_read_bytes(_header_path(path)).decode("ascii", "ignore"))
    w = int(hdr["samples"])
    h = int(hdr["lines"])
    nb = int(hdr.get("bands", "1"))
    dt = np.dtype(_DTYPES[int(hdr["data type"])])
    if int(hdr.get("byte order", "0")) == 1:
        dt = dt.newbyteorder(">")
    off = int(hdr.get("header offset", "0"))
    raw = vsi_read_bytes(path)[off:]
    arr = np.frombuffer(raw, dtype=dt, count=w * h * nb)
    inter = hdr.get("interleave", "bsq").lower()
    if inter == "bsq":
        cube = arr.reshape(nb, h, w)
    elif inter == "bil":
        cube = arr.reshape(h, nb, w).transpose(1, 0, 2)
    elif inter == "bip":
        cube = arr.reshape(h, w, nb).transpose(2, 0, 1)
    else:
        raise ValueError(f"unknown interleave {inter!r}")
    bands = [np.ascontiguousarray(cube[b]).astype(dt.newbyteorder("="))
             for b in range(nb)]

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    crs = ""
    if "map info" in hdr:
        f = [p.strip() for p in hdr["map info"].split(",")]
        crs = f[0]
        refx, refy = float(f[1]), float(f[2])
        x, y = float(f[3]), float(f[4])
        dx, dy = float(f[5]), float(f[6])
        gt = (x - (refx - 1.0) * dx, dx, 0.0,
              y + (refy - 1.0) * dy, 0.0, -dy)
        if crs.lower().startswith("geographic"):
            crs = "EPSG:4326"
    nodata = None
    if "data ignore value" in hdr:
        nodata = float(hdr["data ignore value"])
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata}


def write_envi(path: str, bands, gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
               crs: str = "", nodata: float | None = None,
               interleave: str = "bsq") -> None:
    """Raw file at ``path`` + sibling .hdr (bsq layout default)."""
    from gdal_ray.vsi import vsi_write_bytes

    if gt[2] or gt[4]:
        raise ValueError("ENVI map info cannot represent rotation")
    bands = [np.asarray(b) for b in bands]
    nb = len(bands)
    h, w = bands[0].shape
    cube = np.stack(bands)
    if interleave == "bil":
        raw = cube.transpose(1, 0, 2).tobytes()
    elif interleave == "bip":
        raw = cube.transpose(1, 2, 0).tobytes()
    else:
        interleave = "bsq"
        raw = cube.tobytes()
    vsi_write_bytes(path, raw)
    name = ("Geographic Lat/Lon" if crs in ("EPSG:4326", "")
            else crs)
    hdr = [
        "ENVI",
        "description = {gdal_ray ENVI writer}",
        f"samples = {w}",
        f"lines   = {h}",
        f"bands   = {nb}",
        "header offset = 0",
        "file type = ENVI Standard",
        f"data type = {_INV_DTYPES[bands[0].dtype.name]}",
        f"interleave = {interleave}",
        "byte order = 0",
        f"map info = {{{name}, 1, 1, {gt[0]!r}, {gt[3]!r}, "
        f"{gt[1]!r}, {abs(gt[5])!r}}}",
    ]
    if nodata is not None:
        hdr.append(f"data ignore value = {nodata:g}")
    base, _ = os.path.splitext(path)
    vsi_write_bytes(base + ".hdr", ("\n".join(hdr) + "\n").encode())


# ---------------------------------------------------------------------------
# EHdr — ESRI BIL/.hdr sibling (frmts/ehdr role)


def read_ehdr(path: str) -> dict:
    """ESRI .hdr-labelled raw raster (.bil/.bip/.bsq/.flt): the older
    keyword set (NCOLS/NROWS/NBANDS/NBITS/BYTEORDER/PIXELTYPE,
    ULXMAP/ULYMAP cell-CENTER anchors or xllcorner/cellsize). A .flt
    payload is float32 by definition (reference test #3933); NBITS 32
    without PIXELTYPE is float for .flt, int32 otherwise."""
    import os as _os

    from gdal_ray.vsi import vsi_read_bytes

    base, ext = _os.path.splitext(path)
    hdr_txt = vsi_read_bytes(base + ".hdr").decode("ascii", "ignore")
    kv: dict[str, str] = {}
    for line in hdr_txt.splitlines():
        parts = line.split()
        if len(parts) >= 2:
            kv[parts[0].lower()] = parts[1]
    w = int(kv["ncols"])
    h = int(kv["nrows"])
    nb = int(kv.get("nbands", "1"))
    raw = vsi_read_bytes(path)
    ptype = kv.get("pixeltype", "").upper()
    is_flt = ext.lower() == ".flt"
    if "nbits" in kv:
        nbits = int(kv["nbits"])
    elif len(raw) == w * h * nb * 4:
        # reference #3933: no NBITS → infer float32 from the payload
        # size (or from the .flt extension)
        nbits = 32
        is_flt = True
    else:
        nbits = 8
    if ptype == "FLOAT" or (is_flt and nbits in (0, 32)):
        dt = np.dtype("f4") if nbits != 64 else np.dtype("f8")
    elif ptype == "SIGNEDINT":
        dt = np.dtype(f"i{max(nbits, 8) // 8}")
    else:
        dt = np.dtype(f"u{max(nbits, 8) // 8}")
    order = kv.get("byteorder", "i").lower()
    dt = dt.newbyteorder(">" if order.startswith("m") else "<")
    arr = np.frombuffer(raw, dtype=dt, count=w * h * nb)
    layout = kv.get("layout", "bil").lower()
    if layout == "bsq":
        cube = arr.reshape(nb, h, w)
    elif layout == "bip":
        cube = arr.reshape(h, w, nb).transpose(2, 0, 1)
    else:
        cube = arr.reshape(h, nb, w).transpose(1, 0, 2)
    bands = [np.ascontiguousarray(cube[b]).astype(dt.newbyteorder("="))
             for b in range(nb)]
    dx = float(kv.get("xdim", kv.get("cellsize", "1")))
    dy = float(kv.get("ydim", kv.get("cellsize", "1")))
    if "ulxmap" in kv:  # cell-CENTER of the upper-left pixel
        x0 = float(kv["ulxmap"]) - dx / 2.0
        y0 = float(kv["ulymap"]) + dy / 2.0
    elif "xllcorner" in kv:
        x0 = float(kv["xllcorner"])
        y0 = float(kv["yllcorner"]) + h * dy
    else:
        x0, y0 = 0.0, 0.0
    nodata = (float(kv["nodata"]) if "nodata" in kv
              else float(kv["nodata_value"])
              if "nodata_value" in kv else None)
    return {"bands": bands, "crs": "",
            "geotransform": (x0, dx, 0.0, y0, 0.0, -dy),
            "nodata": nodata}
