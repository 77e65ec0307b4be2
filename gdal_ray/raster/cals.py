"""CALS Type 1 raster driver — reference role
frmts/cals/calsdataset.cpp (MIL-STD-1840 / MIL-R-28002 CALS raster,
public spec): a 2048-byte ASCII header of 128-byte text records
followed by a raw CCITT G4 (T.6) bilevel blob, min-is-white.

Header records used (reference Open): ``rtype: 1`` (type guard),
``rorient: a,b`` (pixel path / line progression; 0,270 is the
normal orientation), ``rpelcnt: x,y`` (dimensions), ``rdensty: d``
(DPI).  The reference mounts the blob under a synthesized TIFF
header via /vsisparse/; here the in-repo T.6 codec decodes it
directly.  The writer emits the reference's exact field layout
(srcdocid/dstdocid/…/notes at 128-byte offsets, NONE defaults) and
G4-encodes with raster/ccitt.py's T.6 coder.

Band semantics match the reference: values are 0/1 palette INDICES
with color table (255,255,255),(0,0,0) — i.e. 0 = white —
GCI_PaletteIndex (autotest cals.py checksums 9907/3883)."""

from __future__ import annotations

import numpy as np

from gdal_ray.raster.ccitt import decode_g4, encode_g4


def _field(header: str, key: str) -> str | None:
    i = header.find(key)
    if i < 0:
        return None
    rest = header[i + len(key):].replace("\x00", " ")
    toks = rest.split()
    return toks[0] if toks else None


def decode_cals(data: bytes) -> dict:
    header = data[:2048].decode("ascii", "replace")
    if "rtype: 1" not in header:
        raise ValueError("CALS: not a type-1 raster (rtype: 1 missing)")
    pel = _field(header, "rpelcnt:")
    orient = _field(header, "rorient:")
    if pel is None or orient is None:
        raise ValueError("CALS: missing rpelcnt/rorient")
    xsize, ysize = (int(v) for v in pel.split(",")[:2])
    ang1, ang2 = (int(v) for v in orient.split(",")[:2])
    density = None
    dens = _field(header, "rdensty:")
    if dens:
        try:
            density = int(dens.split(",")[0])
        except ValueError:
            density = None
    arr = decode_g4(data[2048:], xsize, ysize)
    out = {
        "bands": [arr],
        "crs": None,
        "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
        "nodata": None,
        "color_table": [(255, 255, 255), (0, 0, 0)],
    }
    if ang1 != 0 or ang2 != 270:
        out["pixel_path"] = ang1
        out["line_progression"] = ang2
    if density:
        out["dpi"] = density
    return out


def read_cals(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_cals(vsi_read_bytes(path))


def encode_cals(arr: np.ndarray, *, invert: bool = True,
                dpi: int | None = None, pixel_path: int = 0,
                line_progression: int = 270) -> bytes:
    """``arr`` is 0/1; with ``invert`` (the no-color-table default in
    the reference's CALSWrapperSrcBand) 1-bits are flipped so that
    0 = white in the emitted min-is-white stream.  Pass
    ``invert=False`` when the source already uses the
    (white, black) palette order."""
    a = np.ascontiguousarray(arr, np.uint8) & 1
    if invert:
        a = 1 - a
    ysize, xsize = a.shape
    if xsize > 999999 or ysize > 999999:
        raise ValueError("CALS: dimensions must be <= 999999")
    hdr = bytearray(b" " * 2048)

    def put(slot: int, text: str):
        hdr[slot * 128:slot * 128 + len(text)] = text.encode("ascii")

    put(0, "srcdocid: NONE")
    put(1, "dstdocid: NONE")
    put(2, "txtfilid: NONE")
    put(3, "figid: NONE")
    put(4, "srcgph: NONE")
    put(5, "doccls: NONE")
    put(6, "rtype: 1")
    put(7, f"rorient: {pixel_path:03d},{line_progression:03d}")
    put(8, f"rpelcnt: {xsize:06d},{ysize:06d}")
    density = dpi if dpi and 1 <= dpi <= 9999 else 200
    put(9, f"rdensty: {density:04d}")
    put(10, "notes: NONE")
    return bytes(hdr) + encode_g4(a)


def write_cals(path: str, arr: np.ndarray, **kw) -> None:
    with open(path, "wb") as f:
        f.write(encode_cals(arr, **kw))
