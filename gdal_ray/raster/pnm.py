"""Netpbm PNM driver (PBM/PGM/PPM, P1–P6) — reference role
frmts/raw/pnmdataset.cpp, re-derived from the public Netpbm format
specs.  maxval ≤ 255 → uint8, 256–65535 → big-endian uint16 (the
Netpbm wire rule).  Reference autotest pins: byte.pgm band-1 4672,
rgbsmall.ppm band-2 21053 (gdrivers/pnm.py).  ``pnm_size`` is the
header-only path (the reference opens int_max.pgm without reading —
decode guards absurd allocations the same way)."""

from __future__ import annotations

import re

import numpy as np

_MAX_PIXELS = 100_000_000


def _header_tokens(data: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace/comment-separated integers after the
    magic; returns (values, offset-past-single-whitespace)."""
    pos = 2
    vals: list[int] = []
    while len(vals) < count:
        m = re.match(rb"(?:\s+|#[^\n]*\n)*(\d+)", data[pos:])
        if not m:
            raise ValueError("PNM: truncated header")
        vals.append(int(m.group(1)))
        pos += m.end()
    return vals, pos  # end of the last header integer


def pnm_size(data: bytes) -> tuple[int, int]:
    """(width, height) without decoding."""
    if data[:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError("not a PNM")
    n = 1 if data[1:2] in b"14" else 2  # bitmaps have no maxval
    vals, _ = _header_tokens(data, 2)
    return vals[0], vals[1]


def decode_pnm(data: bytes) -> dict:
    """PNM bytes → ``load_raster`` dict (PGM → 1 band, PPM → R,G,B)."""
    if data[:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError("not a PNM")
    kind = int(data[1:2])
    nhead = 2 if kind in (1, 4) else 3
    vals, off = _header_tokens(data, nhead)
    w, h = vals[0], vals[1]
    maxval = vals[2] if nhead == 3 else 1
    if w * h > _MAX_PIXELS:
        raise ValueError(
            f"PNM image {w}x{h} exceeds {_MAX_PIXELS} px — use "
            "pnm_size() for metadata (reference header-only open)")
    channels = 3 if kind in (3, 6) else 1
    if kind == 1:  # ASCII bitmap: digits may be contiguous
        body = re.sub(rb"#[^\n]*", b"", data[off:])
        bits = np.frombuffer(body, np.uint8)
        bits = bits[(bits == 0x30) | (bits == 0x31)] - 0x30
        arr = (1 - bits[:w * h]).astype(np.uint8)  # PBM: 1 = black
    elif kind in (2, 3):  # ASCII grey / RGB
        body = re.sub(rb"#[^\n]*", b"", data[off:])
        toks = body.split()
        flat = np.array([int(t) for t in toks[:w * h * channels]],
                        dtype=np.int64)
        arr = flat.astype(np.uint16 if maxval > 255 else np.uint8)
    elif kind == 4:  # packed bitmap (off points at the single
        # whitespace byte after the header)
        stride = (w + 7) // 8
        rows = np.frombuffer(data, np.uint8, stride * h, off + 1)
        bits = np.unpackbits(rows.reshape(h, stride),
                             axis=1)[:, :w]
        arr = (1 - bits).reshape(-1)  # 1 = black → 0
    else:  # P5/P6 binary
        if maxval > 255:
            arr = np.frombuffer(data, ">u2", w * h * channels, off + 1)
            arr = arr.astype(np.uint16)
        else:
            arr = np.frombuffer(data, np.uint8, w * h * channels,
                                off + 1)
    px = arr.reshape(h, w, channels)
    bands = [np.ascontiguousarray(px[:, :, i]) for i in range(channels)]
    return {"bands": bands, "crs": "",
            "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
            "nodata": None}


def encode_pnm(bands, maxval: int | None = None) -> bytes:
    """1 band → P5 PGM, 3 bands → P6 PPM (binary — the reference's
    CreateCopy output form)."""
    bands = [np.asarray(b) for b in bands]
    h, w = bands[0].shape
    if maxval is None:
        maxval = 65535 if bands[0].dtype.itemsize > 1 else 255
    if len(bands) == 1:
        head = f"P5\n{w} {h}\n{maxval}\n".encode()
        px = bands[0]
    elif len(bands) == 3:
        head = f"P6\n{w} {h}\n{maxval}\n".encode()
        px = np.dstack(bands)
    else:
        raise ValueError("PNM: 1 (PGM) or 3 (PPM) bands")
    dt = ">u2" if maxval > 255 else np.uint8
    return head + px.astype(dt).tobytes()


def read_pnm(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_pnm(vsi_read_bytes(path))


def write_pnm(path: str, bands, maxval: int | None = None) -> None:
    from gdal_ray.vsi import vsi_write_bytes

    vsi_write_bytes(path, encode_pnm(bands, maxval))
