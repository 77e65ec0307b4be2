"""Spec-correct PNG encode/decode via stdlib zlib — the tile-sink
image format (reference: the PNG output of `gdal raster tile` /
gdal2tiles, apps/gdalalg_raster_tile.cpp:6191, gdal2tiles.py:1283).

Scope: 8-bit greyscale (colortype 0), RGB (2) and RGBA (6), filter
type 0 on every scanline (spec-valid; keeps encode vectorized), no
interlace.  The decoder handles all five standard filters so it can
read any baseline non-interlaced 8-bit PNG, which doubles as the
golden-test verifier without external codecs."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLORTYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG colortype


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 array → PNG bytes (deterministic)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _COLORTYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLORTYPE[c], 0, 0, 0)
    # filter byte 0 prepended to each scanline, single vectorized pass
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    lines = raw.reshape(h, 1 + stride)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a scan
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:
                    p = a + b - cc
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                        b if pb_ <= pc_ else cc
                    )
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) or (H, W, C) uint8 (baseline,
    non-interlaced, colortypes 0/2/3/4/6; paletted images expand
    through PLTE (+tRNS alpha) to RGB/RGBA like the reference's PNG
    driver consumers do)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    channels = None
    idat = b""
    plte = None
    trns = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if inter != 0 or comp != 0 or filt != 0:
                raise ValueError("only baseline non-interlaced")
            if depth != 8 and ctype not in (0, 3):
                raise ValueError("non-8-bit depth only for "
                                 "grayscale/palette")
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"unsupported bit depth {depth}")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unsupported colortype {ctype}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if depth == 8:
        stride = w * channels
        bpp = channels
    elif depth == 16:
        stride = w * 2
        bpp = 2
    else:  # 1/2/4-bit grayscale (GRIB template 5.41 small nbits)
        stride = (w * depth + 7) // 8
        bpp = 1
    if len(raw) != h * (1 + stride):
        raise ValueError("bad IDAT length")
    out = _unfilter(raw, h, stride, bpp)
    if depth == 16:
        return out.reshape(h, stride).view(">u2").astype(np.uint16) \
            .reshape(h, w)
    if depth < 8:
        bits = np.unpackbits(out.reshape(h, stride), axis=1)
        samples = bits[:, :w * depth].reshape(h, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        img = (samples * weights).sum(axis=2).astype(np.uint8)
    else:
        img = out.reshape(h, w, channels)
        img = img[:, :, 0] if channels == 1 else img
    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        idxs = np.clip(img, 0, len(plte) - 1)
        rgb = plte[idxs]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idxs]])
        return rgb
    return img
