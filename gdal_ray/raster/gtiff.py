"""GeoTIFF read/write from scratch — the reference's flagship raster
driver (reference roles: frmts/gtiff/geotiff.cpp driver,
libgeotiff geo_normalize.c for the GeoKey → CRS mapping; formats
re-derived from the public TIFF 6.0 + GeoTIFF 1.1 (OGC 19-008r4)
specifications, no code ported).

Scope:
- read: classic TIFF and BigTIFF (round 4 — magic 43, 64-bit
  offsets, LONG8/SLONG8/IFD8, both byte orders), striped + tiled,
  chunky (PlanarConfig=1) + separate (=2),
  uint8/int8/uint16/int16/uint32/int32/float32/float64, compression
  none (1) / LZW (5) / DEFLATE (8, 32946) / PackBits (32773),
  horizontal-differencing predictor (2),
  ModelPixelScale+ModelTiepoint or ModelTransformation
  geotransforms, EPSG codes from GeoKeyDirectory, GDAL_NODATA,
  overview IFD chains (``ifd_index=``); JPEG-in-TIFF (code 7,
  JPEGTables splice) since round 4.
- write: striped, chunky, none/DEFLATE/LZW/JPEG (round 5: new-style
  JPEG-in-TIFF, code 7 + JPEGTables, via the in-repo T.81 codec),
  GeoKeys for EPSG codes, ModelPixelScale+Tiepoint, GDAL_NODATA;
  classic or BigTIFF with IF_NEEDED auto-promotion past 4 GiB
  (``bigtiff=``); tiled COG with internal overview IFDs via
  ``encode_cog`` (same four codecs).
- out of scope (documented): bit depths < 8, writing floating-point
  predictor 3 (read works).

Dataset-level wrappers mirror the PNG codec's layout: one file = one
read task (`read_geotiff` → the engine's tile-table model), atomic
single-file writes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMP, _T_PHOTO = 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_CNT = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_SAMPLE_FMT = 339
_T_EXTRA_SAMPLES = 338
_T_PIXEL_SCALE, _T_TIEPOINT, _T_TRANSFORM = 33550, 33922, 34264
_T_GEO_KEYS, _T_GEO_DOUBLES, _T_GEO_ASCII = 34735, 34736, 34737
_T_JPEG_TABLES = 347
_T_YCBCR_SUBSAMPLING = 530
_T_GDAL_NODATA = 42113

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8,
              16: 8, 17: 8, 18: 8}   # BigTIFF LONG8 / SLONG8 / IFD8
_TYPE_FMT = {1: "B", 2: "s", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i",
             11: "f", 12: "d", 16: "Q", 17: "q", 18: "Q"}


def _dtype_of(bits: int, fmt: int) -> np.dtype:
    key = (bits, fmt)
    table = {
        (8, 1): np.uint8, (8, 2): np.int8,
        (16, 1): np.uint16, (16, 2): np.int16,
        (32, 1): np.uint32, (32, 2): np.int32, (32, 3): np.float32,
        (64, 3): np.float64,
    }
    if key not in table:
        raise ValueError(f"unsupported TIFF sample: {bits} bits fmt {fmt}")
    return np.dtype(table[key])


# ---------------------------------------------------------------------------
# LZW (TIFF 6.0 §13, MSB-first codes, early change)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi

    reset()
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    old: bytes | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 257:  # EOI
            break
        if code == 256:  # Clear
            reset()
            width = 9
            old = None
            continue
        if old is None:
            entry = table[code]
            out += entry
            old = entry
            continue
        if code < len(table):
            entry = table[code]
            out += entry
            table.append(old + entry[:1])
        else:
            entry = old + old[:1]
            out += entry
            table.append(entry)
        old = entry
        # early change: widen when the next free code reaches
        # 2^width − 1 (libtiff tif_lzw.c: maxcodep = nbitsmask − 1,
        # widen when free_entp passes it) — i.e. table length 511/
        # 1023/2047.  Round-4 fix: the old 510/1022/2046 boundaries
        # desynced one code early on streams whose table crossed 510
        # (first seen on the reference's predictor-3 LZW fixtures;
        # earlier fixtures never grew the table past 510).
        if len(table) == 511:
            width = 10
        elif len(table) == 1023:
            width = 11
        elif len(table) == 2047:
            width = 12
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder (early change) — symmetric with the decoder;
    used for round-trip validation and optional LZW writes."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = nxt
        nxt += 1
        # width grows one table entry LATER than the decoder's
        # 511/1023/2047 switch points because the decoder's table lags
        # the encoder by exactly one entry (round-4 fix: both sides
        # moved one step to libtiff's boundaries — verified against
        # the reference's predictor-3 LZW fixtures, checksum 4672)
        if nxt == 512:
            width = 10
        elif nxt == 1024:
            width = 11
        elif nxt == 2048:
            width = 12
        elif nxt == 4095:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # 128: no-op
    return bytes(out)


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _read_ifd(data: bytes, bo: str, off: int,
              big: bool = False) -> dict[int, tuple]:
    """One IFD → {tag: values}. ``big`` = BigTIFF layout (uint64 entry
    count, 20-byte entries with 8-byte counts and inline values)."""
    if big:
        (count,) = struct.unpack_from(bo + "Q", data, off)
        ebase, esize, inline = off + 8, 20, 8
    else:
        (count,) = struct.unpack_from(bo + "H", data, off)
        ebase, esize, inline = off + 2, 12, 4
    tags: dict[int, tuple] = {}
    for i in range(count):
        if big:
            tag, typ, cnt = struct.unpack_from(
                bo + "HHQ", data, ebase + esize * i)
        else:
            tag, typ, cnt = struct.unpack_from(
                bo + "HHI", data, ebase + esize * i)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        vpos = ebase + esize * i + (12 if big else 8)
        if size > inline:
            (vpos,) = struct.unpack_from(bo + ("Q" if big else "I"),
                                         data, vpos)
        if typ == 2:  # ascii
            val = data[vpos : vpos + cnt].split(b"\0")[0].decode(
                "latin-1", "replace")
        elif typ == 5:  # rational
            nums = struct.unpack_from(bo + "%dI" % (2 * cnt), data, vpos)
            val = tuple(nums[2 * i] / max(nums[2 * i + 1], 1)
                        for i in range(cnt))
        elif typ in _TYPE_FMT:
            val = struct.unpack_from(bo + "%d%s" % (cnt, _TYPE_FMT[typ]),
                                     data, vpos)
        else:
            val = data[vpos : vpos + size]
        tags[tag] = val
    return tags


def _geo_from_keys(tags: dict) -> str:
    keys = tags.get(_T_GEO_KEYS)
    if not keys or len(keys) < 4:
        return ""
    nkeys = keys[3]
    kv = {}
    for i in range(nkeys):
        kid, loc, cnt, val = keys[4 + 4 * i : 8 + 4 * i]
        if loc == 0:
            kv[kid] = val
    if kv.get(3072) and kv[3072] != 32767:       # ProjectedCSType
        return f"EPSG:{kv[3072]}"
    if kv.get(2048) and kv[2048] != 32767:       # GeographicType
        return f"EPSG:{kv[2048]}"
    return ""


def _geotransform(tags: dict) -> tuple[float, ...]:
    if _T_TRANSFORM in tags:
        m = tags[_T_TRANSFORM]
        return (m[3], m[0], m[1], m[7], m[4], m[5])
    scale = tags.get(_T_PIXEL_SCALE)
    tie = tags.get(_T_TIEPOINT)
    if scale and tie and len(tie) >= 6:
        i, j, _k, x, y = tie[0], tie[1], tie[2], tie[3], tie[4]
        sx, sy = scale[0], scale[1]
        return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)
    return (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _tiff_layout(data: bytes) -> tuple[str, bool]:
    """→ (byte order, is_bigtiff); validates both magics."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte order mark)")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic == 42:
        return bo, False
    if magic == 43:
        offsize, pad = struct.unpack_from(bo + "HH", data, 4)
        if offsize != 8 or pad != 0:
            raise ValueError("BigTIFF with non-8-byte offsets")
        return bo, True
    raise ValueError("not a TIFF (bad magic)")


def ifd_offsets(data: bytes) -> list[int]:
    """All IFD offsets in the file (the chain: full-res + overviews),
    classic or BigTIFF."""
    bo, big = _tiff_layout(data)
    if big:
        (off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        (off,) = struct.unpack_from(bo + "I", data, 4)
    out = []
    while off:
        out.append(off)
        if big:
            (count,) = struct.unpack_from(bo + "Q", data, off)
            (off,) = struct.unpack_from(bo + "Q", data, off + 8 + 20 * count)
        else:
            (count,) = struct.unpack_from(bo + "H", data, off)
            (off,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * count)
        if len(out) > 64:
            raise ValueError("IFD chain too long (corrupt file?)")
    return out


def probe_geotiff(data: bytes) -> dict:
    """Header-only probe: size / crs / geotransform / nodata / dtype /
    band count WITHOUT decoding pixel blocks (the gdalbuildvrt scan
    role, apps/gdalbuildvrt_lib.cpp source analysis — it too reads
    only metadata)."""
    bo, big = _tiff_layout(data)
    tags = _read_ifd(data, bo, ifd_offsets(data)[0], big=big)
    spp = tags.get(_T_SPP, (1,))[0]
    bits = tags.get(_T_BITS, (8,) * spp)
    fmt = tags.get(_T_SAMPLE_FMT, (1,) * spp)
    nodata = None
    if _T_GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[_T_GDAL_NODATA]).strip())
        except ValueError:
            nodata = None
    return {
        "width": tags[_T_WIDTH][0],
        "height": tags[_T_HEIGHT][0],
        "bands": spp,
        "dtype": str(_dtype_of(bits[0], fmt[0])),
        "crs": _geo_from_keys(tags),
        "geotransform": _geotransform(tags),
        "nodata": nodata,
    }


def decode_geotiff(data: bytes, ifd_index: int = 0) -> dict:
    """GeoTIFF bytes → {"bands": [2-D arrays], "crs", "geotransform",
    "nodata", "photometric"}. ``ifd_index`` selects an overview IFD
    (0 = full resolution)."""
    bo, big = _tiff_layout(data)
    ifd_off = ifd_offsets(data)[ifd_index]
    tags = _read_ifd(data, bo, ifd_off, big=big)

    w = tags[_T_WIDTH][0]
    h = tags[_T_HEIGHT][0]
    spp = tags.get(_T_SPP, (1,))[0]
    bits = tags.get(_T_BITS, (8,) * spp)
    fmt = tags.get(_T_SAMPLE_FMT, (1,) * spp)
    if len(set(bits)) != 1 or len(set(fmt[:len(bits)])) != 1:
        raise ValueError("mixed per-band sample types not supported")
    comp = tags.get(_T_COMP, (1,))[0]
    packed_bits = None  # sub-byte samples (1/4-bit packed rows)
    if comp in (2, 3, 4):  # CCITT bilevel: 1-bit indices come back u8
        dt = np.dtype(np.uint8)
    elif bits[0] in (1, 4) and fmt[0] == 1:
        packed_bits = bits[0]
        dt = np.dtype(np.uint8)
    else:
        dt = _dtype_of(bits[0], fmt[0]).newbyteorder(bo)
    planar = tags.get(_T_PLANAR, (1,))[0]
    predictor = tags.get(_T_PREDICTOR, (1,))[0]
    itemsize = dt.itemsize

    def blocks():
        """Yield (band_or_None, y0, x0, bh, bw, raw_bytes)."""
        if _T_TILE_OFF in tags:
            tw = tags[_T_TILE_W][0]
            th = tags[_T_TILE_H][0]
            offs = tags[_T_TILE_OFF]
            cnts = tags[_T_TILE_CNT]
            tiles_x = (w + tw - 1) // tw
            tiles_y = (h + th - 1) // th
            per_plane = tiles_x * tiles_y
            for idx, (o, c) in enumerate(zip(offs, cnts)):
                plane = idx // per_plane if planar == 2 else None
                t = idx % per_plane if planar == 2 else idx
                ty, tx = divmod(t, tiles_x)
                yield plane, ty * th, tx * tw, th, tw, data[o : o + c]
        else:
            rps = tags.get(_T_ROWS_PER_STRIP, (h,))[0]
            offs = tags[_T_STRIP_OFF]
            cnts = tags.get(_T_STRIP_CNT)
            if cnts is None:
                cnts = (len(data) - offs[0],)
            strips = (h + rps - 1) // rps
            for idx, (o, c) in enumerate(zip(offs, cnts)):
                plane = idx // strips if planar == 2 else None
                s = idx % strips if planar == 2 else idx
                y0 = s * rps
                yield plane, y0, 0, min(rps, h - y0), w, data[o : o + c]

    bands = [np.zeros((h, w), dt.newbyteorder("=")) for _ in range(spp)]
    for plane, y0, x0, bh, bw, raw in blocks():
        ns = 1 if planar == 2 else spp
        # tiles are padded to full size; strips may be short
        full_h = bh if _T_TILE_OFF not in tags else bh
        if packed_bits:
            # sub-byte samples: each row padded to a byte boundary
            expect = full_h * ((bw * ns * packed_bits + 7) // 8)
        else:
            expect = full_h * bw * ns * itemsize
        if comp == 7:
            # new-style JPEG-in-TIFF (frmts/gtiff JPEG codec role):
            # each block is an abbreviated JPEG stream; tag 347
            # (JPEGTables) carries a tables-only stream whose DQT/DHT
            # segments are spliced in after the block's SOI. Decoded
            # through the engine's own T.81 codec.
            from gdal_ray.raster.jpeg import decode_jpeg

            jt = tags.get(_T_JPEG_TABLES)
            stream = bytes(raw)
            if jt:
                jtb = bytes(jt)
                if jtb[:2] == b"\xff\xd8":
                    jtb = jtb[2:]
                if jtb[-2:] == b"\xff\xd9":
                    jtb = jtb[:-2]
                if stream[:2] == b"\xff\xd8" and jtb:
                    stream = b"\xff\xd8" + jtb + stream[2:]
            timg = decode_jpeg(stream)
            if timg.ndim == 2:
                timg = timg[..., None]
            if timg.shape[2] != ns:
                raise ValueError(
                    f"JPEG-in-TIFF: {timg.shape[2]} JPEG components "
                    f"for {ns} samples"
                )
            arr = np.zeros((full_h, bw, ns), dt.newbyteorder("="))
            ch = min(full_h, timg.shape[0])
            cw = min(bw, timg.shape[1])
            arr[:ch, :cw] = timg[:ch, :cw]
            vh = min(bh, h - y0)
            vw = min(bw, w - x0)
            if planar == 2:
                bands[plane][y0 : y0 + vh, x0 : x0 + vw] = arr[:vh, :vw, 0]
            else:
                for b in range(spp):
                    bands[b][y0 : y0 + vh, x0 : x0 + vw] = arr[:vh, :vw, b]
            continue
        if comp in (2, 3, 4):
            # CCITT G3/G4 fax (raster/ccitt.py): strips/tiles are
            # independently coded; output bits ARE the band indices
            # (white run colour = 0) for every photometric
            from gdal_ray.raster.ccitt import (
                decode_g3,
                decode_g4,
                decode_mh,
            )

            if comp == 4:
                tile = decode_g4(bytes(raw), bw, full_h)
            elif comp == 3:
                t4opts = tags.get(292, (0,))[0]
                tile = decode_g3(bytes(raw), bw, full_h,
                                 two_d=bool(t4opts & 1))
            else:
                tile = decode_mh(bytes(raw), bw, full_h)
            vh = min(bh, h - y0)
            vw = min(bw, w - x0)
            tgt = plane if planar == 2 else 0
            bands[tgt][y0:y0 + vh, x0:x0 + vw] = tile[:vh, :vw]
            continue
        if comp in (8, 32946):
            raw = zlib.decompress(raw)
        elif comp == 5:
            raw = _lzw_decode(raw, expect)
        elif comp == 32773:
            raw = _packbits_decode(raw, expect)
        elif comp != 1:
            raise ValueError(f"unsupported TIFF compression {comp}")
        raw = raw[:expect].ljust(expect, b"\0")
        if packed_bits:
            # unpack 1-/4-bit rows (MSB-first, TIFF FillOrder 1)
            rowbytes = (bw * ns * packed_bits + 7) // 8
            rows = np.frombuffer(raw, np.uint8).reshape(full_h, rowbytes)
            if packed_bits == 1:
                arr = np.unpackbits(rows, axis=1)[:, :bw * ns]
            else:  # 4-bit: high nibble first
                arr = np.empty((full_h, rowbytes * 2), np.uint8)
                arr[:, 0::2] = rows >> 4
                arr[:, 1::2] = rows & 0x0F
                arr = arr[:, :bw * ns]
            arr = arr.reshape(full_h, bw, ns)
            vh = min(bh, h - y0)
            vw = min(bw, w - x0)
            if planar == 2:
                bands[plane][y0:y0 + vh, x0:x0 + vw] = arr[:vh, :vw, 0]
            else:
                for b in range(spp):
                    bands[b][y0:y0 + vh, x0:x0 + vw] = arr[:vh, :vw, b]
            continue
        if predictor == 3:
            # floating-point predictor (libtiff fpAcc semantics): per
            # row, byte-wise horizontal accumulation at sample stride,
            # then the row's bytes are byte-PLANES, MSB plane first —
            # un-shuffle to big-endian values
            rows = np.frombuffer(raw, np.uint8).reshape(
                full_h, bw * ns * itemsize).copy()
            for r in range(ns):
                lane = rows[:, r::ns]
                rows[:, r::ns] = np.cumsum(
                    lane.astype(np.uint64), axis=1
                ).astype(np.uint8)
            wc = bw * ns
            planes = rows.reshape(full_h, itemsize, wc)
            be = np.ascontiguousarray(planes.transpose(0, 2, 1))
            arr = be.reshape(full_h, -1).view(
                dt.newbyteorder(">")).reshape(full_h, bw, ns)
            arr = arr.astype(dt.newbyteorder("="))
        else:
            arr = np.frombuffer(raw, dtype=dt).reshape(full_h, bw, ns)
            arr = arr.astype(dt.newbyteorder("="))
        if predictor == 2:
            # horizontal differencing: modular cumsum along the row
            # (wide accumulate then cast back wraps exactly)
            wide = {1: np.uint64, 2: np.int64}.get(fmt[0], np.float64)
            arr = np.cumsum(arr.astype(wide), axis=1).astype(arr.dtype)
        vh = min(bh, h - y0)
        vw = min(bw, w - x0)
        if planar == 2:
            bands[plane][y0 : y0 + vh, x0 : x0 + vw] = arr[:vh, :vw, 0]
        else:
            for b in range(spp):
                bands[b][y0 : y0 + vh, x0 : x0 + vw] = arr[:vh, :vw, b]

    nodata = None
    if _T_GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[_T_GDAL_NODATA]).strip())
        except ValueError:
            nodata = None
    return {
        "bands": bands,
        "crs": _geo_from_keys(tags),
        "geotransform": _geotransform(tags),
        "nodata": nodata,
        "photometric": tags.get(_T_PHOTO, (1,))[0],
    }


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_NP_TO_TIFF = {
    "uint8": (8, 1), "int8": (8, 2), "uint16": (16, 1), "int16": (16, 2),
    "uint32": (32, 1), "int32": (32, 2), "float32": (32, 3),
    "float64": (64, 3),
}


def encode_geotiff(
    bands: list[np.ndarray] | np.ndarray,
    crs: str = "",
    geotransform: tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    nodata: float | None = None,
    compression: str = "deflate",
    bigtiff: bool | None = None,
    jpeg_quality: int = 75,
) -> bytes:
    """Bands (equal-shape 2-D arrays) → GeoTIFF bytes (little-endian,
    striped, chunky). ``bigtiff``: True forces the BigTIFF (magic 43,
    64-bit offset) layout, None auto-selects it when the payload could
    cross 4 GiB — the reference GTiff driver's IF_NEEDED behavior
    (frmts/gtiff, BIGTIFF=IF_NEEDED).

    ``compression="jpeg"`` (round 5 — frmts/gtiff JPEG codec +
    JPEGTables writer role): new-style JPEG-in-TIFF, compression code
    7 — one shared tables-only stream in tag 347 and an abbreviated
    4:4:4 baseline stream per strip via the in-repo T.81 encoder.
    uint8 only, 1 or 3 samples; 3-band is written PHOTOMETRIC=YCbCr
    with YCbCrSubSampling (1,1), the lossless-color-transform layout
    the read path (comp==7 above) round-trips."""
    if isinstance(bands, np.ndarray) and bands.ndim == 2:
        bands = [bands]
    h, w = bands[0].shape
    spp = len(bands)
    dt = bands[0].dtype
    if str(dt) not in _NP_TO_TIFF:
        raise ValueError(f"unsupported dtype {dt}")
    bits, fmt = _NP_TO_TIFF[str(dt)]
    if any(b.shape != (h, w) or b.dtype != dt for b in bands):
        raise ValueError("bands must share shape and dtype")
    if geotransform[2] or geotransform[4]:
        raise ValueError("rotated geotransforms need ModelTransformation "
                         "(not implemented)")

    if compression == "jpeg" and (str(dt) != "uint8" or spp not in (1, 3)):
        raise ValueError("JPEG-in-TIFF write needs uint8 bands, 1 or 3 "
                         f"samples (got {dt}, {spp} bands)")
    if compression == "ccittg4" and (str(dt) != "uint8" or spp != 1):
        raise ValueError("CCITT G4 write needs a single uint8 0/1 band")

    # interleave chunky rows, strip of ~64 rows (JPEG: multiple of 8
    # rows so strip MCUs tile cleanly, libtiff's TIFFDefaultStripSize
    # rounding for JPEG)
    rps = max(1, min(h, 65536 // max(1, w * spp * dt.itemsize // 8)))
    if compression == "jpeg":
        rps = max(8, (rps + 7) // 8 * 8)
    if compression == "ccittg4":
        rps = h  # single G4-coded strip (the CALS/bilevel layout)
    rps = min(rps, h)
    stack = np.stack(bands, axis=2)  # (h, w, spp)
    jpeg_tables = None
    strips = []
    for y0 in range(0, h, rps):
        if compression == "jpeg":
            from gdal_ray.raster.jpeg import encode_jpeg, encode_jpeg_tables

            img = stack[y0 : y0 + rps]
            if spp == 1:
                img = img[..., 0]
            if jpeg_tables is None:
                jpeg_tables = encode_jpeg_tables(jpeg_quality, spp == 1)
            strips.append(encode_jpeg(img, jpeg_quality, tables=False))
            continue
        if compression == "ccittg4":
            from gdal_ray.raster.ccitt import encode_g4

            strips.append(encode_g4(stack[y0:y0 + rps, :, 0] & 1))
            continue
        raw = np.ascontiguousarray(
            stack[y0 : y0 + rps].astype(dt.newbyteorder("<"))
        ).tobytes()
        if compression == "deflate":
            raw = zlib.compress(raw, 6)
        elif compression == "lzw":
            raw = _lzw_encode(raw)
        elif compression != "none":
            raise ValueError(f"unsupported compression {compression!r}")
        strips.append(raw)
    comp_code = {"none": 1, "deflate": 8, "lzw": 5, "jpeg": 7,
                 "ccittg4": 4}[compression]

    entries = []  # (tag, type, count, packed-or-bytes)

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(_T_WIDTH, 4, (w,))
    entry(_T_HEIGHT, 4, (h,))
    entry(_T_BITS, 3, ((1,) if compression == "ccittg4"
                       else (bits,) * spp))
    entry(_T_COMP, 3, (comp_code,))
    # RGB photometric for 3+ bands (reference GTiff default for 3-band
    # byte); extra bands marked unassociated alpha. JPEG 3-band is
    # YCbCr (6) — the encoder color-transforms — at 4:4:4 subsampling.
    if compression == "jpeg":
        entry(_T_PHOTO, 3, (6 if spp == 3 else 1,))
        if spp == 3:
            entry(_T_YCBCR_SUBSAMPLING, 3, (1, 1))
        entry(_T_JPEG_TABLES, 7, jpeg_tables)
    elif compression == "ccittg4":
        entry(_T_PHOTO, 3, (0,))  # min-is-white, fax convention
    else:
        entry(_T_PHOTO, 3, (2 if spp >= 3 else 1,))
    entry(_T_SPP, 3, (spp,))
    if spp > 3:
        entry(_T_EXTRA_SAMPLES, 3, (2,) * (spp - 3))
    entry(_T_ROWS_PER_STRIP, 4, (rps,))
    entry(_T_PLANAR, 3, (1,))
    entry(_T_SAMPLE_FMT, 3, (fmt,) * spp)
    gt = geotransform
    entry(_T_PIXEL_SCALE, 12, (gt[1], -gt[5], 0.0))
    entry(_T_TIEPOINT, 12, (0.0, 0.0, 0.0, gt[0], gt[3], 0.0))
    if crs.upper().startswith("EPSG:"):
        code = int(crs.split(":")[1])
        geographic = code in (4326, 4267, 4269, 4258, 4283, 4322) or (
            4000 <= code < 5000)
        keys = [1, 1, 0, 3,
                1024, 0, 1, (2 if geographic else 1),
                1025, 0, 1, 1]
        keys += ([2048, 0, 1, code] if geographic
                 else [3072, 0, 1, code])
        keys[3] = (len(keys) - 4) // 4
        entry(_T_GEO_KEYS, 3, tuple(keys))
    if nodata is not None:
        txt = (repr(float(nodata)) + "\0").encode()
        entry(_T_GDAL_NODATA, 2, txt)

    data_bytes = sum(len(s) for s in strips)
    if bigtiff is None:
        # IF_NEEDED: header+tables slack well under 64 KiB here
        bigtiff = data_bytes + 65536 > 0xFFFFFFFF
    big = bool(bigtiff)

    # layout: header | strip data | strip tables + overflow | IFD
    pos = 16 if big else 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    off_type = 16 if big else 4          # LONG8 in BigTIFF
    entry(_T_STRIP_OFF, off_type, tuple(strip_offsets))
    entry(_T_STRIP_CNT, off_type, tuple(len(s) for s in strips))
    entries.sort(key=lambda e: e[0])

    inline = 8 if big else 4
    overflow = bytearray()
    packed = []
    ifd_off0 = pos  # overflow grows before IFD; two-pass
    # first pass: compute overflow sizes
    sizes = []
    for tag, typ, vals in entries:
        if typ in (2, 7):  # ASCII / UNDEFINED: raw bytes
            size = len(vals)
        else:
            size = _TYPE_SIZE[typ] * len(vals)
        sizes.append(size)
    total_overflow = sum(s for s in sizes if s > inline)
    ifd_off = ifd_off0 + total_overflow
    ovpos = ifd_off0
    cnt_fmt = "Q" if big else "I"
    for (tag, typ, vals), size in zip(entries, sizes):
        if typ in (2, 7):
            blob = bytes(vals)
            cnt = len(vals)
        else:
            blob = struct.pack("<%d%s" % (len(vals), _TYPE_FMT[typ]), *vals)
            cnt = len(vals)
        if size > inline:
            packed.append(
                struct.pack("<HH" + cnt_fmt * 2, tag, typ, cnt, ovpos)
            )
            overflow += blob
            ovpos += size
        else:
            packed.append(struct.pack("<HH" + cnt_fmt, tag, typ, cnt)
                          + blob.ljust(inline, b"\0"))
    out = bytearray()
    if big:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    else:
        out += b"II" + struct.pack("<HI", 42, ifd_off)
    for s in strips:
        out += s
    out += overflow
    out += struct.pack("<" + ("Q" if big else "H"), len(packed))
    for p in packed:
        out += p
    out += struct.pack("<" + ("Q" if big else "I"), 0)  # next IFD
    return bytes(out)


_T_SUBFILE = 254  # NewSubfileType: 1 = reduced-resolution image


def encode_cog(
    bands: list[np.ndarray] | np.ndarray,
    crs: str = "",
    geotransform: tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    nodata: float | None = None,
    compression: str = "deflate",
    tile_size: int = 256,
    overview_resampling: str = "average",
    min_overview_size: int = 256,
    jpeg_quality: int = 75,
) -> bytes:
    """Bands → Cloud-Optimized GeoTIFF layout (gdal COG driver role,
    frmts/gtiff/cogdriver.cpp semantics):

    - TILED layout (TileWidth/TileLength 256², edge tiles padded),
    - internal overviews (2× ``reduce_2x2`` pyramid down to
      ``min_overview_size``) as reduced-resolution IFDs
      (NewSubfileType=1) chained after the full-res IFD,
    - all IFDs at the START of the file, tile data after them ordered
      smallest-overview-first → full-res-last, so an HTTP range reader
      gets header+index in one leading read and zoomed-out data first.

    Note: ``compression="lzw"`` uses the pure-Python LZW coder —
    fine for small rasters/tests, ~100 KB/s on 256² tiles; use the
    default deflate (zlib C) for real data.

    ``compression="jpeg"`` (round 5): JPEG-compressed COG — the
    dominant web-serving raster layout (frmts/gtiff JPEG codec +
    cogdriver role). uint8, 1 or 3 bands; every IFD (full-res and
    each overview) carries its own JPEGTables tag and abbreviated
    4:4:4 baseline tile streams from the in-repo T.81 encoder; edge
    tiles are REPLICATE-padded (not zero-padded) so block ringing
    never bleeds into valid pixels.
    """
    from gdal_ray.raster.overview import reduce_2x2

    if isinstance(bands, np.ndarray) and bands.ndim == 2:
        bands = [bands]
    dt = bands[0].dtype
    if str(dt) not in _NP_TO_TIFF:
        raise ValueError(f"unsupported dtype {dt}")
    bits, fmt = _NP_TO_TIFF[str(dt)]
    if geotransform[2] or geotransform[4]:
        raise ValueError("rotated geotransforms not supported")
    comp_code = {"none": 1, "deflate": 8, "lzw": 5, "jpeg": 7}[compression]
    spp = len(bands)
    if compression == "jpeg":
        if str(dt) != "uint8" or spp not in (1, 3):
            raise ValueError("JPEG COG needs uint8 bands, 1 or 3 samples "
                             f"(got {dt}, {spp} bands)")
        from gdal_ray.raster.jpeg import encode_jpeg, encode_jpeg_tables

        jpeg_tables = encode_jpeg_tables(jpeg_quality, spp == 1)

    # pyramid: level 0 = full res
    levels = [list(bands)]
    while max(levels[-1][0].shape) > min_overview_size:
        levels.append([reduce_2x2(b, overview_resampling).astype(dt)
                       for b in levels[-1]])
        if min(levels[-1][0].shape) < 2:
            break

    def tile_blobs(lv_bands):
        h, w = lv_bands[0].shape
        stack = np.stack(lv_bands, axis=2)
        blobs = []
        for y0 in range(0, h, tile_size):
            for x0 in range(0, w, tile_size):
                sub = stack[y0 : y0 + tile_size, x0 : x0 + tile_size]
                if compression == "jpeg":
                    # replicate-pad: zero fill would ring into the
                    # valid pixels of any non-8-aligned edge block
                    t = np.pad(sub, ((0, tile_size - sub.shape[0]),
                                     (0, tile_size - sub.shape[1]),
                                     (0, 0)), mode="edge")
                    img = t[..., 0] if spp == 1 else t
                    blobs.append(encode_jpeg(img, jpeg_quality,
                                             tables=False))
                    continue
                t = np.zeros((tile_size, tile_size, spp), dtype=dt)
                t[: sub.shape[0], : sub.shape[1]] = sub
                raw = np.ascontiguousarray(
                    t.astype(dt.newbyteorder("<"))).tobytes()
                if compression == "deflate":
                    raw = zlib.compress(raw, 6)
                elif compression == "lzw":
                    raw = _lzw_encode(raw)
                blobs.append(raw)
        return blobs

    level_tiles = [tile_blobs(lv) for lv in levels]

    def make_entries(li: int, offs: list[int]) -> list[tuple]:
        h, w = levels[li][0].shape
        e = []
        if li > 0:
            e.append((_T_SUBFILE, 4, (1,)))
        e.append((_T_WIDTH, 4, (w,)))
        e.append((_T_HEIGHT, 4, (h,)))
        e.append((_T_BITS, 3, (bits,) * spp))
        e.append((_T_COMP, 3, (comp_code,)))
        # PHOTOMETRIC=2 (RGB) for 3+ band output like the reference COG
        # writer; band 4+ marked unassociated alpha via ExtraSamples.
        # JPEG: YCbCr (6) at 4:4:4 for 3 bands, per-IFD JPEGTables.
        if compression == "jpeg":
            e.append((_T_PHOTO, 3, (6 if spp == 3 else 1,)))
            if spp == 3:
                e.append((_T_YCBCR_SUBSAMPLING, 3, (1, 1)))
            e.append((_T_JPEG_TABLES, 7, jpeg_tables))
        else:
            e.append((_T_PHOTO, 3, (2 if spp >= 3 else 1,)))
        e.append((_T_SPP, 3, (spp,)))
        e.append((_T_PLANAR, 3, (1,)))
        if spp > 3:
            e.append((_T_EXTRA_SAMPLES, 3, (2,) * (spp - 3)))
        e.append((_T_SAMPLE_FMT, 3, (fmt,) * spp))
        e.append((_T_TILE_W, 3, (tile_size,)))
        e.append((_T_TILE_H, 3, (tile_size,)))
        e.append((_T_TILE_OFF, 4, tuple(offs)))
        e.append((_T_TILE_CNT, 4, tuple(len(b) for b in level_tiles[li])))
        if li == 0:
            gt = geotransform
            e.append((_T_PIXEL_SCALE, 12, (gt[1], -gt[5], 0.0)))
            e.append((_T_TIEPOINT, 12, (0.0, 0.0, 0.0, gt[0], gt[3], 0.0)))
            if crs.upper().startswith("EPSG:"):
                code = int(crs.split(":")[1])
                geographic = code in (4326, 4267, 4269, 4258, 4283, 4322) or (
                    4000 <= code < 5000)
                keys = [1, 1, 0, 3,
                        1024, 0, 1, (2 if geographic else 1),
                        1025, 0, 1, 1]
                keys += ([2048, 0, 1, code] if geographic
                         else [3072, 0, 1, code])
                keys[3] = (len(keys) - 4) // 4
                e.append((_T_GEO_KEYS, 3, tuple(keys)))
            if nodata is not None:
                e.append((_T_GDAL_NODATA, 2,
                          (repr(float(nodata)) + "\0").encode()))
        e.sort(key=lambda x: x[0])
        return e

    def ifd_size(entries) -> int:
        size = 2 + 12 * len(entries) + 4
        for _, typ, vals in entries:
            vsz = (len(vals) if typ in (2, 7)
                   else _TYPE_SIZE[typ] * len(vals))
            if vsz > 4:
                size += vsz
        return size

    # pass 1: IFD sizes with placeholder offsets (offsets are LONGs —
    # byte size is value-independent)
    placeholder = [make_entries(li, [0] * len(level_tiles[li]))
                   for li in range(len(levels))]
    ifd_offs = []
    pos = 8
    for e in placeholder:
        ifd_offs.append(pos)
        pos += ifd_size(e)
    data_start = pos

    # data: smallest overview first, full res last (COG read order)
    tile_offs: list[list[int]] = [None] * len(levels)
    pos = data_start
    for li in range(len(levels) - 1, -1, -1):
        offs = []
        for b in level_tiles[li]:
            offs.append(pos)
            pos += len(b)
        tile_offs[li] = offs

    # pass 2: serialize
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_offs[0])
    for li in range(len(levels)):
        entries = make_entries(li, tile_offs[li])
        nxt = ifd_offs[li + 1] if li + 1 < len(levels) else 0
        # overflow area sits between the entry table and the next IFD
        ovpos = ifd_offs[li] + 2 + 12 * len(entries) + 4
        packed = []
        overflow = bytearray()
        for tag, typ, vals in entries:
            if typ in (2, 7):
                blob = bytes(vals)
                cnt = len(vals)
            else:
                blob = struct.pack(
                    "<%d%s" % (len(vals), _TYPE_FMT[typ]), *vals)
                cnt = len(vals)
            if len(blob) > 4:
                packed.append(struct.pack("<HHII", tag, typ, cnt, ovpos))
                overflow += blob
                ovpos += len(blob)
            else:
                packed.append(struct.pack("<HHI", tag, typ, cnt)
                              + blob.ljust(4, b"\0"))
        out += struct.pack("<H", len(packed))
        for p in packed:
            out += p
        out += struct.pack("<I", nxt)
        out += overflow
    assert len(out) == data_start, "IFD layout accounting error"
    for li in range(len(levels) - 1, -1, -1):
        for b in level_tiles[li]:
            out += b
    return bytes(out)


def write_cog(path: str, bands, crs: str = "",
              geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
              nodata=None, compression: str = "deflate",
              tile_size: int = 256, jpeg_quality: int = 75) -> None:
    """Atomic COG write (tmp + rename)."""
    import os

    data = encode_cog(bands, crs, geotransform, nodata, compression,
                      tile_size, jpeg_quality=jpeg_quality)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Dataset-level wrappers (tile-table model)
# ---------------------------------------------------------------------------


def read_geotiff(paths, tile_size: int = 256):
    """GeoTIFF file(s) → Dataset of tile-table rows (one file = one
    read task; every band tiled `tile_size`²). VSI paths supported
    (e.g. ``/vsizip/scenes.zip/scene1.tif``)."""
    import pyarrow as pa

    from gdal_ray.formats import _binary_ds
    from gdal_ray.raster import model

    ds = _binary_ds(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for data in batch["bytes"]:
            g = decode_geotiff(bytes(data.as_py()))
            for bi, arr in enumerate(g["bands"], start=1):
                tables.append(model.from_array(
                    arr, g["crs"], g["geotransform"], band=bi,
                    tile_size=tile_size))
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_geotiff(path: str, bands, crs: str = "",
                  geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  nodata=None, compression: str = "deflate",
                  jpeg_quality: int = 75) -> None:
    """Atomic single-file write (tmp + rename)."""
    import os

    data = encode_geotiff(bands, crs, geotransform, nodata, compression,
                          jpeg_quality=jpeg_quality)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
