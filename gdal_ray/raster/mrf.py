"""NASA Meta Raster Format (MRF) reader — reference role frmts/mrf
(marfa.h / mrf_band.cpp, originally NASA GIBS' public format):

  .mrf  XML metadata: Raster/Size (x,y,c), PageSize, Compression,
        DataType, Rsets (overviews), GeoTags/BoundingBox +
        Projection WKT
  .idx  big-endian (u64 offset, u64 size) per tile, row-major over
        the tile grid (all-zero entries are empty tiles)
  data  one file per compression: .til (NONE), .pzp (DEFLATE),
        .ppg (PPNG/PNG), .pjg (JPEG), .ptf (TIF) — each tile is an
        independent blob decoded through the engine's own codecs

LERC v1 ("CntZImage") tiles decode natively (the published Esri
LERC1 layout: RLE'd validity bitmask bank + quantized Z bank of
per-tile bit-stuffed blocks, readFlt 1/2/4-byte minima, 2·maxZError
quanta).  Lerc2 tiles remain a named boundary (huffman-coded v2+
codec).  Pinned against the reference autotest fixtures: byte.tif
MRFs in every supported compression (incl. lerc_v1) decode to
checksum 4672."""

from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET
import zlib

import numpy as np

_DTYPES = {"Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
           "Int32": np.int32, "UInt32": np.uint32,
           "Float32": np.float32, "Float64": np.float64}
_DATA_EXT = {"NONE": ".til", "DEFLATE": ".pzp", "PNG": ".ppg",
             "PPNG": ".ppg", "JPEG": ".pjg", "TIF": ".ptf",
             "LERC": ".lrc", "ZSTD": ".zst"}


def read_mrf(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    root = ET.fromstring(vsi_read_bytes(path))
    if root.tag != "MRF_META":
        raise ValueError("MRF: not an MRF_META document")
    raster = root.find("Raster")
    size = raster.find("Size")
    w, h = int(size.get("x")), int(size.get("y"))
    nbands = int(size.get("c", "1"))
    page = raster.find("PageSize")
    tw = int(page.get("x", "512")) if page is not None else 512
    th = int(page.get("y", "512")) if page is not None else 512
    tc = int(page.get("c", "1")) if page is not None else 1
    comp = (raster.findtext("Compression") or "PNG").upper()
    dt = _DTYPES.get(raster.findtext("DataType") or "Byte", np.uint8)

    base = os.path.splitext(path)[0]
    idx = np.frombuffer(open(base + ".idx", "rb").read(), ">u8")
    data_path = base + _DATA_EXT.get(comp, ".til")
    data = open(data_path, "rb").read()

    ntx = (w + tw - 1) // tw
    nty = (h + th - 1) // th
    # band-interleaved tile pages unless PageSize c spans all bands
    pages_per_band = ntx * nty
    bands = [np.zeros((h, w), dt) for _ in range(nbands)]

    def decode_tile(blob: bytes) -> np.ndarray:
        if comp == "NONE":
            return np.frombuffer(blob, np.dtype(dt).newbyteorder(">")
                                 if np.dtype(dt).itemsize > 1 else dt,
                                 tw * th * tc).reshape(th, tw, tc)
        if comp == "DEFLATE":
            raw = zlib.decompress(blob)
            return np.frombuffer(raw, np.dtype(dt).newbyteorder(">")
                                 if np.dtype(dt).itemsize > 1 else dt,
                                 tw * th * tc).reshape(th, tw, tc)
        if comp in ("PNG", "PPNG"):
            from gdal_ray.raster.png import decode_png

            img = decode_png(blob)
            if img.ndim == 2:
                img = img[..., None]
            return img
        if comp == "JPEG":
            from gdal_ray.raster.jpeg import decode_jpeg

            img = decode_jpeg(blob)
            if img.ndim == 2:
                img = img[..., None]
            return img
        if comp == "TIF":
            from gdal_ray.raster import gtiff

            d2 = gtiff.decode_geotiff(blob)
            return np.stack(d2["bands"], axis=2)
        if comp.startswith("LERC"):
            z, mask = _lerc1_decode(blob)
            if z.shape != (th, tw):
                raise ValueError("MRF: LERC tile size mismatch")
            return z.astype(dt)[..., None]
        raise NotImplementedError(f"MRF: compression {comp}")

    ntiles_total = min(len(idx) // 2,
                       pages_per_band * (1 if tc > 1 else nbands))
    for t in range(ntiles_total):
        off, sz = int(idx[2 * t]), int(idx[2 * t + 1])
        if sz == 0:
            continue
        band0 = 0 if tc > 1 else t // pages_per_band
        page_i = t if tc > 1 else t % pages_per_band
        ty, tx = divmod(page_i, ntx)
        tile = decode_tile(data[off:off + sz])
        vh = min(th, h - ty * th)
        vw = min(tw, w - tx * tw)
        for c in range(tile.shape[2]):
            b = band0 + c
            if b < nbands:
                bands[b][ty * th:ty * th + vh,
                         tx * tw:tx * tw + vw] = tile[:vh, :vw, c]

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    crs = None
    geotags = root.find("GeoTags")
    if geotags is not None:
        bb = geotags.find("BoundingBox")
        if bb is not None:
            minx, miny = float(bb.get("minx")), float(bb.get("miny"))
            maxx, maxy = float(bb.get("maxx")), float(bb.get("maxy"))
            gt = (minx, (maxx - minx) / w, 0.0,
                  maxy, 0.0, -(maxy - miny) / h)
        wkt = geotags.findtext("Projection") or ""
        codes = re.findall(r'AUTHORITY\["EPSG","(\d+)"\]', wkt)
        if codes:
            crs = f"EPSG:{codes[-1]}"
    nodata = None
    dv = root.find(".//DataValues")
    if dv is not None and dv.get("NoData"):
        nodata = float(dv.get("NoData").split()[0])
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata}


# ---------------------------------------------------------------------------
# LERC v1 ("CntZImage") decoder — frmts/mrf/LERCV1/Lerc1Image.cpp role
# ---------------------------------------------------------------------------

_STIB67 = (4, 2, 1, 0)


def _lerc1_read_flt(buf: bytes, off: int, n: int) -> float:
    if n == 4:
        return struct.unpack_from("<f", buf, off)[0]
    if n == 2:
        return float(struct.unpack_from("<h", buf, off)[0])
    return float(struct.unpack_from("<b", buf, off)[0])


def _lerc1_blockread(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """One bit-stuffed block: header byte (byte-count-of-count in the
    top 2 bits, bit width in the low 6), element count, then packed
    big-endian-accumulated values."""
    hdr = buf[pos]
    pos += 1
    n = _STIB67[hdr >> 6]
    nbits = hdr & 63
    if nbits >= 32 or n == 0:
        raise ValueError("LERC1: bad block header")
    nelem = int.from_bytes(buf[pos:pos + n], "little")
    pos += n
    if nbits == 0:
        return np.zeros(nelem, np.uint32), pos
    nbytes = (nelem * nbits + 7) // 8
    raw = np.frombuffer(buf, np.uint8, nbytes, pos)
    pos += nbytes
    # values are packed MSB-first into 32-bit accumulators refilled
    # from little-endian 4-byte loads (Lerc1Image.cpp blockread)
    out = np.empty(nelem, np.uint32)
    acc = 0
    bits = 0
    bpos = 0
    for i in range(nelem):
        if bits >= nbits:
            out[i] = acc >> (32 - nbits)
            acc = (acc << nbits) & 0xFFFFFFFF
            bits -= nbits
            continue
        val = 0
        if bits:
            val = (acc >> (32 - bits)) << (nbits - bits)
        nb = min(len(raw) - bpos, 4)
        chunk = raw[bpos:bpos + nb].tobytes()
        if nb == 4:
            acc = int.from_bytes(chunk, "little")
        else:
            acc = int.from_bytes(b"\x00" * (4 - nb) + chunk, "little")
        bpos += nb
        bits += 32 - nbits
        out[i] = val | (acc >> bits)
        acc = (acc << (32 - bits)) & 0xFFFFFFFF
    return out, pos


def _lerc1_rle_mask(buf: bytes, pos: int, nbytes: int,
                    size: int) -> np.ndarray:
    """BitMaskV1::RLEdecompress: (s16 count) sequences — negative =
    repeat next byte -count times, positive = count literals; EOT
    -32768 terminator.  Returns the byte-packed mask."""
    dst = bytearray()
    end = pos + nbytes
    sz = size
    while sz > 0:
        count = struct.unpack_from("<h", buf, pos)[0]
        pos += 2
        if count < 0:
            b = buf[pos]
            pos += 1
            dst += bytes([b]) * (-count)
            sz += count
        else:
            dst += buf[pos:pos + count]
            pos += count
            sz -= count
    return np.frombuffer(bytes(dst[:size]), np.uint8)


def _lerc1_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """CntZImage → (float32 (h, w) Z values, bool validity mask)."""
    if blob[:10] != b"CntZImage ":
        raise NotImplementedError(
            "MRF: only LERC v1 (CntZImage) tiles are supported "
            "(Lerc2 is a named boundary)")
    pos = 10
    version, ztype, height, width = struct.unpack_from("<iiii", blob,
                                                       pos)
    pos += 16
    (max_zerror,) = struct.unpack_from("<d", blob, pos)
    pos += 8
    if version != 11 or ztype != 8:
        raise ValueError("LERC1: unsupported version/type")
    npix = width * height
    mask_bits = np.zeros((npix + 7) // 8, np.uint8)
    z = np.zeros((height, width), np.float32)

    # ---- part 1: the validity-count bank ----
    ntv, nth, nbytes = struct.unpack_from("<iii", blob, pos)
    pos += 12
    (maxval,) = struct.unpack_from("<f", blob, pos)
    pos += 4
    if nbytes == 0:
        mask_bits[:] = 0xFF if maxval != 0 else 0x00
    else:
        mask_bits = _lerc1_rle_mask(blob, pos, nbytes,
                                    len(mask_bits)).copy()
    pos += nbytes
    valid = np.unpackbits(mask_bits)[:npix].reshape(height,
                                                    width).astype(bool)

    # ---- part 2: the Z bank ----
    ntv, nth, nbytes = struct.unpack_from("<iii", blob, pos)
    pos += 12
    (maxval,) = struct.unpack_from("<f", blob, pos)
    pos += 4
    zend = pos + nbytes
    if ntv == 0 or nth == 0:
        raise ValueError("LERC1: missing Z tiling")
    tile_h = height // ntv
    tile_w = width // nth
    if tile_h <= 0 or tile_w <= 0:
        raise ValueError("LERC1: bad tile grid")
    q = max_zerror * 2
    r0 = 0
    while r0 < height:
        r1 = min(height, r0 + tile_h)
        c0 = 0
        while c0 < width:
            c1 = min(width, c0 + tile_w)
            flag = blob[pos]
            pos += 1
            n = _STIB67[flag >> 6]
            cflag = flag & 63
            if n == 0 or cflag > 3:
                raise ValueError("LERC1: bad tile flag")
            if cflag == 2:       # all zero
                z[r0:r1, c0:c1] = 0.0
            elif cflag == 0:     # stored floats for valid pixels
                m = valid[r0:r1, c0:c1]
                cnt = int(m.sum())
                vals = np.frombuffer(blob, "<f4", cnt, pos)
                pos += 4 * cnt
                block = z[r0:r1, c0:c1]
                block[m] = vals
                z[r0:r1, c0:c1] = block
            else:
                minval = _lerc1_read_flt(blob, pos, n)
                pos += n
                if cflag == 3:   # constant tile
                    z[r0:r1, c0:c1] = minval
                else:            # quantized block
                    vals, pos = _lerc1_blockread(blob, pos)
                    m = valid[r0:r1, c0:c1]
                    cnt = int(m.sum())
                    if len(vals) < cnt:
                        raise ValueError("LERC1: short block")
                    block = z[r0:r1, c0:c1]
                    block[m] = np.minimum(
                        maxval,
                        minval + q * vals[:cnt].astype(np.float64)
                    ).astype(np.float32)
                    z[r0:r1, c0:c1] = block
            c0 = c1
        r0 = r1
    del zend
    return z, valid
