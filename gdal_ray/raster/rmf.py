"""Raster Matrix Format (RMF / Panorama GIS) driver: RSW rasters and
MTW DEMs (read).

Reference role: frmts/rmf (rmfdataset.cpp / rmflzw.cpp / rmfdem.cpp,
GDAL 3.13).  Layout re-derived from the reference's documented header
map: signature RSW\\0 / MTW\\0 (or byte-reversed for big-endian
files), 320-byte header with fields at fixed offsets (bit depth @52,
height @56, width @60, tile grid @64..84, color table @96, tile
table @104/108, georef doubles @136..200, compression byte @208,
nodata @296), tile offset/size pair table, version 0x201 "huge"
offsets scaled by 256.

Tile semantics (rmfdataset.cpp IReadBlock): zero-offset tiles fill
with the header nodata; RSW pixel packings 1/4-bit indexed (LSB
nibble first for 4-bit, MSB bit first for 1-bit), 8-bit indexed with
RGBA color table, 16-bit 5-5-5 expanded by the reference's exact
shifts, 24/32-bit interleaved with band order reversed (BGR);
MTW 8/16/32/64-bit signed/float single band.

Codecs: the RMF 12-bit hash-table LZW variant (rmflzw.cpp - signed
byte hashing, collision chaining at +101, table freeze after 3840
codes) and the DEM difference codec (rmfdem.cpp - 3-bit type tags,
4/8/12/16/24/32-bit deltas with out-of-range sentinels).  JPEG tiles
delegate to the in-repo T.81 decoder.
"""

from __future__ import annotations

import struct

import numpy as np

_HUGE = 0x0201


def _lzw_decompress(src: bytes, out_size: int) -> bytes:
    """RMF 12-bit LZW variant, exact port of rmflzw.cpp semantics."""
    TAB = 4096
    NO_PRED = 0xFFFF
    used = np.zeros(TAB, bool)
    nxt = np.zeros(TAB, np.uint16)
    pred = np.zeros(TAB, np.uint32)
    foll = np.zeros(TAB, np.uint8)

    def s8(b):
        return b - 256 if b >= 128 else b

    def update(ipred, bfollow):
        local = ((int(ipred) + s8(int(bfollow))) & 0xFFFFFFFF) | 0x0800
        local = ((local * local) & 0xFFFFFFFFFFFFFFFF) >> 6 & 0x0FFF
        nn = local
        if used[local]:
            while nxt[local] != 0:
                local = nxt[local]
            nn = (local + 101) & 0x0FFF
            while used[nn]:
                nn += 1
                if nn >= TAB:
                    nn = 0
            nxt[local] = nn
        used[nn] = True
        nxt[nn] = 0
        pred[nn] = ipred
        foll[nn] = bfollow

    for code in range(256):
        update(NO_PRED, code)

    out = bytearray()
    n = len(src)
    if n < 2:
        return bytes(out)
    i = 0
    icode = ((src[i] << 4) & 0xFF0)
    i += 1
    icode += (src[i] >> 4) & 0x0F
    iold = icode
    bitsleft = True
    finchar = foll[icode]
    out.append(finchar)
    count = TAB - 256
    while i < n - (0 if bitsleft else 0):
        if bitsleft:
            icode = ((src[i] & 0x0F) << 8) & 0xF00
            i += 1
            if i >= n:
                break
            icode += src[i]
            i += 1
            bitsleft = False
        else:
            icode = (src[i] << 4) & 0xFF0
            i += 1
            if i >= n:
                break
            icode += (src[i] >> 4) & 0x0F
            bitsleft = True
        iin = icode
        newcode = False
        lastchar = 0
        if not used[icode]:
            icode = iold
            lastchar = finchar
            newcode = True
        stack = bytearray()
        while pred[icode] != NO_PRED:
            if len(stack) >= TAB:
                return bytes(out)
            stack.append(foll[icode])
            icode = pred[icode]
        finchar = foll[icode]
        out.append(finchar)
        out.extend(reversed(stack))
        if newcode:
            finchar = lastchar
            out.append(finchar)
        if count > 0:
            count -= 1
            update(iold, finchar)
        iold = iin
        if len(out) >= out_size:
            break
        if i >= n:
            break
    return bytes(out[:out_size])


def _dem_decompress(src: bytes, out_size: int) -> bytes:
    """RMF DEM difference codec, exact port of rmfdem.cpp."""
    OUT32 = -0x80000000
    nout = out_size // 4
    out = np.empty(nout, np.int64)
    pos = 0
    opos = 0
    prev = 0
    n = len(src)

    def add32(a, b):
        return ((a + b) & 0xFFFFFFFF) - (1 << 32) \
            if ((a + b) & 0xFFFFFFFF) >= (1 << 31) else (a + b) & 0xFFFFFFFF

    while pos < n and opos < nout:
        b0 = src[pos]
        count = b0 & 0x1F
        typ = b0 & 0xE0
        pos += 1
        if count == 0:
            if pos >= n:
                break
            count = 32 + src[pos]
            pos += 1
        if typ == 0x20:  # zero diff
            count = min(count, nout - opos)
            out[opos:opos + count] = prev
            opos += count
        elif typ == 0x00:  # out of range
            count = min(count, nout - opos)
            out[opos:opos + count] = OUT32
            opos += count
        elif typ == 0x40:  # 4-bit
            if n - pos < (count + 1) // 2 or nout - opos < count:
                break
            k = 0
            while k < count:
                code = src[pos] & 0x0F
                if code > 7:
                    code |= -16
                if code == -8:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, code)
                    out[opos] = prev
                opos += 1
                k += 1
                if k >= count:
                    pos += 1
                    break
                code = (src[pos] >> 4) & 0x0F
                pos += 1
                if code > 7:
                    code |= -16
                if code == -8:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, code)
                    out[opos] = prev
                opos += 1
                k += 1
        elif typ == 0x60:  # 8-bit
            if n - pos < count or nout - opos < count:
                break
            for _ in range(count):
                code = src[pos] - 256 if src[pos] >= 128 else src[pos]
                pos += 1
                if code == -128:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, code)
                    out[opos] = prev
                opos += 1
        elif typ == 0x80:  # 12-bit pairs
            if n - pos < (3 * count + 1) // 2 or nout - opos < count:
                break
            k = 0
            while k < count:
                v = struct.unpack_from("<h", src, pos)[0] & 0x0FFF
                pos += 1
                if v > 0x7FF:
                    v |= -4096
                if v == -2048:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, v)
                    out[opos] = prev
                opos += 1
                k += 1
                if k >= count:
                    pos += 1
                    break
                v = (struct.unpack_from("<h", src, pos)[0] >> 4) & 0x0FFF
                pos += 2
                if v > 0x7FF:
                    v |= -4096
                if v == -2048:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, v)
                    out[opos] = prev
                opos += 1
                k += 1
        elif typ == 0xA0:  # 16-bit
            if n - pos < 2 * count or nout - opos < count:
                break
            for _ in range(count):
                v = struct.unpack_from("<h", src, pos)[0]
                pos += 2
                if v == -32768:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, v)
                    out[opos] = prev
                opos += 1
        elif typ == 0xC0:  # 24-bit
            if n - pos < 3 * count or nout - opos < count:
                break
            for _ in range(count):
                v = src[pos] | (src[pos + 1] << 8) | (src[pos + 2] << 16)
                pos += 3
                if v > 0x7FFFFF:
                    v |= -(1 << 24)
                if v == -(1 << 23):
                    out[opos] = OUT32
                else:
                    prev = add32(prev, v)
                    out[opos] = prev
                opos += 1
        elif typ == 0xE0:  # 32-bit
            if n - pos < 4 * count or nout - opos < count:
                break
            for _ in range(count):
                v = struct.unpack_from("<i", src, pos)[0]
                pos += 4
                if v == OUT32:
                    out[opos] = OUT32
                else:
                    prev = add32(prev, v)
                    out[opos] = prev
                opos += 1
    return out[:opos].astype(np.int32).tobytes()


def read_rmf(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    data = vsi_read_bytes(path)
    sig = data[:4]
    if sig == b"RSW\x00":
        kind, be = "rsw", False
    elif sig == b"\x00WSR":
        kind, be = "rsw", True
    elif sig == b"MTW\x00":
        kind, be = "mtw", False
    elif sig == b"WTM\x00"[::-1]:
        kind, be = "mtw", True
    else:
        raise ValueError("not an RMF file")
    f = ">" if be else "<"

    def u32(o):
        return struct.unpack_from(f + "I", data, o)[0]

    def f64(o):
        return struct.unpack_from(f + "d", data, o)[0]

    version = u32(4)
    huge = 256 if version >= _HUGE else 1
    bits = u32(52)
    height = u32(56)
    width = u32(60)
    xtiles = u32(64)
    ytiles = u32(68)
    tile_h = u32(72)
    tile_w = u32(76)
    last_h = u32(80)
    last_w = u32(84)
    clr_off = u32(96)
    clr_size = u32(100)
    ttbl_off = u32(104)
    ttbl_size = u32(108)
    epsg = struct.unpack_from(f + "i", data, 132)[0]
    pix = f64(152)
    lly = f64(160)
    llx = f64(168)
    comp = data[208]
    nodata = f64(296)

    tiles = np.frombuffer(data, dtype=f + "u4",
                          count=ttbl_size // 4, offset=ttbl_off * huge)

    if kind == "rsw":
        nbands = 3 if bits in (16, 24, 32) else 1
        dt = np.dtype("u1")
    else:
        nbands = 1
        dt = np.dtype({8: "u1", 16: f + "i2", 32: f + "i4",
                       64: f + "f8"}[bits])

    decompress = None
    if comp == 1:
        decompress = _lzw_decompress
    elif comp == 32:
        decompress = _dem_decompress
    elif comp == 2:
        def decompress(src, out_size):  # noqa: E731
            from gdal_ray.raster.jpeg import decode_jpeg

            arr = decode_jpeg(src)
            return arr.tobytes()
    elif comp != 0:
        raise NotImplementedError(f"RMF compression {comp}")

    bands = [np.zeros((height, width),
                      dtype=np.float64 if False else dt.newbyteorder("="))
             for _ in range(nbands)]
    if kind == "mtw" or nbands == 1:
        for b in bands:
            b[:] = np.asarray(nodata, dtype=b.dtype)

    for ty in range(ytiles):
        for tx in range(xtiles):
            i = ty * xtiles + tx
            if 2 * i + 1 >= len(tiles):
                continue
            off = int(tiles[2 * i]) * huge
            size = int(tiles[2 * i + 1])
            rw = last_w if (last_w and tx == xtiles - 1) else tile_w
            rh = last_h if (last_h and ty == ytiles - 1) else tile_h
            raw_bytes = rw * rh * bits // 8
            if off == 0 or size == 0:
                continue
            buf = data[off:off + size]
            # tiles stored at exactly raw size bypass the codec
            # (rmfdataset.cpp ReadTile: nTileBytes == nRawBytes)
            if size == raw_bytes:
                pass
            elif comp == 2:
                # JPEG tiles decode at full tile size; crop to the
                # edge-tile window
                from gdal_ray.raster.jpeg import decode_jpeg

                arr = decode_jpeg(buf)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                # band map (3,2,1): JPEG RGB -> the RSW BGR tile
                # convention (rmfjpeg.cpp:64)
                arr = arr[:rh, :rw, ::-1]
                buf = np.ascontiguousarray(arr).tobytes()
            elif decompress is not None and size != raw_bytes:
                buf = decompress(buf, raw_bytes)
            if len(buf) < raw_bytes:
                buf = buf + b"\x00" * (raw_bytes - len(buf))
            y0, x0 = ty * tile_h, tx * tile_w
            if bits in (8, 16, 24, 32, 64) and kind == "mtw":
                a = np.frombuffer(buf, dtype=dt, count=rw * rh) \
                    .reshape(rh, rw)
                bands[0][y0:y0 + rh, x0:x0 + rw] = a
            elif bits in (24, 32):
                ps = bits // 8
                a = np.frombuffer(buf, dtype=np.uint8,
                                  count=rw * rh * ps).reshape(rh, rw, ps)
                for bidx in range(nbands):
                    # reference band order reversal (BGR storage)
                    bands[bidx][y0:y0 + rh, x0:x0 + rw] = \
                        a[:, :, nbands - 1 - bidx]
            elif bits == 16:
                a = np.frombuffer(buf, dtype=f + "u2",
                                  count=rw * rh).reshape(rh, rw)
                bands[0][y0:y0 + rh, x0:x0 + rw] = \
                    ((a & 0x7C00) >> 7).astype(np.uint8)
                bands[1][y0:y0 + rh, x0:x0 + rw] = \
                    ((a & 0x03E0) >> 2).astype(np.uint8)
                bands[2][y0:y0 + rh, x0:x0 + rw] = \
                    ((a & 0x1F) << 3).astype(np.uint8)
            elif bits == 8:
                a = np.frombuffer(buf, dtype=np.uint8,
                                  count=rw * rh).reshape(rh, rw)
                bands[0][y0:y0 + rh, x0:x0 + rw] = a
            elif bits == 4:
                nb = np.frombuffer(buf, dtype=np.uint8,
                                   count=(rw + 1) // 2 * rh) \
                    .reshape(rh, (rw + 1) // 2)
                lo = nb & 0x0F
                hi = (nb & 0xF0) >> 4
                pix_a = np.empty((rh, ((rw + 1) // 2) * 2), np.uint8)
                pix_a[:, 0::2] = lo
                pix_a[:, 1::2] = hi
                bands[0][y0:y0 + rh, x0:x0 + rw] = pix_a[:, :rw]
            elif bits == 1:
                nb = np.frombuffer(buf, dtype=np.uint8,
                                   count=(rw + 7) // 8 * rh) \
                    .reshape(rh, (rw + 7) // 8)
                bits_a = np.unpackbits(nb, axis=1)
                bands[0][y0:y0 + rh, x0:x0 + rw] = bits_a[:, :rw]
            else:
                raise NotImplementedError(f"RMF bit depth {bits}")

    color_table = None
    if kind == "rsw" and bits == 8 and clr_off and clr_size:
        ct = data[clr_off * huge:clr_off * huge + clr_size]
        color_table = [(ct[i * 4], ct[i * 4 + 1], ct[i * 4 + 2], 255)
                       for i in range(min(256, len(ct) // 4))]

    gt = (llx, pix, 0.0, lly + height * pix, 0.0, -pix) if pix else None
    crs = f"EPSG:{epsg}" if epsg > 0 else ""
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata, "color_table": color_table,
            "kind": kind, "compression": int(comp)}
