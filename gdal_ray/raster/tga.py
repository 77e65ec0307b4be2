"""TGA (Truevision Targa) read driver — reference role
frmts/tga/tgadataset.cpp, re-derived from the public TGA 2.0 spec.

Band semantics match the reference: 8-bit grey/paletted → 1 band
(+ color table), 15/16-bit → R,G,B expanded ``(v >> shift & 31) << 3``
(the reference's exact rule), 24-bit BGR → R,G,B, 32-bit BGRA →
R,G,B,A.  RLE packets may cross scanlines (decoded flat).  The TGA
2.0 footer's extension area yields AUTHOR_NAME / COMMENTS; the image
ID field yields IMAGE_ID — the reference's metadata domain.  All
eight reference ref_test_suite fixtures + stefan_full_rgba +
the ffmpeg cross-scanline files are checksum-pinned in tests.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_tga(data: bytes) -> dict:
    (idlen, cmaptype, imgtype, cm_first, cm_len, cm_bits,
     _xo, _yo, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB",
                                                data[:18])
    if imgtype not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"TGA: unsupported image type {imgtype}")
    if desc & 0x10:
        raise ValueError("TGA: right-to-left pixel order unsupported")
    pos = 18
    image_id = data[pos:pos + idlen].split(b"\0")[0].decode(
        "ascii", "replace") if idlen else None
    pos += idlen
    palette = []
    if cmaptype == 1 and cm_len:
        esz = (cm_bits + 7) // 8
        raw = data[pos:pos + cm_len * esz]
        for i in range(cm_len):
            e = raw[i * esz:(i + 1) * esz]
            if cm_bits in (15, 16):
                v = e[0] | (e[1] << 8)
                palette.append((((v >> 10) & 31) << 3,
                                ((v >> 5) & 31) << 3,
                                (v & 31) << 3))
            else:  # 24/32-bit BGR(A)
                palette.append((e[2], e[1], e[0]))
        pos += cm_len * esz
    psz = (bpp + 7) // 8
    npix = w * h
    if imgtype >= 9:  # RLE — runs may cross scanlines
        out = bytearray()
        need = npix * psz
        p = pos
        while len(out) < need and p < len(data):
            hdr = data[p]
            p += 1
            cnt = (hdr & 0x7F) + 1
            if hdr & 0x80:
                out += data[p:p + psz] * cnt
                p += psz
            else:
                out += data[p:p + cnt * psz]
                p += cnt * psz
        flat = np.frombuffer(bytes(out[:need]), np.uint8)
    else:
        flat = np.frombuffer(data, np.uint8, npix * psz, pos)
    px = flat.reshape(h, w, psz)
    if not desc & 0x20:  # bottom-origin (the default) → flip
        px = px[::-1]
    if bpp == 8:
        bands = [np.ascontiguousarray(px[:, :, 0])]
    elif bpp in (15, 16):
        v = px[:, :, 0].astype(np.uint16) | (
            px[:, :, 1].astype(np.uint16) << 8)
        bands = [np.ascontiguousarray(
            (((v >> s) & 31) << 3).astype(np.uint8))
            for s in (10, 5, 0)]
    elif bpp in (24, 32):
        c = bpp // 8
        order = [2, 1, 0] + ([3] if c == 4 else [])
        bands = [np.ascontiguousarray(px[:, :, i]) for i in order]
    else:
        raise ValueError(f"TGA: unsupported depth {bpp}")
    meta = {}
    if image_id:
        meta["IMAGE_ID"] = image_id
    # TGA 2.0 footer → extension area (author / comments)
    if data[-18:] == b"TRUEVISION-XFILE.\x00":
        ext_off = struct.unpack("<I", data[-26:-22])[0]
        if ext_off and ext_off + 367 <= len(data):
            ext = data[ext_off:]
            author = ext[2:43].split(b"\0")[0].decode(
                "ascii", "replace").rstrip()
            if author:
                meta["AUTHOR_NAME"] = author
            lines = []
            for i in range(4):
                ln = ext[43 + i * 81:43 + i * 81 + 81].split(
                    b"\0")[0].decode("ascii", "replace").rstrip()
                if ln:
                    lines.append(ln)
            if lines:
                meta["COMMENTS"] = "\n".join(lines)
    return {"bands": bands, "crs": "",
            "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
            "nodata": None, "palette": palette, "metadata": meta}


def read_tga(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_tga(vsi_read_bytes(path))
