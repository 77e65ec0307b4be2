"""Windows BMP raster driver — reference role frmts/bmp/bmpdataset.cpp,
re-derived from the public BITMAPFILEHEADER / BITMAPINFOHEADER format:

  14-byte file header: 'BM', file size, reserved, pixel-data offset
  40-byte info header (LE): header size, width, height (positive →
  BOTTOM-UP rows), planes, bit count (1/4/8/24/32), compression
  (0=BI_RGB, 1=BI_RLE8, 2=BI_RLE4), image size, ppm, palette counts
  palette: 4-byte BGRX entries; rows padded to 4 bytes.

Band semantics match the reference driver: paletted files (1/4/8-bit)
expose ONE band of palette indexes plus the color table; 24/32-bit
expose R, G, B(, A) bands from the file's BGR(A) order.  Reference
autotest pins (gcore/bmp_read.py): 1bit 200, 4bit_pal/4bit_rle4 2587,
8bit_pal/byte_rle8 4672, red_rgb_1x1 band-1 3.

Georeferencing: a sidecar ESRI world file (.wld/.bpw) when present —
the reference's generic world-file path.  Write emits 8-bit paletted
(greyscale palette for band data without one) or 24-bit BGR, always
BI_RGB bottom-up, plus an optional world file.
"""

from __future__ import annotations

import struct

import numpy as np


def _unrle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 → (h, w) index array (top-down rows; the
    caller has already accounted for the bottom-up flip)."""
    out = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    n = len(data)
    while pos + 1 < n and y < h:
        c0, c1 = data[pos], data[pos + 1]
        pos += 2
        if c0:  # encoded run
            if four_bit:
                hi, lo = c1 >> 4, c1 & 0xF
                run = np.tile(np.array([hi, lo], np.uint8),
                              (c0 + 1) // 2)[:c0]
            else:
                run = np.full(c0, c1, np.uint8)
            end = min(x + c0, w)
            out[y, x:end] = run[:end - x]
            x = end
        elif c1 == 0:  # end of line
            x, y = 0, y + 1
        elif c1 == 1:  # end of bitmap
            break
        elif c1 == 2:  # delta
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode, padded to word boundary
            cnt = c1
            if four_bit:
                nbytes = (cnt + 1) // 2
                raw = np.frombuffer(data, np.uint8, nbytes, pos)
                pix = np.empty(nbytes * 2, np.uint8)
                pix[0::2] = raw >> 4
                pix[1::2] = raw & 0xF
                pix = pix[:cnt]
                pos += nbytes + (nbytes & 1)
            else:
                pix = np.frombuffer(data, np.uint8, cnt, pos)
                pos += cnt + (cnt & 1)
            end = min(x + cnt, w)
            out[y, x:end] = pix[:end - x]
            x = end
    return out


def decode_bmp(data: bytes) -> dict:
    """BMP bytes → ``load_raster`` dict (+ ``palette`` for indexed
    files: list of (r, g, b) tuples)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", data[10:14])[0]
    hsize = struct.unpack("<I", data[14:18])[0]
    w, h = struct.unpack("<ii", data[18:26])
    planes, bits, comp = struct.unpack("<HHI", data[26:34])
    if hsize < 40:
        raise ValueError(f"BMP: unsupported header size {hsize}")
    bottom_up = h > 0
    h = abs(h)
    ncolors = struct.unpack("<I", data[46:50])[0]
    palette = []
    if bits <= 8:
        if ncolors == 0:
            ncolors = 1 << bits
        pal_off = 14 + hsize
        for i in range(ncolors):
            b, g, r = data[pal_off + i * 4:pal_off + i * 4 + 3]
            palette.append((r, g, b))
    if comp in (1, 2):  # RLE8 / RLE4 (stored bottom-up like BI_RGB)
        idx = _unrle(data[offset:], w, h, four_bit=(comp == 2))
        if bottom_up:
            idx = idx[::-1]
        bands = [np.ascontiguousarray(idx)]
    elif comp == 0:
        stride = ((w * bits + 31) // 32) * 4
        raw = np.frombuffer(data, np.uint8, stride * h, offset)
        rows = raw.reshape(h, stride)
        if bottom_up:
            rows = rows[::-1]
        if bits == 1:
            pix = np.unpackbits(rows[:, :(w + 7) // 8], axis=1)[:, :w]
            bands = [np.ascontiguousarray(pix)]
        elif bits == 4:
            nb = (w + 1) // 2
            two = np.empty((h, nb * 2), np.uint8)
            two[:, 0::2] = rows[:, :nb] >> 4
            two[:, 1::2] = rows[:, :nb] & 0xF
            bands = [np.ascontiguousarray(two[:, :w])]
        elif bits == 8:
            bands = [np.ascontiguousarray(rows[:, :w])]
        elif bits in (24, 32):
            c = bits // 8
            px = rows[:, :w * c].reshape(h, w, c)
            # file order BGR(A) → bands R, G, B(, A)
            order = [2, 1, 0] + ([3] if c == 4 else [])
            bands = [np.ascontiguousarray(px[:, :, i]) for i in order]
        else:
            raise ValueError(f"BMP: unsupported bit count {bits}")
    else:
        raise ValueError(f"BMP: unsupported compression {comp}")
    return {"bands": bands, "crs": "",
            "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
            "nodata": None, "palette": palette}


def encode_bmp(bands, palette=None) -> bytes:
    """Band arrays → BMP bytes: one band → 8-bit paletted (greyscale
    palette when none given), three bands → 24-bit BI_RGB."""
    bands = [np.asarray(b, np.uint8) for b in bands]
    h, w = bands[0].shape
    if len(bands) == 1:
        pal = palette or [(i, i, i) for i in range(256)]
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = bands[0]
        pix = rows[::-1].tobytes()
        pal_bytes = b"".join(
            bytes((b, g, r, 0)) for r, g, b in
            (pal + [(0, 0, 0)] * 256)[:256])
        offset = 14 + 40 + len(pal_bytes)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                           len(pix), 2835, 2835, 256, 0)
        head = b"BM" + struct.pack("<IHHI", offset + len(pix), 0, 0,
                                   offset)
        return head + info + pal_bytes + pix
    if len(bands) != 3:
        raise ValueError("BMP: 1 (paletted) or 3 (RGB) bands")
    stride = ((w * 3 + 3) & ~3)
    rows = np.zeros((h, stride), np.uint8)
    px = np.dstack([bands[2], bands[1], bands[0]])  # BGR
    rows[:, :w * 3] = px.reshape(h, w * 3)
    pix = rows[::-1].tobytes()
    offset = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pix), 2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", offset + len(pix), 0, 0, offset)
    return head + info + pix


def _worldfile_gt(path: str):
    """Sidecar .wld/.bpw world file → geotransform, if present."""
    import os

    for ext in (".wld", ".bpw"):
        wf = os.path.splitext(path)[0] + ext
        if os.path.exists(wf):
            v = [float(x) for x in open(wf).read().split()[:6]]
            # world file: dx, rot1, rot2, dy, x_center, y_center
            return (v[4] - v[0] / 2, v[0], v[1],
                    v[5] - v[3] / 2, v[2], v[3])
    return None


def read_bmp(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    r = decode_bmp(vsi_read_bytes(path))
    gt = _worldfile_gt(path)
    if gt is not None:
        r["geotransform"] = gt
    return r


def write_bmp(path: str, bands, gt=None, palette=None) -> None:
    from gdal_ray.vsi import vsi_write_bytes

    vsi_write_bytes(path, encode_bmp(bands, palette))
    if gt is not None and not path.startswith("/vsi"):
        wf = path.rsplit(".", 1)[0] + ".wld"
        with open(wf, "w") as f:
            f.write(f"{gt[1]:.10g}\n{gt[4]:.10g}\n{gt[2]:.10g}\n"
                    f"{gt[5]:.10g}\n{gt[0] + gt[1] / 2:.10g}\n"
                    f"{gt[3] + gt[5] / 2:.10g}\n")
