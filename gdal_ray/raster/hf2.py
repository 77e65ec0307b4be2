"""HF2/HFZ heightfield driver — reference role
frmts/hf2/hf2dataset.cpp, re-derived from the public HF2 format
spec (bundysoft.com L3DT docs):

  header: "HF2\\0" magic, u16 version(0), i32 width, i32 height,
          u16 tile size (>=8), f32 vertical precision, f32
          horizontal scale, u32 extended-header length
  extended header: blocks of ("bin\\0" tag, 16-byte NUL-padded name,
          u32 size, payload) — georef-extents (u16 units + 4×f64
          minX/maxX/minY/maxY), georef-utm (i16 zone, <0 = south),
          georef-datum (i16 EPSG datum code), georef-epsg-prj (i16),
          precis-rel (f32), app-name (string)
  tiles:  row-major over tile grid with tile row 0 at the BOTTOM of
          the image; per tile f32 scale + f32 offset, then per line
          (bottom line of the tile first): u8 word size (1/2/4),
          i32 first quantized value, (width-1) signed deltas of that
          word size.  value*scale+offset → float32.

``.hfz`` / ``.hf2.gz`` are transparently gzipped (the reference
auto-prepends /vsigzip/).

The writer mirrors CreateCopy: int16 fast path (scale 1, offset 0)
for integer input, min/max quantization at the requested vertical
precision for float input, per-line minimal word size.  Pinned by
the autotest's CreateCopy checksums (byte.tif → 4672,
n43.dt0 → 49187, float.img → 23529) in tests/test_small_drivers.py.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np


def decode_hf2(data: bytes) -> dict:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if data[:6] != b"HF2\x00\x00\x00":
        raise ValueError("HF2: bad magic")
    xsize, ysize = struct.unpack_from("<ii", data, 6)
    (tile,) = struct.unpack_from("<H", data, 14)
    vert_pres, horiz_scale = struct.unpack_from("<ff", data, 16)
    (ext_len,) = struct.unpack_from("<I", data, 24)
    if tile < 8 or xsize <= 0 or ysize <= 0:
        raise ValueError("HF2: bad dimensions/tile size")
    pos = 28
    end_ext = 28 + ext_len
    extent = None
    utm_zone = None
    datum = None
    epsg = None
    rel_prec = None
    app_name = None
    while pos < end_ext:
        name = data[pos + 4:pos + 20].split(b"\x00")[0].decode("ascii",
                                                               "replace")
        (size,) = struct.unpack_from("<I", data, pos + 20)
        if size > 65536:
            break
        body = data[pos + 24:pos + 24 + size]
        pos += 24 + size
        if name == "georef-extents" and size == 34:
            extent = struct.unpack_from("<4d", body, 2)  # minX maxX minY maxY
        elif name == "georef-utm" and size == 2:
            utm_zone = struct.unpack("<h", body)[0]
        elif name == "georef-datum" and size == 2:
            datum = struct.unpack("<h", body)[0]
        elif name == "georef-epsg-prj" and size == 2:
            epsg = struct.unpack("<h", body)[0]
        elif name == "precis-rel" and size == 4:
            rel_prec = struct.unpack("<f", body)[0]
        elif name == "app-name":
            app_name = body.decode("latin-1", "replace")
    pos = end_ext

    nxb = (xsize + tile - 1) // tile
    nyb = (ysize + tile - 1) // tile
    arr = np.zeros((ysize, xsize), np.float32)
    for j in range(nyb):  # tile row 0 = bottom of image
        th = min(tile, ysize - j * tile)
        for i in range(nxb):
            tw = min(tile, xsize - i * tile)
            scale, offset = struct.unpack_from("<ff", data, pos)
            pos += 8
            for k in range(th):  # line 0 = bottom line of the tile
                word = data[pos]
                pos += 1
                if word not in (1, 2, 4):
                    raise ValueError(f"HF2: bad word size {word}")
                (first,) = struct.unpack_from("<i", data, pos)
                pos += 4
                n = tw - 1
                dt = {1: np.int8, 2: np.dtype("<i2"),
                      4: np.dtype("<i4")}[word]
                deltas = np.frombuffer(data, dt, n, pos)
                pos += word * n
                vals = np.empty(tw, np.int64)
                vals[0] = first
                if n:
                    np.cumsum(deltas.astype(np.int64), out=vals[1:])
                    vals[1:] += first
                row_y = ysize - 1 - (j * tile + k)
                arr[row_y, i * tile:i * tile + tw] = (
                    vals * np.float64(scale) + np.float64(offset)
                ).astype(np.float32)

    if extent is not None:
        minx, maxx, miny, maxy = extent
        gt = (minx, (maxx - minx) / xsize, 0.0,
              maxy, 0.0, -(maxy - miny) / ysize)
    else:
        gt = (0.0, float(horiz_scale), 0.0, 0.0, 0.0, float(horiz_scale))
    crs = None
    if epsg:
        crs = f"EPSG:{epsg}"
    elif utm_zone and 1 <= abs(utm_zone) <= 60:
        base = 32600 if utm_zone > 0 else 32700
        crs = f"EPSG:{base + abs(utm_zone)}"
    elif datum in (23, 6326):
        crs = "EPSG:4326"
    out = {"bands": [arr], "crs": crs, "geotransform": gt, "nodata": None,
           "vertical_precision": float(vert_pres)}
    if rel_prec is not None:
        out["relative_vertical_precision"] = float(rel_prec)
    if app_name:
        out["application_name"] = app_name
    return out


def read_hf2(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_hf2(vsi_read_bytes(path))


def _ext_block(name: str, payload: bytes) -> bytes:
    return (b"bin\x00" + name.encode("ascii").ljust(16, b"\x00")
            + struct.pack("<I", len(payload)) + payload)


def _encode_tile_lines(q: np.ndarray) -> bytes:
    """Per-line delta encode of a quantized int tile (bottom line
    first), minimal word size per line (CreateCopy rule)."""
    out = bytearray()
    th, tw = q.shape
    for k in range(th - 1, -1, -1):
        line = q[k].astype(np.int64)
        deltas = np.diff(line)
        if deltas.size and (deltas.max(initial=0) > 32767
                            or deltas.min(initial=0) < -32768):
            word, dt = 4, "<i4"
        elif deltas.size and (deltas.max(initial=0) > 127
                              or deltas.min(initial=0) < -128):
            word, dt = 2, "<i2"
        else:
            word, dt = 1, "i1"
        out.append(word)
        out += struct.pack("<i", int(line[0]))
        out += deltas.astype(dt).tobytes()
    return bytes(out)


def encode_hf2(arr: np.ndarray, geotransform=None, *,
               tile_size: int = 256, vertical_precision: float = 0.01,
               epsg: int | None = None, datum: int | None = None,
               utm_zone: int | None = None) -> bytes:
    """CreateCopy-parity writer.  Integer-typed input takes the
    int16 path (scale 1, offset 0, exact); float input is quantized
    per tile to ``vertical_precision``."""
    a = np.asarray(arr)
    int_path = np.issubdtype(a.dtype, np.integer)
    if int_path:
        vertical_precision = 1.0
    ysize, xsize = a.shape
    gt = geotransform
    ext = b""
    if gt is not None:
        ext += _ext_block("georef-extents", struct.pack(
            "<h4d", 1, gt[0], gt[0] + xsize * gt[1],
            gt[3] + ysize * gt[5], gt[3]))
    if utm_zone:
        ext += _ext_block("georef-utm", struct.pack("<h", utm_zone))
    if datum:
        ext += _ext_block("georef-datum", struct.pack("<h", datum))
    if epsg:
        ext += _ext_block("georef-epsg-prj", struct.pack("<h", epsg))
    horiz = float((abs(gt[1]) + abs(gt[5])) / 2) if gt is not None else 1.0
    out = bytearray()
    out += b"HF2\x00\x00\x00"
    out += struct.pack("<iiHffI", xsize, ysize, tile_size,
                       vertical_precision, horiz, len(ext))
    out += ext

    nxb = (xsize + tile_size - 1) // tile_size
    nyb = (ysize + tile_size - 1) // tile_size
    for j in range(nyb):
        th = min(tile_size, ysize - j * tile_size)
        y0 = max(0, ysize - (j + 1) * tile_size)
        for i in range(nxb):
            tw = min(tile_size, xsize - i * tile_size)
            t = a[y0:y0 + th, i * tile_size:i * tile_size + tw]
            if int_path:
                scale, offset = np.float32(1), np.float32(0)
                q = t.astype(np.int64)
            else:
                t32 = t.astype(np.float32)
                fmin = np.float32(t32.min())
                fmax = np.float32(t32.max())
                int_range = np.float32(
                    (fmax - fmin) / np.float32(vertical_precision))
                scale = (np.float32(1) if fmin == fmax
                         else np.float32((fmax - fmin) / int_range))
                offset = fmin
                # C cast truncation toward zero
                q = ((t32 - offset) / scale).astype(np.float32)
                q = np.trunc(q).astype(np.int64)
            out += struct.pack("<ff", float(scale), float(offset))
            out += _encode_tile_lines(q)
    return bytes(out)


def write_hf2(path: str, arr: np.ndarray, geotransform=None,
              compress: bool | None = None, **kw) -> None:
    blob = encode_hf2(arr, geotransform, **kw)
    if compress is None:
        compress = path.lower().endswith((".hfz", ".hf2.gz"))
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)
