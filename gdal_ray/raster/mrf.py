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

LERC-compressed MRFs (.lrc) are a named boundary (Esri's LERC codec
family).  Pinned against the reference autotest fixtures: byte.tif
MRFs in every supported compression decode to checksum 4672."""

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
    if comp.startswith("LERC"):
        raise NotImplementedError(
            "MRF: LERC tiles are a named boundary")

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
