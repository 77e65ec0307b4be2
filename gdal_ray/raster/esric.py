"""Esri Compact Cache V2 / .tpkx tile-package driver — reference
role frmts/esric/esric_dataset.cpp (itself written against Esri's
public raster-tiles-compactcache documentation,
github.com/Esri/raster-tiles-compactcache).

Layouts read:
- directory cache: ``conf.xml`` (CacheInfo XML: CacheStorageInfo
  StorageFormat=esriMapCacheStorageModeCompactV2 + PacketSize,
  TileCacheInfo TileOrigin/TileCols/LODInfos) with bundles under
  ``_alllayers/``
- ``.tpkx`` tile package: a zip with ``root.json`` (storageInfo /
  tileInfo / tileImageInfo / minLOD / maxLOD / tileBundlesPath) and
  bundles under ``tile/``

Bundle format (V2): 64-byte header (magic words 3, 5, 40, 0 and
index size 128·128·8 at offsets 0/12/32/36/60) followed by a 128×128
little-endian u64 tile index — offset in the low 40 bits, size in
the high 24 — addressed as (row%128)*128 + col%128; bundle file
``L{lod:02d}/R{row&~127:04x}C{col&~127:04x}.bundle``.  Missing
bundles/tiles are transparent black (checksum-0 parity with the
reference autotest).

Tiles decode through the engine's own PNG/JPEG codecs with the
reference's band adaptation: PNG caches are RGBA (gray tiles
replicate, RGB tiles get alpha 255), JPEG caches are RGB.

Pinned against the reference's own fixtures: Layers.tar L01 band-2
checksum 46857 and Usa.tpkx band checksums 61275/57672/61542/19476
+ overview 53503 (autotest gdrivers/esric.py)."""

from __future__ import annotations

import json
import struct
import xml.etree.ElementTree as ET

import numpy as np

BSZ = 128  # bundle size in tiles (the only supported PacketSize)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xml_find(el, name):
    for c in el.iter():
        if _localname(c.tag) == name:
            return c
    return None


def _parse_conf_xml(xml: bytes) -> dict:
    root = ET.fromstring(xml)
    csi = _xml_find(root, "CacheStorageInfo")
    tci = _xml_find(root, "TileCacheInfo")
    if csi is None or tci is None:
        raise ValueError("ESRIC: missing CacheStorageInfo/TileCacheInfo")
    fmt = (csi.findtext("StorageFormat") or "")
    if fmt != "esriMapCacheStorageModeCompactV2":
        raise ValueError("ESRIC: not a V2 bundled cache")
    if int(float(csi.findtext("PacketSize") or "128")) != BSZ:
        raise ValueError("ESRIC: only PacketSize 128 supported")
    tsz = int(float(tci.findtext("TileCols") or "256"))
    if tsz != int(float(tci.findtext("TileRows") or "256")):
        raise ValueError("ESRIC: non-square tiles unsupported")
    origin = _xml_find(tci, "TileOrigin")
    minx = float(origin.findtext("X")) if origin is not None else -180.0
    maxy = float(origin.findtext("Y")) if origin is not None else 90.0
    res = []
    for lod in root.iter():
        if _localname(lod.tag) == "LODInfo":
            res.append(float(lod.findtext("Resolution")))
    if not res:
        raise ValueError("ESRIC: no LODInfos")
    wkt = tci.findtext("SpatialReference/WKT") or ""
    if not wkt:
        sr = _xml_find(tci, "SpatialReference")
        wkt = sr.findtext("WKT") if sr is not None else ""
    crs = None
    if wkt and ("Web_Mercator" in wkt or '"3857"' in wkt
                or "102100" in wkt):
        crs = "EPSG:3857"
    elif wkt and '"4326"' in wkt:
        crs = "EPSG:4326"
    tif = _xml_find(root, "TileImageInfo")
    cfmt = (tif.findtext("CacheTileFormat") if tif is not None
            else None) or "JPEG"
    return {"tsz": tsz, "minx": minx, "maxy": maxy,
            "maxx": -minx, "miny": -maxy,
            "resolutions": sorted(res), "crs": crs,
            "format": cfmt, "min_lod": 0}


def _parse_root_json(obj: dict) -> dict:
    if obj.get("storageInfo", {}).get("storageFormat") != \
            "esriMapCacheStorageModeCompactV2":
        raise ValueError("ESRIC: not a V2 bundled cache")
    if obj["storageInfo"].get("packetSize") != BSZ:
        raise ValueError("ESRIC: only PacketSize 128 supported")
    ti = obj["tileInfo"]
    tsz = ti["rows"]
    if tsz != ti["cols"]:
        raise ValueError("ESRIC: non-square tiles unsupported")
    minx = ti["origin"]["x"]
    maxy = ti["origin"]["y"]
    min_lod = obj.get("minLOD", 0)
    max_lod = min(obj.get("maxLOD", 31), 31)
    res = [lod["resolution"] for lod in ti.get("lods", [])
           if min_lod <= lod.get("level", -1) <= max_lod]
    if not res:
        raise ValueError("ESRIC: no lods")
    sr = ti.get("spatialReference", {})
    code = sr.get("latestWkid") or sr.get("wkid")
    crs = f"EPSG:{code}" if code and code <= 32767 else None
    return {"tsz": tsz, "minx": minx, "maxy": maxy,
            "maxx": -minx, "miny": -maxy,
            "resolutions": sorted(res), "crs": crs,
            "format": obj.get("tileImageInfo", {}).get("format", "JPEG"),
            "min_lod": min_lod,
            "full_extent": obj.get("fullExtent")}


class _Cache:
    """Meta + member accessor over a directory, archive VSI path or
    .tpkx zip."""

    def __init__(self, path: str):
        low = path.lower()
        self._zip = None
        if low.endswith(".tpkx") or low.endswith(".zip"):
            import io
            import zipfile

            from gdal_ray.vsi import vsi_read_bytes

            self._zip = zipfile.ZipFile(
                io.BytesIO(vsi_read_bytes(path)))
            obj = json.loads(self._zip.read("root.json"))
            self.meta = _parse_root_json(obj)
            tb = obj.get("tileBundlesPath", "./tile")
            self.meta_bundles = tb[2:] if tb.startswith("./") else tb
        elif low.endswith("root.json"):
            from gdal_ray.vsi import vsi_read_bytes

            obj = json.loads(vsi_read_bytes(path))
            self.meta = _parse_root_json(obj)
            tb = obj.get("tileBundlesPath", "./tile")
            tb = tb[2:] if tb.startswith("./") else tb
            base = path.rsplit("/", 1)[0]
            self._dir = f"{base}/{tb}"
        else:
            # conf.xml (possibly inside /vsitar// vsizip chains)
            from gdal_ray.vsi import vsi_read_bytes

            self.meta = _parse_conf_xml(vsi_read_bytes(path))
            base = path.rsplit("/", 1)[0]
            self._dir = f"{base}/_alllayers"

    def member(self, rel: str) -> bytes | None:
        if self._zip is not None:
            name = f"{self.meta_bundles}/{rel}"
            try:
                return self._zip.read(name)
            except KeyError:
                return None
        from gdal_ray.vsi import vsi_read_bytes

        try:
            return vsi_read_bytes(f"{self._dir}/{rel}")
        except (OSError, KeyError, ValueError):
            return None


def _bundle_index(blob: bytes) -> np.ndarray | None:
    if len(blob) < 64 + BSZ * BSZ * 8:
        return None
    h = blob[:64]
    if (struct.unpack_from("<I", h, 0)[0] != 3
            or struct.unpack_from("<I", h, 12)[0] != 5
            or struct.unpack_from("<I", h, 32)[0] != 40
            or struct.unpack_from("<I", h, 36)[0] != 0
            or struct.unpack_from("<I", h, 60)[0] != BSZ * BSZ * 8):
        return None
    return np.frombuffer(blob, "<u8", BSZ * BSZ, 64)


def _decode_tile(blob: bytes, tsz: int, nbands: int) -> np.ndarray:
    """One tile blob → (tsz, tsz, nbands) uint8 with the reference's
    band adaptation (gray replicate, alpha 255 fill)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from gdal_ray.raster.png import decode_png

        img = decode_png(blob)
    elif blob[:2] == b"\xff\xd8":
        from gdal_ray.raster.jpeg import decode_jpeg

        img = decode_jpeg(blob)
    else:
        # unreadable tile payload (the reference raises per-block;
        # a streaming engine degrades to transparent black — the
        # Usa.tpkx fixture's L01 tile is missing its PNG magic)
        return np.zeros((tsz, tsz, nbands), np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    out = np.full((tsz, tsz, nbands), 255, np.uint8)
    ch, cw = min(tsz, img.shape[0]), min(tsz, img.shape[1])
    inb = img.shape[2]
    if inb >= nbands:
        out[:ch, :cw] = img[:ch, :cw, :nbands]
    elif inb in (3, 2):  # RGB (or gray+alpha) under RGBA
        out[:ch, :cw, :inb] = img[:ch, :cw]
    else:  # grayscale replicates into the color bands
        rep = min(nbands, 3)
        out[:ch, :cw, :rep] = img[:ch, :cw, [0] * rep]
        if nbands > 3 and img.shape[2] == 1:
            pass  # alpha stays 255
    return out


def read_esric(path: str, level: int = 0) -> dict:
    """One LOD level → whole-array raster dict. ``level`` counts like
    GDAL overviews: 0 = finest LOD, 1 = next coarser, …"""
    cache = _Cache(path)
    m = cache.meta
    res_list = m["resolutions"]
    if not (0 <= level < len(res_list)):
        raise ValueError(f"ESRIC: level {level} out of range")
    res = res_list[level]
    lxx = m["min_lod"] + (len(res_list) - level - 1)
    tsz = m["tsz"]
    nbands = 3 if m["format"].upper() == "JPEG" else 4
    xsize = int(min((m["maxx"] - m["minx"]) / res, 2**31 - 1))
    ysize = int(min((m["maxy"] - m["miny"]) / res, 2**31 - 1))
    ntx = (xsize + tsz - 1) // tsz
    nty = (ysize + tsz - 1) // tsz
    bands = [np.zeros((ysize, xsize), np.uint8) for _ in range(nbands)]
    for by0 in range(0, nty, BSZ):
        for bx0 in range(0, ntx, BSZ):
            blob = cache.member(
                f"L{lxx:02d}/R{by0:04x}C{bx0:04x}.bundle")
            if blob is None:
                continue
            index = _bundle_index(blob)
            if index is None:
                continue
            occupied = np.flatnonzero(index >> np.uint64(40))
            for k in occupied:
                row, col = divmod(int(k), BSZ)
                ty, tx = by0 + row, bx0 + col
                if ty >= nty or tx >= ntx:
                    continue
                e = int(index[k])
                off, size = e & 0xFFFFFFFFFF, e >> 40
                tile = _decode_tile(blob[off:off + size], tsz, nbands)
                y0, x0 = ty * tsz, tx * tsz
                vh = min(tsz, ysize - y0)
                vw = min(tsz, xsize - x0)
                for b in range(nbands):
                    bands[b][y0:y0 + vh, x0:x0 + vw] = tile[:vh, :vw, b]
    return {
        "bands": bands,
        "crs": m["crs"],
        "geotransform": (m["minx"], res, 0.0, m["maxy"], 0.0, -res),
        "nodata": None,
        "levels": len(res_list),
    }


def read_esric_tiles(path: str, level: int = 0):
    """LOD level → Ray Dataset of tiles (tile_x, tile_y, band data as
    binary PNG/JPEG payload + decoded shape metadata) — the engine's
    tile-table model; each bundle is one read task."""
    import pyarrow as pa
    import ray.data as rd

    cache = _Cache(path)
    m = cache.meta
    res_list = m["resolutions"]
    res = res_list[level]
    lxx = m["min_lod"] + (len(res_list) - level - 1)
    tsz = m["tsz"]
    xsize = int(min((m["maxx"] - m["minx"]) / res, 2**31 - 1))
    ysize = int(min((m["maxy"] - m["miny"]) / res, 2**31 - 1))
    ntx = (xsize + tsz - 1) // tsz
    nty = (ysize + tsz - 1) // tsz
    items = [{"path": path, "level": level, "bx": bx, "by": by}
             for by in range(0, nty, BSZ)
             for bx in range(0, ntx, BSZ)]
    ds = rd.from_items(items)

    def load(batch: pa.Table) -> pa.Table:
        xs, ys, blobs = [], [], []
        for i in range(len(batch)):
            c = _Cache(batch["path"][i].as_py())
            mm = c.meta
            lv = batch["level"][i].as_py()
            lx = mm["min_lod"] + (len(mm["resolutions"]) - lv - 1)
            bx0 = batch["bx"][i].as_py()
            by0 = batch["by"][i].as_py()
            blob = c.member(f"L{lx:02d}/R{by0:04x}C{bx0:04x}.bundle")
            if blob is None:
                continue
            index = _bundle_index(blob)
            if index is None:
                continue
            for k in np.flatnonzero(index >> np.uint64(40)):
                row, col = divmod(int(k), BSZ)
                e = int(index[k])
                off, size = e & 0xFFFFFFFFFF, e >> 40
                xs.append(bx0 + col)
                ys.append(by0 + row)
                blobs.append(blob[off:off + size])
        return pa.table({"tile_x": pa.array(xs, pa.int32()),
                         "tile_y": pa.array(ys, pa.int32()),
                         "data": pa.array(blobs, pa.binary())})

    return ds.map_batches(load, batch_format="pyarrow")
