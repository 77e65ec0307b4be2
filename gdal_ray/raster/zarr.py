"""Zarr v2 / v3 chunked-array READ driver from scratch (reference
role: frmts/zarr/ — zarrdriver.cpp + zarr_array.cpp; formats
re-derived from the public Zarr v2 spec, the Zarr v3 core spec and
the numcodecs / c-blosc format documents, no code ported).

The Zarr chunk grid maps 1:1 onto the engine's tile-table model
(raster/model.py): one chunk = one tile row.  ``read_zarr`` builds
the chunk DESCRIPTOR list driver-side from metadata only (one small
JSON read per array — no pixel I/O on the driver) and decodes chunks
inside ``map_batches`` tasks, so a 100-TB Zarr store streams through
the object store one chunk-block at a time.

Scope:
- v2: ``.zarray``/``.zgroup``/``.zattrs`` (+ consolidated
  ``.zmetadata``), C and F order, any numeric dtype / byte order,
  ``dimension_separator`` "." or "/", missing chunks → fill_value;
  compressors: null, zlib, gzip, blosc (memcpy + lz4/lz4hc/zlib
  block paths), lz4 (frame = int32 size + LZ4 block), lzma (XZ via
  stdlib, incl. embedded delta filters), zstd (from-scratch RFC 8878
  decoder, raster/zstd.py); filters: shuffle, delta, quantize
  (decode = identity), fixedscaleoffset.
- v3: ``zarr.json`` arrays/groups, default and v2 chunk-key
  encodings, codecs ``bytes`` (endian), ``gzip``, ``zlib``,
  ``blosc``, ``zstd``, ``transpose``, ``crc32c`` (verified), and
  ``sharding_indexed`` (offset/nbytes index at either end, missing
  inner chunks → fill, recursive — nested shards work).
- CF georeferencing: 1-D coordinate arrays named by
  ``_ARRAY_DIMENSIONS`` / ``dimension_names`` give the geotransform
  (ascending-y stores are flipped to GDAL north-up, matching the
  reference driver on its own byte_cf1 fixture); a
  ``transverse_mercator`` UTM grid_mapping resolves to its EPSG code.
- write (v2): CF-style group layout mirroring the reference's own
  byte_cf1 fixture (Band{N} + ascending x/y coordinate arrays +
  grid_mapping variable), zlib or raw chunks; ``write_zarr_dataset``
  is the DISTRIBUTED sink — each task writes only its own ``y.x``
  chunk files (idempotent, resumable), the driver writes O(bands)
  metadata JSONs.
- out of scope (documented, raising): string/compound dtypes (the
  tile-table model is numeric), v3 write.
"""

from __future__ import annotations

import gzip as _gzip
import json
import lzma as _lzma
import os
import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def _lz4_block(src: bytes, dst_size: int) -> bytes:
    """LZ4 *block* format decode (public spec lz4_Block_format.md).
    Per-sequence Python loop — chunks are bounded by blosc blocksize
    (or the numcodecs frame size), and the hot Zarr codecs at scale
    are zlib/gzip (C); documented trade-off."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence has literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("LZ4: zero match offset")
        ml = token & 15
        if ml == 15:
            while True:
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - off
        if off >= ml:
            out += out[start : start + ml]
        else:  # overlapping match: RLE-style byte extension
            for k in range(ml):
                out.append(out[start + k])
    if len(out) != dst_size:
        raise ValueError(f"LZ4: got {len(out)} bytes, expected {dst_size}")
    return bytes(out)


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Undo blosc/numcodecs byte shuffle: the stream holds all first
    bytes, then all second bytes, ... — one numpy transpose."""
    if typesize <= 1 or len(buf) % typesize:
        return buf
    n = len(buf) // typesize
    a = np.frombuffer(buf, np.uint8).reshape(typesize, n)
    return a.T.tobytes()


def _blosc_decode(buf: bytes) -> bytes:
    """c-blosc v1 chunk (public README_CHUNK_FORMAT.rst): 16-byte
    header | int32 block offsets | blocks (each int32 csize-prefixed).
    flags bit0 = byte shuffle, bit1 = pure memcpy, bit2 = bit shuffle;
    bits 5-7 = codec (0 blosclz, 1 lz4/lz4hc, 3 zlib, 4 zstd)."""
    if len(buf) < 16:
        raise ValueError("blosc: truncated header")
    _ver, _verlz, flags, typesize = buf[0], buf[1], buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", buf, 4)
    if len(buf) < cbytes:
        raise ValueError("blosc: truncated chunk")
    if flags & 0x4:
        raise NotImplementedError("blosc bit-shuffle not supported")
    if flags & 0x2:  # pure memcpy
        raw = bytes(buf[16 : 16 + nbytes])
    else:
        codec = flags >> 5
        nblocks = -(-nbytes // blocksize) if blocksize else 1
        offs = struct.unpack_from("<%di" % nblocks, buf, 16)
        raw = bytearray()
        for bi, off in enumerate(offs):
            want = min(blocksize, nbytes - bi * blocksize)
            (csize,) = struct.unpack_from("<i", buf, off)
            blk = bytes(buf[off + 4 : off + 4 + csize])
            if csize == want:  # stored uncompressed
                raw += blk
            elif codec == 1:
                raw += _lz4_block(blk, want)
            elif codec == 3:
                raw += zlib.decompress(blk)
            else:
                raise NotImplementedError(
                    f"blosc inner codec {codec} not supported (zstd/"
                    "snappy/blosclz need decoders absent here)")
        raw = bytes(raw)
    if flags & 0x1:
        raw = _unshuffle(raw, typesize)
    return raw


def _decompress_v2(buf: bytes, comp: dict | None) -> bytes:
    if comp is None:
        return bytes(buf)
    cid = comp.get("id")
    if cid == "zlib":
        return zlib.decompress(buf)
    if cid == "gzip":
        return _gzip.decompress(buf)
    if cid == "blosc":
        return _blosc_decode(buf)
    if cid == "lz4":
        (size,) = struct.unpack_from("<i", buf, 0)
        return _lz4_block(bytes(buf[4:]), size)
    if cid == "lzma":
        # numcodecs LZMA default container is XZ; stdlib handles the
        # embedded filter chain (delta etc.) transparently
        return _lzma.decompress(buf)
    if cid == "zstd":
        from gdal_ray.raster.zstd import zstd_decompress

        return zstd_decompress(buf)
    raise NotImplementedError(f"Zarr compressor {cid!r} not supported")


def _undo_filters_v2(raw: bytes, filters: list | None,
                     dtype: np.dtype) -> bytes:
    """numcodecs filters run array→array before the compressor on
    encode; decode applies them in REVERSE order."""
    for f in reversed(filters or []):
        fid = f.get("id")
        if fid == "shuffle":
            raw = _unshuffle(raw, int(f.get("elementsize", dtype.itemsize)))
        elif fid == "delta":
            dt = np.dtype(f.get("dtype", dtype))
            a = np.frombuffer(raw, dt)
            raw = np.cumsum(a, dtype=dt).tobytes()
        elif fid == "quantize":
            # lossy rounding happens on encode; decode casts the
            # stored ``astype`` back to the declared dtype
            st = np.dtype(f.get("astype", dtype))
            out_dt = np.dtype(f.get("dtype", dtype))
            raw = np.frombuffer(raw, st).astype(out_dt).tobytes()
        elif fid == "fixedscaleoffset":
            st = np.dtype(f.get("astype", dtype))
            out_dt = np.dtype(f.get("dtype", dtype))
            a = np.frombuffer(raw, st).astype(np.float64)
            vals = a / float(f["scale"]) + float(f["offset"])
            if np.issubdtype(out_dt, np.floating):
                # numcodecs rounds decoded floats to the quantization
                # step's decimal precision
                dec = int(round(np.log10(float(f["scale"]))))
                vals = np.round(vals, dec)
            raw = vals.astype(out_dt).tobytes()
        else:
            raise NotImplementedError(f"Zarr filter {fid!r} not supported")
    return raw


_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, poly 0x1EDC6F41 reflected = 0x82F63B78) —
    table-driven; verifies v3 crc32c codec trailers."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = np.empty(256, np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
            tbl[i] = c
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = int(tbl[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _undo_b2b_v3(buf: bytes, codec: dict) -> bytes:
    """One v3 bytes→bytes codec, decode direction."""
    name = codec.get("name")
    if name == "gzip":
        return _gzip.decompress(buf)
    if name == "zlib":
        return zlib.decompress(buf)
    if name == "blosc":
        return _blosc_decode(buf)
    if name == "zstd":
        from gdal_ray.raster.zstd import zstd_decompress

        return zstd_decompress(buf)
    if name == "crc32c":
        body, trailer = buf[:-4], buf[-4:]
        want = struct.unpack("<I", trailer)[0]
        got = _crc32c(body)
        if got != want:
            raise ValueError(f"crc32c mismatch: {got:#x} != {want:#x}")
        return body
    raise NotImplementedError(f"v3 codec {name!r} not supported")


def _decode_v3_chunk(buf: bytes, codecs: list, shape: tuple,
                     base_dtype: np.dtype, fill_value) -> np.ndarray:
    """v3 codec pipeline, decode direction: undo bytes→bytes codecs
    (reverse declaration order), apply the one array→bytes codec
    (``bytes`` or ``sharding_indexed``), then undo array→array codecs
    (``transpose``)."""
    a2b = max(i for i, c in enumerate(codecs)
              if c.get("name") in ("bytes", "endian", "sharding_indexed"))
    for c in reversed(codecs[a2b + 1:]):
        buf = _undo_b2b_v3(buf, c)
    # array→array codecs permute the STORED shape (encode direction)
    stored_shape = tuple(shape)
    for c in codecs[:a2b]:
        if c.get("name") == "transpose":
            order = c.get("configuration", {}).get("order")
            if order:
                stored_shape = tuple(stored_shape[i] for i in order)
        else:
            raise NotImplementedError(
                f"v3 array→array codec {c.get('name')!r} not supported")
    main = codecs[a2b]
    cfg = main.get("configuration", {})
    if main.get("name") == "sharding_indexed":
        arr = _decode_shard(buf, cfg, stored_shape, base_dtype, fill_value)
    else:
        endian = cfg.get("endian", "little")
        dt = base_dtype.newbyteorder("<" if endian == "little" else ">")
        arr = np.frombuffer(buf, dt).reshape(stored_shape)
    for c in reversed(codecs[:a2b]):
        if c.get("name") == "transpose":
            order = c.get("configuration", {}).get("order")
            if order and list(order) != list(range(len(shape))):
                arr = arr.transpose(np.argsort(order))
    return arr


def _decode_shard(buf: bytes, cfg: dict, shape: tuple,
                  base_dtype: np.dtype, fill_value) -> np.ndarray:
    """v3 ``sharding_indexed``: the shard holds a grid of inner
    chunks plus an index of (offset, nbytes) uint64 pairs (missing
    chunk = 2^64-1 pair → fill). Recurses through the inner codec
    pipeline, so nested shards and zstd/crc32c inner codecs work."""
    inner = tuple(cfg["chunk_shape"])
    grid = tuple(-(-s // c) for s, c in zip(shape, inner))
    n = int(np.prod(grid))
    idx_codecs = cfg.get("index_codecs") or [{"name": "bytes"}]
    # index size: 16 bytes per inner chunk + codec overhead (crc32c +4)
    idx_size = 16 * n
    for c in idx_codecs:
        if c.get("name") == "crc32c":
            idx_size += 4
        elif c.get("name") not in ("bytes", "endian"):
            raise NotImplementedError(
                f"shard index codec {c.get('name')!r} not supported")
    loc = cfg.get("index_location", "end")
    raw_idx = buf[-idx_size:] if loc == "end" else buf[:idx_size]
    endian = "little"
    for c in idx_codecs:
        if c.get("name") == "crc32c":
            raw_idx = _undo_b2b_v3(raw_idx, c)
        else:
            endian = c.get("configuration", {}).get("endian", "little")
    dt = np.dtype(np.uint64).newbyteorder("<" if endian == "little" else ">")
    pairs = np.frombuffer(raw_idx, dt).reshape(n, 2)
    fv = 0 if fill_value is None else fill_value
    out = np.full(tuple(g * c for g, c in zip(grid, inner)), fv,
                  dtype=base_dtype)
    missing = np.uint64(0xFFFFFFFFFFFFFFFF)
    import itertools

    for k, idx in enumerate(itertools.product(*(range(g) for g in grid))):
        off, nb = pairs[k]
        if off == missing and nb == missing:
            continue
        sub = _decode_v3_chunk(buf[int(off): int(off + nb)],
                               cfg.get("codecs") or [{"name": "bytes"}],
                               inner, base_dtype, fill_value)
        sl = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idx, inner))
        out[sl] = sub
    return out[tuple(slice(0, s) for s in shape)]


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------

_V3_DTYPES = {
    "bool": "?", "int8": "i1", "int16": "i2", "int32": "i4",
    "int64": "i8", "uint8": "u1", "uint16": "u2", "uint32": "u4",
    "uint64": "u8", "float16": "f2", "float32": "f4", "float64": "f8",
}


def _load_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


class ZarrArray:
    """One Zarr array: parsed metadata + chunk-level decode. All pixel
    I/O happens in ``decode_chunk`` so callers (and Ray tasks) touch
    only the chunks they own."""

    def __init__(self, path: str):
        self.path = path.rstrip("/")
        self.name = os.path.basename(self.path)
        meta = _load_json(os.path.join(self.path, ".zarray"))
        if meta is not None:
            self.version = 2
            self._init_v2(meta)
        else:
            meta = _load_json(os.path.join(self.path, "zarr.json"))
            if meta is None or meta.get("node_type") != "array":
                raise ValueError(f"not a Zarr array: {path}")
            self.version = 3
            self._init_v3(meta)
        self.attrs = self._load_attrs()
        if self.dtype.kind not in "biufc":
            raise NotImplementedError(
                f"non-numeric Zarr dtype {self.dtype} (string/compound "
                "arrays are outside the tile-table model)")

    # -- v2 -----------------------------------------------------------------

    def _init_v2(self, meta: dict):
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"]) or self.shape or (1,)
        self.dtype = np.dtype(meta["dtype"])
        self.compressor = meta.get("compressor")
        self.filters = meta.get("filters")
        self.order = meta.get("order", "C")
        self.fill_value = meta.get("fill_value")
        self.sep = meta.get("dimension_separator", ".")
        self.codecs = None

    # -- v3 -----------------------------------------------------------------

    def _init_v3(self, meta: dict):
        self.shape = tuple(meta["shape"])
        grid = meta.get("chunk_grid", {})
        if grid.get("name") != "regular":
            raise NotImplementedError(
                f"v3 chunk grid {grid.get('name')!r} not supported")
        self.chunks = tuple(grid["configuration"]["chunk_shape"])
        dt = meta["data_type"]
        if dt not in _V3_DTYPES:
            raise NotImplementedError(f"v3 data_type {dt!r} not supported")
        self.dtype = np.dtype(_V3_DTYPES[dt])  # endian set by bytes codec
        self.codecs = meta.get("codecs") or [{"name": "bytes"}]
        self.compressor = None
        self.filters = None
        self.order = "C"
        self.fill_value = meta.get("fill_value")
        cke = meta.get("chunk_key_encoding",
                       {"name": "default", "configuration": {}})
        self._cke_name = cke.get("name", "default")
        self.sep = cke.get("configuration", {}).get(
            "separator", "/" if self._cke_name == "default" else ".")
        self._dimension_names = meta.get("dimension_names")
        self._attributes = meta.get("attributes", {})

    def _load_attrs(self) -> dict:
        if self.version == 2:
            return _load_json(os.path.join(self.path, ".zattrs")) or {}
        return self._attributes or {}

    # -- chunk access ---------------------------------------------------------

    @property
    def grid_shape(self) -> tuple:
        return tuple(-(-s // c) for s, c in zip(self.shape, self.chunks))

    def chunk_key(self, idx: tuple) -> str:
        if self.version == 2:
            return self.sep.join(str(i) for i in idx) if idx else "0"
        if self._cke_name == "v2":
            return self.sep.join(str(i) for i in idx) if idx else "0"
        return "c" + self.sep + self.sep.join(str(i) for i in idx) \
            if idx else "c"

    def chunk_keys(self):
        import itertools

        for idx in itertools.product(*(range(g) for g in self.grid_shape)):
            yield idx, self.chunk_key(idx)

    def _fill_chunk(self) -> np.ndarray:
        fv = self.fill_value
        if fv is None:
            fv = 0
        elif isinstance(fv, str):
            fv = {"NaN": np.nan, "Infinity": np.inf,
                  "-Infinity": -np.inf}.get(fv, float(fv))
        return np.full(self.chunks, fv, dtype=self.dtype)

    def decode_chunk(self, idx: tuple) -> np.ndarray:
        """One chunk → full-chunk-shape numpy array (edge crop is the
        caller's job, matching the Zarr storage model)."""
        fp = os.path.join(self.path, self.chunk_key(idx))
        if not os.path.exists(fp):
            return self._fill_chunk()
        with open(fp, "rb") as f:
            buf = f.read()
        if self.version == 2:
            raw = _decompress_v2(buf, self.compressor)
            raw = _undo_filters_v2(raw, self.filters, self.dtype)
            a = np.frombuffer(raw, self.dtype)
            return a.reshape(self.chunks, order=self.order)
        return _decode_v3_chunk(buf, self.codecs, self.chunks, self.dtype,
                                self.fill_value)

    def read(self) -> np.ndarray:
        """Whole array (small arrays / tests; the Ray path decodes
        per-chunk inside tasks instead)."""
        out = np.empty(self.shape, self.dtype)
        if out.size == 0:
            return out
        if not self.shape:  # 0-d
            return self.decode_chunk(()).reshape(())
        for idx, _k in self.chunk_keys():
            sl = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, self.chunks, self.shape))
            want = tuple(s.stop - s.start for s in sl)
            chunk = self.decode_chunk(idx)
            out[sl] = chunk[tuple(slice(0, w) for w in want)]
        return out

    def dimension_names(self) -> list | None:
        if self.version == 3:
            return self._dimension_names
        return self.attrs.get("_ARRAY_DIMENSIONS")


def open_zarr(path: str) -> dict[str, "ZarrArray"]:
    """Store/group directory → {array name: ZarrArray}. Walks child
    directories (one JSON read each — consolidated ``.zmetadata`` is
    honored as the name list when present); a path that IS an array
    returns {name: array}."""
    path = path.rstrip("/")
    if os.path.exists(os.path.join(path, ".zarray")) or (
        (_load_json(os.path.join(path, "zarr.json")) or {}).get("node_type")
        == "array"
    ):
        a = ZarrArray(path)
        return {a.name: a}
    out: dict[str, ZarrArray] = {}
    zmeta = _load_json(os.path.join(path, ".zmetadata"))
    if zmeta:
        names = sorted({k[: -len("/.zarray")]
                        for k in zmeta.get("metadata", {})
                        if k.endswith("/.zarray")})
        for n in names:
            try:
                out[n] = ZarrArray(os.path.join(path, n))
            except NotImplementedError:
                continue
        return out
    for n in sorted(os.listdir(path)):
        sub = os.path.join(path, n)
        if not os.path.isdir(sub):
            continue
        try:
            j3 = _load_json(os.path.join(sub, "zarr.json"))
            if os.path.exists(os.path.join(sub, ".zarray")) or (
                    j3 and j3.get("node_type") == "array"):
                out[n] = ZarrArray(sub)
            elif os.path.exists(os.path.join(sub, ".zgroup")) or (
                    j3 and j3.get("node_type") == "group"):
                out.update({f"{n}/{k}": v
                            for k, v in open_zarr(sub).items()})
        except NotImplementedError:
            continue  # unreadable member arrays don't hide the rest
    return out


# ---------------------------------------------------------------------------
# CF georeferencing
# ---------------------------------------------------------------------------


def _cf_to_epsg(gm: dict) -> str:
    """Minimal CF grid_mapping → EPSG resolution: UTM-parameterized
    transverse_mercator on NAD27/WGS84/NAD83 ellipsoids (the shapes
    the reference's own CF fixtures use) and lat/lon. Everything else
    returns "" with the raw attrs still available on the array."""
    name = gm.get("grid_mapping_name", "")
    if name == "latitude_longitude":
        return "EPSG:4326"
    if name != "transverse_mercator":
        return ""
    k = gm.get("scale_factor_at_central_meridian")
    fe = gm.get("false_easting")
    fn = gm.get("false_northing", 0.0)
    lon0 = gm.get("longitude_of_central_meridian")
    if k is None or fe is None or lon0 is None:
        return ""
    if abs(k - 0.9996) > 1e-9 or abs(fe - 500000.0) > 1e-6:
        return ""
    zone = int(round((lon0 + 183.0) / 6.0))
    if not 1 <= zone <= 60 or abs(lon0 - (zone * 6 - 183)) > 1e-6:
        return ""
    a = gm.get("semi_major_axis", 6378137.0)
    south = abs(fn - 10000000.0) < 1e-6
    if abs(a - 6378206.4) < 0.1 and not south:
        return f"EPSG:{26700 + zone}"          # NAD27 UTM north
    if abs(a - 6378137.0) < 0.1:
        inv_f = gm.get("inverse_flattening", 298.257223563)
        if abs(inv_f - 298.257222101) < 1e-6 and not south:
            return f"EPSG:{26900 + zone}"      # NAD83 UTM north
        return f"EPSG:{(32700 if south else 32600) + zone}"  # WGS84
    return ""


def georeference(arrays: dict[str, ZarrArray],
                 name: str) -> tuple[tuple, str, bool]:
    """(geotransform, crs, flip_y) for a 2-D array from its CF
    coordinate arrays. Ascending-y stores (CF order) flip to GDAL
    north-up — the reference driver reads its byte_cf1 fixture that
    way (checksum parity pinned in tests)."""
    arr = arrays[name]
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    dims = arr.dimension_names()
    flip = False
    crs = ""
    gm_name = arr.attrs.get("grid_mapping")
    if gm_name:
        base = os.path.dirname(arr.path)
        gm_path = os.path.join(base, gm_name)
        gm_attrs = _load_json(os.path.join(gm_path, ".zattrs")) or {}
        crs = _cf_to_epsg(gm_attrs)
    if not dims or len(dims) != 2:
        return gt, crs, flip
    ydim, xdim = dims
    prefix = name.rsplit("/", 1)[0] + "/" if "/" in name else ""
    xdim = xdim if xdim in arrays else prefix + xdim
    ydim = ydim if ydim in arrays else prefix + ydim
    if xdim not in arrays or ydim not in arrays:
        return gt, crs, flip
    x = arrays[xdim].read().astype(np.float64)
    y = arrays[ydim].read().astype(np.float64)
    if len(x) < 2 or len(y) < 2:
        return gt, crs, flip
    dx = float(x[1] - x[0])
    dy = float(y[1] - y[0])
    if dy > 0:  # CF ascending y → flip rows to north-up
        flip = True
        gt = (float(x[0]) - dx / 2, dx, 0.0,
              float(y[-1]) + dy / 2, 0.0, -dy)
    else:
        gt = (float(x[0]) - dx / 2, dx, 0.0,
              float(y[0]) - dy / 2, 0.0, dy)
    return gt, crs, flip


# ---------------------------------------------------------------------------
# Ray Data surface
# ---------------------------------------------------------------------------


def _main_array(arrays: dict, array: str | None, path: str) -> str:
    if array is not None:
        return array
    # main array = the one with the most dimensions, ties by size
    cands = [n for n, a in arrays.items() if len(a.shape) >= 2]
    if not cands:
        raise ValueError(f"no >=2-D array found in {path}")
    return max(cands, key=lambda n: (len(arrays[n].shape),
                                     int(np.prod(arrays[n].shape))))


def read_zarr_array(path: str, array: str | None = None,
                    band_dim: int = 0) -> dict:
    """Whole-store load → the CLI ``load_raster`` dict shape (small
    rasters / CLI tools; the Ray path is ``read_zarr``)."""
    arrays = open_zarr(path)
    array = _main_array(arrays, array, path)
    arr = arrays[array]
    if len(arr.shape) not in (2, 3):
        raise ValueError(f"need a 2-D or 3-D array, got {arr.shape}")
    gt, crs, flip = georeference(arrays, array)
    a = arr.read()
    if len(arr.shape) == 3:
        order = [band_dim] + [d for d in range(3) if d != band_dim]
        a = np.transpose(a, order)
        bands = [np.ascontiguousarray(a[k][::-1] if flip else a[k])
                 for k in range(a.shape[0])]
    else:
        bands = [np.ascontiguousarray(a[::-1] if flip else a)]
    fv = arr.fill_value
    nodata = float(fv) if isinstance(fv, (int, float)) and fv != 0 \
        else None
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata}


def read_zarr(path: str, array: str | None = None, band_dim: int = 0):
    """Zarr store → tile-table Dataset (one row per chunk; one chunk
    decode per task — the driver reads METADATA only).

    2-D arrays map directly (band=1); 3-D arrays treat ``band_dim``
    as the band axis (one tile row per band per chunk). Coordinate
    arrays named by _ARRAY_DIMENSIONS carry the geotransform; a
    recognised CF grid_mapping carries the EPSG code."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.raster import model

    arrays = open_zarr(path)
    array = _main_array(arrays, array, path)
    arr = arrays[array]
    if len(arr.shape) not in (2, 3):
        raise ValueError(f"read_zarr needs a 2-D or 3-D array, "
                         f"got shape {arr.shape}")
    gt, crs, flip = georeference(arrays, array)
    items = [{"zarr_path": arr.path, "idx": list(idx)}
             for idx, _k in arr.chunk_keys()]
    ds = rd.from_items(items)
    h = arr.shape[-2]
    shape = arr.shape
    chunks = arr.chunks
    nd = len(shape)
    bd = band_dim if nd == 3 else None

    def decode(batch: pa.Table) -> pa.Table:
        az = ZarrArray(batch["zarr_path"][0].as_py())
        tables = []
        for item in batch["idx"].to_pylist():
            idx = tuple(item)
            chunk = az.decode_chunk(idx)
            # crop to valid extent
            valid = tuple(
                slice(0, min((i + 1) * c, s) - i * c)
                for i, c, s in zip(idx, chunks, shape))
            chunk = chunk[valid]
            if nd == 2:
                planes = [(1, chunk)]
                iy, ix = idx
            else:
                order = [bd] + [d for d in range(3) if d != bd]
                m = np.transpose(chunk, order)
                b0 = idx[bd] * chunks[bd]
                planes = [(b0 + k + 1, m[k]) for k in range(m.shape[0])]
                rest = [d for d in range(3) if d != bd]
                iy, ix = idx[rest[0]], idx[rest[1]]
            y0 = iy * chunks[-2]
            x0 = ix * chunks[-1]
            for band, plane in planes:
                if flip:
                    plane = plane[::-1]
                    ty0 = h - (y0 + plane.shape[0])
                else:
                    ty0 = y0
                t = model.from_array(
                    np.ascontiguousarray(plane), crs, gt, band=band,
                    tile_size=max(plane.shape))
                t = t.set_column(
                    t.schema.get_field_index("block_x"), "block_x",
                    pa.array([ix] * t.num_rows, pa.int32()))
                t = t.set_column(
                    t.schema.get_field_index("block_y"), "block_y",
                    pa.array([iy] * t.num_rows, pa.int32()))
                t = t.set_column(
                    t.schema.get_field_index("x0"), "x0",
                    pa.array([x0] * t.num_rows, pa.int32()))
                t = t.set_column(
                    t.schema.get_field_index("y0"), "y0",
                    pa.array([ty0] * t.num_rows, pa.int32()))
                tables.append(t)
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# write (v2)
# ---------------------------------------------------------------------------

_EPSG_TO_CF = None


def _epsg_to_cf(crs: str) -> dict | None:
    """Inverse of _cf_to_epsg for the UTM / lat-lon families — enough
    to round-trip the engine's own outputs (full CRS→CF is the
    reference's netcdf/zarr SRS exporter role, out of scope)."""
    if not crs.upper().startswith("EPSG:"):
        return None
    code = int(crs.split(":")[1])
    if code == 4326:
        return {"grid_mapping_name": "latitude_longitude",
                "semi_major_axis": 6378137.0,
                "inverse_flattening": 298.257223563}
    for base, a, invf, south in ((26700, 6378206.4, 294.978698213898, 0),
                                 (26900, 6378137.0, 298.257222101, 0),
                                 (32600, 6378137.0, 298.257223563, 0),
                                 (32700, 6378137.0, 298.257223563, 1)):
        zone = code - base
        if 1 <= zone <= 60:
            return {
                "grid_mapping_name": "transverse_mercator",
                "scale_factor_at_central_meridian": 0.9996,
                "false_easting": 500000.0,
                "false_northing": 10000000.0 if south else 0.0,
                "longitude_of_central_meridian": float(zone * 6 - 183),
                "latitude_of_projection_origin": 0.0,
                "longitude_of_prime_meridian": 0.0,
                "semi_major_axis": a,
                "inverse_flattening": invf,
                "long_name": "CRS definition",
            }
    return None


def _write_json(path: str, obj: dict) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def _zarray_meta(shape, chunks, dtype: np.dtype, compressor) -> dict:
    return {
        "chunks": list(chunks),
        "compressor": compressor,
        "dtype": dtype.newbyteorder("<").str if dtype.itemsize > 1
        else dtype.str.replace("=", "|").replace("<", "|").replace(">", "|"),
        "fill_value": None,
        "filters": None,
        "order": "C",
        "shape": list(shape),
        "zarr_format": 2,
    }


def write_zarr_array(path: str, arr: np.ndarray,
                     chunks: tuple | None = None,
                     attrs: dict | None = None,
                     compressor: str | None = "zlib") -> None:
    """One numpy array → a Zarr v2 array directory (zlib or raw
    chunks). Driver-side helper; the distributed path is
    ``write_zarr_dataset``."""
    os.makedirs(path, exist_ok=True)
    if chunks is None:
        chunks = tuple(min(s, 256) for s in arr.shape) or (1,)
    comp = {"id": "zlib", "level": 6} if compressor == "zlib" else None
    _write_json(os.path.join(path, ".zarray"),
                _zarray_meta(arr.shape, chunks, arr.dtype, comp))
    if attrs:
        _write_json(os.path.join(path, ".zattrs"), attrs)
    import itertools

    grid = tuple(-(-s // c) for s, c in zip(arr.shape, chunks)) or ()
    for idx in itertools.product(*(range(g) for g in grid)):
        sl = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks))
        block = np.zeros(chunks, arr.dtype)
        sub = arr[sl]
        block[tuple(slice(0, s) for s in sub.shape)] = sub
        raw = np.ascontiguousarray(
            block.astype(arr.dtype.newbyteorder("<"))).tobytes()
        if comp:
            raw = zlib.compress(raw, comp["level"])
        key = ".".join(str(i) for i in idx) if idx else "0"
        with open(os.path.join(path, key), "wb") as f:
            f.write(raw)


def write_zarr(path: str, bands, crs: str = "",
               geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
               chunks: tuple = (256, 256),
               compressor: str | None = "zlib") -> None:
    """Bands → CF-style Zarr v2 group (the byte_cf1 fixture layout:
    Band{N} arrays with _ARRAY_DIMENSIONS + grid_mapping, ascending
    x/y pixel-center coordinate arrays, a grid-mapping variable).
    Round-trips through open_zarr/georeference bit-exactly."""
    if isinstance(bands, np.ndarray) and bands.ndim == 2:
        bands = [bands]
    h, w = bands[0].shape
    gt = geotransform
    if gt[2] or gt[4]:
        raise ValueError("rotated geotransforms not supported")
    os.makedirs(path, exist_ok=True)
    _write_json(os.path.join(path, ".zgroup"), {"zarr_format": 2})
    _write_json(os.path.join(path, ".zattrs"), {})
    x = gt[0] + gt[1] / 2.0 + np.arange(w) * gt[1]
    # CF stores ascending y (south-up); the reader flips back
    rows_y = gt[3] + gt[5] / 2.0 + np.arange(h) * gt[5]
    y = rows_y[::-1].copy()
    write_zarr_array(os.path.join(path, "x"), x, (w,), {
        "_ARRAY_DIMENSIONS": ["x"],
        "standard_name": "projection_x_coordinate"}, compressor=None)
    write_zarr_array(os.path.join(path, "y"), y, (h,), {
        "_ARRAY_DIMENSIONS": ["y"],
        "standard_name": "projection_y_coordinate"}, compressor=None)
    cf = _epsg_to_cf(crs)
    band_attrs = {"_ARRAY_DIMENSIONS": ["y", "x"]}
    if cf:
        write_zarr_array(os.path.join(path, "crs_def"),
                         np.zeros((), np.uint8), None, cf,
                         compressor=None)
        band_attrs["grid_mapping"] = "crs_def"
    for bi, b in enumerate(bands, start=1):
        write_zarr_array(os.path.join(path, f"Band{bi}"), b[::-1],
                         chunks, dict(band_attrs), compressor=compressor)


def write_zarr_dataset(ds, path: str, compressor: str | None = "zlib"):
    """Tile-table Dataset → Zarr v2 store, DISTRIBUTED: every task
    writes only its own chunk files (named ``y.x`` per the spec), so
    the sink is embarrassingly parallel and resumable — rewriting a
    chunk is idempotent, and a restarted run just overwrites the
    chunks it owns. The driver writes the O(bands) metadata JSONs
    from the first row + global extents (one tiny aggregate).

    Requires a uniform tile grid (every row the same tile size, the
    raster/model.py contract). Rows must carry band/block_x/block_y/
    width/height/dtype/data + crs/geotransform."""
    import pyarrow as pa

    first = ds.take(1)[0]
    gt = tuple(first["geotransform"])
    crs = first["crs"]
    dt = np.dtype(first["dtype"])
    from ray.data.aggregate import Max

    ext = ds.aggregate(Max("band", alias_name="nb"),
                       Max("x0", alias_name="mx"),
                       Max("y0", alias_name="my"),
                       Max("width", alias_name="w"),
                       Max("height", alias_name="h"))
    tile = max(int(ext["w"]), int(ext["h"]))
    width = int(ext["mx"]) + int(ext["w"])
    height = int(ext["my"]) + int(ext["h"])
    nbands = int(ext["nb"])
    grid_h = -(-height // tile)
    comp = {"id": "zlib", "level": 6} if compressor == "zlib" else None

    # metadata + coordinate arrays (driver, tiny)
    os.makedirs(path, exist_ok=True)
    _write_json(os.path.join(path, ".zgroup"), {"zarr_format": 2})
    cf = _epsg_to_cf(crs)
    band_attrs = {"_ARRAY_DIMENSIONS": ["y", "x"]}
    if cf:
        write_zarr_array(os.path.join(path, "crs_def"),
                         np.zeros((), np.uint8), None, cf,
                         compressor=None)
        band_attrs["grid_mapping"] = "crs_def"
    x = gt[0] + gt[1] / 2.0 + np.arange(width) * gt[1]
    y = (gt[3] + gt[5] / 2.0 + np.arange(height) * gt[5])[::-1].copy()
    write_zarr_array(os.path.join(path, "x"), x, (width,), {
        "_ARRAY_DIMENSIONS": ["x"],
        "standard_name": "projection_x_coordinate"}, compressor=None)
    write_zarr_array(os.path.join(path, "y"), y, (height,), {
        "_ARRAY_DIMENSIONS": ["y"],
        "standard_name": "projection_y_coordinate"}, compressor=None)
    for bi in range(1, nbands + 1):
        bdir = os.path.join(path, f"Band{bi}")
        os.makedirs(bdir, exist_ok=True)
        _write_json(os.path.join(bdir, ".zarray"),
                    _zarray_meta((height, width), (tile, tile), dt, comp))
        _write_json(os.path.join(bdir, ".zattrs"), dict(band_attrs))

    def write_chunks(t: pa.Table) -> pa.Table:
        for row in t.to_pylist():
            arr = np.frombuffer(row["data"], row["dtype"]).reshape(
                row["height"], row["width"])
            block = np.zeros((tile, tile), dt)
            # CF south-up: the store's row 0 is the SOUTH edge
            block[: arr.shape[0], : arr.shape[1]] = arr
            flipped = block[::-1]
            cy = grid_h - 1 - row["block_y"]
            raw = np.ascontiguousarray(
                flipped.astype(dt.newbyteorder("<"))).tobytes()
            if comp:
                raw = zlib.compress(raw, comp["level"])
            fp = os.path.join(path, f"Band{row['band']}",
                              f"{cy}.{row['block_x']}")
            tmp = fp + ".tmp"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, fp)
        return pa.table({"chunks_written": pa.array([t.num_rows])})

    counts = ds.map_batches(write_chunks, batch_format="pyarrow")
    return sum(r["chunks_written"] for r in counts.take_all())
