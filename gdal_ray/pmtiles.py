"""PMTiles v3 — single-file tile archive (read + write).

The modern distribution form of the z/x/y pyramid the engine already
emits (pipelines/tilepyramid.py writes trees; this writes ONE
range-readable file). From-scratch implementation of the public spec
(github.com/protomaps/PMTiles, spec/v3): 127-byte header, Hilbert
tile ids, varint delta-encoded directories (gzip), optional leaf
directories, clustered tile data with content dedup via run-length
entries.

Reference role: `gdal raster tile` output formats; the reference has
no PMTiles driver — this extends the tiling surface (SURVEY.md §2.10)
the same way MVT did.

Ray shape: the archive is inherently one file, so the writer is a
driver FUNNEL over a Dataset sorted by tile id (the arrowipc.py
single-file precedent): tile bytes stream through `iter_batches()`
in clustered order and are appended incrementally — driver memory is
O(directory entries), never O(tile bytes). The reader is
header+directory-only on the driver; tile payloads are pread by
tasks (the flatgeobuf.py sharding pattern).
"""

from __future__ import annotations

import gzip
import hashlib
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"PMTiles"
HEADER_LEN = 127

# tile types (spec §3)
TYPE_UNKNOWN, TYPE_MVT, TYPE_PNG, TYPE_JPEG, TYPE_WEBP, TYPE_AVIF = range(6)
COMP_UNKNOWN, COMP_NONE, COMP_GZIP = 0, 1, 2


# ---------------------------------------------------------------------------
# tile id <-> z/x/y (zoom-major, Hilbert within zoom)


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
        raise ValueError(f"tile ({x},{y}) out of range for z{z}")
    acc = ((1 << (2 * z)) - 1) // 3  # sum of 4^i for i < z
    # standard Hilbert xy -> d with rotations
    d = 0
    s = (1 << z) >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return acc + d


def tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    z = 0
    while tid >= (1 << (2 * z)):
        tid -= 1 << (2 * z)
        z += 1
    d = tid
    x = y = 0
    s = 1
    while s < (1 << z):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s <<= 1
    return z, x, y


# ---------------------------------------------------------------------------
# varint + directory codec (spec §4)


def _write_varint(buf: bytearray, v: int) -> None:
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries = [(tile_id, offset, length, run_length)] sorted by id."""
    buf = bytearray()
    _write_varint(buf, len(entries))
    last = 0
    for tid, _o, _l, _r in entries:
        _write_varint(buf, tid - last)
        last = tid
    for _t, _o, _l, r in entries:
        _write_varint(buf, r)
    for _t, _o, length, _r in entries:
        _write_varint(buf, length)
    prev_off = prev_len = None
    for _t, off, length, _r in entries:
        if prev_off is not None and off == prev_off + prev_len:
            _write_varint(buf, 0)
        else:
            _write_varint(buf, off + 1)
        prev_off, prev_len = off, length
    return gzip.compress(bytes(buf), mtime=0)


def deserialize_directory(data: bytes) -> list[tuple[int, int, int, int]]:
    raw = gzip.decompress(data)
    pos = 0
    n, pos = _read_varint(raw, pos)
    tids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(raw, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        r, pos = _read_varint(raw, pos)
        runs.append(r)
    for _ in range(n):
        ln, pos = _read_varint(raw, pos)
        lens.append(ln)
    for i in range(n):
        o, pos = _read_varint(raw, pos)
        offs.append(offs[i - 1] + lens[i - 1] if o == 0 else o - 1)
    return list(zip(tids, offs, lens, runs))


# ---------------------------------------------------------------------------
# header


def _pack_header(fields: dict) -> bytes:
    h = bytearray(HEADER_LEN)
    h[0:7] = MAGIC
    h[7] = 3
    struct.pack_into(
        "<QQQQQQQQQQQ", h, 8,
        fields["root_off"], fields["root_len"],
        fields["meta_off"], fields["meta_len"],
        fields["leaf_off"], fields["leaf_len"],
        fields["data_off"], fields["data_len"],
        fields["n_addressed"], fields["n_entries"], fields["n_contents"],
    )
    h[96] = 1 if fields.get("clustered", True) else 0
    h[97] = COMP_GZIP        # internal (directory/metadata) compression
    h[98] = fields.get("tile_compression", COMP_NONE)
    h[99] = fields.get("tile_type", TYPE_UNKNOWN)
    h[100] = fields.get("min_zoom", 0)
    h[101] = fields.get("max_zoom", 0)
    struct.pack_into(
        "<iiii", h, 102,
        int(fields.get("min_lon", -180.0) * 1e7),
        int(fields.get("min_lat", -85.0511288) * 1e7),
        int(fields.get("max_lon", 180.0) * 1e7),
        int(fields.get("max_lat", 85.0511288) * 1e7),
    )
    h[118] = fields.get("center_zoom", fields.get("min_zoom", 0))
    struct.pack_into("<ii", h, 119,
                     int(fields.get("center_lon", 0.0) * 1e7),
                     int(fields.get("center_lat", 0.0) * 1e7))
    return bytes(h)


def _parse_header(h: bytes) -> dict:
    if h[0:7] != MAGIC or h[7] != 3:
        raise ValueError("not a PMTiles v3 file")
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len, n_addr, n_entries, n_contents) = struct.unpack_from(
        "<QQQQQQQQQQQ", h, 8)
    minlon, minlat, maxlon, maxlat = struct.unpack_from("<iiii", h, 102)
    return {
        "root_off": root_off, "root_len": root_len,
        "meta_off": meta_off, "meta_len": meta_len,
        "leaf_off": leaf_off, "leaf_len": leaf_len,
        "data_off": data_off, "data_len": data_len,
        "n_addressed": n_addr, "n_entries": n_entries,
        "n_contents": n_contents,
        "clustered": bool(h[96]), "internal_compression": h[97],
        "tile_compression": h[98], "tile_type": h[99],
        "min_zoom": h[100], "max_zoom": h[101],
        "bounds": (minlon / 1e7, minlat / 1e7, maxlon / 1e7, maxlat / 1e7),
    }


# ---------------------------------------------------------------------------
# writer


def write_pmtiles(path: str, tiles, tile_type: int = TYPE_PNG,
                  metadata: bytes = b"{}",
                  max_root_entries: int = 16384,
                  tile_compression: int = COMP_NONE) -> dict:
    """Write an archive from ``tiles``: an iterable of
    ``(z, x, y, bytes)`` OR a ``ray.data.Dataset`` with columns
    ``z, x, y, data``. A Dataset is sorted by tile id DISTRIBUTED and
    streamed through ``iter_batches`` — driver memory is
    O(directory), not O(tile bytes). Identical tile contents are
    written once (content-hash dedup; adjacent ids fold into
    run-length entries — the clustered layout)."""
    import ray.data as rd

    if isinstance(tiles, rd.Dataset):
        def add_tid(t: pa.Table) -> pa.Table:
            tid = [zxy_to_tileid(z, x, y) for z, x, y in
                   zip(t["z"].to_pylist(), t["x"].to_pylist(),
                       t["y"].to_pylist())]
            return t.append_column("__tid", pa.array(tid, pa.int64()))

        stream = tiles.map_batches(add_tid, batch_format="pyarrow") \
            .sort("__tid").iter_batches(batch_format="pyarrow")

        def gen():
            for b in stream:
                for tid, data in zip(b["__tid"].to_pylist(),
                                     b["data"].to_pylist()):
                    yield tid, data
        items = gen()
    else:
        items = iter(sorted(
            (zxy_to_tileid(z, x, y), d) for z, x, y, d in tiles))

    entries: list[tuple[int, int, int, int]] = []
    by_hash: dict[bytes, tuple[int, int]] = {}
    data_buf_path = path + ".data.tmp"
    n_addressed = 0
    zmin, zmax = 99, 0
    with open(data_buf_path, "wb") as df:
        pos = 0
        for tid, data in items:
            n_addressed += 1
            z = tileid_to_zxy(tid)[0]
            zmin, zmax = min(zmin, z), max(zmax, z)
            if tile_compression == COMP_GZIP:
                data = gzip.compress(data, mtime=0)
            hkey = hashlib.sha1(data).digest()
            if hkey in by_hash:
                off, ln = by_hash[hkey]
            else:
                df.write(data)
                off, ln = pos, len(data)
                pos += ln
                by_hash[hkey] = (off, ln)
            if (entries and entries[-1][1] == off
                    and entries[-1][0] + entries[-1][3] == tid):
                e = entries[-1]   # adjacent id, same content: extend run
                entries[-1] = (e[0], e[1], e[2], e[3] + 1)
            else:
                entries.append((tid, off, ln, 1))
        data_len = pos

    # root/leaf split
    if len(entries) <= max_root_entries:
        root = serialize_directory(entries)
        leaves = b""
    else:
        per_leaf = max_root_entries
        root_entries = []
        chunks = []
        leaf_pos = 0
        for i in range(0, len(entries), per_leaf):
            leaf = serialize_directory(entries[i : i + per_leaf])
            root_entries.append((entries[i][0], leaf_pos, len(leaf), 0))
            chunks.append(leaf)
            leaf_pos += len(leaf)
        root = serialize_directory(root_entries)
        leaves = b"".join(chunks)

    meta = gzip.compress(metadata, mtime=0)
    root_off = HEADER_LEN
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off + len(leaves)
    header = _pack_header({
        "root_off": root_off, "root_len": len(root),
        "meta_off": meta_off, "meta_len": len(meta),
        "leaf_off": leaf_off, "leaf_len": len(leaves),
        "data_off": data_off, "data_len": data_len,
        "n_addressed": n_addressed, "n_entries": len(entries),
        "n_contents": len(by_hash),
        "tile_type": tile_type, "tile_compression": tile_compression,
        "min_zoom": zmin if n_addressed else 0,
        "max_zoom": zmax if n_addressed else 0,
    })
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta)
        f.write(leaves)
        with open(data_buf_path, "rb") as df:
            while True:
                chunk = df.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    os.remove(data_buf_path)
    os.replace(tmp, path)
    return {"entries": len(entries), "contents": len(by_hash),
            "addressed": n_addressed}


# ---------------------------------------------------------------------------
# reader


class PMTilesReader:
    """Range-read access: header + root directory parsed once; leaf
    directories fetched on demand; tile payloads pread per request."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self.header = _parse_header(f.read(HEADER_LEN))
            f.seek(self.header["root_off"])
            self.root = deserialize_directory(
                f.read(self.header["root_len"]))
        self._leaf_cache: dict[int, list] = {}

    def _pread(self, off: int, ln: int) -> bytes:
        with open(self.path, "rb") as f:
            f.seek(off)
            return f.read(ln)

    def metadata(self) -> bytes:
        return gzip.decompress(
            self._pread(self.header["meta_off"], self.header["meta_len"]))

    @staticmethod
    def _find(entries, tid):
        """Last entry with id ≤ tid; match if tid falls in its run,
        or unconditionally for a leaf pointer (run 0)."""
        lo, hi = 0, len(entries) - 1
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            if entries[mid][0] <= tid:
                best = entries[mid]
                lo = mid + 1
            else:
                hi = mid - 1
        if best is None:
            return None
        if best[3] == 0 or tid < best[0] + best[3]:
            return best
        return None

    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        tid = zxy_to_tileid(z, x, y)
        e = self._find(self.root, tid)
        if e is None:
            return None
        if e[3] == 0:  # leaf directory
            if e[1] not in self._leaf_cache:
                self._leaf_cache[e[1]] = deserialize_directory(
                    self._pread(self.header["leaf_off"] + e[1], e[2]))
            e = self._find(self._leaf_cache[e[1]], tid)
            if e is None or e[3] == 0:
                return None
        data = self._pread(self.header["data_off"] + e[1], e[2])
        if self.header["tile_compression"] == COMP_GZIP:
            data = gzip.decompress(data)
        return data

    def entries(self) -> list[tuple[int, int, int, int]]:
        """Flattened (tile_id, offset, length, run) tile entries."""
        out = []
        for e in self.root:
            if e[3] == 0:
                out.extend(deserialize_directory(
                    self._pread(self.header["leaf_off"] + e[1], e[2])))
            else:
                out.append(e)
        return out


def read_pmtiles(path: str):
    """Archive → Dataset of (z, x, y, data): the driver reads only
    header + directories; payload preads run in tasks sharded over
    entries (flatgeobuf.py pattern)."""
    import ray.data as rd

    r = PMTilesReader(path)
    data_off = r.header["data_off"]
    ents = [{"tid": e[0], "off": e[1], "len": e[2], "run": e[3]}
            for e in r.entries()]

    comp = r.header["tile_compression"]

    def fetch(batch: pa.Table) -> pa.Table:
        rows = []
        with open(path, "rb") as f:
            for e in batch.to_pylist():
                f.seek(data_off + e["off"])
                data = f.read(e["len"])
                if comp == COMP_GZIP:
                    data = gzip.decompress(data)
                for k in range(e["run"]):
                    z, x, y = tileid_to_zxy(e["tid"] + k)
                    rows.append({"z": z, "x": x, "y": y, "data": data})
        return pa.Table.from_pylist(rows)

    return rd.from_items(ents).map_batches(fetch, batch_format="pyarrow")
