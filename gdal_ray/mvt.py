"""Mapbox Vector Tiles (MVT 2.1) encoder/decoder, stdlib-only.

Reference role: ogr/ogrsf_frmts/mvt (GDAL's MVT write driver used by
`ogr2ogr -f MVT` and the `gdal vector tile` pipeline). The wire format
is protobuf (vector_tile.proto); this module hand-rolls the subset the
spec uses — varints, zigzag deltas, length-delimited messages — and
the geometry command stream (MoveTo/LineTo/ClosePath), validated
against the worked examples in the MVT 2.1 specification (e.g.
Point(25,17) → [9, 50, 34]).

Layer schema: features carry ``geom_type`` ∈ {1 point, 2 linestring,
3 polygon}, integer tile coordinates (0..extent), and flat str→
(str|int|float|bool) properties. Keys/values are deduplicated into
the layer tables exactly like the reference writer.
"""

from __future__ import annotations

import struct

__all__ = ["encode_tile", "decode_tile", "CMD_MOVE", "CMD_LINE", "CMD_CLOSE"]

CMD_MOVE, CMD_LINE, CMD_CLOSE = 1, 2, 7


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed_varints(field: int, vals) -> bytes:
    body = b"".join(_varint(int(v)) for v in vals)
    return _len_delim(field, body)


def _geometry_commands(geom_type: int, parts: list[list[tuple[int, int]]]):
    """Parts (rings / lines / [points]) → MVT command integers with
    cursor-relative zigzag deltas."""
    cmds: list[int] = []
    cx = cy = 0
    if geom_type == 1:  # point(s): one MoveTo with count
        pts = [p for part in parts for p in part]
        cmds.append((CMD_MOVE) | (len(pts) << 3))
        for x, y in pts:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        return cmds
    for part in parts:
        if len(part) < 2:
            continue
        cmds.append(CMD_MOVE | (1 << 3))
        x, y = part[0]
        cmds += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
        rest = part[1:]
        if geom_type == 3 and rest and rest[-1] == part[0]:
            rest = rest[:-1]  # implicit closure via ClosePath
        cmds.append(CMD_LINE | (len(rest) << 3))
        for x, y in rest:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        if geom_type == 3:
            cmds.append(CMD_CLOSE | (1 << 3))
    return cmds


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(4, 0) + _varint(v if v >= 0 else (v + (1 << 64)))
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    s = str(v).encode("utf-8")
    return _tag(1, 2) + _varint(len(s)) + s


def encode_tile(layers: dict[str, list[dict]], extent: int = 4096) -> bytes:
    """{layer_name: [ {geom_type, parts, properties} ]} → tile bytes.

    ``parts``: list of coordinate lists (one per ring / line; points
    may pass a single list)."""
    out = bytearray()
    for name, feats in layers.items():
        keys: list[str] = []
        vals: list = []
        kidx: dict = {}
        vidx: dict = {}
        fbodies = []
        for fid, f in enumerate(feats):
            tags = []
            for k, v in (f.get("properties") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(vals)
                    vals.append(v)
                tags += [kidx[k], vidx[vk]]
            body = bytearray()
            body += _tag(1, 0) + _varint(fid + 1)  # id
            if tags:
                body += _packed_varints(2, tags)
            body += _tag(3, 0) + _varint(f["geom_type"])
            body += _packed_varints(
                4, _geometry_commands(f["geom_type"], f["parts"])
            )
            fbodies.append(bytes(body))
        layer = bytearray()
        layer += _tag(15, 0) + _varint(2)  # version 2
        layer += _len_delim(1, name.encode("utf-8"))
        for fb in fbodies:
            layer += _len_delim(2, fb)
        for k in keys:
            layer += _len_delim(3, k.encode("utf-8"))
        for v in vals:
            layer += _len_delim(4, _encode_value(v))
        layer += _tag(5, 0) + _varint(extent)
        out += _len_delim(3, bytes(layer))
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (verification surface for tests + a read driver)
# ---------------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _fields(data: bytes):
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
        elif wire == 1:
            v = data[pos : pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            v = data[pos : pos + ln]
            pos += ln
        elif wire == 5:
            v = data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wire}")
        yield field, wire, v


def _decode_value(data: bytes):
    for field, _w, v in _fields(data):
        if field == 1:
            return v.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field in (4, 5):
            return v if v < (1 << 63) else v - (1 << 64)
        if field == 6:
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    return None


def _decode_geometry(geom_type: int, cmds: list[int]):
    parts = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i] & 7
        count = cmds[i] >> 3
        i += 1
        if cmd == CMD_MOVE:
            if cur and geom_type != 1:
                parts.append(cur)
                cur = []
            for _ in range(count):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd == CMD_LINE:
            for _ in range(count):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd == CMD_CLOSE:
            if cur:
                cur.append(cur[0])
                parts.append(cur)
                cur = []
    if cur:
        parts.append(cur)
    return parts


def decode_tile(data: bytes) -> dict:
    """Tile bytes → {layer: {"extent", "features": [...]}} (inverse of
    encode_tile; also serves as an MVT read driver)."""
    out = {}
    for field, _w, payload in _fields(data):
        if field != 3:
            continue
        name = ""
        extent = 4096
        keys: list[str] = []
        vals: list = []
        raw_feats = []
        for lf, _lw, lv in _fields(payload):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                vals.append(_decode_value(lv))
            elif lf == 5:
                extent = lv
        feats = []
        for fb in raw_feats:
            gt = 0
            tags: list[int] = []
            cmds: list[int] = []
            fid = None
            for ff, fw, fv in _fields(fb):
                if ff == 1:
                    fid = fv
                elif ff == 2:
                    pos = 0
                    while pos < len(fv):
                        t, pos = _read_varint(fv, pos)
                        tags.append(t)
                elif ff == 3:
                    gt = fv
                elif ff == 4:
                    pos = 0
                    while pos < len(fv):
                        c, pos = _read_varint(fv, pos)
                        cmds.append(c)
            props = {
                keys[tags[i]]: vals[tags[i + 1]]
                for i in range(0, len(tags), 2)
            }
            feats.append(
                {
                    "id": fid,
                    "geom_type": gt,
                    "parts": _decode_geometry(gt, cmds),
                    "properties": props,
                }
            )
        out[name] = {"extent": extent, "features": feats}
    return out


# ---------------------------------------------------------------------------
# Dataset-level z/x/y.mvt sink (gdal vector tile / MVT dataset-write role)
# ---------------------------------------------------------------------------


def write_mvt_tiles(
    ds,
    out_dir: str,
    zoom: int,
    layer: str = "points",
    lon_col: str = "lon",
    lat_col: str = "lat",
    property_cols: list[str] | None = None,
    extent: int = 4096,
    num_partitions: int = 8,
) -> int:
    """Point Dataset → ``{out_dir}/{z}/{x}/{y}.mvt`` tree (atomic
    writes). One groupby(tile) shuffle; each group task encodes and
    writes its tile independently (resumable: rerun skips nothing but
    rewrites identical bytes). Returns the number of tiles written."""
    import math
    import os

    import numpy as np
    import pyarrow as pa

    n2 = 1 << zoom
    props = property_cols or []

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = np.clip(
            batch[lat_col].to_numpy(zero_copy_only=False), -85.05112878,
            85.05112878,
        )
        xf = (lon + 180.0) / 360.0 * n2
        yf = (
            (1.0 - np.arcsinh(np.tan(np.radians(lat))) / math.pi) / 2.0 * n2
        )
        tx = np.clip(np.floor(xf).astype(np.int64), 0, n2 - 1)
        ty = np.clip(np.floor(yf).astype(np.int64), 0, n2 - 1)
        px = np.clip(((xf - tx) * extent).astype(np.int64), 0, extent - 1)
        py = np.clip(((yf - ty) * extent).astype(np.int64), 0, extent - 1)
        cols = {c: batch[c] for c in props}
        cols.update(
            {"__tx": pa.array(tx), "__ty": pa.array(ty),
             "__px": pa.array(px), "__py": pa.array(py)}
        )
        return pa.table(cols)

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def write_tile(group: pa.Table) -> pa.Table:
        tx = int(group["__tx"][0].as_py())
        ty = int(group["__ty"][0].as_py())
        feats = []
        pxs = group["__px"].to_pylist()
        pys = group["__py"].to_pylist()
        pcols = {c: group[c].to_pylist() for c in props}
        for i in range(group.num_rows):
            feats.append(
                {
                    "geom_type": 1,
                    "parts": [[(pxs[i], pys[i])]],
                    "properties": {c: pcols[c][i] for c in props},
                }
            )
        data = encode_tile({layer: feats}, extent=extent)
        d = os.path.join(out_dir, str(zoom), str(tx))
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{ty}.mvt.tmp.{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(d, f"{ty}.mvt"))
        return pa.table({"z": [zoom], "x": [tx], "y": [ty],
                         "n_features": [group.num_rows]})

    manifest = assigned.groupby(
        ["__tx", "__ty"], num_partitions=num_partitions
    ).map_groups(write_tile, batch_format="pyarrow")
    return manifest.count()
