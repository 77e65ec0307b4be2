"""WKT read/write for the engine's geometry model — the OGR
ImportFromWkt/ExportToWkt surface (reference: ogr/ogrgeometryfactory
createFromWkt; 2-D subset matching the WKB model: Point, LineString,
Polygon, Multi*, GeometryCollection)."""

from __future__ import annotations

import re

import numpy as np

from gdal_ray.geom import wkb as gwkb

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _fmt(v: float) -> str:
    # shortest round-trip representation (OGR prints %.15g-like).
    # repr() is Python's shortest round-trip float repr; never strip
    # characters from a string that may carry an exponent (stripping
    # '0' off '1.5e-10' would corrupt the value).
    v = float(v)
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _coords_to_wkt(c: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c)


def to_wkt(buf: bytes) -> str:
    """WKB → WKT."""
    g = gwkb.parse(buf)
    t = g["type"]
    if t == gwkb.POINT:
        x, y = g["coords"][0]
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if t == gwkb.LINESTRING:
        return f"LINESTRING ({_coords_to_wkt(g['coords'])})"
    if t == gwkb.POLYGON:
        rings = ", ".join(f"({_coords_to_wkt(r)})" for r in g["rings"])
        return f"POLYGON ({rings})"
    if t == gwkb.MULTIPOINT:
        pts = ", ".join(
            f"({_fmt(p['coords'][0][0])} {_fmt(p['coords'][0][1])})"
            for p in g["parts"]
        )
        return f"MULTIPOINT ({pts})"
    if t == gwkb.MULTILINESTRING:
        ls = ", ".join(f"({_coords_to_wkt(p['coords'])})" for p in g["parts"])
        return f"MULTILINESTRING ({ls})"
    if t == gwkb.MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_coords_to_wkt(r)})" for r in p["rings"]) + ")"
            for p in g["parts"]
        )
        return f"MULTIPOLYGON ({polys})"
    if t == gwkb.GEOMETRYCOLLECTION:
        parts = ", ".join(to_wkt(_part_to_wkb(p)) for p in g["parts"])
        return f"GEOMETRYCOLLECTION ({parts})"
    raise ValueError(f"unsupported geometry type {t}")


def _part_to_wkb(parsed: dict) -> bytes:
    if parsed["type"] == gwkb.POINT:
        return gwkb.point_wkb(*parsed["coords"][0])
    if parsed["type"] == gwkb.LINESTRING:
        return gwkb.linestring_wkb(parsed["coords"])
    if parsed["type"] == gwkb.POLYGON:
        return gwkb.polygon_wkb(parsed["rings"][0], parsed["rings"][1:])
    raise ValueError("unsupported collection part")


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def word(self) -> str:
        self.ws()
        m = re.match(r"[A-Za-z]+", self.s[self.i:])
        if not m:
            raise ValueError(f"WKT: expected keyword at {self.s[self.i:self.i+20]!r}")
        self.i += m.end()
        return m.group().upper()

    def expect(self, ch: str):
        self.ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(f"WKT: expected {ch!r} at {self.s[self.i:self.i+20]!r}")
        self.i += 1

    def accept(self, ch: str) -> bool:
        self.ws()
        if self.i < len(self.s) and self.s[self.i] == ch:
            self.i += 1
            return True
        return False

    def number(self) -> float:
        self.ws()
        m = re.match(_NUM, self.s[self.i:])
        if not m:
            raise ValueError(f"WKT: expected number at {self.s[self.i:self.i+20]!r}")
        self.i += m.end()
        return float(m.group())

    def coords(self) -> np.ndarray:
        self.expect("(")
        out = []
        while True:
            x = self.number()
            y = self.number()
            out.append((x, y))
            if not self.accept(","):
                break
        self.expect(")")
        return np.array(out, dtype=np.float64)


def from_wkt(wkt: str) -> bytes:
    """WKT → WKB."""
    p = _P(wkt)
    return _parse_geom(p)


def _parse_geom(p: _P) -> bytes:
    kind = p.word()
    if kind == "POINT":
        c = p.coords()
        return gwkb.point_wkb(c[0][0], c[0][1])
    if kind == "LINESTRING":
        return gwkb.linestring_wkb(p.coords())
    if kind == "POLYGON":
        p.expect("(")
        rings = [p.coords()]
        while p.accept(","):
            rings.append(p.coords())
        p.expect(")")
        return gwkb.polygon_wkb(rings[0], rings[1:])
    if kind == "MULTIPOINT":
        p.expect("(")
        pts = []
        while True:
            if p.accept("("):
                x = p.number()
                y = p.number()
                p.expect(")")
            else:
                x = p.number()
                y = p.number()
            pts.append((x, y))
            if not p.accept(","):
                break
        p.expect(")")
        from gdal_ray.geom.wkb import geometrycollection_wkb  # noqa: F401

        import struct

        body = b"".join(gwkb.point_wkb(x, y) for x, y in pts)
        return (
            b"\x01" + struct.pack("<I", gwkb.MULTIPOINT)
            + struct.pack("<I", len(pts)) + body
        )
    if kind == "MULTILINESTRING":
        p.expect("(")
        parts = [p.coords()]
        while p.accept(","):
            parts.append(p.coords())
        p.expect(")")
        import struct

        body = b"".join(gwkb.linestring_wkb(c) for c in parts)
        return (
            b"\x01" + struct.pack("<I", gwkb.MULTILINESTRING)
            + struct.pack("<I", len(parts)) + body
        )
    if kind == "MULTIPOLYGON":
        p.expect("(")
        polys = []
        while True:
            p.expect("(")
            rings = [p.coords()]
            while p.accept(","):
                rings.append(p.coords())
            p.expect(")")
            polys.append((rings[0], rings[1:]))
            if not p.accept(","):
                break
        p.expect(")")
        return gwkb.multipolygon_wkb(polys)
    if kind == "GEOMETRYCOLLECTION":
        p.expect("(")
        parts = [_parse_geom(p)]
        while p.accept(","):
            parts.append(_parse_geom(p))
        p.expect(")")
        return gwkb.geometrycollection_wkb(parts)
    raise ValueError(f"unsupported WKT type {kind}")


# --- vectorized point-column WKT (Arrow kernels, no per-row Python) ----


def points_to_wkt(lon, lat):
    """lon/lat columns → ``POINT (x y)`` StringArray in one Arrow pass.
    Arrow's double→string cast is a shortest-round-trip formatter (Ryu,
    same contract as ``_fmt``'s repr()), so ``points_from_wkt`` returns
    the exact input doubles.  The scalar ``to_wkt`` stays the general
    path; this is the columnar fast path for point layers (the r2
    verdict's WKT-kernel perf item)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lon = lon if isinstance(lon, (pa.Array, pa.ChunkedArray)) else pa.array(
        np.asarray(lon, np.float64))
    lat = lat if isinstance(lat, (pa.Array, pa.ChunkedArray)) else pa.array(
        np.asarray(lat, np.float64))
    return pc.binary_join_element_wise(
        "POINT (", pc.cast(lon, pa.string()), " ",
        pc.cast(lat, pa.string()), ")", "",
    )


def points_from_wkt(arr):
    """``POINT (x y)`` StringArray → (lon, lat) float64 arrays, one
    Arrow pass (split + trim + correctly-rounded string→double cast)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sp = pc.split_pattern(arr, " ")
    lon = pc.cast(pc.utf8_trim(pc.list_element(sp, 1), "("), pa.float64())
    lat = pc.cast(pc.utf8_trim(pc.list_element(sp, 2), ")"), pa.float64())
    return lon, lat
