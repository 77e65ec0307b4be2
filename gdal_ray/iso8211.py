"""ISO/IEC 8211 (DDF) reader — the frmts/iso8211 role.

Generic parser for the self-describing interchange format used by
S-57 ENC charts and SDTS (reference roles: frmts/iso8211/ddfmodule.cpp
leader/directory, ddffielddefn.cpp format controls, ddfrecord.cpp
data decode).  From-scratch: the leader/directory/field layouts are
the published ISO 8211 standard; the binary `bXY` subfield forms are
the S-57 annex.

Structure: each record = 24-byte leader (5-digit record length,
interchange level, leader id 'L' (DDR) / 'D'|' ' (DR), 5-digit field
area base address, entry map: field-length size, field-position size,
reserved, tag size) + directory (tag/len/pos triplets, 0x1E
terminated) + field area.  The DDR declares, per field tag, the
subfield labels ('!'-separated, leading '*' = repeating group) and
format controls ("(b11,2b24,A(8),R)"): A/I/R = ASCII (fixed width or
0x1F-terminated), bXY = little-endian binary int (X=1 unsigned,
2 signed; Y bytes), B(n) = n bits raw.
"""
from __future__ import annotations

import struct

UT = 0x1F  # unit terminator
FT = 0x1E  # field terminator


class FieldDefn:
    __slots__ = ("tag", "name", "labels", "formats", "repeating")

    def __init__(self, tag: str, name: str, labels: list[str],
                 formats: list[tuple], repeating: bool):
        self.tag = tag
        self.name = name
        self.labels = labels
        self.formats = formats
        self.repeating = repeating


def _parse_formats(spec: str) -> list[tuple]:
    """Format controls string → [(kind, width), ...] expanded."""
    spec = spec.strip()
    if spec.startswith("(") and spec.endswith(")"):
        spec = spec[1:-1]
    out: list[tuple] = []
    i = 0
    n = len(spec)
    while i < n:
        c = spec[i]
        if c == ",":
            i += 1
            continue
        rep = 0
        while i < n and spec[i].isdigit():
            rep = rep * 10 + int(spec[i])
            i += 1
        rep = max(1, rep)
        if i >= n:
            break
        kind = spec[i]
        i += 1
        width = None
        if kind == "b":
            width = int(spec[i:i + 2])
            i += 2
        elif i < n and spec[i] == "(":
            j = spec.index(")", i)
            width = int(spec[i + 1:j])
            i = j + 1
        out.extend([(kind, width)] * rep)
    return out


def _decode_value(kind: str, width, data: bytes, pos: int):
    if kind == "b":
        signed = width // 10 == 2
        nbytes = width % 10
        raw = data[pos:pos + nbytes]
        val = int.from_bytes(raw, "little", signed=signed)
        return val, pos + nbytes
    if kind == "B":  # width in bits
        nbytes = (width or 8) // 8
        return data[pos:pos + nbytes], pos + nbytes
    # ASCII kinds: A, I, R, S, C...
    if width:
        raw = data[pos:pos + width]
        pos += width
    else:
        end = pos
        while end < len(data) and data[end] not in (UT, FT):
            end += 1
        raw = data[pos:end]
        pos = end + 1 if end < len(data) and data[end] == UT else end
    text = raw.decode("latin1")
    if kind == "I":
        try:
            return int(text.strip() or 0), pos
        except ValueError:
            return 0, pos
    if kind == "R":
        try:
            return float(text.strip() or 0), pos
        except ValueError:
            return 0.0, pos
    return text, pos


class Record:
    """One DR: dict field tag → list of subfield-dict instances.
    ``raw`` keeps each field's undecoded bytes for format variants the
    generic decode can't know (e.g. S-57 lexical level 2 NATF)."""

    __slots__ = ("fields", "order", "raw")

    def __init__(self):
        self.fields: dict[str, list[dict]] = {}
        self.order: list[str] = []
        self.raw: dict[str, bytes] = {}

    def first(self, tag: str) -> dict | None:
        v = self.fields.get(tag)
        return v[0] if v else None

    def all(self, tag: str) -> list[dict]:
        return self.fields.get(tag, [])


class DDFReader:
    def __init__(self, data: bytes):
        self.data = data
        self.defs: dict[str, FieldDefn] = {}
        self.records: list[Record] = []
        self._parse()

    # -- leader/directory ----------------------------------------------------

    def _leader(self, off: int):
        d = self.data
        reclen = int(d[off:off + 5])
        leader_id = chr(d[off + 6])
        base = int(d[off + 12:off + 17])
        size_len = int(chr(d[off + 20]))
        size_pos = int(chr(d[off + 21]))
        size_tag = int(chr(d[off + 23]))
        return reclen, leader_id, base, size_len, size_pos, size_tag

    def _directory(self, off, base, size_len, size_pos, size_tag):
        d = self.data
        pos = off + 24
        entries = []
        end = off + base - 1  # directory ends with FT at base-1
        esz = size_tag + size_len + size_pos
        while pos + esz <= end:
            tag = d[pos:pos + size_tag].decode("latin1")
            ln = int(d[pos + size_tag:pos + size_tag + size_len])
            fp = int(d[pos + size_tag + size_len:pos + esz])
            entries.append((tag, ln, fp))
            pos += esz
        return entries

    # -- DDR -----------------------------------------------------------------

    def _parse_ddr(self, off: int) -> int:
        reclen, _lid, base, sl, sp, st = self._leader(off)
        for tag, ln, fp in self._directory(off, base, sl, sp, st):
            area = self.data[off + base + fp:off + base + fp + ln]
            if tag in ("0000", "0001"):
                continue
            # field controls: 9 bytes (data structure, type, aux, ...)
            body = area[9:] if len(area) > 9 else b""
            parts = body.split(bytes([UT]))
            name = parts[0].decode("latin1") if parts else ""
            labels_raw = parts[1].decode("latin1") if len(parts) > 1 else ""
            fmt_raw = parts[2].decode("latin1").rstrip("\x1e") \
                if len(parts) > 2 else ""
            repeating = labels_raw.startswith("*")
            labels = [x for x in labels_raw.lstrip("*").split("!") if x]
            self.defs[tag] = FieldDefn(tag, name, labels,
                                       _parse_formats(fmt_raw), repeating)
        return off + reclen

    # -- DR ------------------------------------------------------------------

    def _parse_dr(self, off: int) -> int:
        reclen, _lid, base, sl, sp, st = self._leader(off)
        rec = Record()
        for tag, ln, fp in self._directory(off, base, sl, sp, st):
            area = self.data[off + base + fp:off + base + fp + ln]
            if area and area[-1] == FT:
                area = area[:-1]
            rec.raw[tag] = area
            defn = self.defs.get(tag)
            if defn is None or not defn.labels:
                rec.fields.setdefault(tag, []).append({"_raw": area})
                rec.order.append(tag)
                continue
            pos = 0
            insts = []
            while True:
                vals = {}
                for label, (kind, width) in zip(defn.labels, defn.formats):
                    if pos > len(area):
                        break
                    v, pos = _decode_value(kind, width, area, pos)
                    vals[label] = v
                insts.append(vals)
                if not defn.repeating or pos >= len(area):
                    break
            rec.fields.setdefault(tag, []).extend(insts)
            rec.order.append(tag)
        self.records.append(rec)
        return off + reclen

    def _parse(self):
        off = 0
        first = True
        while off + 24 <= len(self.data):
            # skip inter-record filler (SRP .GEN pads with '^')
            while off < len(self.data) and self.data[off] in (0x5E, 0x00):
                off += 1
            if off + 24 > len(self.data):
                break
            try:
                lid = chr(self.data[off + 6])
            except IndexError:
                break
            if first and lid == "L":
                off = self._parse_ddr(off)
                first = False
            else:
                nxt = self._parse_dr(off)
                if nxt <= off:
                    break
                off = nxt
                first = False


def read_ddf(path: str) -> DDFReader:
    with open(path, "rb") as f:
        return DDFReader(f.read())
