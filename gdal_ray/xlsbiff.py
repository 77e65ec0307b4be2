"""XLS (BIFF8) spreadsheet reader — reference role
ogr/ogrsf_frmts/xls (ogrxlsdatasource.cpp, which delegates cell
extraction to FreeXL), re-derived from the published Microsoft
formats: MS-CFB (OLE2 compound file binary) and MS-XLS (BIFF8
record stream).  No FreeXL code consulted.

Container: CFB header → DIFAT → FAT chains → directory; the
``Workbook`` (or ``Book``) stream holds BIFF records, small streams
come from the root entry's mini-stream via the miniFAT.

Records used: BOF/EOF, BOUNDSHEET (sheet name + substream offset),
SST + CONTINUE (shared strings with per-segment compression flags),
FORMAT/XF (number-format ids → date/time/datetime cell kinds, the
same 14-22/45-47/custom-code classification as the XLSX driver),
DATEMODE (1904 system), NUMBER, RK/MULRK (packed RK numbers),
LABELSST, LABEL, BOOLERR, BLANK/MULBLANK, FORMULA (+STRING for
cached string results).

Cell rows come out as the same ``(value, kind)`` lists the XLSX/ODS
readers produce, so header detection and OGR field typing are the
shared ``xlsx.rows_to_table`` — the autotest's type expectations
(ogr_xls.py: Integer, Real, String, Date, DateTime over
test972000xp.xls) pin the whole chain."""

from __future__ import annotations

import re
import struct

import pyarrow as pa

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


# ---------------------------------------------------------------------------
# OLE2 / CFB container
# ---------------------------------------------------------------------------


def _cfb_stream(data: bytes, want: tuple[str, ...]) -> bytes:
    if data[:8] != _CFB_MAGIC:
        raise ValueError("XLS: not an OLE2 compound document")
    (sshift,) = struct.unpack_from("<H", data, 30)
    (mshift,) = struct.unpack_from("<H", data, 32)
    ssize, msize = 1 << sshift, 1 << mshift
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (first_minifat,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (first_difat,) = struct.unpack_from("<I", data, 68)
    (n_difat,) = struct.unpack_from("<I", data, 72)

    def sector(i: int) -> bytes:
        off = 512 + i * ssize
        return data[off:off + ssize]

    # DIFAT → list of FAT sector ids
    fat_ids = list(struct.unpack_from("<109I", data, 76))
    d = first_difat
    for _ in range(n_difat):
        if d in (_FREE, _ENDCHAIN):
            break
        s = sector(d)
        ids = struct.unpack(f"<{ssize // 4}I", s)
        fat_ids.extend(ids[:-1])
        d = ids[-1]
    fat_ids = [i for i in fat_ids if i != _FREE]
    fat: list[int] = []
    for i in fat_ids:
        fat.extend(struct.unpack(f"<{ssize // 4}I", sector(i)))

    def chain(start: int) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s not in (_FREE, _ENDCHAIN) and seen <= len(fat):
            out += sector(s)
            s = fat[s]
            seen += 1
        return bytes(out)

    # directory entries
    dirdata = chain(first_dir)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        (nlen,) = struct.unpack_from("<H", dirdata, off + 64)
        if nlen < 2:
            continue
        name = dirdata[off:off + nlen - 2].decode("utf-16-le", "replace")
        etype = dirdata[off + 66]
        (start,) = struct.unpack_from("<I", dirdata, off + 116)
        (size,) = struct.unpack_from("<Q", dirdata, off + 120)
        if sshift == 9:
            size &= 0xFFFFFFFF
        entries.append((name, etype, start, size))
    root = next(e for e in entries if e[1] == 5)
    ministream = chain(root[2])[:root[3]]
    # miniFAT
    minifat: list[int] = []
    s = first_minifat
    for _ in range(n_minifat):
        if s in (_FREE, _ENDCHAIN):
            break
        minifat.extend(struct.unpack(f"<{ssize // 4}I", sector(s)))
        s = fat[s]

    def mini_chain(start: int) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s not in (_FREE, _ENDCHAIN) and seen <= len(minifat):
            out += ministream[s * msize:(s + 1) * msize]
            s = minifat[s]
            seen += 1
        return bytes(out)

    for name, etype, start, size in entries:
        if etype == 2 and name in want:
            blob = (mini_chain(start) if size < mini_cutoff
                    else chain(start))
            return blob[:size]
    raise ValueError(f"XLS: no {want} stream in compound document")


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------


def _records(stream: bytes, start: int = 0):
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        opcode, length = struct.unpack_from("<HH", stream, pos)
        body = stream[pos + 4:pos + 4 + length]
        yield opcode, body, pos
        pos += 4 + length
        if opcode == 0x0A and start:  # EOF of a substream
            return


class _StrReader:
    """XLUnicodeString reader across SST CONTINUE boundaries — each
    continuation segment restarts with its own compression flag."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.segs[self.i]) - self.pos

    def _advance(self):
        while self.i < len(self.segs) - 1 and self._remaining() == 0:
            self.i += 1
            self.pos = 0

    def raw(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            take = min(n, self._remaining())
            seg = self.segs[self.i]
            out += seg[self.pos:self.pos + take]
            self.pos += take
            n -= take
            if take == 0:
                raise ValueError("XLS: truncated SST")
        return bytes(out)

    def u8(self) -> int:
        return self.raw(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.raw(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def string(self) -> str:
        cch = self.u16()
        flags = self.u8()
        crun = self.u16() if flags & 0x08 else 0
        cbext = self.u32() if flags & 0x04 else 0
        chars = []
        left = cch
        high = flags & 0x01
        while left > 0:
            self._advance()
            per = 2 if high else 1
            avail = self._remaining() // per
            take = min(left, avail)
            if take:
                b = self.raw(take * per)
                chars.append(b.decode("utf-16-le" if high else "latin-1",
                                      "replace"))
                left -= take
            if left > 0:
                # next CONTINUE restarts with a fresh grbit byte
                high = self.u8() & 0x01
        self.raw(4 * crun)
        self.raw(cbext)
        return "".join(chars)


def _short_string(body: bytes, off: int) -> str:
    cch = body[off]
    flags = body[off + 1]
    if flags & 0x01:
        return body[off + 2:off + 2 + 2 * cch].decode("utf-16-le",
                                                      "replace")
    return body[off + 2:off + 2 + cch].decode("latin-1", "replace")


def _rk_value(rk: int) -> float:
    if rk & 0x02:  # integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:
        val = struct.unpack("<d", b"\x00\x00\x00\x00"
                            + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    if rk & 0x01:
        val /= 100.0
    return val


def _fmt_kind(ifmt: int, custom: dict[int, str]) -> str:
    if 14 <= ifmt <= 17:
        return "date"
    if 18 <= ifmt <= 21 or 45 <= ifmt <= 47:
        return "time"
    if ifmt == 22:
        return "datetime"
    return custom.get(ifmt, "float")


def _classify_format(code: str) -> str:
    has_date = re.search(r"dd|yy", code, re.I) is not None
    has_time = re.search(r"hh", code, re.I) is not None
    if has_date and has_time:
        return ("datetime_ms" if re.search(r"ss\.000", code, re.I)
                else "datetime")
    if has_date:
        return "date"
    if has_time:
        return "time"
    return "float"


def load_xls_sheets(path: str) -> list[tuple[str, list]]:
    """[(sheet name, rows)] — rows are (value, kind) cell lists in
    the shared spreadsheet shape."""
    from gdal_ray.vsi import vsi_read_bytes

    stream = _cfb_stream(vsi_read_bytes(path), ("Workbook", "Book"))

    # ---- workbook globals ----
    sst: list[str] = []
    sheets_meta: list[tuple[str, int]] = []
    custom_fmt: dict[int, str] = {}
    xf_kind: list[str] = []
    date1904 = False
    recs = list(_records(stream))
    for idx, (op, body, _pos) in enumerate(recs):
        if op == 0x0A:  # end of globals substream
            break
        if op == 0x85:  # BOUNDSHEET
            (spos,) = struct.unpack_from("<I", body, 0)
            sheets_meta.append((_short_string(body, 6), spos))
        elif op == 0xFC:  # SST (+ CONTINUEs)
            segs = [body[8:]]
            j = idx + 1
            while j < len(recs) and recs[j][0] == 0x3C:
                segs.append(recs[j][1])
                j += 1
            (cst,) = struct.unpack_from("<I", body, 4)
            r = _StrReader(segs)
            for _ in range(cst):
                sst.append(r.string())
        elif op == 0x041E:  # FORMAT
            (ifmt,) = struct.unpack_from("<H", body, 0)
            r = _StrReader([body[2:]])
            custom_fmt[ifmt] = _classify_format(r.string())
        elif op == 0xE0:  # XF
            (ifmt,) = struct.unpack_from("<H", body, 2)
            xf_kind.append(_fmt_kind(ifmt, custom_fmt))
        elif op == 0x22:  # DATEMODE
            date1904 = struct.unpack_from("<H", body, 0)[0] == 1

    def kind_of(xf: int) -> str:
        return xf_kind[xf] if xf < len(xf_kind) else "float"

    def num_value(v: float, kind: str) -> str:
        if date1904 and kind in ("date", "datetime", "datetime_ms",
                                 "time"):
            v += 1462.0  # 1904 epoch shift onto the 1899-12-30 serial
        # whole numbers print integer-style so the shared typing pass
        # can refine float → int (FreeXL hands OGR doubles; the XLS
        # driver's GetFieldAsInteger parity needs the collapse)
        if kind == "float" and float(v).is_integer() and abs(v) < 2**53:
            return repr(int(v))
        return repr(v)

    # ---- worksheet substreams ----
    out = []
    for name, spos in sheets_meta:
        cells: dict[int, dict[int, tuple[str, str]]] = {}
        pending_formula: tuple[int, int] | None = None
        sub = list(_records(stream, spos))
        for k, (op, body, _p) in enumerate(sub):
            if op == 0x0A:
                break
            if op == 0x0203:  # NUMBER
                row, col, xf = struct.unpack_from("<HHH", body, 0)
                (v,) = struct.unpack_from("<d", body, 6)
                kind = kind_of(xf)
                cells.setdefault(row, {})[col] = (num_value(v, kind),
                                                  kind)
            elif op == 0x027E:  # RK
                row, col, xf = struct.unpack_from("<HHH", body, 0)
                (rk,) = struct.unpack_from("<I", body, 6)
                kind = kind_of(xf)
                cells.setdefault(row, {})[col] = (
                    num_value(_rk_value(rk), kind), kind)
            elif op == 0xBD:  # MULRK
                (row,) = struct.unpack_from("<H", body, 0)
                (col0,) = struct.unpack_from("<H", body, 2)
                ncell = (len(body) - 6) // 6
                for i in range(ncell):
                    xf, rk = struct.unpack_from("<HI", body, 4 + 6 * i)
                    kind = kind_of(xf)
                    cells.setdefault(row, {})[col0 + i] = (
                        num_value(_rk_value(rk), kind), kind)
            elif op == 0x00FD:  # LABELSST
                row, col, _xf = struct.unpack_from("<HHH", body, 0)
                (isst,) = struct.unpack_from("<I", body, 6)
                v = sst[isst] if isst < len(sst) else ""
                cells.setdefault(row, {})[col] = (v, "string")
            elif op == 0x0204:  # LABEL (inline string)
                row, col, _xf = struct.unpack_from("<HHH", body, 0)
                r = _StrReader([body[6:]])
                cells.setdefault(row, {})[col] = (r.string(), "string")
            elif op == 0x0205:  # BOOLERR
                row, col, _xf = struct.unpack_from("<HHH", body, 0)
                val, is_err = body[6], body[7]
                if not is_err:
                    cells.setdefault(row, {})[col] = (str(int(val)),
                                                      "bool")
            elif op == 0x0006:  # FORMULA
                row, col, xf = struct.unpack_from("<HHH", body, 0)
                res = body[6:14]
                if res[6:8] == b"\xff\xff":
                    if res[0] == 0:  # cached string → next STRING rec
                        pending_formula = (row, col)
                    elif res[0] == 1:  # bool
                        cells.setdefault(row, {})[col] = (
                            str(res[2]), "bool")
                    # error (2) → unset
                else:
                    (v,) = struct.unpack("<d", res)
                    kind = kind_of(xf)
                    cells.setdefault(row, {})[col] = (
                        num_value(v, kind), kind)
            elif op == 0x0207 and pending_formula:  # STRING
                r = _StrReader([body])
                row, col = pending_formula
                pending_formula = None
                cells.setdefault(row, {})[col] = (r.string(), "string")
        rows: list[list] = []
        if cells:
            for rnum in range(0, max(cells) + 1):
                rowcells = cells.get(rnum, {})
                row: list[tuple[str, str]] = []
                if rowcells:
                    for c in range(max(rowcells) + 1):
                        row.append(rowcells.get(c, ("", "")))
                rows.append(row)
        out.append((name, rows))
    return out


def list_sheets(path: str) -> list[str]:
    return [n for n, _ in load_xls_sheets(path)]


def read_xls(path: str, sheet: str | None = None,
             headers: str = "AUTO") -> pa.Table:
    from gdal_ray.xlsx import rows_to_table

    sheets = load_xls_sheets(path)
    if sheet is None:
        name, rows = sheets[0]
    else:
        match = [s for s in sheets if s[0] == sheet]
        if not match:
            raise ValueError(f"no sheet {sheet!r} in {path} "
                             f"(have {[s[0] for s in sheets]})")
        name, rows = match[0]
    return rows_to_table(rows, headers)


def read_xls_dataset(path: str, sheet: str | None = None):
    """XLS sheet → Dataset (file-per-task; spreadsheets are small by
    format — shard across files upstream)."""
    import ray.data as rd

    return rd.from_arrow(read_xls(path, sheet))
