"""XLSX (Office Open XML spreadsheet) reader — the OGR XLSX role.

From-scratch parse of the published OOXML SpreadsheetML package
(reference roles: ogr/ogrsf_frmts/xlsx/ogrxlsxdatasource.cpp —
DetectHeaderLine, GetOGRFieldType promotion, the style→date rules).

Semantics matched to the reference:

- one layer per sheet (workbook.xml order, names verbatim);
- header detection: the first row is a header iff it is all-text,
  at least as wide as row 2, and row 2 is neither all-text nor empty
  (OGR_XLSX_HEADERS AUTO rule); otherwise columns are named Field1…;
- cell typing: shared/inline strings, booleans, and floats split
  int/float by value; a cell style whose numFmtId is 14-17 → Date,
  18-21 → Time, 22 → DateTime, custom formats (≥164) classified by
  dd/yy vs hh substrings (SS.000 → millisecond datetimes);
- column types promote across rows (Integer → Integer64 → Real →
  String; Date/Time/DateTime mixing degrades to String except
  Date+DateTime → DateTime);
- date serials convert with the 1899-12-30 epoch (25569-day Unix
  offset), times as fraction-of-day.

Scale: one read task per sheet (zip member random access).
"""
from __future__ import annotations

import datetime
import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NSPR = ("{http://schemas.openxmlformats.org/package/2006/"
         "relationships}")


def _strip(tag: str) -> str:
    return tag.split("}")[-1]


def _cell_text(c) -> str:
    parts = []
    for t in c.iter():
        if _strip(t.tag) in ("v", "t") and t.text:
            parts.append(t.text)
    return "".join(parts)


class _Sheet:
    def __init__(self, name):
        self.name = name
        self.rows: list[list[tuple[str, str]]] = []  # (value, kind)


def _col_index(ref: str) -> int:
    m = re.match(r"([A-Z]+)", ref or "")
    if not m:
        return -1
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def load_sheets(path: str) -> list[_Sheet]:
    z = zipfile.ZipFile(path)
    names = {n.lower(): n for n in z.namelist()}

    def member(n):
        return z.read(names[n.lower()]) if n.lower() in names else None

    # shared strings
    shared = []
    ss = member("xl/sharedStrings.xml")
    if ss:
        for si in ET.fromstring(ss):
            shared.append("".join(
                t.text or "" for t in si.iter() if _strip(t.tag) == "t"))

    # styles → per-xf value kind
    styles: list[str] = []
    st = member("xl/styles.xml")
    if st:
        root = ET.fromstring(st)
        custom = {}
        for nf in root.iter():
            if _strip(nf.tag) != "numFmt":
                continue
            fid = int(nf.get("numFmtId", "-1"))
            code = nf.get("formatCode", "")
            if fid >= 164:
                has_date = re.search(r"dd|yy", code, re.I) is not None
                has_time = re.search(r"hh", code, re.I) is not None
                if has_date and has_time:
                    custom[fid] = ("datetime_ms"
                                   if re.search(r"ss\.000", code, re.I)
                                   else "datetime")
                elif has_date:
                    custom[fid] = "date"
                elif has_time:
                    custom[fid] = "time"
                else:
                    custom[fid] = "float"
        for xfs in root.iter():
            if _strip(xfs.tag) != "cellXfs":
                continue
            for xf in xfs:
                fid = int(xf.get("numFmtId", "-1"))
                kind = "float"
                if 14 <= fid <= 17:
                    kind = "date"
                elif 18 <= fid <= 21:
                    kind = "time"
                elif fid == 22:
                    kind = "datetime"
                elif fid >= 164:
                    kind = custom.get(fid, "float")
                styles.append(kind)

    # workbook sheet order + rels
    wb = ET.fromstring(member("xl/workbook.xml"))
    rels = {}
    rl = member("xl/_rels/workbook.xml.rels")
    if rl:
        for r in ET.fromstring(rl):
            rels[r.get("Id")] = r.get("Target")
    sheets = []
    for s in wb.iter():
        if _strip(s.tag) != "sheet":
            continue
        rid = s.get(f"{_NSR}id")
        target = rels.get(rid, f"worksheets/sheet{len(sheets) + 1}.xml")
        if target.startswith("/"):
            target = target[1:]
        elif not target.startswith("xl/"):
            target = "xl/" + target
        data = member(target)
        sheet = _Sheet(s.get("name"))
        if data:
            _parse_sheet(data, shared, styles, sheet)
        sheets.append(sheet)
    return sheets


def _parse_sheet(data, shared, styles, sheet: _Sheet):
    root = ET.fromstring(data)
    last_row = 0
    for row in root.iter(f"{_NS}row"):
        rnum = int(row.get("r", last_row + 1))
        # gaps in row numbering become empty features (OGR parity)
        while last_row + 1 < rnum:
            sheet.rows.append([])
            last_row += 1
        last_row = rnum
        cells: list[tuple[str, str]] = []
        auto_col = 0
        for c in row:
            if _strip(c.tag) != "c":
                continue
            idx = _col_index(c.get("r", ""))
            if idx < 0:
                idx = auto_col
            while len(cells) < idx:
                cells.append(("", ""))
            t = c.get("t", "")
            s = c.get("s")
            val = _cell_text(c)
            kind = "float"
            if s is not None and s.isdigit() and int(s) < len(styles):
                kind = styles[int(s)]
            if t == "s":
                try:
                    val = shared[int(val)]
                except (ValueError, IndexError):
                    pass
                kind = "string"
            elif t in ("inlineStr", "str"):
                kind = "string"
            elif t == "b":
                kind = "bool"
            if val == "" and kind != "string":
                kind = ""
            cells.append((val, kind))
            auto_col = idx + 1
        sheet.rows.append(cells)


_EPOCH = datetime.datetime(1899, 12, 30)


def _serial_dt(v: float) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=round(v * 86400))


def _promote(a: str, b: str) -> str:
    if a == b or a == "":
        return b
    if b == "":
        return a
    order = {"int": 0, "int64": 1, "float": 2}
    if a in order and b in order:
        return a if order[a] >= order[b] else b
    if {a, b} <= {"date", "time", "datetime", "datetime_ms"}:
        # mixed date/time kinds widen to datetime (the reference's
        # OGR field promotion: Date+Time/DateTime → DateTime)
        return "datetime_ms" if "datetime_ms" in (a, b) else "datetime"
    return "string"


def read_xlsx(path: str, sheet: str | None = None,
              headers: str = "AUTO") -> pa.Table:
    sheets = load_sheets(path)
    if sheet is None:
        sh = sheets[0]
    else:
        match = [s for s in sheets if s.name == sheet]
        if not match:
            raise ValueError(f"no sheet {sheet!r} in {path} "
                             f"(have {[s.name for s in sheets]})")
        sh = match[0]
    return rows_to_table(sh.rows, headers)


def rows_to_table(rows: list, headers: str = "AUTO") -> pa.Table:
    """(value, kind) row lists → typed Arrow table with the driver's
    DetectHeaderLine + GetOGRFieldType promotion rules — shared by
    the XLSX, ODS-style and XLS (BIFF8) spreadsheet readers."""
    if not rows:
        return pa.table({})

    first = rows[0]
    header = False
    if headers == "FORCE":
        header = True
    elif headers != "DISABLE" and len(rows) >= 2:
        all_text = all(k == "string" for _v, k in first) and first
        second = rows[1]
        n_text = sum(1 for _v, k in second if k == "string")
        n_nonempty = sum(1 for _v, k in second if k != "")
        if all_text and len(first) >= len(second) and \
                n_text != len(first) and n_nonempty != 0:
            header = True
    if header:
        names = [v.strip() or f"Field{i + 1}"
                 for i, (v, _k) in enumerate(first)]
        body = rows[1:]
    else:
        width = max(len(r) for r in rows)
        names = [f"Field{i + 1}" for i in range(width)]
        body = rows
    width = len(names)

    # numeric refinement + column type promotion
    col_kinds = [""] * width
    for r in body:
        for i in range(min(width, len(r))):
            v, k = r[i]
            if k == "float":
                try:
                    iv = int(v)
                    k = "int" if -2**31 < iv < 2**31 else "int64"
                except ValueError:
                    k = "float"
            elif k == "bool":
                k = "int"
            col_kinds[i] = _promote(col_kinds[i], k)

    cols: dict[str, list] = {n: [] for n in names}
    for r in body:
        for i, n in enumerate(names):
            v, k = r[i] if i < len(r) else ("", "")
            kind = col_kinds[i]
            if v == "" and k == "":
                cols[n].append(None)
                continue
            try:
                if kind in ("int", "int64"):
                    cols[n].append(int(float(v)))
                elif kind == "float":
                    cols[n].append(float(v))
                elif kind == "date":
                    cols[n].append(_serial_dt(float(v)).date())
                elif kind in ("datetime", "datetime_ms"):
                    cols[n].append(_serial_dt(float(v)))
                elif kind == "time":
                    dt = _serial_dt(float(v) % 1.0)
                    cols[n].append(dt.time())
                else:
                    cols[n].append(str(v))
            except ValueError:
                cols[n].append(str(v) if kind == "string" else None)

    _ARROW = {"int": pa.int32(), "int64": pa.int64(),
              "float": pa.float64(), "date": pa.date32(),
              "datetime": pa.timestamp("ms"),
              "datetime_ms": pa.timestamp("ms"),
              "time": pa.time32("s"), "string": pa.string(),
              "": pa.string()}
    return pa.table({n: pa.array(cols[n], _ARROW[col_kinds[i]])
                     for i, n in enumerate(names)})


def list_sheets(path: str) -> list[str]:
    """Non-empty sheets only (the reference skips empty ones)."""
    return [s.name for s in load_sheets(path) if s.rows]


def read_xlsx_dataset(path: str, sheet: str | None = None):
    """Ray Dataset over one sheet — one task per workbook."""
    import ray.data as rd
    ds = rd.from_items([{"path": path}])

    def load(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([read_xlsx(p.as_py(), sheet)
                                 for p in batch["path"]])

    return ds.map_batches(load, batch_format="pyarrow")
