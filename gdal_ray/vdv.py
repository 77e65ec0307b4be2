"""VDV-452 / IDF transit-data formats — reference role
ogr/ogrsf_frmts/vdv (ogrvdvdatasource.cpp OGRIDFDataSource::Parse,
OGRVDVWriterLayer), re-derived from the published VDV-451/452 file
grammar (semicolon-separated command records: tbl/atr/frm/rec/end/
eof, mod/src/chs/ver/ifv/dve/fft headers) and the Intrex IDF layout
(chs/eoh preamble, Node/Link/LinkCoordinate/Other tables).

IDF reading follows the reference's geometry assembly: Node rows
become points (X/Y and optional Z columns), Link rows become
linestrings from the FROM_NODE point, the LinkCoordinate
intermediates in COUNT order, then the TO_NODE point; the
LinkCoordinate layer itself exposes per-row points; remaining
tables are attribute-only.

The VDV writer reproduces the reference's serialization byte for
byte (autotest ogr_vdv.py test_ogr_vdv_2 golden): the literal
"mod; DD.MM.YYYY; HH:MM:SS; free" stamp, quoted src/chs/ver/ifv/
dve/fft defaults, custom header lines, char[n]/num[n.0]/boolean
formats (string width default 80, int 10, int64 19, explicit width
w → w-1 digits), doubled-quote escaping and NULL markers."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# shared tokenizer


def _split_semi(line: str) -> list[str]:
    """Split a VDV/IDF record on ';' respecting double-quoted cells
    (with doubled-quote escapes)."""
    out = []
    cur = []
    in_q = False
    i = 0
    while i < len(line):
        c = line[i]
        if in_q:
            if c == '"':
                if i + 1 < len(line) and line[i + 1] == '"':
                    cur.append('"')
                    i += 1
                else:
                    in_q = False
            else:
                cur.append(c)
        elif c == '"':
            in_q = True
        elif c == ";":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def _parse_tables(text: str, sep_strip: bool = True):
    """VDV/IDF text → [(table name, [attr names], [frm], [rows])]."""
    tables = []
    cur = None
    for raw in text.splitlines():
        if not raw.strip():
            continue
        parts = _split_semi(raw)
        cmd = parts[0].strip().lower()
        cells = [p.strip() if sep_strip else p for p in parts[1:]]
        if cmd == "tbl":
            cur = {"name": cells[0], "atr": [], "frm": [], "rows": []}
            tables.append(cur)
        elif cur is None:
            continue
        elif cmd == "atr":
            cur["atr"] = [c for c in cells if c]
        elif cmd == "frm":
            cur["frm"] = [c for c in cells if c]
        elif cmd == "rec":
            cur["rows"].append(cells)
        elif cmd in ("end", "eof"):
            if cmd == "eof":
                cur = None
    return tables


def _typed_column(vals: list, frm: str):
    """One column of raw cell strings → typed arrow array by the
    frm declaration (decimal(n)/decimal(n,m)/string(n) for IDF,
    char[n]/num[n.m]/boolean for VDV-452)."""
    frm = (frm or "").strip().lower()
    is_float = False
    is_int = False
    is_bool = False
    int64 = False
    if frm.startswith("decimal"):
        inner = frm[frm.find("(") + 1:frm.rfind(")")]
        if "," in inner and int(inner.split(",")[1] or 0) > 0:
            is_float = True
        else:
            is_int = True
            int64 = int(inner.split(",")[0] or 10) > 9
    elif frm.startswith("num["):
        inner = frm[4:frm.rfind("]")]
        whole, _, dec = inner.partition(".")
        if dec and int(dec) > 0:
            is_float = True
        else:
            is_int = True
            int64 = int(whole or 10) > 10
    elif frm == "boolean":
        is_bool = True

    def _norm(v):
        v = v.strip() if isinstance(v, str) else v
        return None if v in (None, "", "NULL") else v

    vals = [_norm(v) for v in vals]
    if is_float:
        return pa.array([float(v) if v is not None else None
                         for v in vals], pa.float64())
    if is_int:
        return pa.array([int(float(v)) if v is not None else None
                         for v in vals],
                        pa.int64() if int64 else pa.int32())
    if is_bool:
        return pa.array([None if v is None else v in ("1", "true")
                         for v in vals], pa.bool_())
    return pa.array(vals, pa.string())


def _table_to_arrow(tbl: dict) -> pa.Table:
    names = tbl["atr"]
    frm = tbl["frm"] + [""] * (len(names) - len(tbl["frm"]))
    cols = []
    for i, n in enumerate(names):
        vals = [(r[i] if i < len(r) else None) for r in tbl["rows"]]
        cols.append(_typed_column(vals, frm[i]))
    if not names:
        return pa.table({"_empty": pa.array([], pa.int32())}).drop_columns(
            ["_empty"])
    return pa.table(cols, names=names)


# ---------------------------------------------------------------------------
# IDF reader


def read_idf_tables(path: str) -> dict[str, pa.Table]:
    """Intrex IDF → {layer name: arrow table with WKB geometry}
    (Node/Link points+linestrings assembly per OGRIDFDataSource)."""
    from gdal_ray.geom import wkb as gwkb
    from gdal_ray.vsi import vsi_read_bytes

    text = vsi_read_bytes(path).decode("latin-1")
    tables = _parse_tables(text)
    out: dict[str, pa.Table] = {}
    nodes: dict[int, tuple] = {}
    link_coords: dict[int, list] = {}

    def col(tbl, name):
        try:
            return tbl["atr"].index(name)
        except ValueError:
            return -1

    for tbl in tables:
        name = tbl["name"]
        at = _table_to_arrow(tbl)
        ix, iy = col(tbl, "X"), col(tbl, "Y")
        iz = col(tbl, "Z")
        if name == "Node" and ix >= 0 and iy >= 0:
            geoms = []
            iid = col(tbl, "NODE_ID")
            for r in tbl["rows"]:
                x, y = float(r[ix]), float(r[iy])
                z = float(r[iz]) if iz >= 0 else None
                if iid >= 0:
                    nodes[int(float(r[iid]))] = (x, y, z)
                geoms.append(gwkb.point_wkb_d(
                    [x, y] + ([z] if z is not None else []),
                    "xyz" if z is not None else "xy"))
            at = at.append_column("geometry", pa.array(geoms, pa.binary()))
        elif name == "LinkCoordinate" and ix >= 0 and iy >= 0:
            geoms = []
            ili = col(tbl, "LINK_ID")
            icnt = col(tbl, "COUNT")
            for r in tbl["rows"]:
                x, y = float(r[ix]), float(r[iy])
                z = float(r[iz]) if iz >= 0 else None
                if ili >= 0:
                    link_coords.setdefault(
                        int(float(r[ili])), []).append(
                            (int(float(r[icnt])) if icnt >= 0 else 0,
                             x, y, z))
                geoms.append(gwkb.point_wkb_d(
                    [x, y] + ([z] if z is not None else []),
                    "xyz" if z is not None else "xy"))
            at = at.append_column("geometry", pa.array(geoms, pa.binary()))
        out[name] = at

    # second pass: Link linestrings = from-node + ordered
    # intermediates + to-node
    for tbl in tables:
        if tbl["name"] != "Link":
            continue
        ifr, ito = col(tbl, "FROM_NODE"), col(tbl, "TO_NODE")
        ili = col(tbl, "LINK_ID")
        geoms = []
        for r in tbl["rows"]:
            fr = nodes.get(int(float(r[ifr]))) if ifr >= 0 else None
            to = nodes.get(int(float(r[ito]))) if ito >= 0 else None
            if fr is None or to is None:
                geoms.append(None)
                continue
            mids = sorted(link_coords.get(
                int(float(r[ili])) if ili >= 0 else -1, []))
            pts = [fr] + [(x, y, z) for _, x, y, z in mids] + [to]
            has_z = fr[2] is not None
            arr = np.array([[p[0], p[1]] + ([p[2]] if has_z else [])
                            for p in pts])
            geoms.append(gwkb.linestring_wkb_d(
                arr, "xyz" if has_z else "xy"))
        out["Link"] = out["Link"].append_column(
            "geometry", pa.array(geoms, pa.binary()))
    return out


def read_idf(path: str, layer: str | None = None):
    """IDF → Ray Dataset of one layer (default Node)."""
    import ray.data as rd

    tables = read_idf_tables(path)
    return rd.from_arrow(tables[layer or next(iter(tables))])


# ---------------------------------------------------------------------------
# VDV-452 reader


def read_vdv_tables(path: str) -> dict[str, pa.Table]:
    """VDV-452 single .x10 file or directory → {table: arrow}."""
    from gdal_ray.vsi import vsi_read_bytes

    paths = []
    if os.path.isdir(path):
        for n in sorted(os.listdir(path)):
            if n.lower().endswith((".x10", ".txt")):
                paths.append(os.path.join(path, n))
    else:
        paths = [path]
    out = {}
    for p in paths:
        for tbl in _parse_tables(
                vsi_read_bytes(p).decode("latin-1")):
            out[tbl["name"]] = _table_to_arrow(tbl)
    return out


def read_vdv(path: str, layer: str | None = None):
    import ray.data as rd

    tables = read_vdv_tables(path)
    return rd.from_arrow(tables[layer or next(iter(tables))])


# ---------------------------------------------------------------------------
# VDV-452 writer (byte-pinned to the reference serialization)


def _frm_for(field: pa.Field, width: int = 0) -> str:
    t = field.type
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        if width:
            return f"num[{width - 1}.0]"
        return "num[19.0]" if pa.types.is_int64(t) else "num[10.0]"
    if pa.types.is_floating(t):
        return "num[20.5]"
    return f"char[{width or 80}]"


def _cell(v, field: pa.Field) -> str:
    if v is None:
        return "NULL"
    t = field.type
    if pa.types.is_boolean(t):
        return "1" if v else "0"
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return str(v)
    return '"' + str(v).replace('"', '""') + '"'


def write_vdv(layers: dict[str, pa.Table], path: str,
              widths: dict[str, dict[str, int]] | None = None,
              headers: dict[str, str] | None = None,
              src_date: str = "01.01.1970",
              src_time: str = "00.00.00") -> None:
    """Write VDV-452 (single-file): the reference's literal header
    block, one tbl/atr/frm/rec*/end section per layer, eof; N."""
    widths = widths or {}
    lines = [
        "mod; DD.MM.YYYY; HH:MM:SS; free",
        f'src; "UNKNOWN"; "{src_date}"; "{src_time}"',
        'chs; "ISO8859-1"',
        'ver; "1.4"',
        'ifv; "1.4"',
        'dve; "1.4"',
        'fft; ""',
    ]
    for k, v in (headers or {}).items():
        lines.append(f'{k}; "{v}"')
    for name, tbl in layers.items():
        lines.append(f"tbl; {name}")
        w = widths.get(name, {})
        if tbl.num_columns:
            lines.append("atr; " + "; ".join(tbl.column_names))
            lines.append("frm; " + "; ".join(
                _frm_for(tbl.schema.field(i), w.get(tbl.column_names[i], 0))
                for i in range(tbl.num_columns)))
        else:
            lines.append("atr;")
            lines.append("frm;")
        for ri in range(len(tbl)):
            cells = [_cell(tbl[c][ri].as_py(), tbl.schema.field(c))
                     for c in tbl.column_names]
            lines.append("rec; " + "; ".join(cells) if cells else "rec;")
        lines.append(f"end; {len(tbl)}")
    lines.append(f"eof; {len(layers)}")
    with open(path, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode("latin-1"))
