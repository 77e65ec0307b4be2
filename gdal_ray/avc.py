"""Arc/Info Coverage vector driver: AVCE00 ASCII interchange + AVCBin
binary coverages — reference role ogr/ogrsf_frmts/avc (avc_e00parse.cpp,
avc_bin.cpp, ogravclayer.cpp), re-derived from the published AVCE00
format description (avce00.maptools.org "Arc/Info Export (E00)" and
"Arc/Info Binary Coverage" format notes).

E00 = line-oriented ASCII dump of a workspace coverage: an ``EXP  0``
header then sections (``ARC``/``CNT``/``LAB``/``PAL``/``TOL``/``PRJ``/
``IFO`` ...), each tagged with a precision code (2 = single, 3 =
double) and terminated by a ``-1`` record.  ``EXP  1`` marks the
run-length "compressed" variant which the reference also refuses.

Binary coverage = a directory of big-endian ``.adf`` files (arc.adf,
lab.adf, pal.adf, cnt.adf ...) each with a 100-byte header (signature
9994/9993, precision flag, length in 16-bit words), plus an ``info``
sibling directory holding the attribute tables: ``arc.dir`` (380-byte
directory records), ``arcNNNN.nit`` (144-byte field definitions) and
``arcNNNN.dat`` (fixed-size data records).

Layer model matches the reference driver: ARC (linestrings; UserId /
FNODE_ / TNODE_ / LPOLY_ / RPOLY_ + COVER.AAT attributes minus its
first four node/poly fields), PAL (polygons chained from the arc list,
universe polygon FID 1 skipped, COVER.PAT attributes), CNT (centroid
points + LabelIds), LAB (label points ValueId/PolyId + COVER.PAT when
no PAL section claims it; keyed on PolyId when a PAL exists).  E00
attaches any INFO table whose name contains ``.AAT``/``.PAT``.

Field widths in E00 table records: char/date/fixint = declared size,
fixnum = 14, binary int = 11 (4-byte) / 6 (2-byte), binary float = 14
(4-byte) / 24 (8-byte); records wrap at 80 columns with space padding.

Pinned against the reference fixtures: test.e00 / testavc (ARC UserId
1..7 + first-arc geometry), testpoint.e00 / testpointavc (80 wells,
7 fields, WELLS-ID join), testpoly.e00 / testpolyavc (3 polygons after
universe skip, ArcIds [-4,-5], AREA 9939.059, ring parity with the
reference WKT), compressed.e00 (must raise).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from gdal_ray.geom import wkb as W

SINGLE, DOUBLE = 1, 2

# INFO field type codes (nType1 * 10)
FT_DATE, FT_CHAR, FT_FIXINT, FT_FIXNUM, FT_BININT, FT_BINFLOAT = (
    10, 20, 30, 40, 50, 60)


# ---------------------------------------------------------------------------
# E00 ASCII parsing
# ---------------------------------------------------------------------------

class _Cursor:
    def __init__(self, lines):
        self.lines = lines
        self.i = 0

    def next(self):
        if self.i >= len(self.lines):
            return None
        s = self.lines[self.i]
        self.i += 1
        return s


def _int(s, off, w=10):
    v = s[off:off + w].strip()
    return int(v) if v else 0


def _flt(s, off, w=14):
    v = s[off:off + w].strip()
    return float(v) if v else 0.0


def _parse_arc_section(cur, prec):
    arcs = []
    while True:
        line = cur.next()
        if line is None:
            break
        arc_id = _int(line, 0)
        if arc_id == -1:
            break
        user_id, fnode, tnode = (_int(line, 10), _int(line, 20),
                                 _int(line, 30))
        lpoly, rpoly, nvert = (_int(line, 40), _int(line, 50),
                               _int(line, 60))
        pts = []
        if prec == SINGLE:
            while len(pts) < nvert:
                ln = cur.next()
                pts.append((_flt(ln, 0), _flt(ln, 14)))
                if len(pts) < nvert and len(ln) >= 56:
                    pts.append((_flt(ln, 28), _flt(ln, 42)))
        else:
            for _ in range(nvert):
                ln = cur.next()
                pts.append((_flt(ln, 0, 21), _flt(ln, 21, 21)))
        arcs.append((arc_id, user_id, fnode, tnode, lpoly, rpoly,
                     np.array(pts, dtype=np.float64)))
    return arcs


def _parse_lab_section(cur, prec):
    labs = []
    while True:
        line = cur.next()
        if line is None:
            break
        value = _int(line, 0)
        if value == -1:
            break
        poly_id = _int(line, 10)
        if prec == SINGLE:
            x, y = _flt(line, 20), _flt(line, 34)
            cur.next()  # coord2/coord3 box — not exposed as fields
        else:
            x, y = _flt(line, 20, 21), _flt(line, 41, 21)
            cur.next()
            cur.next()
        labs.append((value, poly_id, x, y))
    return labs


def _parse_cnt_section(cur, prec):
    cnts = []
    poly_id = 0
    while True:
        line = cur.next()
        if line is None:
            break
        nlab = _int(line, 0)
        if nlab == -1:
            break
        poly_id += 1
        if prec == SINGLE:
            x, y = _flt(line, 10), _flt(line, 24)
        else:
            x, y = _flt(line, 10, 21), _flt(line, 31, 21)
        ids = []
        while len(ids) < nlab:
            ln = cur.next()
            for k in range(0, min(len(ln), 80), 10):
                if len(ids) < nlab and ln[k:k + 10].strip():
                    ids.append(_int(ln, k))
        cnts.append((poly_id, x, y, ids))
    return cnts


def _parse_pal_section(cur, prec):
    pals = []
    poly_id = 0
    while True:
        line = cur.next()
        if line is None:
            break
        narcs = _int(line, 0)
        if narcs == -1:
            break
        poly_id += 1
        if prec == DOUBLE:
            cur.next()  # second bbox line
        n = max(narcs, 1)
        trips = []
        while len(trips) < n:
            ln = cur.next()
            trips.append((_int(ln, 0), _int(ln, 10), _int(ln, 20)))
            if len(trips) < n and len(ln) >= 60:
                trips.append((_int(ln, 30), _int(ln, 40), _int(ln, 50)))
        pals.append((poly_id, [t[0] for t in trips]))
    return pals


def _skip_until(cur, stop):
    while True:
        line = cur.next()
        if line is None or line.strip() == stop:
            return


def _parse_prj_section(cur):
    out = []
    while True:
        line = cur.next()
        if line is None or line.strip() == "EOP":
            return "\n".join(out)
        if line.strip() != "~":
            out.append(line.rstrip())


def _e00_field_width(ftype, size):
    if ftype in (FT_DATE, FT_CHAR, FT_FIXINT):
        return size
    if ftype == FT_BININT:
        return 11 if size == 4 else 6
    if ftype == FT_BINFLOAT:
        return 14 if size == 4 else 24
    if ftype == FT_FIXNUM:
        return 14
    raise ValueError(f"AVC E00: unsupported field type {ftype}")


def _decode_table_value(buf, off, ftype, size):
    if ftype in (FT_DATE, FT_CHAR, FT_FIXINT, FT_FIXNUM):
        w = size if ftype != FT_FIXNUM else 14
        raw = buf[off:off + w]
        if ftype == FT_FIXINT:
            return int(raw.strip() or 0)
        if ftype == FT_FIXNUM:
            return float(raw.strip() or 0)
        return raw.rstrip()
    if ftype == FT_BININT:
        w = 11 if size == 4 else 6
        return int(buf[off:off + w].strip() or 0)
    w = 14 if size == 4 else 24
    return float(buf[off:off + w].strip() or 0)


def _parse_ifo_section(cur):
    """Parse INFO tables until EOI → {table_name: (fields, rows)}."""
    tables = {}
    while True:
        line = cur.next()
        if line is None or line.strip() == "EOI":
            return tables
        if not line.strip():
            continue
        name = line[:32].strip()
        num_fields = _int(line, 34, 4)
        num_defs = _int(line, 38, 4)
        num_records = _int(line, 46, 10)
        fields = []  # (name, ftype, size)
        for _ in range(num_defs):
            ln = cur.next()
            idx = _int(ln, 65, 4)
            if idx <= 0:
                continue
            fname = ln[:16].strip()
            size = _int(ln, 16, 3)
            ftype = (_int(ln, 34, 3) // 10) * 10
            fields.append((fname, ftype, size))
        rec_len = sum(_e00_field_width(t, s) for _, t, s in fields)
        rows = []
        for _ in range(num_records):
            buf = ""
            while len(buf) < rec_len:
                ln = cur.next()
                chunk = ln if ln is not None else ""
                need = rec_len - len(buf)
                chunk = chunk[:max(need, 80)]
                buf += chunk.ljust(min(80, need), " ")
            vals, off = [], 0
            for _, t, s in fields:
                vals.append(_decode_table_value(buf, off, t, s))
                off += _e00_field_width(t, s)
            rows.append(vals)
        tables[name] = (fields, rows)


def parse_e00(path: str) -> dict:
    """Parse an E00 interchange file into raw coverage sections."""
    with open(path, encoding="latin-1") as f:
        lines = f.read().splitlines()
    if not lines or not lines[0].startswith("EXP"):
        raise ValueError(f"AVC: {path} is not an E00 interchange file")
    if _int(lines[0], 3, 3) != 0:
        raise ValueError(
            f"AVC: {path} is a compressed E00 (EXP 1) — not supported, "
            "matching the reference driver")
    cov = {"arcs": [], "labs": [], "cnts": [], "pals": [],
           "tables": {}, "prj": None}
    cur = _Cursor(lines[1:])
    while True:
        line = cur.next()
        if line is None or line.strip() == "EOS":
            break
        key = line[:3]
        if len(line) < 4 or key in ("EOX", "EOL", "EOP", "EOI"):
            continue
        prec = SINGLE if _int(line, 3, 3) == 2 else DOUBLE
        if key == "ARC":
            cov["arcs"] = _parse_arc_section(cur, prec)
        elif key == "LAB":
            cov["labs"] = _parse_lab_section(cur, prec)
        elif key == "CNT":
            cov["cnts"] = _parse_cnt_section(cur, prec)
        elif key == "PAL":
            cov["pals"] = _parse_pal_section(cur, prec)
        elif key == "TOL":
            while True:
                ln = cur.next()
                if ln is None or _int(ln, 0) == -1:
                    break
        elif key == "SIN":
            _skip_until(cur, "EOX")
        elif key == "LOG":
            _skip_until(cur, "EOL")
        elif key == "PRJ":
            cov["prj"] = _parse_prj_section(cur)
        elif key == "IFO":
            cov["tables"] = _parse_ifo_section(cur)
    return cov


# ---------------------------------------------------------------------------
# Binary coverage parsing (big-endian .adf + INFO tables)
# ---------------------------------------------------------------------------

def _read_bin_header(data: bytes):
    """100-byte coverage file header → (precision, data_end)."""
    sig, prec_flag = struct.unpack_from(">ii", data, 0)
    if sig not in (9993, 9994):
        raise ValueError(f"AVC: bad coverage file signature {sig}")
    length_words = struct.unpack_from(">i", data, 24)[0]
    prec = DOUBLE if (prec_flag < 0 or prec_flag > 1000) else SINGLE
    return prec, min(len(data), length_words * 2)


def _read_bin_arcs(path: str):
    data = open(path, "rb").read()
    prec, end = _read_bin_header(data)
    arcs, pos = [], 100
    while pos + 8 <= end:
        arc_id, rec_words = struct.unpack_from(">ii", data, pos)
        start = pos + 8
        (user_id, fnode, tnode, lpoly, rpoly, nvert) = struct.unpack_from(
            ">6i", data, start)
        coords = np.frombuffer(
            data, dtype=">f4" if prec == SINGLE else ">f8",
            count=nvert * 2, offset=start + 24).astype(
            np.float64).reshape(-1, 2)
        arcs.append((arc_id, user_id, fnode, tnode, lpoly, rpoly, coords))
        pos = start + rec_words * 2
    return arcs


def _read_bin_labs(path: str):
    data = open(path, "rb").read()
    prec, end = _read_bin_header(data)
    csz = 4 if prec == SINGLE else 8
    cfmt = ">f" if prec == SINGLE else ">d"
    rec = 8 + 6 * csz
    labs, pos = [], 100
    while pos + rec <= end:
        value, poly_id = struct.unpack_from(">ii", data, pos)
        x = struct.unpack_from(cfmt, data, pos + 8)[0]
        y = struct.unpack_from(cfmt, data, pos + 8 + csz)[0]
        labs.append((value, poly_id, x, y))
        pos += rec
    return labs


def _read_bin_cnts(path: str):
    data = open(path, "rb").read()
    prec, end = _read_bin_header(data)
    csz = 4 if prec == SINGLE else 8
    cfmt = ">f" if prec == SINGLE else ">d"
    cnts, pos = [], 100
    while pos + 8 <= end:
        poly_id, rec_words = struct.unpack_from(">ii", data, pos)
        start = pos + 8
        x = struct.unpack_from(cfmt, data, start)[0]
        y = struct.unpack_from(cfmt, data, start + csz)[0]
        nlab = struct.unpack_from(">i", data, start + 2 * csz)[0]
        ids = list(struct.unpack_from(
            f">{nlab}i", data, start + 2 * csz + 4)) if nlab else []
        cnts.append((poly_id, x, y, ids))
        pos = start + rec_words * 2
    return cnts


def _read_bin_pals(path: str):
    data = open(path, "rb").read()
    prec, end = _read_bin_header(data)
    csz = 4 if prec == SINGLE else 8
    pals, pos = [], 100
    while pos + 8 <= end:
        poly_id, rec_words = struct.unpack_from(">ii", data, pos)
        start = pos + 8
        narcs = struct.unpack_from(">i", data, start + 4 * csz)[0]
        ids = [struct.unpack_from(">i", data, start + 4 * csz + 4 + 12 * k)[0]
               for k in range(narcs)]
        pals.append((poly_id, ids))
        pos = start + rec_words * 2
    return pals


def _read_info_tables(info_dir: str):
    """Scan info/arc.dir → {TABLE.NAME: (fields, rows)} decoded lazily."""
    dir_path = os.path.join(info_dir, "arc.dir")
    if not os.path.exists(dir_path):
        return {}
    data = open(dir_path, "rb").read()
    tables = {}
    for pos in range(0, len(data) - 379, 380):
        name = data[pos:pos + 32].decode("latin-1").strip()
        base = data[pos + 32:pos + 40].decode("latin-1").strip().lower()
        num_fields = struct.unpack_from(">h", data, pos + 40)[0]
        rec_size = struct.unpack_from(">h", data, pos + 42)[0]
        num_records = struct.unpack_from(">i", data, pos + 64)[0]
        external = data[pos + 78:pos + 80].decode("latin-1")
        if not name or num_fields <= 0:
            continue
        tables[name] = (base, rec_size, num_records, external)

    def load(name):
        base, rec_size, num_records, external = tables[name]
        nit = open(os.path.join(info_dir, base + ".nit"), "rb").read()
        fields = []
        for p in range(0, len(nit) - 143, 144):
            fname = nit[p:p + 16].decode("latin-1").strip()
            size, = struct.unpack_from(">h", nit, p + 16)
            ftype = (struct.unpack_from(">h", nit, p + 30)[0]) * 10
            index, = struct.unpack_from(">h", nit, p + 114)
            if index > 0:
                fields.append((fname, ftype, size))
        dat_path = os.path.join(info_dir, base + ".dat")
        if external == "XX":
            # arcNNNN.dat holds an 80-char path (relative to the info
            # dir) to the headerless external data file (e.g. pat.adf).
            rel = open(dat_path, "rb").read(80).decode(
                "latin-1").rstrip()
            dat_path = os.path.normpath(os.path.join(info_dir, rel))
        dat = open(dat_path, "rb").read()
        rows = []
        for r in range(num_records):
            off = r * rec_size
            vals = []
            for _, ftype, size in fields:
                if ftype in (FT_DATE, FT_CHAR, FT_FIXINT, FT_FIXNUM):
                    raw = dat[off:off + size].decode("latin-1")
                    if ftype == FT_FIXINT:
                        vals.append(int(raw.strip() or 0))
                    elif ftype == FT_FIXNUM:
                        vals.append(float(raw.strip() or 0))
                    else:
                        vals.append(raw.rstrip())
                elif ftype == FT_BININT:
                    fmt = ">i" if size == 4 else ">h"
                    vals.append(struct.unpack_from(fmt, dat, off)[0])
                elif ftype == FT_BINFLOAT:
                    fmt = ">f" if size == 4 else ">d"
                    vals.append(float(struct.unpack_from(fmt, dat, off)[0]))
                else:
                    raise ValueError(f"AVC INFO: field type {ftype}")
                off += size
            rows.append(vals)
        return fields, rows

    return {name: load for name in tables}, tables.keys()


def _load_bin_coverage(cov_dir: str) -> dict:
    cov_dir = cov_dir.rstrip("/")
    cover = os.path.basename(cov_dir).upper()
    cov = {"arcs": [], "labs": [], "cnts": [], "pals": [],
           "tables": {}, "prj": None}

    def p(name):
        fp = os.path.join(cov_dir, name)
        return fp if os.path.exists(fp) else None

    if p("arc.adf"):
        cov["arcs"] = _read_bin_arcs(p("arc.adf"))
    if p("lab.adf"):
        cov["labs"] = _read_bin_labs(p("lab.adf"))
    if p("cnt.adf"):
        cov["cnts"] = _read_bin_cnts(p("cnt.adf"))
    if p("pal.adf"):
        cov["pals"] = _read_bin_pals(p("pal.adf"))
    if p("prj.adf"):
        cov["prj"] = "\n".join(
            ln.rstrip() for ln in open(p("prj.adf"), encoding="latin-1")
            if ln.strip() != "~")
    info_dir = os.path.join(os.path.dirname(cov_dir), "info")
    if os.path.isdir(info_dir):
        loaders, names = _read_info_tables(info_dir)
        prefix = cover + "."
        for name in names:
            if name.upper().startswith(prefix):
                fields, rows = loaders[name](name)
                cov["tables"][name] = (fields, rows)
    return cov


# ---------------------------------------------------------------------------
# Layer assembly (shared by E00 and binary)
# ---------------------------------------------------------------------------

_ARROW_TYPES = {FT_DATE: pa.string(), FT_CHAR: pa.string(),
                FT_FIXINT: pa.int64(), FT_FIXNUM: pa.float64(),
                FT_BININT: pa.int64(), FT_BINFLOAT: pa.float64()}


def _find_table(tables: dict, suffix: str):
    """Reference rule: first INFO table whose name contains .AAT/.PAT."""
    for name, tab in tables.items():
        if suffix in name.upper():
            return tab
    return None


def _table_columns(fields, rows, skip_first: int = 0):
    cols = {}
    for j, (fname, ftype, _s) in enumerate(fields):
        if j < skip_first:
            continue
        name = fname.split(" ")[0]
        cols[name] = pa.array([r[j] for r in rows], _ARROW_TYPES[ftype])
    return cols


def _attach(cols: dict, table, keys, skip_first: int = 0):
    """Join table rows onto features by 1-based record index list."""
    if table is None:
        return cols
    fields, rows = table
    picked = [rows[k - 1] if 1 <= k <= len(rows) else
              [None] * len(fields) for k in keys]
    cols.update(_table_columns(fields, picked, skip_first))
    return cols


def _chain_rings(arc_ids, arc_coords):
    """Assemble rings by endpoint chaining, first arc forward (parity
    with OGRBuildPolygonFromEdges on the reference fixtures)."""
    rings, cur = [], None
    for aid in arc_ids:
        if aid == 0:
            continue
        pts = arc_coords.get(abs(aid))
        if pts is None:
            continue
        pts = [tuple(p) for p in pts]
        if cur is None:
            cur = list(pts)
        elif pts[0] == cur[-1]:
            cur.extend(pts[1:])
        elif pts[-1] == cur[-1]:
            cur.extend(pts[-2::-1])
        elif aid < 0:
            cur.extend(pts[::-1])
        else:
            cur.extend(pts)
        if len(cur) >= 4 and cur[0] == cur[-1]:
            rings.append(np.array(cur))
            cur = None
    if cur:
        if cur[0] != cur[-1]:
            cur.append(cur[0])
        if len(cur) >= 4:
            rings.append(np.array(cur))
    return rings


def _meta(tbl: pa.Table, cov: dict) -> pa.Table:
    if cov.get("prj"):
        return tbl.replace_schema_metadata(
            {b"avc_prj": cov["prj"].encode("latin-1")})
    return tbl


def _layer_arc(cov):
    arcs = cov["arcs"]
    aat = _find_table(cov["tables"], ".AAT")
    cols = {
        "UserId": pa.array([a[1] for a in arcs], pa.int64()),
        "FNODE_": pa.array([a[2] for a in arcs], pa.int64()),
        "TNODE_": pa.array([a[3] for a in arcs], pa.int64()),
        "LPOLY_": pa.array([a[4] for a in arcs], pa.int64()),
        "RPOLY_": pa.array([a[5] for a in arcs], pa.int64()),
    }
    # AAT first four fields (FNODE#..RPOLY#) duplicate the ARC record.
    _attach(cols, aat, [a[0] for a in arcs], skip_first=4)
    cols["geometry"] = pa.array(
        [W.linestring_wkb(a[6]) for a in arcs], pa.binary())
    return pa.table(cols)


def _layer_lab(cov):
    labs = cov["labs"]
    pat = _find_table(cov["tables"], ".PAT")
    cols = {
        "ValueId": pa.array([v for v, _p, _x, _y in labs], pa.int64()),
        "PolyId": pa.array([p for _v, p, _x, _y in labs], pa.int64()),
    }
    # With a PAL section the PAT belongs to polygons: key on PolyId;
    # otherwise the PAT rows parallel the LAB records (key on FID).
    keys = ([p for _v, p, _x, _y in labs] if cov["pals"]
            else list(range(1, len(labs) + 1)))
    _attach(cols, pat, keys)
    cols["geometry"] = pa.array(
        [W.point_wkb(x, y) for _v, _p, x, y in labs], pa.binary())
    return pa.table(cols)


def _layer_cnt(cov):
    cnts = cov["cnts"]
    cols = {
        "LabelIds": pa.array([ids for _p, _x, _y, ids in cnts],
                             pa.list_(pa.int64())),
        "geometry": pa.array(
            [W.point_wkb(x, y) for _p, x, y, _ids in cnts], pa.binary()),
    }
    return pa.table(cols)


def _layer_pal(cov):
    arc_coords = {a[0]: a[6] for a in cov["arcs"]}
    pat = _find_table(cov["tables"], ".PAT")
    rows = [p for p in cov["pals"] if p[0] != 1]  # skip universe polygon
    cols = {"ArcIds": pa.array([ids for _p, ids in rows],
                               pa.list_(pa.int64()))}
    _attach(cols, pat, [p for p, _ids in rows])
    geoms = []
    for _pid, ids in rows:
        rings = _chain_rings(ids, arc_coords)
        if not rings:
            geoms.append(None)
        else:
            geoms.append(W.polygon_wkb(rings[0], rings[1:]))
    cols["geometry"] = pa.array(geoms, pa.binary())
    return pa.table(cols)


_LAYER_BUILDERS = {"ARC": _layer_arc, "LAB": _layer_lab,
                   "CNT": _layer_cnt, "PAL": _layer_pal}


def _load_coverage(path: str) -> dict:
    if os.path.isdir(path):
        return _load_bin_coverage(path)
    return parse_e00(path)


def list_layers(path: str) -> list[str]:
    cov = _load_coverage(path)
    out = []
    for name, key in (("ARC", "arcs"), ("CNT", "cnts"),
                      ("LAB", "labs"), ("PAL", "pals")):
        if cov[key]:
            out.append(name)
    return out


def read_avc_local(path: str, layer: str = "ARC") -> pa.Table:
    """Read one layer of an E00 file or binary coverage directory."""
    cov = _load_coverage(path)
    builder = _LAYER_BUILDERS.get(layer.upper())
    if builder is None:
        raise ValueError(f"AVC: unknown layer {layer!r} "
                         f"(have {list(_LAYER_BUILDERS)})")
    return _meta(builder(cov), cov)


def read_avc(paths, layer: str = "ARC"):
    """Coverage-per-task distributed read → Ray Dataset."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        tabs = [read_avc_local(p, layer) for p in batch["path"].to_pylist()]
        return pa.concat_tables(tabs, promote_options="permissive")

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow")
