"""FITS raster + binary-table driver.

Reference role: frmts/fits/fitsdataset.cpp (GDAL 3.13, cfitsio
delegation) re-derived from the public FITS 4.0 standard (NASA/IAU,
"Definition of the Flexible Image Transport System") — 2880-byte
blocks of 80-char header cards, big-endian data, BINTABLE extension
per the standard's Table 18 TFORM codes.

Reference behaviors replicated (pinned in tests/test_fits.py against
the reference's own autotest fixtures):

- HDU model: a file whose single image HDU (primary NAXIS>=2 or
  XTENSION='IMAGE') opens directly; several image HDUs expose
  subdatasets named ``FITS:"path":n`` (1-based HDU index).
- Metadata: non-structural header keywords, string padding preserved
  verbatim; an empty primary HDU (NAXIS=0) acts as global metadata
  merged under every image HDU (later keys override); an image
  primary's keys stay its own (fits.py autotest
  image_in_first_and_second_hdu vs image_in_second_and_fourth).
- BZERO/BSCALE -> band offset/scale (not applied to pixels);
  BLANK -> nodata; rows stored bottom-up (row 1 = south), flipped on
  read/write (fitsdataset.cpp:1744).
- WCS georef (fitsdataset.cpp:3480-3527): CD matrix = CDELT x PC
  (or CDn_m), gt1=cd00*radfac, gt5=-cd11*radfac,
  gt0=crval1*radfac-gt1*(crpix1-0.5), gt3=-gt5*(crpix2-0.5);
  projection = last '-'-token of CTYPE1 (MER Mercator_1SP, CAR
  Equirectangular, SFL Sinusoidal, ZEA LAEA, STG Stereographic);
  spheroid from A_RADIUS/C_RADIUS, names from OBJECT
  (D_<obj>/GCS_<obj>).
- BINTABLE vector layer: TFORM L/X/B/I/J/K/A/E/D/C/M with repeats,
  P/Q variable-length heap arrays, TDIM reshape, TSCAL/TZERO rules
  (integral 2^(bits-1) TZERO = signedness shift, keeps integer type;
  anything else promotes to float), TNULL, complex -> "%.17g + %.17gj"
  strings — every field of the reference's binary_table.fits pinned.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

_BLOCK = 2880
_CARD = 80

_BITPIX_DTYPE = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8",
                 -32: ">f4", -64: ">f8"}
_DTYPE_BITPIX = {"uint8": 8, "int16": 16, "int32": 32, "int64": 64,
                 "float32": -32, "float64": -64,
                 "uint16": 16, "uint32": 32}

# keywords that are structural / consumed, not user metadata
_IGNORED = {"SIMPLE", "XTENSION", "BITPIX", "EXTEND", "PCOUNT", "GCOUNT",
            "COMMENT", "HISTORY", "END", "CHECKSUM", "DATASUM", "BLANK",
            "BSCALE", "BZERO", "LONGSTRN", "CONTINUE", "TFIELDS", "THEAP",
            "OBJECT", "A_RADIUS", "B_RADIUS", "C_RADIUS"}
_IGNORED_RE = re.compile(
    r"^(NAXIS\d*|CTYPE\d|CRVAL\d|CRPIX\d|CDELT\d|CROTA\d|CD\d_\d|PC\d_\d"
    r"|TTYPE\d+|TFORM\d+|TDIM\d+|TSCAL\d+|TZERO\d+|TNULL\d+|TUNIT\d+)$")


def _parse_cards(data: bytes, pos: int):
    """One header unit starting at ``pos`` -> (ordered [(key, raw
    value-string)], end position past the padded header)."""
    cards = []
    p = pos
    while p < len(data):
        done = False
        for i in range(36):
            raw = data[p + i * _CARD:p + (i + 1) * _CARD]
            if len(raw) < _CARD:
                done = True
                break
            key = raw[:8].decode("ascii", "replace").rstrip()
            if key == "END":
                done = True
                break
            rest = raw[8:].decode("ascii", "replace")
            if rest.startswith("= "):
                cards.append((key, rest[2:]))
            elif key in ("COMMENT", "HISTORY", ""):
                cards.append((key, rest))
        p += _BLOCK
        if done:
            return cards, p
    return cards, p


def _value(raw: str):
    """Card value text -> python value. Strings keep inner padding
    verbatim (the reference's metadata contract)."""
    s = raw.strip()
    if s.startswith("'"):
        # quoted string; '' escapes a quote
        out, i = [], 1
        while i < len(s):
            if s[i] == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                break
            out.append(s[i])
            i += 1
        return "".join(out)
    s = s.split("/")[0].strip()
    if s in ("T", "F"):
        return s == "T"
    try:
        if re.match(r"^[+-]?\d+$", s):
            return int(s)
        return float(s)
    except ValueError:
        return s


class Hdu:
    def __init__(self, index, cards, data_offset):
        self.index = index  # 1-based
        self.cards = cards
        self.header = {k: _value(v) for k, v in cards if k}
        self.data_offset = data_offset
        h = self.header
        self.naxis = int(h.get("NAXIS", 0))
        self.shape = [int(h.get(f"NAXIS{i}", 1))
                      for i in range(1, self.naxis + 1)]
        self.bitpix = int(h.get("BITPIX", 8))
        n = 1
        for s in self.shape:
            n *= s
        size = 0 if self.naxis == 0 else n * abs(self.bitpix) // 8
        size += int(h.get("PCOUNT", 0))
        self.data_size = size
        self.end = data_offset + (size + _BLOCK - 1) // _BLOCK * _BLOCK
        xt = str(h.get("XTENSION", "")).strip()
        if index == 1:
            self.kind = "image" if self.naxis >= 2 else "empty"
        elif xt == "IMAGE":
            self.kind = "image" if self.naxis >= 2 else "empty"
        elif xt == "BINTABLE":
            self.kind = "bintable"
        else:
            self.kind = xt.lower() or "unknown"

    def metadata(self) -> dict:
        out = {}
        for k, v in self.cards:
            if not k or k in _IGNORED or _IGNORED_RE.match(k):
                continue
            out[k] = _value(v) if not isinstance(_value(v), str) \
                else _value(v)
            out[k] = _value(v)
            if isinstance(out[k], bool):
                out[k] = "T" if out[k] else "F"
            elif not isinstance(out[k], str):
                out[k] = repr(out[k])
        return out


def parse_hdus(data: bytes) -> list[Hdu]:
    hdus = []
    pos = 0
    while pos + _CARD <= len(data):
        cards, dpos = _parse_cards(data, pos)
        if not cards:
            break
        hdu = Hdu(len(hdus) + 1, cards, dpos)
        hdus.append(hdu)
        pos = hdu.end
    return hdus


# ---------------------------------------------------------------------------
# raster
# ---------------------------------------------------------------------------


def _build_srs(h: dict) -> str:
    ctype = str(h.get("CTYPE1", ""))
    proj = ctype.rsplit("-", 1)[-1] if "-" in ctype else ""
    obj = str(h.get("OBJECT", "unknown")).strip() or "unknown"
    a = float(h.get("A_RADIUS", 0) or 0)
    c = float(h.get("C_RADIUS", a) or a)
    if not a:
        return ""
    invf = 0.0 if a == c else a / (a - c)
    invf_s = f"{invf:.15g}"
    geogcs = (f'GEOGCS["GCS_{obj}",DATUM["D_{obj}",SPHEROID["{obj}",'
              f'{a:.10g},{invf_s}]],PRIMEM["Reference_Meridian",0],'
              f'UNIT["degree",0.0174532925199433,'
              f'AUTHORITY["EPSG","9122"]]]')
    crval1 = float(h.get("CRVAL1", 0) or 0)
    crval2 = float(h.get("CRVAL2", 0) or 0)
    if crval1 > 180.0:
        crval1 -= 180.0
    unit = 'UNIT["metre",1,AUTHORITY["EPSG","9001"]]'
    axes = 'AXIS["Easting",EAST],AXIS["Northing",NORTH]'

    def projcs(name, projection, params):
        p = ",".join(f'PARAMETER["{k}",{v:.15g}]' for k, v in params)
        return (f'PROJCS["{name}_{obj}",{geogcs},'
                f'PROJECTION["{projection}"],{p},{unit},{axes}]')

    if proj == "MER":
        return projcs("Mercator", "Mercator_1SP",
                      [("central_meridian", crval1), ("scale_factor", 1),
                       ("false_easting", 0), ("false_northing", 0)])
    if proj == "CAR":
        return projcs("Equirectangular", "Equirectangular",
                      [("standard_parallel_1", crval2),
                       ("central_meridian", crval1),
                       ("false_easting", 0), ("false_northing", 0)])
    if proj == "SFL":
        return projcs("Sinusoidal", "Sinusoidal",
                      [("longitude_of_center", crval1),
                       ("false_easting", 0), ("false_northing", 0)])
    if proj == "ZEA":
        return projcs("LAEA", "Lambert_Azimuthal_Equal_Area",
                      [("latitude_of_center", crval2),
                       ("longitude_of_center", crval1),
                       ("false_easting", 0), ("false_northing", 0)])
    if proj == "STG":
        return projcs("Stereographic", "Stereographic",
                      [("latitude_of_origin", crval2),
                       ("central_meridian", crval1), ("scale_factor", 1),
                       ("false_easting", 0), ("false_northing", 0)])
    return geogcs if not proj else ""


def _geotransform(h: dict):
    if "CRPIX1" not in h or "CRPIX2" not in h:
        return None
    a = float(h.get("A_RADIUS", 0) or 0)
    if not a:
        return None
    radfac = math.pi / 180.0 * a
    if "CDELT1" in h and "PC1_1" in h:
        cd00 = float(h["CDELT1"]) * float(h["PC1_1"])
        cd01 = float(h["CDELT1"]) * float(h.get("PC1_2", 0))
        cd10 = float(h["CDELT2"]) * float(h.get("PC2_1", 0))
        cd11 = float(h["CDELT2"]) * float(h.get("PC2_2", 1))
    elif "CD1_1" in h:
        cd00 = float(h["CD1_1"])
        cd01 = float(h.get("CD1_2", 0))
        cd10 = float(h.get("CD2_1", 0))
        cd11 = float(h["CD2_2"])
    elif "CDELT1" in h:
        cd00, cd01, cd10 = float(h["CDELT1"]), 0.0, 0.0
        cd11 = float(h.get("CDELT2", h["CDELT1"]))
    else:
        return None
    crval1 = float(h.get("CRVAL1", 0) or 0)
    if crval1 > 180.0:
        crval1 -= 180.0
    gt1 = cd00 * radfac
    gt2 = cd01 * radfac
    gt4 = cd10 * radfac
    gt5 = -cd11 * radfac
    gt0 = crval1 * radfac - gt1 * (float(h["CRPIX1"]) - 0.5)
    gt3 = -gt5 * (float(h["CRPIX2"]) - 0.5)
    return (gt0, gt1, gt2, gt3, gt4, gt5)


_SUBDS_RE = re.compile(r'^FITS:"(.*)":(\d+)$')


def fits_subdatasets(path: str) -> list[tuple[str, str]]:
    from gdal_ray.vsi import vsi_read_bytes

    hdus = parse_hdus(vsi_read_bytes(path))
    out = []
    for hdu in hdus:
        if hdu.kind != "image":
            continue
        w, hgt = hdu.shape[0], hdu.shape[1]
        nb = hdu.shape[2] if len(hdu.shape) > 2 else 1
        name = hdu.header.get("EXTNAME", "")
        label = f"HDU {hdu.index} ({w}x{hgt}, {nb} band" + \
            ("s" if nb > 1 else "") + ")"
        if name:
            label += f", {name}"
        out.append((f'FITS:"{path}":{hdu.index}', label))
    return out


def read_fits(path: str) -> dict:
    """FITS image (plain path or ``FITS:"path":n`` subdataset) ->
    decode_geotiff-shaped dict (+ metadata / offset / scale /
    subdatasets)."""
    from gdal_ray.vsi import vsi_read_bytes

    m = _SUBDS_RE.match(path)
    want = None
    if m:
        path, want = m.group(1), int(m.group(2))
    data = vsi_read_bytes(path)
    hdus = parse_hdus(data)
    if not hdus:
        raise ValueError("not a FITS file")
    images = [h for h in hdus if h.kind == "image"]
    primary_global = hdus[0].metadata() if hdus[0].kind == "empty" else {}

    if want is not None:
        if want < 1 or want > len(hdus) or hdus[want - 1].kind != "image":
            raise ValueError(f"HDU {want} is not an image HDU")
        sel = hdus[want - 1]
    elif len(images) == 1:
        sel = images[0]
    elif not images:
        raise ValueError("FITS file has no image HDU")
    else:
        # several images: container dataset with subdatasets
        meta = dict(hdus[0].metadata())
        return {"bands": [], "crs": "", "geotransform": None,
                "nodata": None, "metadata": meta,
                "subdatasets": fits_subdatasets(path)}

    h = sel.header
    w, hgt = sel.shape[0], sel.shape[1]
    nb = sel.shape[2] if len(sel.shape) > 2 else 1
    dt = np.dtype(_BITPIX_DTYPE[sel.bitpix])
    arr = np.frombuffer(data, dtype=dt, count=w * hgt * nb,
                        offset=sel.data_offset)
    cube = arr.reshape(nb, hgt, w)
    # FITS rows start at the bottom left (fitsdataset.cpp:1744)
    bands = [np.ascontiguousarray(cube[b][::-1]).astype(
        dt.newbyteorder("=")) for b in range(nb)]
    meta = dict(primary_global)
    meta.update(sel.metadata())
    out = {"bands": bands, "crs": _build_srs(h),
           "geotransform": _geotransform(h),
           "nodata": (float(h["BLANK"]) if "BLANK" in h else None),
           "metadata": meta, "subdatasets": [],
           "offset": float(h.get("BZERO", 0) or 0),
           "scale": float(h.get("BSCALE", 1) or 1)}
    return out


def write_fits(path: str, bands, metadata: dict | None = None,
               offset: float | None = None, scale: float | None = None,
               nodata: float | None = None) -> None:
    """CreateCopy role: one primary image HDU, bottom-up rows,
    BZERO/BSCALE from offset/scale, BLANK from nodata."""
    from gdal_ray.vsi import vsi_write_bytes

    if isinstance(bands, np.ndarray):
        bands = [bands]
    arr = np.stack(bands)
    nb, h, w = arr.shape
    key = str(arr.dtype)
    if key not in _DTYPE_BITPIX:
        raise ValueError(f"unsupported dtype {key}")
    bitpix = _DTYPE_BITPIX[key]
    bzero = offset
    if key == "uint16":
        arr = (arr.astype(np.int32) - 32768).astype(np.int16)
        bzero = 32768.0
    elif key == "uint32":
        arr = (arr.astype(np.int64) - 2147483648).astype(np.int32)
        bzero = 2147483648.0

    cards = []

    def card(key, val, comment=""):
        if isinstance(val, str):
            v = "'" + val.ljust(8) + "'"
        elif isinstance(val, bool):
            v = ("T" if val else "F").rjust(20)
        elif isinstance(val, int):
            v = str(val).rjust(20)
        else:
            v = f"{val:.15g}".rjust(20)
        line = f"{key:<8}= {v}"
        if comment:
            line += " / " + comment
        cards.append(line[:80].ljust(80))

    card("SIMPLE", True, "file does conform to FITS standard")
    card("BITPIX", bitpix, "number of bits per data pixel")
    card("NAXIS", 3 if nb > 1 else 2, "number of data axes")
    card("NAXIS1", w)
    card("NAXIS2", h)
    if nb > 1:
        card("NAXIS3", nb)
    card("EXTEND", True)
    if bzero not in (None, 0):
        card("BZERO", bzero)
    if scale not in (None, 1):
        card("BSCALE", scale)
    if nodata is not None:
        card("BLANK", nodata)
    for k, v in (metadata or {}).items():
        card(str(k)[:8].upper(), v)
    cards.append("END".ljust(80))
    hdr = "".join(cards).encode("ascii")
    hdr += b" " * (-len(hdr) % _BLOCK)
    body = arr[:, ::-1, :].astype(
        np.dtype(_BITPIX_DTYPE[bitpix])).tobytes()
    body += b"\x00" * (-len(body) % _BLOCK)
    vsi_write_bytes(path, hdr + body)


# ---------------------------------------------------------------------------
# BINTABLE vector layer
# ---------------------------------------------------------------------------

_TFORM_RE = re.compile(r"^(\d*)([LXBIJKAEDCMPQ])([A-Z]?)(?:\((\d+)\))?")
_T_SIZE = {"L": 1, "X": 0, "B": 1, "I": 2, "J": 4, "K": 8,
           "A": 1, "E": 4, "D": 8, "C": 8, "M": 16}
_T_DTYPE = {"B": ">u1", "I": ">i2", "J": ">i4", "K": ">i8",
            "E": ">f4", "D": ">f8", "C": ">c8", "M": ">c16"}


def _g17(v: float) -> str:
    return f"{v:.17g}"


def _complex_str(v) -> str:
    return f"{_g17(v.real)} + {_g17(v.imag)}j"


def read_fits_table(path: str, hdu: int | None = None):
    """BINTABLE HDU -> (pyarrow.Table, layer_name).

    Columns follow the reference's OGR mapping: scalars stay
    scalars, repeat>1 / P / Q / TDIM become lists, rX bit fields
    explode to ``name_bitK`` int columns, C/M complex render as
    "%.17g + %.17gj" strings, TSCAL/TZERO and TNULL applied."""
    from gdal_ray.vsi import vsi_read_bytes

    data = vsi_read_bytes(path)
    hdus = parse_hdus(data)
    tables = [x for x in hdus if x.kind == "bintable"]
    if hdu is not None:
        sel = hdus[hdu - 1]
    elif tables:
        sel = tables[0]
    else:
        raise ValueError("FITS file has no BINTABLE HDU")
    h = sel.header
    nfields = int(h["TFIELDS"])
    row_len = sel.shape[0]
    nrows = sel.shape[1]
    heap_off = sel.data_offset + int(h.get("THEAP", row_len * nrows))
    raw = np.frombuffer(data, dtype=np.uint8, count=row_len * nrows,
                        offset=sel.data_offset).reshape(nrows, row_len)

    cols: dict[str, pa.Array] = {}
    pos = 0
    for i in range(1, nfields + 1):
        name = str(h.get(f"TTYPE{i}", f"col{i}")).strip()
        tform = str(h[f"TFORM{i}"]).strip()
        m = _TFORM_RE.match(tform)
        if not m:
            raise ValueError(f"bad TFORM {tform!r}")
        rep = int(m.group(1) or "1")
        code = m.group(2)
        sub = m.group(3)  # for P/Q: the element type
        scal = h.get(f"TSCAL{i}")
        zero = h.get(f"TZERO{i}")
        tnull = h.get(f"TNULL{i}")

        _CLAMP = {"B": (0, 255), "I": (-32768, 32767),
                  "J": (-2147483648, 2147483647),
                  "K": (-(2 ** 63), 2 ** 63 - 1)}

        def scaled_out(vals, code, nulls=None):
            """Apply TSCAL/TZERO typing rules to an int/float/complex
            numpy array -> (values list, is_float, is_string)."""
            s = float(scal) if scal is not None else 1.0
            z = float(zero) if zero is not None else 0.0
            if code in ("C", "M"):
                if scal is not None or zero is not None:
                    vals = vals * s + complex(z, z)
                return [_complex_str(v) for v in vals], False, True
            if code in ("E", "D"):
                if scal is not None or zero is not None:
                    vals = vals * s + z
                return vals.astype(np.float64), True, False
            # integer family
            if scal is None and zero is None:
                return vals.astype(np.int64), False, False
            bits = {"B": 8, "I": 16, "J": 32, "K": 64}[code]
            shift = -(2 ** (bits - 1)) if code == "B" else 2 ** (bits - 1)
            if (scal in (None, 1) and zero is not None
                    and float(zero) == shift):
                # cfitsio signedness shift, stays integer
                # (fitsdataset.cpp:343-390 TSBYTE/TUSHORT/TUINT)
                return vals.astype(np.int64) + int(zero), False, False
            # reference double-scaling parity (fitsdataset.cpp:622-646):
            # cfitsio scales raw*s+z, casts/truncs+clamps back to the
            # column's integer type, then GDAL applies s,z AGAIN
            lo, hi = _CLAMP[code]
            once = vals.astype(np.float64) * s + z
            as_int = np.clip(np.trunc(once), lo, hi)
            return as_int * s + z, True, False

        if code == "X":
            nbytes = (rep + 7) // 8
            chunk = raw[:, pos:pos + nbytes]
            bits = np.unpackbits(chunk, axis=1)[:, :rep]
            if rep == 1:
                cols[f"{name}_bit1"] = pa.array(bits[:, 0].astype(np.int32))
            else:
                for b in range(rep):
                    cols[f"{name}_bit{b + 1}"] = pa.array(
                        bits[:, b].astype(np.int32))
            pos += nbytes
            continue
        if code in ("P", "Q"):
            dsz = 4 if code == "P" else 8
            desc = raw[:, pos:pos + 2 * dsz].copy().view(
                ">i4" if code == "P" else ">i8").reshape(nrows, 2)
            esz = _T_SIZE[sub]
            rows_out = []
            for r in range(nrows):
                cnt, off = int(desc[r, 0]), int(desc[r, 1])
                buf = data[heap_off + off:heap_off + off + cnt * max(esz, 1)]
                if sub == "L":
                    # cfitsio maps both binary 1 and 'T' to true in
                    # variable-length arrays (the P branch does not
                    # hit the fixed-L '1' quirk)
                    rows_out.append([1 if b in (1, ord("T")) else 0
                                     for b in buf])
                elif sub == "A":
                    rows_out.append(buf.decode("ascii", "replace"))
                else:
                    vals = np.frombuffer(buf, dtype=_T_DTYPE[sub],
                                         count=cnt)
                    out, isf, iss = scaled_out(vals, sub)
                    rows_out.append(list(out) if not iss else out)
            if sub == "A":
                cols[name] = pa.array(rows_out, pa.string())
            elif sub == "L":
                cols[name] = pa.array(rows_out, pa.list_(pa.int32()))
            elif sub in ("C", "M"):
                cols[name] = pa.array(rows_out, pa.list_(pa.string()))
            elif sub in ("E", "D") or scal is not None or zero is not None:
                cols[name] = pa.array(
                    [[float(v) for v in r] for r in rows_out],
                    pa.list_(pa.float64()))
            else:
                cols[name] = pa.array(
                    [[int(v) for v in r] for r in rows_out],
                    pa.list_(pa.int64()))
            pos += 2 * dsz
            continue
        if code == "A":
            width = rep
            chunk = raw[:, pos:pos + width]
            tdim = h.get(f"TDIM{i}")
            if tdim:
                dims = [int(x) for x in
                        re.findall(r"\d+", str(tdim))]
                sw = dims[0]
                n = width // sw
                vals = [[chunk[r, k * sw:(k + 1) * sw].tobytes()
                         .decode("ascii", "replace").rstrip()
                         for k in range(n)] for r in range(nrows)]
                cols[name] = pa.array(vals, pa.list_(pa.string()))
            else:
                vals = [chunk[r].tobytes().decode("ascii", "replace")
                        .rstrip() for r in range(nrows)]
                cols[name] = pa.array(vals, pa.string())
            pos += width
            continue
        if code == "L":
            # reference parity quirk (fitsdataset.cpp:702): fixed L
            # columns compare cfitsio's binary 1/0 against the
            # CHARACTER '1' -- never true, so every value reads 0
            vals = np.zeros((nrows, rep), np.int32)
            if rep == 1:
                cols[name] = pa.array(vals[:, 0])
            else:
                cols[name] = pa.array([list(map(int, vals[r]))
                                       for r in range(nrows)],
                                      pa.list_(pa.int32()))
            pos += rep
            continue
        esz = _T_SIZE[code]
        chunk = raw[:, pos:pos + rep * esz].copy().view(
            _T_DTYPE[code]).reshape(nrows, rep)
        out, is_float, is_str = scaled_out(chunk.reshape(-1), code)
        if is_str:
            vals = np.array(out, dtype=object).reshape(nrows, rep)
        else:
            vals = np.asarray(out).reshape(nrows, rep)
        null_mask = None
        if tnull is not None and not is_float and not is_str:
            null_mask = (chunk.astype(np.int64)
                         == int(tnull))
        if rep == 1:
            v = vals[:, 0]
            if is_str:
                cols[name] = pa.array(list(v), pa.string())
            elif null_mask is not None:
                cols[name] = pa.array(
                    [None if null_mask[r, 0] else v[r]
                     for r in range(nrows)])
            else:
                cols[name] = pa.array(v)
        else:
            if is_str:
                cols[name] = pa.array([list(vals[r])
                                       for r in range(nrows)],
                                      pa.list_(pa.string()))
            else:
                cols[name] = pa.array(
                    [list(vals[r]) for r in range(nrows)],
                    pa.list_(pa.float64() if is_float else pa.int64()))
        pos += rep * esz

    layer = str(h.get("EXTNAME", "table")).strip()
    return pa.table(cols), layer


def read_fits_vector(paths, hdu: int | None = None):
    """BINTABLE file(s) -> Ray Dataset (one file = one task)."""
    from gdal_ray.formats import _binary_ds  # noqa: F401
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    ds = rd.from_items([{"path": p} for p in paths])

    def load(batch: pa.Table) -> pa.Table:
        tabs = []
        for p in batch["path"].to_pylist():
            t, _ = read_fits_table(p, hdu=hdu)
            tabs.append(t)
        return pa.concat_tables(tabs, promote_options="default")

    return ds.map_batches(load, batch_format="pyarrow")
