"""JPL/MIPL VICAR planetary image driver (read + uncompressed write).

Reference role: frmts/pds/vicardataset.cpp + vicarkeywordhandler.cpp
(GDAL 3.13), re-derived from the published VICAR file format spec
(NASA/JPL MIPL) and the public DLR HRSC label documentation:

- label: ``LBLSIZE=n`` then space-separated ``KEY=value`` pairs
  (strings in single quotes with ``''`` escape, arrays in parens,
  ints/reals typed by pattern); ``PROPERTY='NAME'`` / ``TASK='NAME'``
  open nested groups; parse stops at NUL; ``EOL=1`` appends an
  end-of-dataset label at EOCI (or image end), re-parsed with its
  own LBLSIZE prefix skipped;
- layout: FORMAT (BYTE/HALF/WORD/FULL/LONG/REAL/DOUB/COMP) × ORG
  (BSQ/BIL/BIP) with RECSIZE/NLB header records and NBB binary
  prefix bytes per record; INTFMT LOW/HIGH, REALFMT IEEE (big) /
  RIEEE (little) / VAX (F- and D-float word-swapped, converted with
  the exact NASA conv_vax_ieee_r denormal/NaN rules);
- BASIC / BASIC2 compression: per-record bit stream of 3-bit byte
  deltas (-3..3 from the previous value), escape code 7 → 1 bit
  selecting an 8-bit literal or a run (4-bit count, 15 → 8-bit,
  255 → 24-bit little-endian) followed by the repeated value's
  code; bytes of multi-byte pixels coded plane-by-plane,
  little-endian.  BASIC prefixes each record with a u32 size
  (self-inclusive); BASIC2 packs all u32 record sizes right after
  the label;
- georef: PROPERTY MAP group through the same ParseSRS rules as the
  in-repo PDS3 driver (MAP_SCALE km→m, the 0.5 / −1 ProjOffset
  shift/mult knobs, sphere-forcing per projection, GCS_/D_ target
  naming); GEOTIFF property group (MODELTIEPOINTTAG /
  MODELPIXELSCALETAG) as the alternative;
- the binary prefix area (NBB bytes per record) exposed as a
  row-per-record table using the BLTYPE field tables from the
  reference's public vicar.json config (GDAL_AUTOTEST + M94_HRSC,
  the latter from the public DLR HRSC_LABEL_HEADER document);
- HRSC (BLTYPE=M94_HRSC) instrument metadata keyword table, DTM
  scale/offset, BYTE/HALF/REAL default nodata for known
  instruments.

Pinned against every reference autotest fixture (gdrivers/vicar.py):
13 dtype/endianness/VAX checksums, 4 BASIC/BASIC2 checksums, the
HRSC truncated label metadata + Sinusoidal Mars SRS + gt, the
binary-prefix feature, and write roundtrips.
"""

from __future__ import annotations

import numpy as np

_FORMAT_DTYPES = {
    "BYTE": ("u1", 1), "HALF": ("i2", 2), "WORD": ("i2", 2),
    "FULL": ("i4", 4), "LONG": ("i4", 4), "REAL": ("f4", 4),
    "DOUB": ("f8", 8), "COMP": ("c8", 8), "COMPLEX": ("c8", 8),
}

# ---------------------------------------------------------------------------
# Label grammar (vicarkeywordhandler.cpp role)


def _is_int(s: str) -> bool:
    t = s.strip()
    if t[:1] in "+-":
        t = t[1:]
    return t.isdigit() and t != ""


def _is_real(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


class _LabelParser:
    def __init__(self, text: str):
        self.t = text
        self.i = 0
        self.n = len(text)

    def _skip_white(self):
        while self.i < self.n and self.t[self.i].isspace():
            self.i += 1

    def _at_end(self) -> bool:
        return self.i >= self.n or self.t[self.i] == "\0"

    def _read_name(self) -> str | None:
        self._skip_white()
        if self._at_end():
            return None
        w = []
        while not self._at_end() and self.t[self.i] != "=" \
                and not self.t[self.i].isspace():
            w.append(self.t[self.i])
            self.i += 1
        self._skip_white()
        if self._at_end() or self.t[self.i] != "=":
            return None
        self.i += 1
        self._skip_white()
        return "".join(w)

    def _read_value(self, in_list: bool):
        """-> (raw_string, is_string) or None at stream end."""
        self._skip_white()
        if self._at_end():
            return None
        w = []
        if self.t[self.i] == "'":
            self.i += 1
            while True:
                if self._at_end():
                    return None
                ch = self.t[self.i]
                if ch == "'":
                    if self.i + 1 < self.n and self.t[self.i + 1] == "'":
                        self.i += 1  # '' -> literal quote
                    else:
                        break
                w.append(self.t[self.i])
                self.i += 1
            self.i += 1
            self._skip_white()
            if in_list and (self._at_end()
                            or self.t[self.i] not in ",)"):
                return None
            return "".join(w), True
        while True:
            if self._at_end():
                if in_list:
                    return None
                s = "".join(w)
                return s, not (_is_int(s) or _is_real(s))
            ch = self.t[self.i]
            if ch.isspace():
                break
            if in_list and ch in ",)":
                s = "".join(w)
                return s, not (_is_int(s) or _is_real(s))
            w.append(ch)
            self.i += 1
        s = "".join(w)
        self._skip_white()
        if in_list and (self._at_end() or self.t[self.i] not in ",)"):
            return None
        return s, not (_is_int(s) or _is_real(s))

    @staticmethod
    def _typed(raw: str, is_string: bool):
        if is_string:
            return raw
        if _is_int(raw):
            return int(raw)
        return float(raw)

    def parse(self):
        """-> (label dict incl. PROPERTY/TASK subdicts, flat kw map).

        The flat map mirrors the reference's keyword list: group
        members keyed ``GROUP.NAME``, raw string values (arrays as
        comma-joined)."""
        label: dict = {}
        props: dict = {}
        tasks: dict = {}
        flat: dict[str, str] = {}
        cur = label
        group = ""
        while True:
            name = self._read_name()
            if name is None:
                break
            if self.i < self.n and self.t[self.i] == "(":
                self.i += 1
                arr = []
                raws = []
                while True:
                    v = self._read_value(True)
                    if v is None:
                        break
                    arr.append(self._typed(*v))
                    raws.append(v[0])
                    if self.i < self.n and self.t[self.i] == ")":
                        self.i += 1
                        break
                    self.i += 1  # the comma
                cur[name] = arr
                raw = ",".join(raws)
                is_group = False
            else:
                v = self._read_value(False)
                if v is None:
                    break
                raw = v[0]
                is_group = name.upper() in ("PROPERTY", "TASK")
                if not is_group:
                    cur[name] = self._typed(*v)
            if is_group:
                cur = {}
                group = raw
                if name.upper() == "PROPERTY":
                    props[group] = cur
                else:
                    tasks[group] = cur
            else:
                flat[(group + "." if group else "") + name] = raw
        if props:
            label["PROPERTY"] = props
        if tasks:
            label["TASK"] = tasks
        return label, flat


def parse_vicar_label(data: bytes):
    """First label (+ EOL extension) -> (label json dict, flat kw)."""
    head = data[:1024]
    p = head.find(b"LBLSIZE")
    if p < 0:
        raise ValueError("not a VICAR file (no LBLSIZE)")
    eq = head.find(b"=", p)
    lblsize = int(head[eq + 1:eq + 32].split()[0])
    if lblsize <= 0:
        raise ValueError("bad LBLSIZE")
    text = data[:lblsize].decode("latin-1")
    label, flat = _LabelParser(text).parse()
    if str(flat.get("EOL", "0")) == "1":
        # end-of-dataset label: at EOCI, or just past the image
        img_off, _, _, _, _, img_size = _spacings(flat)
        eoci = (int(flat.get("EOCI2", "0") or 0) << 32) | \
            int(flat.get("EOCI1", "0") or 0)
        start = eoci if eoci else img_off + img_size
        chunk = data[start:start + 64]
        p2 = chunk.find(b"LBLSIZE")
        if p2 < 0:
            raise ValueError("END-OF-DATASET LABEL NOT FOUND")
        eq2 = chunk.find(b"=", p2)
        rest = chunk[eq2 + 1:].lstrip()
        val = rest.split()[0]
        skip = len(chunk) - len(rest) + len(val)
        eolsize = int(val)
        text2 = data[start:start + eolsize].decode("latin-1")
        label, flat = _LabelParser(text + text2[skip:]).parse()
    return label, flat


def _spacings(flat: dict):
    """-> (image_offset_without_nbb, pixel_off, line_off, band_off,
    nbb, image_size) in bytes (GetSpacings role)."""
    fmt = str(flat.get("FORMAT", "")).upper()
    if fmt not in _FORMAT_DTYPES:
        raise ValueError(f"unknown VICAR FORMAT {fmt!r}")
    item = _FORMAT_DTYPES[fmt][1]
    org = str(flat.get("ORG", "BSQ")).upper()
    nbb = int(flat.get("NBB", "0") or 0)
    ns = int(flat.get("NS", "0") or 0)
    nl = int(flat.get("NL", "0") or 0)
    nb = int(flat.get("NB", "1") or 1)
    if org == "BIP":
        pixel = item * nb
        band = item
        line = nbb + pixel * ns
        size = line * nl
    elif org == "BIL":
        pixel = item
        band = item * ns
        line = nbb + band * nb
        size = line * nl
    elif org == "BSQ":
        pixel = item
        line = nbb + pixel * ns
        band = line * nl
        size = band * nb
    else:
        raise ValueError(f"ORG={org} layout not supported")
    lblsize = int(flat.get("LBLSIZE", "0") or 0)
    recsize = int(flat.get("RECSIZE", "0") or 0)
    nlb = int(flat.get("NLB", "0") or 0)
    img_off = lblsize + recsize * nlb
    return img_off, pixel, line, band, nbb, size


# ---------------------------------------------------------------------------
# VAX floating point (port/cpl_vax.cpp role, NASA conv_vax_ieee_r)


def vax_to_ieee32(raw: np.ndarray) -> np.ndarray:
    """VAX F-float bytes (..., 4) u1 -> IEEE float32 (vectorized)."""
    b = raw.reshape(-1, 4)
    # rational (big-endian) order: swap bytes within each 16-bit word
    v = (b[:, 1].astype(np.uint32) << 24) | \
        (b[:, 0].astype(np.uint32) << 16) | \
        (b[:, 3].astype(np.uint32) << 8) | b[:, 2].astype(np.uint32)
    sign = v & 0x80000000
    exp = (v >> 23) & 0xFF
    man = v & 0x7FFFFF
    out = np.where(exp >= 3, sign | ((exp - 2) << 23) | man, 0)
    out = np.where(exp == 2, sign | ((0x800000 | man) >> 1), out)
    out = np.where(exp == 1, sign | ((0x800000 | man) >> 2), out)
    out = np.where((exp == 0) & (sign != 0),
                   np.uint32(0x7FFFFFFF), out)  # reserved -> NaN
    out = np.where((exp == 0) & (sign == 0), np.uint32(0), out)
    return out.astype(np.uint32).view(np.float32)


def vax_to_ieee64(raw: np.ndarray) -> np.ndarray:
    """VAX D-float bytes (..., 8) u1 -> IEEE float64 (vectorized,
    sticky-bit rounding like CPLVaxToIEEEDouble)."""
    b = raw.reshape(-1, 8).astype(np.uint64)
    # word-swapped: words (1,0),(3,2),(5,4),(7,6) big-endian
    v = (b[:, 1] << 56) | (b[:, 0] << 48) | (b[:, 3] << 40) | \
        (b[:, 2] << 32) | (b[:, 5] << 24) | (b[:, 4] << 16) | \
        (b[:, 7] << 8) | b[:, 6]
    sign = v & np.uint64(0x8000000000000000)
    exp = (v >> np.uint64(55)) & np.uint64(0xFF)
    man = v & np.uint64(0x007FFFFFFFFFFFFF)  # 55 bits
    sticky = (man & np.uint64(7)) != 0
    m52 = (man >> np.uint64(3)) | sticky.astype(np.uint64)
    e = np.where(exp != 0, exp - np.uint64(129) + np.uint64(1023),
                 np.uint64(0))
    out = np.where(exp != 0, sign | (e << np.uint64(52)) | m52,
                   np.uint64(0))
    return out.astype(np.uint64).view(np.float64)


# ---------------------------------------------------------------------------
# BASIC / BASIC2 codec (vicardataset.cpp basic_decode role)

_TRNS = (-3, -2, -1, 0, 1, 2, 3)


class _BitReader:
    __slots__ = ("buf", "pos", "bit", "n")

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0
        self.bit = 0
        self.n = len(buf)

    def grab(self, nbit: int) -> int:
        shift = 8 - nbit - self.bit
        if self.pos >= self.n:
            raise ValueError("out of decoding buffer")
        if shift > 0:
            val = (self.buf[self.pos] >> shift) & ((1 << nbit) - 1)
            self.bit += nbit
            return val
        if shift < 0:
            v1 = self.buf[self.pos] & ((1 << (nbit + shift)) - 1)
            self.pos += 1
            if self.pos >= self.n:
                raise ValueError("out of decoding buffer")
            v2 = (self.buf[self.pos] >> (8 + shift)) & ((1 << -shift) - 1)
            self.bit = -shift
            return (v1 << -shift) + v2
        val = self.buf[self.pos] & ((1 << nbit) - 1)
        self.pos += 1
        self.bit = 0
        return val


def basic_decode(code: bytes, ns: int, wid: int) -> np.ndarray:
    """One record -> ns*wid little-endian bytes (plane-by-plane)."""
    out = np.zeros(ns * wid, np.uint8)
    r = _BitReader(code)
    run = -3
    nval = 999999
    old = 0
    grab = r.grab
    for iw in range(wid):
        for ip in range(iw, ns * wid, wid):
            if run > -3:
                out[ip] = nval & 0xFF
                run -= 1
                continue
            val = grab(3)
            if val < 7:
                nval = (old + _TRNS[val]) & 0xFFFFFFFF
                out[ip] = nval & 0xFF
                old = nval
                continue
            if grab(1):
                rc = grab(4)
                if rc == 15:
                    rc = grab(8)
                    if rc == 255:
                        run = grab(8) | (grab(8) << 8) | (grab(8) << 16)
                    else:
                        run = rc + 15
                else:
                    run = rc
                val = grab(3)
                if val < 7:
                    nval = (old + _TRNS[val]) & 0xFFFFFFFF
                else:
                    nval = grab(8)
                out[ip] = nval & 0xFF
                old = nval
            else:
                val = grab(8)
                out[ip] = val
                old = val
    return out


class _BitWriter:
    __slots__ = ("out", "reg", "bit")

    def __init__(self):
        self.out = bytearray()
        self.reg = 0
        self.bit = 0

    def emit(self, val: int, nbit: int):
        shift = 8 - nbit - self.bit
        if shift > 0:
            self.reg |= val << shift
            self.bit += nbit
            return
        if shift < 0:
            self.out.append((self.reg | (val >> -shift)) & 0xFF)
            self.reg = (val << (8 + shift)) & 0xFF
            self.bit = -shift
            return
        self.out.append((self.reg | val) & 0xFF)
        self.reg = 0
        self.bit = 0

    def finish(self) -> bytes:
        if self.bit:
            self.out.append(self.reg & 0xFF)
        return bytes(self.out)


def basic_encode(rec: np.ndarray, ns: int, wid: int) -> bytes:
    """Inverse of basic_decode — one record of ns*wid LE bytes.
    Emits the same stream shapes the decoder understands (delta
    codes, literal escape, run escape); roundtrip-pinned rather
    than byte-pinned against the reference encoder."""
    w = _BitWriter()
    vals = [int(rec[ip]) for iw in range(wid)
            for ip in range(iw, ns * wid, wid)]
    old = 0
    i = 0
    n = len(vals)

    def emit_val(v, prev):
        d = v - prev
        if -3 <= d <= 3:
            w.emit(d + 3, 3)
        else:
            w.emit(7, 3)
            w.emit(0, 1)
            w.emit(v, 8)

    while i < n:
        v = vals[i]
        j = i + 1
        while j < n and vals[j] == v:
            j += 1
        runlen = j - i  # total copies of v
        extra = runlen - 1  # repeats after the first
        if extra >= 4:
            # run escape: count = extra - 3 per the decoder's
            # run>-3 loop (count N emits N+3 additional values)
            cnt = extra - 3
            w.emit(7, 3)
            w.emit(1, 1)
            if cnt < 15:
                w.emit(cnt, 4)
            elif cnt < 15 + 255:
                w.emit(15, 4)
                w.emit(cnt - 15, 8)
            else:
                w.emit(15, 4)
                w.emit(255, 8)
                w.emit(cnt & 0xFF, 8)
                w.emit((cnt >> 8) & 0xFF, 8)
                w.emit((cnt >> 16) & 0xFF, 8)
            d = v - old
            if -3 <= d <= 3:
                w.emit(d + 3, 3)
            else:
                w.emit(7, 3)
                w.emit(v, 8)
            old = v
            i = j
        else:
            for _ in range(runlen):
                emit_val(v, old)
                old = v
            i = j
    return w.finish()


# ---------------------------------------------------------------------------
# Binary prefix field tables (reference data/vicar.json role; the
# M94_HRSC layout is from the public DLR HRSC_LABEL_HEADER document)

_PREFIX_TYPES = {
    "unsigned char": ("u1", 1), "unsigned short": ("u2", 2),
    "unsigned int": ("u4", 4), "short": ("i2", 2), "int": ("i4", 4),
    "float": ("f4", 4), "double": ("f8", 8),
}

PREFIX_DEFS = {
    "GDAL_AUTOTEST": {
        "size": 29,
        "fields": [
            ("unsigned_char", "unsigned char", False),
            ("unsigned_short", "unsigned short", False),
            ("unsigned_int", "unsigned int", False),
            ("unsigned_int_hidden", "unsigned int", True),
            ("short", "short", False),
            ("int", "int", False),
            ("float", "float", False),
            ("double", "double", False),
        ],
    },
    "M94_HRSC": {
        "size": 68,
        "fields": [
            ("EphTime", "double", False), ("Exposure", "float", False),
            ("COT", "int", False), ("FEETemp", "int", False),
            ("FPMTemp", "int", False), ("OBTemp", "int", False),
            ("FERT", "int", False), ("LERT", "int", False),
            ("reserved1", "int", True),
            ("CmpDataLen", "unsigned short", False),
            ("FrameCount", "unsigned short", False),
            ("Pischel", "unsigned short", False),
            ("ActPixel", "unsigned short", False),
            ("RSHits", "unsigned short", False),
            ("reserved2", "unsigned short", True),
            ("DceInput", "unsigned char", False),
            ("DceOutput", "unsigned char", False),
            ("FrameErr1", "unsigned char", False),
            ("FrameErr2", "unsigned char", False),
            ("Gob1", "unsigned char", False),
            ("Gob2", "unsigned char", False),
            ("Gob3", "unsigned char", False),
            ("DSS", "unsigned char", False),
            ("DecmpErr1", "unsigned char", False),
            ("DecmpErr2", "unsigned char", False),
            ("DecmpErr3", "unsigned char", False),
            ("FillerFlag", "unsigned char", False),
            ("reserved3", "unsigned int", True),
        ],
    },
}


def _read_prefix_table(data: bytes, flat: dict, img_off: int,
                       nbb: int, img_size: int):
    """NBB prefix bytes per record -> list of row dicts (the
    OGRVICARBinaryPrefixesLayer role)."""
    bltype = str(flat.get("BLTYPE", "") or "")
    d = PREFIX_DEFS.get(bltype)
    recsize = int(flat.get("RECSIZE", "0") or 0)
    if d is None or d["size"] != nbb or recsize <= 0:
        return None
    int_be = str(flat.get("BINTFMT", "LOW")).upper() == "HIGH"
    realfmt = str(flat.get("BREALFMT", "VAX")).upper()
    nrec = img_size // recsize
    rows = []
    for r in range(nrec):
        base = img_off + r * recsize
        off = 0
        row = {}
        for name, typ, hidden in d["fields"]:
            code, size = _PREFIX_TYPES[typ]
            raw = data[base + off:base + off + size]
            off += size
            if hidden:
                continue
            if code in ("f4", "f8"):
                if realfmt == "VAX":
                    arr = np.frombuffer(raw, np.uint8)
                    v = (vax_to_ieee32(arr) if code == "f4"
                         else vax_to_ieee64(arr))[0]
                else:
                    v = np.frombuffer(
                        raw, (">" if realfmt == "IEEE" else "<") + code)[0]
            else:
                v = np.frombuffer(
                    raw, (">" if int_be else "<") + code)[0]
            row[name] = v.item()
        rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# HRSC / DTM metadata keyword tables (vicardataset.cpp Open role)

_HRSC_KEYWORDS = (
    "M94_ORBIT.START_TIME", "M94_ORBIT.STOP_TIME",
    "M94_INSTRUMENT.DETECTOR_ID", "M94_CAMERAS.MACROPIXEL_SIZE",
    "FILE.EVENT_TYPE", "M94_INSTRUMENT.MISSION_PHASE_NAME",
    "HRORTHO.SPICE_FILE_NAME", "HRCONVER.MISSING_FRAMES",
    "HRCONVER.OVERFLOW_FRAMES", "HRCONVER.ERROR_FRAMES",
    "HRFOOT.BEST_GROUND_SAMPLING_DISTANCE",
    "DLRTO8.RADIANCE_SCALING_FACTOR", "DLRTO8.RADIANCE_OFFSET",
    "DLRTO8.REFLECTANCE_SCALING_FACTOR", "DLRTO8.REFLECTANCE_OFFSET",
    "HRCAL.RADIANCE_SCALING_FACTOR", "HRCAL.RADIANCE_OFFSET",
    "HRCAL.REFLECTANCE_SCALING_FACTOR", "HRCAL.REFLECTANCE_OFFSET",
    "HRORTHO.DTM_NAME", "HRORTHO.EXTORI_FILE_NAME",
    "HRORTHO.GEOMETRIC_CALIB_FILE_NAME",
)

_HRSC_SRC_KEYWORDS = (
    "M94_ORBIT.IMAGE_TIME", "FILE.EVENT_TYPE",
    "FILE.PROCESSING_LEVEL_ID", "M94_INSTRUMENT.DETECTOR_ID",
    "M94_CAMERAS.EXPOSURE_DURATION",
    "HRCONVER.INSTRUMENT_TEMPERATURE",
)


def _map_srs_and_gt(flat: dict):
    """PROPERTY MAP group -> (wkt_or_projstring, geotransform)."""
    if not str(flat.get("MAP.MAP_PROJECTION_TYPE", "") or ""):
        return "", None
    # reuse the PDS3 ParseSRS (same rules, pdsdataset.cpp heritage)
    from gdal_ray.raster.pds import _build_srs

    kw = {}
    for k, v in flat.items():
        if k.startswith("MAP."):
            kw["IMAGE_MAP_PROJECTION." + k[4:]] = str(v)
    target = str(flat.get("MAP.TARGET_NAME", "") or "")
    crs = _build_srs(kw, "", target)
    scale = float(flat.get("MAP.MAP_SCALE", "1") or 1)
    dx = scale * 1000.0
    dy = -scale * 1000.0
    ulx, uly = 0.5, 0.5
    v = flat.get("MAP.LINE_PROJECTION_OFFSET")
    if v is not None and str(v):
        uly = (float(v) + 0.5) * -dy * 1.0
    v = flat.get("MAP.SAMPLE_PROJECTION_OFFSET")
    if v is not None and str(v):
        ulx = (float(v) + 0.5) * dx * -1.0
    return crs, (ulx, dx, 0.0, uly, 0.0, dy)


def _geotiff_gt(flat: dict):
    """PROPERTY GEOTIFF group tie-point/scale -> geotransform."""
    def nums(key):
        v = flat.get("GEOTIFF." + key)
        if v is None:
            return None
        s = str(v).replace("(", "").replace(")", "").replace(",", " ")
        return [float(x) for x in s.split()]

    tie = nums("MODELTIEPOINTTAG")
    scl = nums("MODELPIXELSCALETAG")
    if tie and scl and len(tie) >= 6 and len(scl) >= 2:
        return (tie[3] - tie[0] * scl[0], scl[0], 0.0,
                tie[4] + tie[1] * scl[1], 0.0, -scl[1])
    mat = nums("MODELTRANSFORMATIONTAG")
    if mat and len(mat) >= 8:
        return (mat[3], mat[0], mat[1], mat[7], mat[4], mat[5])
    return None


# ---------------------------------------------------------------------------


def read_vicar(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    data = vsi_read_bytes(path)
    label, flat = parse_vicar_label(data)

    ns = int(flat.get("NS", "0") or 0)
    nl = int(flat.get("NL", "0") or 0)
    nb = int(flat.get("NB", "1") or 1)
    if ns <= 0 or nl <= 0 or nb <= 0:
        raise ValueError("VICAR: missing NS/NL/NB")
    fmt = str(flat.get("FORMAT", "")).upper()
    code, item = _FORMAT_DTYPES[fmt]
    is_int = code[0] in "ui"
    if is_int:
        order = "<" if str(flat.get("INTFMT", "LOW")).upper() == "LOW" \
            else ">"
        realfmt = ""
    else:
        realfmt = str(flat.get("REALFMT", "VAX")).upper()
        order = {"RIEEE": "<", "IEEE": ">", "VAX": "<"}[realfmt]

    img_off, pixel_off, line_off, band_off, nbb, img_size = \
        _spacings(flat)
    org = str(flat.get("ORG", "BSQ")).upper()

    def from_raw(raw: np.ndarray) -> np.ndarray:
        """bytes (..., item) -> typed values (handles VAX)."""
        if realfmt == "VAX":
            if code == "f4":
                return vax_to_ieee32(raw)
            if code == "f8":
                return vax_to_ieee64(raw)
            if code == "c8":
                re = vax_to_ieee32(raw.reshape(-1, 8)[:, :4])
                im = vax_to_ieee32(raw.reshape(-1, 8)[:, 4:])
                return (re + 1j * im).astype(np.complex64)
        return np.frombuffer(raw.tobytes(), order + code).astype(code)

    compress = str(flat.get("COMPRESS", "NONE") or "NONE").upper()
    bands = []
    if compress in ("BASIC", "BASIC2"):
        if not is_int:
            raise ValueError("data type incompatible with compression")
        nrec = nl * nb
        recs = []
        if compress == "BASIC":
            pos = img_off
            for _ in range(nrec):
                size = int.from_bytes(data[pos:pos + 4], "little")
                if size <= 4:
                    raise ValueError("wrong BASIC record size")
                recs.append(data[pos + 4:pos + size])
                pos += size
        else:
            sizes = np.frombuffer(data, "<u4", count=nrec,
                                  offset=img_off)
            pos = img_off + 4 * nrec
            for s in sizes:
                if s == 0:
                    raise ValueError("wrong BASIC2 record size")
                recs.append(data[pos:pos + int(s)])
                pos += int(s)
        for b in range(nb):
            rows = [basic_decode(recs[b * nl + y], ns, item)
                    for y in range(nl)]
            raw = np.concatenate(rows).reshape(nl, ns, item)
            vals = np.frombuffer(raw.tobytes(), "<" + code)
            bands.append(vals.reshape(nl, ns))
    else:
        if compress != "NONE":
            raise ValueError(f"COMPRESS={compress} not supported")
        for b in range(nb):
            rows = np.zeros((nl, ns * item), np.uint8)
            base = img_off + nbb + band_off * b
            for y in range(nl):
                start = base + line_off * y
                got = _strided(data, start, pixel_off, item, ns)
                rows[y, :len(got)] = np.frombuffer(got, np.uint8)
            vals = from_raw(rows.reshape(nl, ns, item))
            bands.append(np.asarray(vals).reshape(nl, ns))

    # georef
    crs, gt = _map_srs_and_gt(flat)
    if gt is None:
        gt = _geotiff_gt(flat)

    # nodata only for known instruments (HRSC / Dawn FC2)
    bltype = str(flat.get("BLTYPE", "") or "")
    inst_known = bltype == "M94_HRSC" or \
        str(flat.get("INSTRUMENT_ID", "") or "") == "FC2"
    nodata = None
    if inst_known:
        nodata = {"u1": 0, "i2": -32768, "f4": -32768.0}.get(code)

    is_dtm = bool(str(flat.get("DTM.DTM_OFFSET", "") or ""))
    scale = offset = None
    metadata: dict[str, str] = {}
    if is_dtm:
        scale = float(flat.get("DTM.DTM_SCALING_FACTOR", "1") or 1)
        offset = float(flat.get("DTM.DTM_OFFSET", "0") or 0)
        v = flat.get("DTM.DTM_MISSING_DN")
        if v is not None:
            nodata = float(v)
    elif bltype == "M94_HRSC":
        s = float(flat.get("DLRTO8.REFLECTANCE_SCALING_FACTOR",
                           "-1.") or -1.)
        if s < 0.0:
            s = float(flat.get("HRCAL.REFLECTANCE_SCALING_FACTOR",
                               "1.") or 1.)
        scale = s
        o = float(flat.get("DLRTO8.REFLECTANCE_OFFSET", "-1.") or -1.)
        if o < 0.0:
            o = float(flat.get("HRCAL.REFLECTANCE_OFFSET", "0.") or 0.)
        offset = o

    if bltype == "M94_HRSC":
        metadata["SPACECRAFT_NAME"] = str(
            flat.get("M94_INSTRUMENT.INSTRUMENT_HOST_NAME", "") or "")
        metadata["PRODUCT_TYPE"] = str(flat.get("TYPE", "") or "")
        table = _HRSC_SRC_KEYWORDS if str(
            flat.get("M94_INSTRUMENT.DETECTOR_ID", "") or "") == \
            "MEX_HRSC_SRC" else _HRSC_KEYWORDS
        for k in table:
            if k in flat:
                metadata[k] = str(flat[k])

    prefix_rows = None
    if nbb:
        prefix_rows = _read_prefix_table(data, flat, img_off, nbb,
                                         img_size)

    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata, "scale": scale, "offset": offset,
            "metadata": metadata, "label": label,
            "prefix_table": prefix_rows, "compress": compress,
            "format": fmt}


def _strided(data: bytes, start: int, pixel_off: int, item: int,
             ns: int) -> bytes:
    """ns items of `item` bytes spaced pixel_off apart; short reads
    (truncated products) return what exists — callers zero-fill."""
    if pixel_off == item:
        return data[start:start + ns * item]
    need = pixel_off * (ns - 1) + item
    if start + need > len(data):
        ns = max(0, (len(data) - start - item) // pixel_off + 1)
        if ns <= 0:
            return b""
        need = pixel_off * (ns - 1) + item
    buf = np.frombuffer(data, np.uint8, need, start)
    idx = (np.arange(ns)[:, None] * pixel_off +
           np.arange(item)[None, :])
    return buf[idx].tobytes()


# ---------------------------------------------------------------------------
# Writer (CreateCopy role): uncompressed or BASIC/BASIC2 BSQ


def _fmt_value(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        s = repr(v)
        return s if ("." in s or "e" in s or "E" in s) else s + ".0"
    if isinstance(v, (list, tuple)):
        return "(" + ",".join(_fmt_value(x) for x in v) + ")"
    return str(v)


_FORMAT_OF_DTYPE = {
    "uint8": "BYTE", "int16": "HALF", "int32": "FULL",
    "float32": "REAL", "float64": "DOUB", "complex64": "COMP",
}


def write_vicar(path: str, bands, gt=None, crs: str = "",
                label_extra: dict | None = None,
                compress: str = "NONE",
                map_props: dict | None = None) -> None:
    """Minimal VICAR writer: BSQ, LOW/RIEEE byte order, optional
    BASIC/BASIC2 compression (integer types only), optional MAP
    property group passthrough; LBLSIZE padded to a RECSIZE
    multiple like the reference."""
    from gdal_ray.vsi import vsi_write_bytes

    bands = [np.asarray(b) for b in bands]
    nl, ns = bands[0].shape
    nb = len(bands)
    fmt = _FORMAT_OF_DTYPE[str(bands[0].dtype)]
    code, item = _FORMAT_DTYPES[fmt]
    compress = compress.upper()
    recsize = ns * item

    if compress in ("BASIC", "BASIC2"):
        if code[0] not in "ui":
            raise ValueError("data type incompatible with compression")
        encoded = []
        for b in bands:
            le = np.ascontiguousarray(b.astype("<" + code))
            for y in range(nl):
                raw = np.frombuffer(le[y].tobytes(), np.uint8)
                encoded.append(basic_encode(raw, ns, item))
        body_parts = []
        if compress == "BASIC":
            for e in encoded:
                body_parts.append(
                    (len(e) + 4).to_bytes(4, "little") + e)
        else:
            for e in encoded:
                body_parts.append(len(e).to_bytes(4, "little"))
            body_parts.extend(encoded)
        body = b"".join(body_parts)
    else:
        body = b"".join(
            np.ascontiguousarray(b.astype("<" + code)).tobytes()
            for b in bands)

    kv = [("LBLSIZE", 0), ("FORMAT", fmt), ("TYPE", "IMAGE"),
          ("BUFSIZ", 20480), ("DIM", 3), ("EOL", 0),
          ("RECSIZE", recsize), ("ORG", "BSQ"), ("NL", nl),
          ("NS", ns), ("NB", nb), ("N1", ns), ("N2", nl), ("N3", nb),
          ("N4", 0), ("NBB", 0), ("NLB", 0), ("HOST", "X86-64-LINX"),
          ("INTFMT", "LOW"), ("REALFMT", "RIEEE"), ("BHOST", "X86-64-LINX"),
          ("BINTFMT", "LOW"), ("BREALFMT", "RIEEE")]
    if compress in ("BASIC", "BASIC2"):
        kv.insert(8, ("COMPRESS", compress))
        kv.insert(9, ("EOCI1", 0))
        kv.insert(10, ("EOCI2", 0))
    for k, v in (label_extra or {}).items():
        kv.append((k, v))
    # TASK opens a history group — everything after it is nested
    kv += [("TASK", "GDAL"), ("USER", "GDAL"),
           ("DAT_TIM", "Thu Jan  1 00:00:00 1970")]
    if map_props:
        kv.append(("PROPERTY", "MAP"))
        for k, v in map_props.items():
            kv.append((k, v))

    def render(lblsize: int, eoci1: int = 0) -> bytes:
        parts = []
        for k, v in kv:
            if k == "LBLSIZE":
                v = lblsize
            elif k == "EOCI1":
                v = eoci1
            parts.append(f"{k}={_fmt_value(v)}")
        s = "  ".join(parts).encode("latin-1")
        return s

    raw = render(0)
    # pad label to a multiple of RECSIZE (reference behavior)
    lblsize = ((len(raw) + 32 + recsize - 1) // recsize) * recsize
    eoci1 = lblsize + len(body)
    raw = render(lblsize, eoci1)
    raw += b"\0" * (lblsize - len(raw))
    vsi_write_bytes(path, raw + body)
