"""Small raw-format driver zoo — reference roles frmts/raw/*.cpp.

Each reader re-derives a compact fixed-layout format from the public
spec / reference driver behaviour and returns the repo's standard
raster dict ``{"bands": [np.ndarray...], "crs": str|None,
"geotransform": tuple, ...}``.  Every driver here is pinned against
the reference autotest fixture/checksum in tests/test_rawzoo.py.

Drivers (reference role file):
- GSC Geogrid           frmts/raw/gscdataset.cpp
- NOAA ``.b`` grids     frmts/raw/noaabdataset.cpp  (NADCON5/GEOCON)
- SNODAS                frmts/raw/snodasdataset.cpp
- DOQ1 / DOQ2           frmts/raw/doq1dataset.cpp, doq2dataset.cpp
- NLAPS NDF             frmts/raw/ndfdataset.cpp
- NSIDC sea-ice .bin    frmts/raw/nsidcbindataset.cpp
- Convair PolGASP SIRC  frmts/raw/cpgdataset.cpp (SIRC flavour;
  the Stokes-matrix flavour raises — no fixture to pin against)
- MFF2 / HKV blob dirs  frmts/raw/hkvdataset.cpp
- VTP BT 1.3            frmts/raw/btdataset.cpp  (read + write)
- KRO KOLOR raw         frmts/raw/krodataset.cpp (read + write)
- ACE2                  frmts/raw/ace2dataset.cpp
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

from gdal_ray.vsi import vsi_read_bytes


# ---------------------------------------------------------------------------
# GSC Geogrid — fortran-framed float32 records (gscdataset.cpp)

GSC_NODATA = -1.0000000150474662199e+30


def decode_gsc(data: bytes) -> dict:
    if len(data) < 20 or data[12:16] != b"\x02\x00\x00\x00":
        raise ValueError("GSC: bad signature word")
    rec_len, w, h = struct.unpack_from("<iii", data, 0)
    if not (1 <= w <= 100000 and 1 <= h <= 100000) or rec_len != w * 4:
        raise ValueError("GSC: implausible dimensions")
    rec_len += 8  # fortran record length markers
    # second record carries 8 float32 header values
    hdr = np.frombuffer(data, "<f4", count=8, offset=rec_len + 12)
    gt = (float(hdr[2]), float(hdr[0]), 0.0,
          float(hdr[5]), 0.0, -float(hdr[1]))
    base = rec_len * 2 + 4
    rows = np.empty((h, w), np.float32)
    for y in range(h):
        rows[y] = np.frombuffer(data, "<f4", count=w,
                                offset=base + y * rec_len)
    return {"bands": [rows], "crs": None, "geotransform": gt,
            "nodata": GSC_NODATA}


def read_gsc(path: str) -> dict:
    return decode_gsc(vsi_read_bytes(path))


# ---------------------------------------------------------------------------
# NOAA .b — NADCON5 (big-endian) / VERTCON3 (little-endian) grids
# (noaabdataset.cpp; NOAA TR NOS NGS 63 §10.2)

_NOAAB_KIND_DTYPE = {0: "i4", 1: "f4", 2: "i2"}


def _noaab_header(data: bytes, be: bool):
    e = ">" if be else "<"
    swlat, swlon, dlat, dlon = struct.unpack_from(e + "dddd", data, 4)
    nrows, ncols, kind = struct.unpack_from(e + "iii", data, 36)
    return swlat, swlon, dlat, dlon, nrows, ncols, kind


def decode_noaa_b(data: bytes) -> dict:
    if len(data) < 52:
        raise ValueError("NOAA_B: short header")
    picked = None
    for be in (True, False):
        swlat, swlon, dlat, dlon, nrows, ncols, kind = \
            _noaab_header(data, be)
        if not (abs(swlat) <= 90 and abs(swlon) <= 360):
            continue
        if not (0 < dlat <= 1 and 0 < dlon <= 1):
            continue
        if not (nrows > 0 and swlat + (nrows - 1) * dlat <= 90):
            continue
        if not (ncols > 0 and (ncols - 1) * dlon <= 360):
            continue
        if not (-1 <= kind <= 2):
            continue
        picked = (be, swlat, swlon, dlat, dlon, nrows, ncols, kind)
        break
    if picked is None:
        raise ValueError("NOAA_B: header failed both-endian sanity checks")
    be, swlat, swlon, dlat, dlon, nrows, ncols, kind = picked
    if kind == -1:
        raise ValueError("NOAA_B: KIND=-1 not supported (reference parity)")
    dt = (">" if be else "<") + _NOAAB_KIND_DTYPE[kind]
    itemsize = int(dt[-1])
    line = 4 + ncols * itemsize + 4
    if swlon > 180:
        swlon -= 360
    gt = (swlon - dlon / 2, dlon, 0.0,
          swlat + (nrows - 1) * dlat + dlat / 2, 0.0, -dlat)
    out = np.empty((nrows, ncols), np.dtype(dt).newbyteorder("="))
    # records run south→north; row 0 of the raster is the northernmost
    for i in range(nrows):
        off = 52 + (nrows - 1 - i) * line + 4
        out[i] = np.frombuffer(data, dt, count=ncols, offset=off)
    return {"bands": [out], "crs": "EPSG:4326", "geotransform": gt}


def read_noaa_b(path: str) -> dict:
    return decode_noaa_b(vsi_read_bytes(path))


# ---------------------------------------------------------------------------
# SNODAS — NOHRSC GIS/RS ASCII .hdr + big-endian int16 .dat
# (snodasdataset.cpp)

def read_snodas(path: str) -> dict:
    hdr_text = vsi_read_bytes(path).decode("latin-1")
    kv = {}
    for ln in hdr_text.splitlines():
        if ":" not in ln:
            continue
        k, _, v = ln.partition(":")
        kv[k.strip()] = v.strip()
    need = ("Number of columns", "Number of rows", "Data file pathname")
    if not all(k in kv for k in need):
        raise ValueError("SNODAS: missing required header keys")
    w = int(kv["Number of columns"])
    h = int(kv["Number of rows"])
    if kv.get("Data type", "integer") != "integer" or \
            kv.get("Data bytes per pixel", "2") != "2":
        raise ValueError("SNODAS: only 2-byte integer data supported "
                         "(reference parity)")
    minx = float(kv["Minimum x-axis coordinate"])
    maxx = float(kv["Maximum x-axis coordinate"])
    miny = float(kv["Minimum y-axis coordinate"])
    maxy = float(kv["Maximum y-axis coordinate"])
    gt = (minx, (maxx - minx) / w, 0.0, maxy, 0.0, -(maxy - miny) / h)
    dat_path = os.path.join(os.path.dirname(path), kv["Data file pathname"])
    raw = vsi_read_bytes(dat_path)
    n = min(len(raw) // 2, w * h)
    flat = np.zeros(w * h, ">i2")
    flat[:n] = np.frombuffer(raw, ">i2", count=n)
    arr = flat.reshape(h, w)
    crs = "EPSG:4326" if kv.get("Projected") == "no" and \
        kv.get("Horizontal datum") == "WGS84" else None
    out = {"bands": [np.ascontiguousarray(arr.astype(np.int16))],
           "crs": crs, "geotransform": gt, "metadata": kv}
    if "No data value" in kv:
        out["nodata"] = float(kv["No data value"])
    if "Minimum data value" in kv:
        out["stat_min"] = float(kv["Minimum data value"])
    if "Maximum data value" in kv:
        out["stat_max"] = float(kv["Maximum data value"])
    return out


# ---------------------------------------------------------------------------
# DOQ2 — "BEGIN_USGS_DOQ_HEADER" keyword header + byte imagery
# (doq2dataset.cpp)

def _doq_tokenize(line: str) -> list[str]:
    """CSLTokenizeString semantics: whitespace-split honouring
    double-quoted groups (quotes stripped)."""
    toks = re.findall(r'"([^"]*)"|(\S+)', line)
    return [a if a else b for a, b in toks]


def read_doq2(path: str) -> dict:
    data = vsi_read_bytes(path)
    if not data.startswith(b"BEGIN_USGS_DOQ_HEADER"):
        raise ValueError("DOQ2: missing BEGIN_USGS_DOQ_HEADER")
    text = data[:40000].decode("latin-1", "replace")
    w = h = 0
    skip = 0
    bytes_pp = 1
    band_count = 0
    band_types = 0
    ulx = uly = 0.0
    dim = 0.0
    zone = 0
    proj_type = -1
    datum = ""
    meta: dict[str, str] = {}
    lines = text.splitlines()
    for ln in lines[1:]:
        ln = ln.rstrip("\x00")
        if ln.startswith("END_USGS_DOQ_HEADER"):
            break
        toks = _doq_tokenize(ln)
        if len(toks) < 2:
            break
        key = toks[0].upper()
        if key == "SAMPLES_AND_LINES" and len(toks) >= 3:
            w, h = int(toks[1]), int(toks[2])
        elif key == "BYTE_COUNT":
            skip = int(toks[1])
        elif key == "XY_ORIGIN" and len(toks) >= 3:
            ulx, uly = float(toks[1]), float(toks[2])
        elif key == "HORIZONTAL_RESOLUTION":
            dim = float(toks[1])
        elif key == "BAND_ORGANIZATION":
            pass
        elif key == "BAND_CONTENT":
            band_count += 1
            if toks[1] in ("COLOR", "RGB", "RED", "GREEN", "BLUE"):
                band_types = 5
            elif toks[1] == "BLACK&WHITE":
                band_types = max(band_types, 1)
        elif key == "BITS_PER_PIXEL":
            bytes_pp = int(toks[1]) // 8
        elif key == "HORIZONTAL_COORDINATE_SYSTEM":
            proj_type = {"UTM": 1, "SPCS": 2, "GEOGRAPHIC": 0}.get(toks[1], -1)
        elif key == "COORDINATE_ZONE":
            zone = int(toks[1])
        elif key == "HORIZONTAL_DATUM":
            datum = toks[1]
        else:
            # generic metadata: join remaining tokens, skipping bare '*'
            meta[toks[0]] = " ".join(t for t in toks[1:] if t != "*")
    if not (500 <= w <= 25000 and 500 <= h <= 25000 and
            1 <= band_types <= 5):
        raise ValueError("DOQ2: values incoherent for a DOQ file")
    if band_count < 2:
        band_count = bytes_pp
    else:
        bytes_pp *= band_count
    bytes_per_line = bytes_pp * w
    avail = len(data) - skip
    rows = min(h, max(0, avail // bytes_per_line))
    px = np.frombuffer(data, np.uint8, count=rows * bytes_per_line,
                       offset=skip).reshape(rows, w, bytes_pp)
    bands = []
    for b in range(band_count):
        full = np.zeros((h, w), np.uint8)
        full[:rows] = px[:, :, b]
        bands.append(full)
    crs = None
    if proj_type == 1 and 1 <= zone <= 60:
        base = {"NAD27": 26700, "NAD83": 26900, "WGS84": 32600}.get(datum)
        if base is not None:
            crs = f"EPSG:{base + zone}"
    return {"bands": bands, "crs": crs,
            "geotransform": (ulx, dim, 0.0, uly, 0.0, -dim),
            "metadata": meta, "truncated_rows": h - rows}


# ---------------------------------------------------------------------------
# DOQ1 — fixed-column binary header (doq1dataset.cpp)

def _doq1_field(data: bytes, off: int, n: int) -> float:
    s = data[off:off + n].decode("latin-1", "replace")
    s = s.replace("D", "E").replace("d", "E").strip()
    try:
        return float(s)
    except ValueError:
        return 0.0


def read_doq1(path: str) -> dict:
    data = vsi_read_bytes(path)
    if len(data) < 212:
        raise ValueError("DOQ1: short header")
    w = _doq1_field(data, 150, 6)
    h = _doq1_field(data, 144, 6)
    band_storage = _doq1_field(data, 162, 3)
    band_types = _doq1_field(data, 156, 3)
    if not (500 <= w <= 25000 and 500 <= h <= 25000 and
            0 <= band_storage <= 4 and 1 <= band_types <= 5):
        raise ValueError("DOQ1: values incoherent for a DOQ file")
    w, h = int(w), int(h)
    bytes_pp = 1 if band_types < 5 else 3
    bytes_per_line = bytes_pp * w
    skip = 4 * bytes_per_line
    # georeferencing lives in records 3 and 4
    ulx = _doq1_field(data, bytes_per_line * 2 + 288, 24)
    uly = _doq1_field(data, bytes_per_line * 2 + 312, 24)
    xps = _doq1_field(data, bytes_per_line * 3 + 59, 12)
    yps = _doq1_field(data, bytes_per_line * 3 + 71, 12)
    avail = len(data) - skip
    rows = min(h, max(0, avail // bytes_per_line))
    px = np.frombuffer(data, np.uint8, count=rows * bytes_per_line,
                       offset=skip).reshape(rows, w, bytes_pp)
    bands = []
    for b in range(bytes_pp):
        full = np.zeros((h, w), np.uint8)
        full[:rows] = px[:, :, b]
        bands.append(full)
    return {"bands": bands, "crs": None,
            "geotransform": (ulx, xps, 0.0, uly, 0.0, -yps)}


# ---------------------------------------------------------------------------
# NLAPS NDF — "KEY=value;" text header + one raw byte file per band
# (ndfdataset.cpp)

def read_ndf(path: str) -> dict:
    text = vsi_read_bytes(path).decode("latin-1", "replace")
    if not text.upper().startswith(("NDF_REVISION=2", "NDF_REVISION=0")):
        raise ValueError("NDF: missing NDF_REVISION signature")
    kv: dict[str, str] = {}
    for ln in text.splitlines():
        if ln.strip() == "END_OF_HDR;":
            break
        if "=" not in ln:
            break
        k, _, v = ln.partition("=")
        kv[k.strip()] = v.strip().rstrip(";")
    for need in ("PIXELS_PER_LINE", "LINES_PER_DATA_FILE",
                 "BITS_PER_PIXEL", "PIXEL_FORMAT"):
        if need not in kv:
            raise ValueError(f"NDF: missing required field {need}")
    if kv["PIXEL_FORMAT"] != "BYTE" or kv["BITS_PER_PIXEL"] != "8":
        raise ValueError("NDF: only 8-bit BYTE supported (reference parity)")
    w = int(kv["PIXELS_PER_LINE"])
    h = int(kv["LINES_PER_DATA_FILE"])
    nbands = int(kv.get("NUMBER_OF_BANDS_IN_VOLUME", "0"))
    if nbands <= 0:
        raise ValueError("NDF: cannot find band count")
    base = os.path.dirname(path)
    bands = []
    for i in range(1, nbands + 1):
        fname = kv.get(f"BAND{i}_FILENAME", "")
        if fname:
            bpath = os.path.join(base, fname)
        else:
            bpath = os.path.splitext(path)[0] + f".I{i}"
        raw = vsi_read_bytes(bpath)
        n = min(len(raw), w * h)
        arr = np.zeros(w * h, np.uint8)
        arr[:n] = np.frombuffer(raw, np.uint8, count=n)
        bands.append(arr.reshape(h, w))
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    ul = kv.get("UPPER_LEFT_CORNER", "").split(",")
    ur = kv.get("UPPER_RIGHT_CORNER", "").split(",")
    ll = kv.get("LOWER_LEFT_CORNER", "").split(",")
    if len(ul) == 4 and len(ur) == 4 and len(ll) == 4:
        ulx, uly = float(ul[2]), float(ul[3])
        g1 = (float(ur[2]) - ulx) / (w - 1)
        g2 = (float(ur[3]) - uly) / (w - 1)
        g4 = (float(ll[2]) - ulx) / (h - 1)
        g5 = (float(ll[3]) - uly) / (h - 1)
        gt = (ulx - g1 * 0.5 - g4 * 0.5, g1, g2,
              uly - g2 * 0.5 - g5 * 0.5, g4, g5)
    crs = None
    if kv.get("USGS_PROJECTION_NUMBER", "").split(",")[0].strip() == "1":
        zone = int(kv.get("USGS_MAP_ZONE", "0"))
        datum = kv.get("HORIZONTAL_DATUM", "WGS84")
        base_code = {"WGS84": 32600, "NAD83": 26900,
                     "NAD27": 26700}.get(datum[:5], 32600)
        if 1 <= zone <= 60:
            crs = f"EPSG:{base_code + zone}"
    return {"bands": bands, "crs": crs, "geotransform": gt, "metadata": kv}


# ---------------------------------------------------------------------------
# NSIDC sea-ice concentration .bin — 300-byte 6-char-field header
# (nsidcbindataset.cpp; NSIDC-0051 user guide §1.3.2)

def decode_nsidcbin(data: bytes) -> dict:
    if len(data) < 300:
        raise ValueError("NSIDCbin: short header")
    if not (data[103:105] in (b"19", b"20") or
            data[102:104] in (b"19", b"20")):
        raise ValueError("NSIDCbin: implausible year field")
    if not (data[230:].startswith(b"ANTARCTIC") or
            data[230:].startswith(b"ARCTIC")):
        raise ValueError("NSIDCbin: missing hemisphere descriptor")
    w = int(data[6:12].decode("latin-1").strip().strip("\x00"))
    h = int(data[12:18].decode("latin-1").strip().strip("\x00"))
    south = data[230:].startswith(b"ANTARCTIC")
    gt = (-3950000.0, 25000.0, 0.0, 4350000.0, 0.0, -25000.0) if south \
        else (-3837500.0, 25000.0, 0.0, 5837500.0, 0.0, -25000.0)
    arr = np.frombuffer(data, np.uint8, count=w * h,
                        offset=300).reshape(h, w)
    # NSIDC polar stereographic, 70° true-scale latitude (EPSG 3412/3411)
    crs = "EPSG:3412" if south else "EPSG:3411"
    return {"bands": [np.ascontiguousarray(arr)], "crs": crs,
            "geotransform": gt, "nodata": 255.0, "scale": 0.4,
            "units": "percentage",
            "imagetitle": data[150:230].split(b"\0")[0]
            .decode("latin-1").strip()}


def read_nsidcbin(path: str) -> dict:
    return decode_nsidcbin(vsi_read_bytes(path))


# ---------------------------------------------------------------------------
# Convair PolGASP SIRC — ...SIRC.hdr + ...SIRC.img quad-pol complex
# (cpgdataset.cpp SIRC flavour)

SIRC_POLARIZATIONS = ("HH", "HV", "VH", "VV")


def read_cpg_sirc(path: str) -> dict:
    low = path.lower()
    if not (low.endswith("sirc.hdr") or low.endswith("sirc.img")):
        raise ValueError("CPG: only the SIRC flavour is implemented "
                         "(the Stokes 's'-suffix flavour has no public "
                         "fixture to pin against)")
    stem = path[:-4]
    kv: dict[str, str] = {}
    for ln in vsi_read_bytes(stem + ".hdr").decode("latin-1").splitlines():
        toks = ln.split()
        if len(toks) >= 2:
            kv[toks[0]] = toks[1]
    h = int(kv.get("number_lines", "0"))
    w = int(kv.get("number_samples", "0"))
    if h <= 0 or w <= 0:
        raise ValueError("CPG: missing number_lines/number_samples")
    raw = vsi_read_bytes(stem + ".img")
    b = np.frombuffer(raw, np.int8, count=h * w * 10).reshape(h, w, 10)
    # byte 0: exponent, byte 1: mantissa refinement; bytes 2..9 are the
    # four complex scattering pairs (cpgdataset.cpp:1317-1355)
    scale = (np.sqrt((b[:, :, 1].astype(np.float64) / 254 + 1.5)
                     * np.exp2(b[:, :, 0].astype(np.float64)))
             / 127.0).astype(np.float32)
    bands = []
    for i in range(4):
        re_part = b[:, :, 2 + 2 * i].astype(np.float32) * scale
        im_part = b[:, :, 3 + 2 * i].astype(np.float32) * scale
        bands.append((re_part + 1j * im_part).astype(np.complex64))
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    return {"bands": bands, "crs": None, "geotransform": gt,
            "polarizations": SIRC_POLARIZATIONS,
            "matrix_representation": "SCATTERING", "metadata": kv}


# ---------------------------------------------------------------------------
# MFF2 / HKV — directory holding `attrib` + raw `image_data` blob
# (hkvdataset.cpp)

def read_mff2(path: str) -> dict:
    attrib = os.path.join(path, "attrib")
    kv: dict[str, str] = {}
    for ln in vsi_read_bytes(attrib).decode("latin-1").splitlines():
        if "=" not in ln:
            continue
        k, _, v = ln.partition("=")
        kv[k.strip()] = v.strip()
    w = int(kv["extent.cols"])
    h = int(kv["extent.rows"])
    nbands = int(kv.get("channel.enumeration", "1"))
    order = kv.get("pixel.order", "{ *lsbf }")
    little = "*lsbf" in order
    enc = kv.get("pixel.encoding", "{ *unsigned }")
    unsigned = "*unsigned" in enc
    twos = "*two" in enc
    is_complex = "*complex" in kv.get("pixel.field", "")
    size = int(kv.get("pixel.size", "8")) // 8
    if size == 1:
        dt = np.uint8
    elif size == 2:
        dt = np.uint16 if unsigned else np.int16
    elif size == 4 and is_complex:
        # CInt16 pair — expose as complex64 after widening
        dt = np.dtype([("re", np.int16), ("im", np.int16)])
    elif size == 4 and unsigned:
        dt = np.uint32
    elif size == 4 and twos:
        dt = np.int32
    elif size == 4:
        dt = np.float32
    elif size == 8 and is_complex and twos:
        dt = np.dtype([("re", np.int32), ("im", np.int32)])
    elif size == 8 and is_complex:
        dt = np.complex64
    elif size == 8:
        dt = np.float64
    elif size == 16 and is_complex:
        dt = np.complex128
    else:
        raise ValueError(f"MFF2: unsupported pixel.size={size * 8}")
    blob = os.path.join(path, "image_data")
    if not os.path.exists(blob):
        blob = os.path.join(path, "blob")
    raw = vsi_read_bytes(blob)
    base = np.dtype(dt).newbyteorder("<" if little else ">")
    flat = np.frombuffer(raw, base, count=w * h * nbands)
    cube = flat.reshape(h, w, nbands)
    bands = []
    for i in range(nbands):
        plane = cube[:, :, i]
        if plane.dtype.names:  # integer-complex pair → complex64
            plane = (plane["re"].astype(np.float32)
                     + 1j * plane["im"].astype(np.float32))
        bands.append(np.ascontiguousarray(
            plane.astype(plane.dtype.newbyteorder("="))))
    return {"bands": bands, "crs": None,
            "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
            "metadata": kv, "version": float(kv.get("version", "1.0"))}


# ---------------------------------------------------------------------------
# VTP BT 1.3 — 256-byte header + column-major profiles
# (btdataset.cpp; the reference reads/writes profiles top-to-bottom)

def decode_bt(data: bytes) -> dict:
    if len(data) < 256 or not data.startswith(b"binterr"):
        raise ValueError("BT: missing binterr signature")
    try:
        version = float(data[7:10].decode("latin-1", "replace"))
    except ValueError:
        version = 1.0
    w = struct.unpack_from("<i", data, 10)[0]
    h = struct.unpack_from("<i", data, 14)[0]
    dsize = struct.unpack_from("<h", data, 18)[0]
    floating = data[20] != 0
    if floating and dsize == 4:
        dt = "<f4"
    elif not floating and dsize == 4:
        dt = "<i4"
    elif not floating and dsize == 2:
        dt = "<i2"
    else:
        raise ValueError(f"BT: unknown data type (datasize={dsize})")
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    if version >= 1.1:
        left, right, bottom, top = struct.unpack_from("<dddd", data, 28)
        if right != left and bottom != top:
            gt = (left, (right - left) / w, 0.0,
                  top, 0.0, (bottom - top) / h)
    vscale = struct.unpack_from("<f", data, 62)[0]
    if vscale == 0.0 or not np.isfinite(vscale):
        vscale = 1.0
    cols = np.frombuffer(data, dt, count=w * h, offset=256).reshape(w, h)
    arr = np.ascontiguousarray(cols.T.astype(np.dtype(dt).newbyteorder("=")))
    return {"bands": [arr], "crs": None, "geotransform": gt,
            "scale": vscale, "bt_version": version}


def encode_bt(arr: np.ndarray, gt=None, vscale: float = 1.0) -> bytes:
    h, w = arr.shape
    if arr.dtype == np.float32:
        dsize, floating, dt = 4, 1, "<f4"
    elif arr.dtype == np.int32:
        dsize, floating, dt = 4, 0, "<i4"
    elif arr.dtype == np.int16:
        dsize, floating, dt = 2, 0, "<i2"
    else:
        raise ValueError(f"BT: cannot write dtype {arr.dtype}")
    hdr = bytearray(256)
    hdr[0:10] = b"binterr1.3"
    struct.pack_into("<i", hdr, 10, w)
    struct.pack_into("<i", hdr, 14, h)
    struct.pack_into("<h", hdr, 18, dsize)
    hdr[20] = floating
    if gt is not None:
        left = gt[0]
        right = gt[0] + gt[1] * w
        top = gt[3]
        bottom = gt[3] + gt[5] * h
        struct.pack_into("<dddd", hdr, 28, left, right, bottom, top)
    struct.pack_into("<f", hdr, 62, vscale)
    return bytes(hdr) + np.asarray(arr.T, dt).tobytes()


def read_bt(path: str) -> dict:
    return decode_bt(vsi_read_bytes(path))


# ---------------------------------------------------------------------------
# KRO — "KRO\x01" + big-endian dims, BIP big-endian samples
# (krodataset.cpp)

_KRO_DEPTH_DTYPE = {8: "u1", 16: ">u2", 32: ">f4"}


def decode_kro(data: bytes) -> dict:
    if data[:4] != b"KRO\x01":
        raise ValueError("KRO: bad magic")
    w, h, depth, ncomp = struct.unpack_from(">iiii", data, 4)
    if depth not in _KRO_DEPTH_DTYPE:
        raise ValueError(f"KRO: unhandled depth {depth}")
    if not (0 < w and 0 < h and 0 < ncomp):
        raise ValueError("KRO: implausible dimensions")
    dt = _KRO_DEPTH_DTYPE[depth]
    cube = np.frombuffer(data, dt, count=w * h * ncomp,
                         offset=20).reshape(h, w, ncomp)
    bands = [np.ascontiguousarray(
        cube[:, :, i].astype(np.dtype(dt).newbyteorder("=")))
        for i in range(ncomp)]
    return {"bands": bands, "crs": None,
            "geotransform": (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)}


def encode_kro(bands: list[np.ndarray]) -> bytes:
    h, w = bands[0].shape
    dt = bands[0].dtype
    if dt == np.uint8:
        depth, odt = 8, "u1"
    elif dt == np.uint16:
        depth, odt = 16, ">u2"
    elif dt == np.float32:
        depth, odt = 32, ">f4"
    else:
        raise ValueError(f"KRO: cannot write dtype {dt}")
    # np.stack normalises to native byte order — re-apply the wire
    # order at the end so the payload really is big-endian
    cube = np.asarray(np.stack(bands, axis=2), odt)
    head = b"KRO\x01" + struct.pack(">iiii", w, h, depth, len(bands))
    return head + np.ascontiguousarray(cube).tobytes()


def read_kro(path: str) -> dict:
    return decode_kro(vsi_read_bytes(path))


# ---------------------------------------------------------------------------
# ACE2 — georef entirely from the NNXNNNE_RES.ACE2 filename
# (ace2dataset.cpp)

_ACE2_SIZES = {"_5M": (180, 5.0 / 60), "_30S": (1800, 30.0 / 3600),
               "_9S": (6000, 9.0 / 3600), "_3S": (18000, 3.0 / 3600)}


def read_ace2(path: str) -> dict:
    name = os.path.basename(path)
    base = name.split(".")[0]
    if len(base) < 7:
        raise ValueError("ACE2: filename too short for a tile name")
    lat = int(base[0:2])
    lon = int(base[3:6])
    if base[2] in "Ss":
        lat = -lat
    elif base[2] not in "Nn":
        raise ValueError("ACE2: bad hemisphere letter")
    if base[6] in "Ww":
        lon = -lon
    elif base[6] not in "Ee":
        raise ValueError("ACE2: bad E/W letter")
    is_int16 = any(t in base for t in ("_CONF_", "_QUALITY_", "_SOURCE_"))
    dt = "<i2" if is_int16 else "<f4"
    word = 2 if is_int16 else 4
    n = None
    px = None
    for suffix, (cells, psize) in _ACE2_SIZES.items():
        if suffix in base:
            n, px = cells, psize
            break
    data = vsi_read_bytes(path)
    if n is None:
        for cells, psize in _ACE2_SIZES.values():
            if len(data) == cells * cells * word:
                n, px = cells, psize
                break
    if n is None:
        raise ValueError("ACE2: cannot infer tile resolution")
    arr = np.frombuffer(data, dt, count=n * n).reshape(n, n)
    gt = (float(lon), px, 0.0, lat + n * px, 0.0, -px)
    return {"bands": [np.ascontiguousarray(
        arr.astype(np.dtype(dt).newbyteorder("=")))],
        "crs": "EPSG:4326", "geotransform": gt,
        "units": None if is_int16 else "m"}


def read_pcraster(path: str) -> dict:
    """PCRaster CSF-2.0 map (frmts/pcraster role — the reference
    links libcsf; re-derived from the published CSF 2.0 layout):
    27-byte "RUU CROSS SYSTEM MAP FORMAT" signature, main header
    (version/gisFileId/projection/attrTable/mapType/byteOrder), a
    raster header at 64 (valueScale u16, cellRepr u16, min/max cells,
    xUL/yUL f64, nrRows/nrCols u32, cell sizes + angle f64) and raw
    cells from 256.  Cell representations CR_UINT1/INT1/UINT2/INT2/
    UINT4/INT4/REAL4/REAL8 with their standard missing values
    (255 / type-min / NaN).  Autotest pin: ldd.map cs 4528 with the
    literal geotransform and nodata 255 (gdrivers/pcraster.py)."""
    import struct as _s

    from gdal_ray.vsi import vsi_read_bytes

    d = vsi_read_bytes(path)
    if d[:27] != b"RUU CROSS SYSTEM MAP FORMAT":
        raise ValueError("PCRaster: bad signature")
    value_scale, cell_repr = _s.unpack_from("<HH", d, 64)
    xul, yul = _s.unpack_from("<dd", d, 84)
    nrows, ncols = _s.unpack_from("<II", d, 100)
    csx, csy = _s.unpack_from("<dd", d, 108)
    reprs = {
        0x00: (np.uint8, 255), 0x04: (np.int8, -128),
        0x11: (np.uint16, 65535), 0x15: (np.int16, -32768),
        0x22: (np.uint32, 4294967295), 0x26: (np.int32, -2147483648),
        0x5A: (np.float32, float("nan")),
        0xDB: (np.float64, float("nan")),
    }
    if cell_repr not in reprs:
        raise ValueError(f"PCRaster: cell representation {cell_repr:#x}")
    dt, nodata = reprs[cell_repr]
    arr = np.frombuffer(d, np.dtype(dt).newbyteorder("<"),
                        nrows * ncols, 256).reshape(nrows, ncols)
    return {
        "bands": [arr.copy()],
        "crs": None,
        "geotransform": (xul, csx, 0.0, yul, 0.0, -csy),
        "nodata": float(nodata) if nodata == nodata else nodata,
        "value_scale": value_scale,
    }
