"""BSB / Maptech nautical chart (.KAP) driver (read).

Reference role: frmts/bsb (bsb_read.c / bsbdataset.cpp, GDAL 3.13),
re-derived from the publicly documented format (the reading side of
the expired US patent 5,727,090 per the reference's own header
notes).  Layout:

- ASCII header records ``TAG/value`` (continuation lines begin with
  whitespace) up to the ``0x1A 0x00`` end-of-header sequence (a
  stray 0x1A mid-header is skipped — the reference's issue-8765
  fix); ``BSB/RA=w,h`` gives the size, ``RGB/i,r,g,b`` the palette,
  ``REF/n,pixel,line,lat,lon`` ground control points,
  ``KNP/...PR=<projection>,PP=<central meridian>`` the chart
  projection, ``PLY/n,lat,lon`` the cutline polygon;
- after ``0x1A 0x00``: one byte of color-index bit width (USGS
  charts store the ASCII digit — detected and corrected), then
  RLE-compressed scanlines.  Each line starts with a 7-bit
  big-endian line marker (high bit = continue; extra leading zeros
  skipped for y>0 — optech quirk), then runs: top ``colorsize``
  bits below the continuation bit = palette index, low bits
  accumulate the run count in 7-bit groups (emit count+1 pixels),
  0x00 terminates the line.  A line that stops one pixel short is
  padded (NDI/CHS quirk); a line that stops earlier mid-data
  resumes decoding unless the following bytes parse as the next
  scanline's marker (rgbsmall_with_line_break case).  Decoded
  palette indices are 1-based: the band shifts values >0 down by
  one and drops the first color-table entry, matching the
  reference band exactly;
- a big-endian offset-per-row index table sits at the file tail,
  pointed to by the last 4 bytes (validated offset-by-offset
  against the line markers; falls back to sequential scan when
  implausible, incl. the one-row-short NOAA variant).

Truncated files raise (the reference autotest's rgbsmall_truncated
pair).  Georef: GCP lat/lon projected through the chart projection
(TRANSVERSE MERCATOR via the in-repo Karney kernels) and fitted to
an affine geotransform (GDALGCPsToGeoTransform role; exact for 3
points, least squares beyond).  Pinned against the reference
autotest fixtures (checksum 30321 ×3, the transverse_mercator
geotransform to 1e-8 relative, the australia4c cutline verbatim).
NOS/.NO1 obfuscated files are supported (round 5): BSBGetc-path
bytes are stored +9 mod 256 while the tail offset table stays raw
(bsb_read.c bNO1); tested by re-obfuscating the reference fixture.
"""

from __future__ import annotations

import numpy as np


def _parse_header(data: bytes):
    end = data.find(b"\x1a\x00")
    if end < 0:
        raise ValueError("not a BSB file (no 0x1A 0x00 header end)")
    # stray 0x1A bytes inside the header are skipped (issue-8765 fix)
    text = data[:end].replace(b"\x1a", b"").decode("latin-1")
    # merge continuation lines (leading whitespace)
    records: list[str] = []
    for raw in text.split("\n"):
        line = raw.rstrip("\r")
        if not line.strip():
            continue
        if line[0] in " \t" and records:
            records[-1] += "," + line.strip()
        else:
            records.append(line.strip())
    hdr = {"RGB": {}, "REF": [], "PLY": []}
    for rec in records:
        if len(rec) > 4 and rec[3] == "/":
            tag, body = rec[:3].upper(), rec[4:]
        else:
            continue
        if tag == "BSB" or tag == "NOS":
            kv = {}
            parts = body.split(",")
            i = 0
            while i < len(parts):
                if "=" in parts[i]:
                    k, v = parts[i].split("=", 1)
                    vals = [v]
                    while (i + 1 < len(parts)
                           and "=" not in parts[i + 1]):
                        i += 1
                        vals.append(parts[i])
                    kv[k.strip()] = vals
                i += 1
            hdr["BSB"] = kv
            ra = kv.get("RA", [])
            if tag == "NOS":
                hdr["size"] = (int(ra[2]), int(ra[3]))
            else:
                hdr["size"] = (int(ra[0]), int(ra[1]))
        elif tag == "RGB":
            f = body.split(",")
            if len(f) >= 4:
                hdr["RGB"][int(f[0])] = (int(f[1]), int(f[2]),
                                         int(f[3]), 255)
        elif tag == "REF":
            f = body.split(",")
            if len(f) >= 5:
                hdr["REF"].append((float(f[1]), float(f[2]),
                                   float(f[3]), float(f[4])))
        elif tag == "KNP":
            kv = {}
            for part in body.split(","):
                if "=" in part:
                    k, v = part.split("=", 1)
                    kv[k.strip()] = v.strip()
            hdr["KNP"] = kv
        elif tag == "PLY":
            # keep raw tokens: BSB_CUTLINE echoes them verbatim
            f = [t.strip() for t in body.split(",")]
            if len(f) >= 3:
                hdr["PLY"].append((f[1], f[2]))
        elif tag == "VER":
            hdr["VER"] = body.strip()
    return hdr, end


class _Truncated(ValueError):
    pass


def _read_marker(data: bytes, p: int, y: int) -> tuple[int, int]:
    """7-bit-group line marker at p; extra-zero skip for y>0."""
    n = len(data)
    marker = 0
    while True:
        if p >= n:
            raise _Truncated("truncated BSB file (line marker)")
        b = data[p]
        p += 1
        if y != 0 and marker == 0 and b == 0:
            continue  # extra-zero skip hack (optech quirk)
        marker = marker * 128 + (b & 0x7F)
        if not (b & 0x80):
            return p, marker


def read_bsb(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    data = vsi_read_bytes(path)
    idx_src = data  # raw bytes — the tail index table is NOT shifted
    if data[:4] == bytes((c + 9) & 0xFF for c in b"NOS/"):
        # .NO1 obfuscated variant (bsb_read.c BSBGetc bNO1 role):
        # every byte read through the record/scanline path is stored
        # +9 mod 256; only the trailing big-endian offset table is raw
        data = (np.frombuffer(data, np.uint8).astype(np.int16) - 9
                ).astype(np.uint8).tobytes()
    hdr, hend = _parse_header(data)
    w, h = hdr["size"]
    if not (0 < w and 0 < h):
        raise ValueError("bad BSB dimensions")

    colorsize = data[hend + 2] if hend + 2 < len(data) else 0
    if not (0 < colorsize <= 7) and 0x31 <= colorsize <= 0x38:
        colorsize -= 0x30  # USGS ASCII-digit quirk
    if not (0 < colorsize <= 7):
        raise ValueError(f"bad BSB colorsize {colorsize}")
    first_line_off = hend + 3

    value_shift = 7 - colorsize
    value_mask = ((1 << colorsize) - 1) << value_shift
    count_mask = (1 << (7 - colorsize)) - 1
    n = len(data)

    def decode_runs(p: int, i: int, row: np.ndarray) -> tuple[int, int]:
        """Expand runs until the 0 terminator; returns (pos, filled)."""
        while True:
            if p >= n:
                raise _Truncated("truncated BSB file (row data)")
            b = data[p]
            p += 1
            if b == 0:
                return p, i
            value = (b & value_mask) >> value_shift
            count = b & count_mask
            while b & 0x80:
                if p >= n:
                    raise _Truncated("truncated BSB file (run count)")
                b = data[p]
                p += 1
                count = count * 128 + (b & 0x7F)
            if i + count + 1 > w:
                count = w - i - 1  # clamp over-run (may consume-only)
            if count >= 0:
                row[i:i + count + 1] = value
                i += count + 1

    # ---- index table from the tail (validated like the reference) ----
    offsets: list[int] = [-1] * h
    if n >= 4:
        idx_off = int.from_bytes(idx_src[n - 4:n], "big")
        if idx_off > 0:
            if idx_off + 4 * (h - 1) == n - 4:
                h -= 1  # one-row-short NOAA variant
                offsets = offsets[:h]
            if first_line_off < idx_off and idx_off + 4 * h <= n - 4:
                offs = np.frombuffer(idx_src, dtype=">u4", count=h,
                                     offset=idx_off).astype(np.int64)
                ok = bool(np.all(offs >= first_line_off)
                          and np.all(offs < idx_off)
                          and np.all(np.diff(offs) >= 0))
                if ok:
                    for i in range(h):
                        try:
                            _, m = _read_marker(data, int(offs[i]), i)
                        except _Truncated:
                            ok = False
                            break
                        if m not in (i, i + 1):
                            ok = False
                            break
                if ok:
                    offsets = [int(o) for o in offs]

    img = np.zeros((h, w), np.uint8)

    if offsets[0] == -1:
        offsets[0] = first_line_off

    sequential = offsets[-1] == -1 if h > 1 else offsets[0] == first_line_off
    for y in range(h):
        p = offsets[y]
        p, marker = _read_marker(data, p, y)
        if marker not in (y, y + 1):
            raise ValueError(
                f"got scanline id {marker} when looking for {y + 1}")
        row = img[y]
        i = 0
        while True:
            p, i = decode_runs(p, i, row)
            if i == w - 1:
                i += 1  # one-pixel-short NDI/CHS quirk (already 0)
            next_known = y + 1 < h and offsets[y + 1] != -1
            if i >= w:
                break
            if y + 1 >= h:
                break  # last line: pad with zeros
            if not next_known:
                # peek: is this the next scanline's marker?
                try:
                    _, m2 = _read_marker(data, p, y + 1)
                except _Truncated:
                    m2 = -1
                if m2 in (y + 1, y + 2):
                    offsets[y + 1] = p
                    break
                # not a row marker: keep filling this row from p
                continue
            if p >= offsets[y + 1]:
                break
        if y + 1 < h and offsets[y + 1] == -1:
            offsets[y + 1] = p

    # palette indices are 1-based; shift down like the reference band
    np.subtract(img, 1, out=img, where=img > 0)

    # color table with the first entry dropped (reference band ctor):
    # exposed entry i is RGB record i+1
    max_idx = max(hdr["RGB"], default=0)
    color_table = [hdr["RGB"].get(i + 1, (0, 0, 0, 255))
                   for i in range(max_idx)]

    # cutline polygon from raw PLY tokens (lon lat order, verbatim)
    cutline = ""
    if hdr["PLY"]:
        cutline = ("POLYGON ((" +
                   ",".join(f"{lon} {lat}" for lat, lon in hdr["PLY"]) +
                   "))")

    # georef from projected GCPs
    gcps = []
    gt = None
    crs = ""
    knp = hdr.get("KNP", {})
    proj_name = knp.get("PR", "").upper()
    try:
        pp = float(knp.get("PP", "nan"))
    except ValueError:
        pp = float("nan")
    fwd = None
    if proj_name == "TRANSVERSE MERCATOR" and np.isfinite(pp):
        from gdal_ray.proj.transverse_mercator import (WGS84,
                                                       TransverseMercator)

        tm = TransverseMercator(WGS84, lon0=pp, k0=1.0,
                                false_easting=0.0, false_northing=0.0)
        fwd = tm.forward
        crs = (f'PROJCS["unnamed",GEOGCS["WGS 84",DATUM["WGS_1984",'
               f'SPHEROID["WGS 84",6378137,298.257223563]],'
               f'PRIMEM["Greenwich",0],'
               f'UNIT["degree",0.0174532925199433]],'
               f'PROJECTION["Transverse_Mercator"],'
               f'PARAMETER["latitude_of_origin",0],'
               f'PARAMETER["central_meridian",{pp:.15g}],'
               f'PARAMETER["scale_factor",1],'
               f'PARAMETER["false_easting",0],'
               f'PARAMETER["false_northing",0],UNIT["Meter",1]]')
    elif proj_name == "MERCATOR":
        crs = "EPSG:4326"  # GCPs exposed in lat/lon (gt unpinned)
    for (pix, line, lat, lon) in hdr["REF"]:
        if fwd is not None:
            res = fwd(np.array([lon]), np.array([lat]))
            x, y_ = res[0], res[1]
            gcps.append((pix, line, float(x[0]), float(y_[0])))
        else:
            gcps.append((pix, line, lon, lat))
    if len(gcps) >= 3 and fwd is not None:
        # GDALGCPsToGeoTransform role: affine fit pixel/line -> x/y
        A = np.array([[1.0, p, ln] for p, ln, _, _ in gcps])
        bx = np.array([g[2] for g in gcps])
        by = np.array([g[3] for g in gcps])
        cx, *_ = np.linalg.lstsq(A, bx, rcond=None)
        cy, *_ = np.linalg.lstsq(A, by, rcond=None)
        gt = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])

    return {"bands": [img], "crs": crs, "geotransform": gt,
            "nodata": None, "color_table": color_table,
            "gcps": gcps, "cutline": cutline, "knp": knp,
            "sequential": sequential}
