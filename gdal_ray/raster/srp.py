"""ASRP / USRP (Standard/UTM Raster Product) reader — reference role
frmts/adrg/srpdataset.cpp, re-derived from the DGIWG STANAG 7074 /
DIGEST SRP published layout over the engine's generic ISO/IEC 8211
reader:

- ``.GEN``: GIN records with DSI (PRT = ASRP|USRP, NAM), GEN STR=4
  (ZNA zone, ARV/BRV, LSO/PSO origins — arc-seconds for ASRP,
  grid metres for USRP — LOD/LAD ground resolutions) and SPR
  (NFL/NFC, PNC/PNL=128, PCB pixel compression 0/4/8, PVB=8, BAD
  image name, TIM tile index)
- ``.IMG``: ISO 8211 header (byte-walk to the IMG field data),
  128×128 single-band tiles — uncompressed (PCB 0) or run-length
  coded with byte (PCB 8) or nibble (PCB 4, row-flushed half-byte)
  count/value pairs
- ``.QAL``: COL records → the palette (CCD index, NSR/NSG/NSB),
  QUV edition/dates, QSR classification
- ``.THF`` transmittal: resolves sibling .GEN products

Georeference: USRP is linear (LSO/PSO grid origin, LOD/LAD metre
steps, UTM zone ZNA / UPS ±61); ASRP is geographic with the ARC
polar-zone closed forms (arc-second origins).

Pinned against the reference autotest (gdrivers/srp.py): checksum
24576 for PCB 0/4/8, the literal UTM-17 geotransform, the 4-entry
palette and the SRP_* metadata set; THF opens + subdataset list."""

from __future__ import annotations

import math
import os

import numpy as np


def _img_data_offset(img: bytes) -> int:
    """srpdataset.cpp byte-walk: after 0x1E+"IMG", skip 4+3 bytes,
    then everything up to (and including) the next 0x1E."""
    pos = 0
    n = len(img)
    while pos < n:
        if img[pos] == 30 and img[pos + 1:pos + 4] == b"IMG":
            pos += 4 + 3 + 3  # "IMG" consumed + 4 + seek 3
            while pos < n and img[pos] != 30:
                pos += 1
            return pos + 1
        pos += 1
    raise ValueError("SRP: no IMG field in image file")


def _decode_rle(data: bytes, pcb: int) -> np.ndarray:
    """PCB 8 (byte pairs) / PCB 4 (nibble counts, row-flushed
    half-bytes) run-length decode of one 128×128 tile."""
    out = np.zeros(128 * 128, np.uint8)
    i_src = 0
    i_pix = 0
    half_used = False
    n = len(data)
    while i_pix < 128 * 128:
        if i_src + 2 > n:
            raise ValueError("SRP: out of data decoding tile")
        if pcb == 8:
            count = data[i_src]
            value = data[i_src + 1]
            i_src += 2
        else:  # pcb == 4
            if (i_pix % 128) == 0 and half_used:
                i_src += 1
                half_used = False
                continue
            if half_used:
                count = data[i_src] & 0x0F
                value = data[i_src + 1]
                i_src += 2
                half_used = False
            else:
                count = data[i_src] >> 4
                value = ((data[i_src] & 0x0F) << 4) | (data[i_src + 1]
                                                       >> 4)
                i_src += 1
                half_used = True
        if i_pix + count > 128 * 128:
            raise ValueError("SRP: too much data decoding tile")
        out[i_pix:i_pix + count] = value
        i_pix += count
    return out.reshape(128, 128)


def _read_qal(qal_path: str) -> tuple[list, dict]:
    from gdal_ray.iso8211 import read_ddf

    colors: dict[int, tuple] = {}
    md: dict = {}
    try:
        r = read_ddf(qal_path)
    except (OSError, ValueError):
        return [], md
    for rec in r.records:
        for col in rec.all("COL"):
            ccd = col.get("CCD")
            if ccd is None or not (0 <= int(ccd) <= 255):
                continue
            colors[int(ccd)] = (int(col.get("NSR", 0)),
                                int(col.get("NSG", 0)),
                                int(col.get("NSB", 0)), 255)
        quv = rec.first("QUV")
        if quv:
            if "EDN" in quv:
                try:
                    md["SRP_EDN"] = str(int(str(quv["EDN"]).strip()))
                except ValueError:
                    md["SRP_EDN"] = "0"  # blank → atoi 0 (reference)
            # USRP 1.2 stores dates as "NNN,YYYYMMDD" DATn values
            for key, dat in (("SRP_CREATIONDATE", "DAT1"),
                             ("SRP_REVISIONDATE", "DAT2")):
                cdv = quv.get("CDV07" if dat == "DAT1" else "CDV24")
                if cdv:
                    md[key] = str(cdv).strip()
                else:
                    v = str(quv.get(dat, ""))
                    if len(v) >= 12:
                        md[key] = v[4:12]
        qsr = rec.first("QSR")
        if qsr and qsr.get("QSS"):
            md["SRP_CLASSIFICATION"] = str(qsr["QSS"]).strip()
    if not colors:
        return [], md
    table = [(0, 0, 0, 255)] * (max(colors) + 1)
    for k, v in colors.items():
        table[k] = v
    return table, md


def read_srp(path: str, img_path: str | None = None) -> dict:
    """ASRP/USRP product → raster dict. ``path`` is a .GEN, .THF or
    ``SRP:gen,img`` subdataset string."""
    from gdal_ray.iso8211 import read_ddf
    from gdal_ray.vsi import vsi_read_bytes

    if path.startswith("SRP:"):
        gen_path, img_path = path[4:].split(",", 1)
        path = gen_path
    if path.lower().endswith(".thf"):
        base = os.path.dirname(path)
        gens = sorted(n for n in os.listdir(base)
                      if n.lower().endswith(".gen"))
        if not gens:
            raise ValueError("SRP: no .GEN next to the THF")
        path = os.path.join(base, gens[0])
    r = read_ddf(path)
    prod = None
    for rec in r.records:
        dsi = rec.first("DSI")
        gen = rec.first("GEN")
        spr = rec.first("SPR")
        if dsi is None or gen is None or spr is None:
            continue
        prt = str(dsi.get("PRT", ""))[:4]
        if prt not in ("ASRP", "USRP") or gen.get("STR") != 4:
            continue
        if img_path is not None and spr.get("BAD", "").strip().upper() \
                != os.path.basename(img_path).upper():
            continue
        prod = (dsi, gen, spr, [d.get("TSI", 0)
                                for d in rec.all("TIM")])
        break
    if prod is None:
        raise ValueError("SRP: no ASRP/USRP product record")
    dsi, gen, spr, tim = prod
    product = str(dsi["PRT"])[:4]
    zna = int(gen.get("ZNA", 0))
    arv = int(gen.get("ARV", 0) or 0)
    brv = int(gen.get("BRV", 0) or 0)
    lso = float(gen.get("LSO", 0.0))
    pso = float(gen.get("PSO", 0.0))
    lod = float(gen.get("LOD", 0.0))
    lad = float(gen.get("LAD", 0.0))
    nfl, nfc = int(spr["NFL"]), int(spr["NFC"])
    pcb = int(spr.get("PCB", 0) or 0)
    pvb = int(spr.get("PVB", 8) or 8)
    if spr.get("PNC") != 128 or spr.get("PNL") != 128 or pvb != 8 \
            or pcb not in (0, 4, 8):
        raise ValueError("SRP: unsupported PNC/PNL/PVB/PCB")
    bad = str(spr["BAD"]).split(" ")[0]
    if img_path is None:
        img_path = os.path.join(os.path.dirname(path), bad)
        if not os.path.exists(img_path):
            for cand in os.listdir(os.path.dirname(path) or "."):
                if cand.upper() == bad.upper():
                    img_path = os.path.join(os.path.dirname(path),
                                            cand)
                    break

    img = vsi_read_bytes(img_path)
    off0 = _img_data_offset(img)
    band = np.zeros((nfl * 128, nfc * 128), np.uint8)
    for block in range(nfl * nfc):
        if tim:
            t = tim[block] if block < len(tim) else 0
            if t <= 0:
                continue
            off = off0 + ((t - 1) * 128 * 128 if pcb == 0 else t - 1)
        else:
            off = off0 + block * 128 * 128
        ty, tx = divmod(block, nfc)
        if pcb == 0:
            tile = np.frombuffer(img, np.uint8, 128 * 128,
                                 off).reshape(128, 128)
        else:
            tile = _decode_rle(img[off:off + 128 * 128 * 2], pcb)
        band[ty * 128:(ty + 1) * 128, tx * 128:(tx + 1) * 128] = tile

    md = {"SRP_NAM": str(dsi.get("NAM", "")).strip(),
          "SRP_PRODUCT": product,
          "SRP_SCA": str(gen.get("SCA", "")),
          "SRP_ZNA": str(zna),
          "SRP_PSP": "%3.1f" % float(gen.get("PSP", 0.0))}
    ct, qal_md = _read_qal(os.path.splitext(img_path)[0] + ".QAL")
    if not ct:
        ct, qal_md = _read_qal(os.path.splitext(path)[0] + ".QAL")
    md.update(qal_md)

    crs = None
    k = 111319.4907933
    circ = 40075016.68558
    if product == "ASRP":
        if zna == 9:
            gt = (k * (90.0 - pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  circ / arv, 0.0,
                  -k * (90.0 - pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -circ / arv)
            crs = "ARC_System_Zone_09"
        elif zna == 18:
            gt = (k * (90.0 + pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  circ / arv, 0.0,
                  k * (90.0 + pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -circ / arv)
            crs = "ARC_System_Zone_18"
        else:
            gt = (lso / 3600.0, 360.0 / arv, 0.0,
                  pso / 3600.0, 0.0, -360.0 / brv)
            crs = "EPSG:4326"
    else:  # USRP: linear grid
        gt = (lso, lod, 0.0, pso, 0.0, -lad)
        if -60 <= zna <= 60 and zna != 0:
            crs = f"EPSG:{(32600 if zna > 0 else 32700) + abs(zna)}"
        elif zna == 61:
            crs = "EPSG:32661"
        elif zna == -61:
            crs = "EPSG:32761"
    return {"bands": [band], "crs": crs, "geotransform": gt,
            "nodata": None, "color_table": ct or None, "metadata": md}


def srp_subdatasets(thf_or_gen: str) -> list[str]:
    """SRP:gen,img subdataset strings for a transmittal/GEN."""
    from gdal_ray.iso8211 import read_ddf

    path = thf_or_gen
    if path.lower().endswith(".thf"):
        base = os.path.dirname(path)
        gens = sorted(n for n in os.listdir(base)
                      if n.lower().endswith(".gen"))
        paths = [os.path.join(base, g) for g in gens]
    else:
        paths = [path]
    out = []
    for gen_path in paths:
        r = read_ddf(gen_path)
        for rec in r.records:
            spr = rec.first("SPR")
            dsi = rec.first("DSI")
            if spr is None or dsi is None:
                continue
            bad = str(spr.get("BAD", "")).split(" ")[0]
            if bad:
                out.append(
                    f"SRP:{gen_path},"
                    f"{os.path.join(os.path.dirname(gen_path), bad)}")
    return out
