"""JPEG (ITU-T T.81) codec, pure numpy/stdlib — the multimodal decode
boundary the r2 verdict asked to lift (reference role: GDAL's JPEG
driver delegating to libjpeg; frmts/jpeg).  Decoder supports baseline
SOF0/1 AND progressive SOF2 (spectral selection + successive
approximation, DC/AC first + refinement scans with EOB runs — T.81
G.2 / libjpeg jdphuff.c semantics), 8-bit AND 12-bit precision
(T.81 allows both; 12-bit shifts/clamps at 2048/4095 and returns
uint16 — round 5, the reference's test_jpeg_10/test_nitf_41 stats
pins), grayscale and YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
restart intervals; the encoder (grayscale / 4:4:4 baseline) exists
for round-trip testing and synthetic media generation.

Not implemented (raise): arithmetic coding, lossless SOF3.  Chroma
upsampling is box replication (libjpeg's "fancy" triangular filter is
a documented divergence: pixel values may differ by ±1 near chroma
edges).

Tables below are the ITU-T T.81 Annex K examples (public spec
constants): K.1 luminance / K.2 chrominance quantization, K.3
typical Huffman tables.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order (T.81 Figure A.6)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 / K.2 quantization tables (natural order via zigzag below)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS list of 16 counts, HUFFVAL)
HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II basis (orthonormal): IDCT is B.T @ X @ B
_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16.0)
                * (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                for x in range(8)] for u in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _build_decode_table(bits, vals):
    """(BITS, HUFFVAL) → dict (length, code) → symbol (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers
    (restart markers are consumed by the MCU loop)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a marker: feed padding, don't consume it
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Drop partial byte + locate the next marker (for DRI)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                return d[self.pos + 1]
            self.pos += 1
        return None

    def skip_marker(self):
        self.pos += 2


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit value to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W) uint8 (grayscale) or (H, W, 3)
    uint8 RGB (BT.601 YCbCr conversion, values clipped)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg, "u1", 64, p).astype(np.int64)
                    p += 64
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = vals
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                n = sum(bits)
                vals = list(seg[p + 17: p + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coeffs = []
                dcpred = [0] * nc
                for c in comps:
                    comp_w = -(-(w * c["h"]) // hmax)
                    comp_h = -(-(h * c["v"]) // vmax)
                    c["bw"] = -(-comp_w // 8)
                    c["bh"] = -(-comp_h // 8)
                    coeffs.append(
                        np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                 np.int64))
                frame.update(hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{marker:02X})")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"cs": cs, "dc": tbl >> 4, "ac": tbl & 0xF})
            if not frame.get("progressive"):
                pos += seglen
                return _decode_scan(data, pos, frame, scan, qt, huff,
                                    restart)
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos += seglen
            pos = _decode_progressive_scan(
                data, pos, frame, scan, ss, se, ahal >> 4, ahal & 0xF,
                huff, restart, coeffs, dcpred,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _finish_progressive(frame, coeffs, qt)
    raise ValueError("no SOS segment")


def _dc_first(br, dctab, coef, pred, ci, al):
    t = _decode_huff(br, dctab)
    pred[ci] += _extend(br.bits(t), t)
    coef[0] = pred[ci] << al


def _ac_first(br, actab, coef, ss, se, al, eobrun):
    """T.81 G.2.2 AC first scan (spectral band, point transform Al)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, actab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coef[k] = _extend(br.bits(s), s) * (1 << al)
        k += 1
    return eobrun


def _ac_refine(br, actab, coef, ss, se, al, eobrun):
    """T.81 G.2.2 AC successive-approximation refinement (libjpeg
    jdphuff.c decode_mcu_AC_refine structure)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, actab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
            else:
                val = p1 if br.bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if br.bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if br.bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, huff, restart, coeffs, dcpred
):
    """Decode ONE progressive scan into the coefficient store; returns
    the stream position just past the scan's entropy data."""
    comps = frame["comps"]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    br = _BitReader(data, pos)
    eobrun = 0
    unit = 0

    def maybe_restart(n_units):
        nonlocal eobrun, unit
        if restart and unit and unit % restart == 0 and unit < n_units:
            m = br.align_to_marker()
            if m is not None and 0xD0 <= m <= 0xD7:
                br.skip_marker()
            eobrun = 0
            for i in range(len(dcpred)):
                dcpred[i] = 0

    if len(scan) > 1:
        # interleaved: DC scans only (T.81 G.1.1.1.1)
        if ss != 0:
            raise ValueError("interleaved progressive AC scan")
        n_units = frame["mcux"] * frame["mcuy"]
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart(n_units)
                for s in scan:
                    ci = by_id[s["cs"]]
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = coeffs[ci][my * c["v"] + by,
                                              mx * c["h"] + bx]
                            if ah == 0:
                                _dc_first(br, huff[(0, s["dc"])], coef,
                                          dcpred, ci, al)
                            else:
                                coef[0] |= br.bit() << al
                unit += 1
    else:
        s = scan[0]
        ci = by_id[s["cs"]]
        c = comps[ci]
        n_units = c["bw"] * c["bh"]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                maybe_restart(n_units)
                coef = coeffs[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        _dc_first(br, huff[(0, s["dc"])], coef, dcpred,
                                  ci, al)
                    else:
                        coef[0] |= br.bit() << al
                elif ah == 0:
                    eobrun = _ac_first(br, huff[(1, s["ac"])], coef, ss,
                                       se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, huff[(1, s["ac"])], coef, ss,
                                        se, al, eobrun)
                unit += 1
    # locate the end of this scan's entropy bytes (next true marker)
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(data)


def _finish_progressive(frame, coeffs, qt):
    comps = frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        store = coeffs[ci]
        pbh, pbw = store.shape[:2]
        plane = np.zeros((pbh * 8, pbw * 8))
        for by in range(pbh):
            for bx in range(pbw):
                blk = np.zeros(64, np.int64)
                blk[ZIGZAG] = store[by, bx]
                plane[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = (
                    _idct2(blk.reshape(8, 8) * q)
                    + float(1 << (frame.get("prec", 8) - 1))
                )
        planes.append(plane)
    return _planes_to_image(frame, planes)


def _planes_to_image(frame, planes):
    """Shared tail: upsample subsampled planes, crop, color-convert.
    12-bit frames (ITU T.81 allows 8 or 12) shift/clamp at 2048/4095
    and come back as uint16 (the reference's JPEG driver reports
    GDT_UInt16 for them)."""
    h, w = frame["h"], frame["w"]
    prec = frame.get("prec", 8)
    half = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, maxv).astype(dtype)
    y, cb, cr = full[0], full[1] - half, full[2] - half
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, maxv).astype(dtype)


def _decode_scan(data, pos, frame, scan, qt, huff, restart):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    by_id = {s["cs"]: s for s in scan}
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                m = br.align_to_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    br.skip_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                s = by_id[c["id"]]
                dctab = huff[(0, s["dc"])]
                actab = huff[(1, s["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.int64)
                        t = _decode_huff(br, dctab)
                        diff = _extend(br.bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, actab)
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(br.bits(sz), sz)
                            k += 1
                        blk = np.zeros(64, np.int64)
                        blk[ZIGZAG] = coef
                        px = _idct2(blk.reshape(8, 8) * q) \
                            + float(1 << (frame.get("prec", 8) - 1))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    return _planes_to_image(frame, planes)


# --- encoder (grayscale / 4:4:4 color) ---------------------------------


def _build_encode_table(bits, vals):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s (spec convention)


def _cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255)


def _table_segments(quality: int, gray: bool) -> tuple[bytes, dict]:
    """DQT + DHT marker segments (and the huffman encode tables) for
    the standard Annex-K/libjpeg-quality setup ``encode_jpeg`` emits."""
    qts = [_quality_scale(QT_LUM.reshape(8, 8), quality)]
    if not gray:
        qts.append(_quality_scale(QT_CHROM.reshape(8, 8), quality))
    seg = bytearray()
    for tq, q in enumerate(qts):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8)
        seg += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    tables = [(0, 0, HUFF_DC_LUM), (1, 0, HUFF_AC_LUM)]
    if not gray:
        tables += [(0, 1, HUFF_DC_CHROM), (1, 1, HUFF_AC_CHROM)]
    enc = {}
    for tc, th, (bits, vals) in tables:
        payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        seg += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
        enc[(tc, th)] = _build_encode_table(bits, vals)
    return bytes(seg), enc


def encode_jpeg_tables(quality: int = 85, gray: bool = False) -> bytes:
    """Tables-only abbreviated stream (SOI + DQT + DHT + EOI) — the
    TIFF 6.0 TechNote-2 JPEGTables (tag 347) payload shared by every
    tile/strip of a JPEG-compressed TIFF (frmts/gtiff JPEG codec +
    JPEGTables role)."""
    seg, _ = _table_segments(quality, gray)
    return b"\xff\xd8" + seg + b"\xff\xd9"


def encode_jpeg(img: np.ndarray, quality: int = 85,
                tables: bool = True) -> bytes:
    """(H,W) grayscale or (H,W,3) RGB uint8 → baseline JPEG bytes
    (4:4:4, Annex K tables scaled by the libjpeg quality rule).
    ``tables=False`` emits an ABBREVIATED stream (no DQT/DHT — the
    TIFF JPEGTables splice supplies them at decode)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        ycc = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        ycc = [0.299 * r + 0.587 * g + 0.114 * b,
               -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
               0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    qts = [_quality_scale(QT_LUM.reshape(8, 8), quality)]
    if not gray:
        qts.append(_quality_scale(QT_CHROM.reshape(8, 8), quality))
    out = bytearray(b"\xff\xd8")
    seg, enc = _table_segments(quality, gray)
    if tables:
        out += seg
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    pred = [0] * nc
    bh, bwid = -(-h // 8), -(-w // 8)
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(nc):
                plane = ycc[ci]
                blk = np.full((8, 8), plane[min(h - 1, by * 8), min(w - 1, bx * 8)])
                ys, xs = min(8, h - by * 8), min(8, w - bx * 8)
                blk[:ys, :xs] = plane[by * 8: by * 8 + ys, bx * 8: bx * 8 + xs]
                # edge extension (replicate last row/col)
                if ys < 8:
                    blk[ys:, :xs] = blk[ys - 1, :xs]
                if xs < 8:
                    blk[:, xs:] = blk[:, xs - 1: xs]
                q = qts[0 if ci == 0 else 1]
                coef = np.round(_dct2(blk - 128.0) / q).astype(np.int64)
                zz = coef.reshape(64)[ZIGZAG]
                dctab = enc[(0, 0 if ci == 0 else 1)]
                actab = enc[(1, 0 if ci == 0 else 1)]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _cat(diff)
                ln, code = dctab[t]
                bw.write(code, ln)
                if t:
                    v = diff if diff >= 0 else diff + (1 << t) - 1
                    bw.write(v & ((1 << t) - 1), t)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = actab[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    sz = _cat(v)
                    ln, code = actab[(run << 4) | sz]
                    bw.write(code, ln)
                    u = v if v >= 0 else v + (1 << sz) - 1
                    bw.write(u & ((1 << sz) - 1), sz)
                    run = 0
                if last < 63:
                    ln, code = actab[0x00]
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
