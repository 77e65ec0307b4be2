"""JPEG 2000 Part 1 (ITU-T T.800 / ISO 15444-1) decoder — from scratch.

Reference role: frmts/openjpeg/openjpegdataset.cpp (GDAL's JP2OpenJPEG
driver delegates to libopenjp2; this module re-implements the decode
path itself from the published standard).  Scope: full Tier-2
codestream parsing (SIZ/COD/COC/QCD/QCC/SOT tile-parts, packet headers
with tag trees, all five progression orders, precincts, SOP/EPH),
Tier-1 EBCOT block decoding (MQ arithmetic coder per Annex C, the
three coding passes per Annex D with bypass / termall / reset /
vertically-causal / segment-symbol options), inverse 5/3 reversible
and 9/7 irreversible DWT (Annex F lifting with symmetric extension on
absolute coordinates, so odd tile/image origins reconstruct exactly),
scalar dequantization (none / derived / expounded, Annex E), inverse
RCT/ICT component transforms, and the JP2 container boxes (jp2h,
GeoJP2 UUID + GMLJP2 georeferencing).

The normative constant tables (the 47-state MQ Qe transition table,
the zero-coding / sign-coding / magnitude-refinement context rules)
are transcribed from the published standard — they are spec data, not
creative code.  Correctness is pinned against the reference's own
autotest fixtures (autotest/gdrivers/data/jpeg2000/*) at the exact
checksums its jp2openjpeg tests assert.

Layout notes for 100-TB use: `read_jp2` decodes one file per task via
the tile-table model (each JPEG2000 tile is independently decodable —
tiles map 1:1 onto Ray Data blocks), so a directory of JP2 scenes
streams through `map_batches` without any driver-side state.
"""

from __future__ import annotations

import math
import struct
import xml.etree.ElementTree as ET

import numpy as np

# ---------------------------------------------------------------------------
# MQ arithmetic decoder (T.800 Annex C, software conventions)
# ---------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH) — normative Table C.2
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

# EBCOT context numbering: 0-8 zero coding, 9-13 sign coding,
# 14-16 magnitude refinement, 17 run-length, 18 uniform.
N_CTX = 19
_CTX_UNI = 18
_CTX_RL = 17


class _MQDecoder:
    """MQ decoder, INITDEC/DECODE/BYTEIN per T.800 C.3."""

    __slots__ = ("data", "bp", "c", "a", "ct", "I", "mps")

    def __init__(self, data: bytes, states=None):
        self.data = data
        n = len(data)
        b0 = data[0] if n else 0xFF
        self.bp = 0
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        if states is None:
            self.I = [0] * N_CTX
            self.mps = [0] * N_CTX
            self.I[0] = 4
            self.I[_CTX_RL] = 3
            self.I[_CTX_UNI] = 46
        else:
            self.I, self.mps = states

    def reset_states(self):
        self.I = [0] * N_CTX
        self.mps = [0] * N_CTX
        self.I[0] = 4
        self.I[_CTX_RL] = 3
        self.I[_CTX_UNI] = 46

    def _bytein(self):
        data, bp = self.data, self.bp
        n = len(data)
        b = data[bp] if bp < n else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        I, mps = self.I, self.mps
        st = I[cx]
        qe, nmps, nlps, switch = _QE[st]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS path / conditional exchange
            if self.a < qe:
                d = mps[cx]
                I[cx] = nmps
            else:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                I[cx] = nlps
            self.a = qe
            # renorm
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a <<= 1
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - mps[cx]
                    if switch:
                        mps[cx] = 1 - mps[cx]
                    I[cx] = nlps
                else:
                    d = mps[cx]
                    I[cx] = nmps
                while True:
                    if self.ct == 0:
                        self._bytein()
                    self.a <<= 1
                    self.c = (self.c << 1) & 0xFFFFFFFF
                    self.ct -= 1
                    if self.a & 0x8000:
                        break
            else:
                d = mps[cx]
        return d


class _RawDecoder:
    """Raw (arithmetic-bypass) bit reader with FF unstuffing (D.4)."""

    __slots__ = ("data", "bp", "buf", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.buf = 0
        self.ct = 0

    def bit(self) -> int:
        if self.ct == 0:
            prev = self.buf
            if self.bp < len(self.data):
                self.buf = self.data[self.bp]
                self.bp += 1
            else:
                self.buf = 0xFF
            self.ct = 7 if prev == 0xFF else 8
        self.ct -= 1
        return (self.buf >> self.ct) & 1


# ---------------------------------------------------------------------------
# Packet-header bit reader + tag trees (B.10)
# ---------------------------------------------------------------------------


class _HdrReader:
    __slots__ = ("data", "pos", "buf", "ct", "last")

    def __init__(self, data, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.ct = 0
        self.last = 0

    def bit(self) -> int:
        if self.ct == 0:
            self.buf = self.data[self.pos]
            self.pos += 1
            self.ct = 7 if self.last == 0xFF else 8
            self.last = self.buf
        self.ct -= 1
        return (self.buf >> self.ct) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        # B.10.1: headers are byte-aligned; a terminating 0xFF byte is
        # followed by a stuffed byte whose MSB is 0 — skip it.
        if self.last == 0xFF:
            self.pos += 1
        self.ct = 0
        self.last = 0


class _TagTree:
    """Tag tree (B.10.2).  Per node: consumed-threshold ``t``, ``known``
    flag and ``value`` (valid once known).  ``decode(rd, leaf, T)``
    consumes exactly the encoder's bits and returns leaf-value < T.
    """

    def __init__(self, w: int, h: int):
        self.paths = []  # per leaf: node indices root→leaf
        # build level sizes
        levels = []
        lw, lh = w, h
        while True:
            levels.append((lw, lh))
            if lw <= 1 and lh <= 1:
                break
            lw = (lw + 1) // 2
            lh = (lh + 1) // 2
        # node ids: level 0 = leaves
        offs = []
        total = 0
        for (lw, lh) in levels:
            offs.append(total)
            total += lw * lh
        self.t = [0] * total
        self.known = [False] * total
        self.value = [0] * total
        for y in range(h):
            for x in range(w):
                path = []
                lx, ly = x, y
                for lev, (lw, lh) in enumerate(levels):
                    path.append(offs[lev] + ly * lw + lx)
                    lx >>= 1
                    ly >>= 1
                path.reverse()  # root first
                self.paths.append(path)
        self.w = w

    def decode(self, rd: _HdrReader, x: int, y: int, threshold: int) -> bool:
        t, known, value = self.t, self.known, self.value
        tmin = 0
        for n in self.paths[y * self.w + x]:
            if t[n] < tmin:
                t[n] = tmin
            while not known[n] and t[n] < threshold:
                if rd.bit():
                    known[n] = True
                    value[n] = t[n]
                else:
                    t[n] += 1
            if known[n]:
                if value[n] >= threshold:
                    return False
                tmin = value[n]
            else:
                return False  # value ≥ threshold
        return True

    def leaf_value(self, x: int, y: int) -> int:
        return self.value[self.paths[y * self.w + x][-1]]


# ---------------------------------------------------------------------------
# Codestream structures (Annex A markers)
# ---------------------------------------------------------------------------


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class _Cod:
    """Coding-style parameters from COD/COC (per component)."""

    __slots__ = ("levels", "cbw", "cbh", "cbstyle", "transform",
                 "precincts", "prog", "layers", "mct", "sop", "eph")

    def copy(self):
        c = _Cod()
        for s in self.__slots__:
            setattr(c, s, getattr(self, s))
        return c


class _Qcd:
    __slots__ = ("style", "guard", "vals")  # vals: list of (exp, mant)

    def copy(self):
        q = _Qcd()
        q.style, q.guard, q.vals = self.style, self.guard, list(self.vals)
        return q


def _parse_cod(body: bytes):
    cod = _Cod()
    scod = body[0]
    cod.sop = bool(scod & 0x02)
    cod.eph = bool(scod & 0x04)
    cod.prog = body[1]
    cod.layers = struct.unpack_from(">H", body, 2)[0]
    cod.mct = body[4]
    cod.levels = body[5]
    cod.cbw = (body[6] & 0x0F) + 2
    cod.cbh = (body[7] & 0x0F) + 2
    cod.cbstyle = body[8]
    cod.transform = body[9]
    if scod & 0x01:
        cod.precincts = [(b & 0x0F, b >> 4) for b in body[10:10 + cod.levels + 1]]
    else:
        cod.precincts = [(15, 15)] * (cod.levels + 1)
    return cod


def _parse_coc_sp(body: bytes, base: _Cod):
    """SPcoc portion shared by COC (component overrides)."""
    cod = base.copy()
    cod.levels = body[0]
    cod.cbw = (body[1] & 0x0F) + 2
    cod.cbh = (body[2] & 0x0F) + 2
    cod.cbstyle = body[3]
    cod.transform = body[4]
    return cod


def _parse_qcd(body: bytes) -> _Qcd:
    q = _Qcd()
    s = body[0]
    q.style = s & 0x1F
    q.guard = s >> 5
    q.vals = []
    pos = 1
    if q.style == 0:  # no quantization: 8-bit exponents
        while pos < len(body):
            q.vals.append((body[pos] >> 3, 0))
            pos += 1
    else:  # derived (1) or expounded (2): 16-bit (exp,mant)
        while pos + 1 < len(body):
            v = struct.unpack_from(">H", body, pos)[0]
            q.vals.append((v >> 11, v & 0x7FF))
            pos += 2
    return q


class _Codestream:
    def __init__(self):
        self.xsiz = self.ysiz = self.xosiz = self.yosiz = 0
        self.xtsiz = self.ytsiz = self.xtosiz = self.ytosiz = 0
        self.comps = []           # (depth, signed, dx, dy)
        self.cod = None           # main-header default _Cod
        self.coc = {}             # comp → _Cod
        self.qcd = None
        self.qcc = {}
        self.tiles = {}           # tile index → dict
        self.comments = []


def parse_codestream(data: bytes, header_only: bool = False) -> _Codestream:
    cs = _Codestream()
    if data[:2] != b"\xff\x4f":
        raise ValueError("JP2: missing SOC")
    pos = 2
    n = len(data)
    cur_tile = None
    while pos + 2 <= n:
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:  # EOC
            break
        if marker == 0xFF93:  # SOD — tile-part data follows
            t = cs.tiles[cur_tile]
            start = pos + 2
            end = t["_tp_end"]
            t["data"].append(data[start:end])
            pos = end
            cur_tile = None
            continue
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xFF51:  # SIZ
            (_rsiz, cs.xsiz, cs.ysiz, cs.xosiz, cs.yosiz, cs.xtsiz,
             cs.ytsiz, cs.xtosiz, cs.ytosiz, ncomp) = struct.unpack_from(
                ">HIIIIIIIIH", body, 0)
            for i in range(ncomp):
                ss, dx, dy = body[36 + 3 * i:39 + 3 * i]
                cs.comps.append(((ss & 0x7F) + 1, bool(ss & 0x80), dx, dy))
        elif marker == 0xFF52:  # COD
            cod = _parse_cod(body)
            if cur_tile is None:
                cs.cod = cod
            else:
                cs.tiles[cur_tile]["cod"] = cod
        elif marker == 0xFF53:  # COC
            ncomp = len(cs.comps)
            if ncomp < 257:
                c = body[0]
                sp = body[2:]
            else:
                c = struct.unpack_from(">H", body, 0)[0]
                sp = body[3:]
            if cur_tile is None:
                base = cs.cod
                cs.coc[c] = _parse_coc_sp(sp, base)
                if body[1 if ncomp < 257 else 2] & 0x01:
                    cod = cs.coc[c]
                    off = 5
                    cod.precincts = [(b & 0x0F, b >> 4)
                                     for b in sp[off:off + cod.levels + 1]]
            else:
                t = cs.tiles[cur_tile]
                base = t.get("cod") or cs.cod
                t.setdefault("coc", {})[c] = _parse_coc_sp(sp, base)
                if body[1 if ncomp < 257 else 2] & 0x01:
                    cod = t["coc"][c]
                    cod.precincts = [(b & 0x0F, b >> 4)
                                     for b in sp[5:5 + cod.levels + 1]]
        elif marker == 0xFF5C:  # QCD
            q = _parse_qcd(body)
            if cur_tile is None:
                cs.qcd = q
            else:
                cs.tiles[cur_tile]["qcd"] = q
        elif marker == 0xFF5D:  # QCC
            ncomp = len(cs.comps)
            if ncomp < 257:
                c = body[0]
                q = _parse_qcd(body[1:])
            else:
                c = struct.unpack_from(">H", body, 0)[0]
                q = _parse_qcd(body[2:])
            if cur_tile is None:
                cs.qcc[c] = q
            else:
                cs.tiles[cur_tile].setdefault("qcc", {})[c] = q
        elif marker == 0xFF90:  # SOT
            isot, psot, _tpsot, _tnsot = struct.unpack_from(">HIBB", body, 0)
            if header_only:
                break
            t = cs.tiles.setdefault(isot, {"data": []})
            cur_tile = isot
            t["_tp_end"] = pos + psot if psot else n
        elif marker == 0xFF64:  # COM
            cs.comments.append(body[2:])
        elif marker in (0xFF60, 0xFF61):  # PPM / PPT packed headers
            raise ValueError("JP2: PPM/PPT packed packet headers unsupported")
        elif marker == 0xFF5F:  # POC
            raise ValueError("JP2: POC progression-order changes unsupported")
        # TLM/PLM/PLT/CRG/RGN ignored (RGN would shift ROI — none in scope)
        elif marker == 0xFF5E and body[-1] != 0:
            raise ValueError("JP2: RGN ROI shift unsupported")
        pos += 2 + ln
    return cs


# ---------------------------------------------------------------------------
# Tile geometry (B.5) + packet iteration (B.12)
# ---------------------------------------------------------------------------


class _CodeBlock:
    __slots__ = ("x0", "y0", "x1", "y1", "included", "zbp", "lblock",
                 "segs", "seg_passes", "numpasses", "incl_leaf")

    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.included = False
        self.zbp = 0
        self.lblock = 3
        self.segs = []         # list of bytearray
        self.seg_passes = []   # passes per segment
        self.numpasses = 0


class _Band:
    __slots__ = ("orient", "x0", "y0", "x1", "y1", "exp", "mant", "gain",
                 "data")

    # orient: 0=LL, 1=HL, 2=LH, 3=HH


class _Precinct:
    __slots__ = ("cbs", "incl_tree", "zbp_tree", "nw", "nh", "band")


class _Resolution:
    __slots__ = ("r", "x0", "y0", "x1", "y1", "bands", "precincts", "ppx",
                 "ppy", "npw", "nph")


def _band_rect(tcx0, tcy0, tcx1, tcy1, levels, r, orient):
    if r == 0:
        nb = levels
        xob = yob = 0
    else:
        nb = levels - r + 1
        xob = 1 if orient in (1, 3) else 0
        yob = 1 if orient in (2, 3) else 0
    d = 1 << nb
    h = 1 << (nb - 1) if nb >= 1 else 0
    bx0 = _ceil_div(tcx0 - h * xob, d)
    by0 = _ceil_div(tcy0 - h * yob, d)
    bx1 = _ceil_div(tcx1 - h * xob, d)
    by1 = _ceil_div(tcy1 - h * yob, d)
    return bx0, by0, bx1, by1


class _TileComp:
    """Per tile-component decode geometry."""

    def __init__(self, cs, tx0, ty0, tx1, ty1, comp_idx, cod, qcd):
        depth, signed, dx, dy = cs.comps[comp_idx]
        self.depth, self.signed = depth, signed
        self.dx, self.dy = dx, dy
        self.cod = cod
        self.qcd = qcd
        self.x0 = _ceil_div(tx0, dx)
        self.y0 = _ceil_div(ty0, dy)
        self.x1 = _ceil_div(tx1, dx)
        self.y1 = _ceil_div(ty1, dy)
        N = cod.levels
        self.resolutions = []
        qi = 0  # index into qcd.vals (LL first, then HL,LH,HH per level)
        for r in range(N + 1):
            res = _Resolution()
            res.r = r
            sc = 1 << (N - r)
            res.x0 = _ceil_div(self.x0, sc)
            res.y0 = _ceil_div(self.y0, sc)
            res.x1 = _ceil_div(self.x1, sc)
            res.y1 = _ceil_div(self.y1, sc)
            res.ppx, res.ppy = cod.precincts[r]
            # precinct counts on the resolution grid
            if res.x1 > res.x0:
                res.npw = _ceil_div(res.x1, 1 << res.ppx) - (res.x0 >> res.ppx)
            else:
                res.npw = 0
            if res.y1 > res.y0:
                res.nph = _ceil_div(res.y1, 1 << res.ppy) - (res.y0 >> res.ppy)
            else:
                res.nph = 0
            orients = [0] if r == 0 else [1, 2, 3]
            res.bands = []
            for orient in orients:
                b = _Band()
                b.orient = orient
                b.x0, b.y0, b.x1, b.y1 = _band_rect(
                    self.x0, self.y0, self.x1, self.y1, N, r, orient)
                if qcd.style == 2:  # expounded: one entry per band
                    b.exp, b.mant = qcd.vals[qi]
                elif qcd.style == 1:  # derived from the LL entry (E-5)
                    e0, m0 = qcd.vals[0]
                    nb = N if r == 0 else N - r + 1
                    b.exp, b.mant = e0 - N + nb, m0
                else:  # no quantization: per-band exponents
                    b.exp, b.mant = qcd.vals[qi]
                if qcd.style != 1 or qi == 0:
                    qi += 1
                b.gain = (0, 1, 1, 2)[orient]
                b.data = None
                res.bands.append(b)
            # precincts: codeblock partition per band
            res.precincts = [[] for _ in range(len(res.bands))]
            for bi, b in enumerate(res.bands):
                # codeblock size within this band (B.7)
                xcb = min(cod.cbw, res.ppx - 1 if r > 0 else res.ppx)
                ycb = min(cod.cbh, res.ppy - 1 if r > 0 else res.ppy)
                for pq in range(res.nph):
                    for pp in range(res.npw):
                        # precinct rect in resolution coords
                        prx0 = max(res.x0, ((res.x0 >> res.ppx) + pp) << res.ppx)
                        pry0 = max(res.y0, ((res.y0 >> res.ppy) + pq) << res.ppy)
                        prx1 = min(res.x1, (((res.x0 >> res.ppx) + pp + 1) << res.ppx))
                        pry1 = min(res.y1, (((res.y0 >> res.ppy) + pq + 1) << res.ppy))
                        # map to band coords
                        if r == 0:
                            bx0, by0, bx1, by1 = prx0, pry0, prx1, pry1
                        else:
                            bx0, by0 = _ceil_div(prx0, 2), _ceil_div(pry0, 2)
                            bx1, by1 = _ceil_div(prx1, 2), _ceil_div(pry1, 2)
                        # clamp to band rect
                        bx0, by0 = max(bx0, b.x0), max(by0, b.y0)
                        bx1, by1 = min(bx1, b.x1), min(by1, b.y1)
                        pr = _Precinct()
                        pr.band = bi
                        pr.cbs = []
                        if bx1 > bx0 and by1 > by0:
                            cw = 1 << xcb
                            ch = 1 << ycb
                            cgx0 = bx0 >> xcb
                            cgx1 = _ceil_div(bx1, cw)
                            cgy0 = by0 >> ycb
                            cgy1 = _ceil_div(by1, ch)
                            pr.nw = cgx1 - cgx0
                            pr.nh = cgy1 - cgy0
                            for cy in range(cgy0, cgy1):
                                for cx in range(cgx0, cgx1):
                                    cb = _CodeBlock(
                                        max(cx * cw, bx0), max(cy * ch, by0),
                                        min((cx + 1) * cw, bx1),
                                        min((cy + 1) * ch, by1))
                                    pr.cbs.append(cb)
                        else:
                            pr.nw = pr.nh = 0
                        pr.incl_tree = _TagTree(max(pr.nw, 1), max(pr.nh, 1))
                        pr.zbp_tree = _TagTree(max(pr.nw, 1), max(pr.nh, 1))
                        res.precincts[bi].append(pr)
            self.resolutions.append(res)


def _packet_order(cod, tcomps, tx0, ty0):
    """Yield (comp, res, precinct_index) in the tile's progression order;
    the caller iterates layers per B.12 (layer position depends on order).
    Returns a list of packet keys (layer, comp, res, prec) fully ordered.
    """
    layers = cod.layers
    prog = cod.prog
    maxres = max(len(tc.resolutions) for tc in tcomps)
    # precinct positional sort key: upper-left in reference-grid coords
    def prec_pos(ci, r, p):
        tc = tcomps[ci]
        res = tc.resolutions[r]
        pp = p % res.npw
        pq = p // res.npw
        N = tc.cod.levels
        sc = 1 << (N - r)
        prx0 = max(res.x0, ((res.x0 >> res.ppx) + pp) << res.ppx)
        pry0 = max(res.y0, ((res.y0 >> res.ppy) + pq) << res.ppy)
        # reference-grid coordinates
        return (pry0 * sc * tc.dy, prx0 * sc * tc.dx)

    entries = []  # (ci, r, p, (y, x))
    for ci, tc in enumerate(tcomps):
        for r, res in enumerate(tc.resolutions):
            np_ = res.npw * res.nph
            for p in range(np_):
                entries.append((ci, r, p, prec_pos(ci, r, p)))

    out = []
    if prog == 0:  # LRCP
        for lay in range(layers):
            for r in range(maxres):
                for ci, tc in enumerate(tcomps):
                    if r >= len(tc.resolutions):
                        continue
                    res = tc.resolutions[r]
                    for p in range(res.npw * res.nph):
                        out.append((lay, ci, r, p))
    elif prog == 1:  # RLCP
        for r in range(maxres):
            for lay in range(layers):
                for ci, tc in enumerate(tcomps):
                    if r >= len(tc.resolutions):
                        continue
                    res = tc.resolutions[r]
                    for p in range(res.npw * res.nph):
                        out.append((lay, ci, r, p))
    elif prog == 2:  # RPCL
        for r in range(maxres):
            sel = sorted((e for e in entries if e[1] == r),
                         key=lambda e: (e[3][0], e[3][1], e[0]))
            for ci, rr, p, _pos in sel:
                for lay in range(layers):
                    out.append((lay, ci, rr, p))
    elif prog == 3:  # PCRL
        sel = sorted(entries, key=lambda e: (e[3][0], e[3][1], e[0], e[1]))
        for ci, rr, p, _pos in sel:
            for lay in range(layers):
                out.append((lay, ci, rr, p))
    elif prog == 4:  # CPRL
        sel = sorted(entries, key=lambda e: (e[0], e[3][0], e[3][1], e[1]))
        for ci, rr, p, _pos in sel:
            for lay in range(layers):
                out.append((lay, ci, rr, p))
    else:
        raise ValueError(f"JP2: unknown progression order {prog}")
    return out


# ---------------------------------------------------------------------------
# Packet header + body decode (B.9/B.10)
# ---------------------------------------------------------------------------


def _seg_maxpasses(cod, seg_index: int, first_pass_of_seg: int) -> int:
    """Max passes a codeword segment may hold (D.8.1 termination rules)."""
    termall = cod.cbstyle & 0x04
    bypass = cod.cbstyle & 0x01
    if termall:
        return 1
    if bypass:
        if first_pass_of_seg < 10:
            return 10 - first_pass_of_seg
        # after pass 10: raw (SPP+MRP) segments of 2, MQ cleanup of 1
        return 2 if ((first_pass_of_seg - 10) % 3) != 2 else 1
    return 109


def _read_packets(tile_data: bytes, tcomps, cod, order):
    """Sequentially decode every packet, filling codeblock segments."""
    pos = 0
    n = len(tile_data)
    for (lay, ci, r, p) in order:
        if pos >= n:
            break
        if cod.sop:
            if tile_data[pos:pos + 2] == b"\xff\x91":
                pos += 6
        res = tcomps[ci].resolutions[r]
        ccod = tcomps[ci].cod
        rd = _HdrReader(tile_data, pos)
        nonzero = rd.bit()
        bodies = []  # (cb, nbytes_list aligned with new segments)
        if nonzero:
            for bi in range(len(res.bands)):
                pr = res.precincts[bi][p]
                for cbi, cb in enumerate(pr.cbs):
                    cx = cbi % pr.nw
                    cy = cbi // pr.nw
                    if not cb.included:
                        inc = pr.incl_tree.decode(rd, cx, cy, lay + 1)
                    else:
                        inc = rd.bit()
                    if not inc:
                        continue
                    if not cb.included:
                        # zero bitplanes via second tag tree
                        t = 1
                        while not pr.zbp_tree.decode(rd, cx, cy, t):
                            t += 1
                        cb.zbp = pr.zbp_tree.leaf_value(cx, cy)
                        cb.included = True
                        cb.segs.append(bytearray())
                        cb.seg_passes.append(0)
                    # number of new passes (Table B.4)
                    if rd.bit() == 0:
                        newp = 1
                    elif rd.bit() == 0:
                        newp = 2
                    else:
                        v = rd.bits(2)
                        if v < 3:
                            newp = 3 + v
                        else:
                            v = rd.bits(5)
                            if v < 31:
                                newp = 6 + v
                            else:
                                newp = 37 + rd.bits(7)
                    # Lblock increase (comma code)
                    while rd.bit():
                        cb.lblock += 1
                    # split new passes into codeword segments
                    remaining = newp
                    while remaining > 0:
                        seg_start = cb.numpasses - cb.seg_passes[-1]
                        maxp = _seg_maxpasses(ccod, len(cb.segs) - 1,
                                              seg_start)
                        room = maxp - cb.seg_passes[-1]
                        if room <= 0:
                            cb.segs.append(bytearray())
                            cb.seg_passes.append(0)
                            continue
                        take = min(room, remaining)
                        nbits = cb.lblock + int(math.floor(math.log2(take)))
                        nbytes = rd.bits(nbits)
                        bodies.append((cb, len(cb.segs) - 1, nbytes))
                        cb.seg_passes[-1] += take
                        cb.numpasses += take
                        remaining -= take
        rd.align()
        pos = rd.pos
        if cod.eph:
            if tile_data[pos:pos + 2] == b"\xff\x92":
                pos += 2
        # packet body: append bytes in the order the lengths were signaled
        for cb, seg_idx, nbytes in bodies:
            cb.segs[seg_idx].extend(tile_data[pos:pos + nbytes])
            pos += nbytes
    return pos

# ---------------------------------------------------------------------------
# Tier-1 EBCOT codeblock decoding (Annex D)
# ---------------------------------------------------------------------------

# Sign-coding contexts (Table D.3): (H, V) → (context, XOR bit).
_SC_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


def _build_zc_lut():
    """Zero-coding context (Table D.1) per band orientation, indexed
    [orient][h][v][d] with h,v ∈ 0..2 significant-neighbor counts and
    d ∈ 0..4 diagonal count.  HL swaps the h/v roles of the LL/LH
    column; HH keys on d first."""
    lut = [[[[0] * 5 for _ in range(3)] for _ in range(3)]
           for _ in range(4)]
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                elif d >= 2:
                    c = 2
                elif d == 1:
                    c = 1
                else:
                    c = 0
                lut[0][h][v][d] = c
                lut[2][h][v][d] = c
                lut[1][v][h][d] = c  # HL: transposed roles
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                lut[3][h][v][d] = c
    return lut


_ZC_LUT = _build_zc_lut()


def _decode_codeblock(cb: _CodeBlock, ccod: _Cod, orient: int, mb: int):
    """Decode one codeblock's coding passes → int64 signed-magnitude
    array (h, w).  ``mb`` is the band's magnitude bit count M_b =
    guard + exponent − 1 (Eq. E-2); ``cb.zbp`` leading bitplanes are
    all-zero (signalled via the precinct tag tree)."""
    w = cb.x1 - cb.x0
    h = cb.y1 - cb.y0
    out = np.zeros((h, w), np.int64)
    if w <= 0 or h <= 0 or not cb.included or cb.numpasses == 0:
        return out
    numbps = mb - cb.zbp
    if numbps <= 0:
        return out

    # Pass schedule: cleanup on the MSB plane, then SPP/MRP/CP per
    # lower plane (D.2).
    sched = [(2, numbps - 1)]
    p = numbps - 1
    while p > 0:
        p -= 1
        sched.extend(((0, p), (1, p), (2, p)))
    npasses = min(cb.numpasses, len(sched))

    seg_of_pass = []
    for si, np_ in enumerate(cb.seg_passes):
        seg_of_pass.extend([si] * np_)

    bypass = bool(ccod.cbstyle & 0x01)
    resetctx = bool(ccod.cbstyle & 0x02)
    causal = bool(ccod.cbstyle & 0x08)
    segsym = bool(ccod.cbstyle & 0x20)

    stride = w + 2
    size = stride * (h + 2)
    sig = bytearray(size)
    sgn = [0] * size
    val = [0] * size
    refined = bytearray(size)
    pi = bytearray(size)
    zc_lut = _ZC_LUT[orient]

    # shared MQ context state across segments (terminations do not
    # reset contexts unless the RESET style bit is on)
    I = [0] * N_CTX
    mps = [0] * N_CTX
    I[0] = 4
    I[_CTX_RL] = 3
    I[_CTX_UNI] = 46

    mq = None
    raw = None
    cur_seg = -1

    def idx(x, y):
        return (y + 1) * stride + x + 1

    def zc_ctx(i, y):
        hh = sig[i - 1] + sig[i + 1]
        if causal and (y & 3) == 3:
            vv = sig[i - stride]
            dd = sig[i - stride - 1] + sig[i - stride + 1]
        else:
            vv = sig[i - stride] + sig[i + stride]
            dd = (sig[i - stride - 1] + sig[i - stride + 1]
                  + sig[i + stride - 1] + sig[i + stride + 1])
        return zc_lut[hh][vv][dd]

    def sc_decode(dec, i, y):
        hc = sgn[i - 1] + sgn[i + 1]
        hc = 1 if hc > 0 else (-1 if hc < 0 else 0)
        if causal and (y & 3) == 3:
            vc = sgn[i - stride]
        else:
            vc = sgn[i - stride] + sgn[i + stride]
        vc = 1 if vc > 0 else (-1 if vc < 0 else 0)
        ctx, xor = _SC_TABLE[(hc, vc)]
        return dec.decode(ctx) ^ xor  # 1 = negative

    for k in range(npasses):
        ptype, plane = sched[k]
        si = seg_of_pass[k] if k < len(seg_of_pass) else len(cb.segs) - 1
        is_raw = bypass and k >= 10 and ptype != 2
        if si != cur_seg:
            data = bytes(cb.segs[si])
            if is_raw:
                raw = _RawDecoder(data)
            else:
                mq = _MQDecoder(data, states=(I, mps))
            cur_seg = si
        dec = raw if is_raw else mq
        # openjpeg-compatible mid-point reconstruction: work in a
        # 1-bit-shifted domain where becoming significant at plane p
        # sets one|half = 3<<p and each refinement bit moves the value
        # by ±half of the newly-resolved plane; a final trunc-by-2
        # yields the exact integer when every plane was decoded and
        # the standard mid-point reconstruction when truncated.
        bit = 3 << plane

        if ptype == 0:  # significance propagation
            for ys in range(0, h, 4):
                ye = min(ys + 4, h)
                for x in range(w):
                    for y in range(ys, ye):
                        i = idx(x, y)
                        if sig[i]:
                            continue
                        ctx = zc_ctx(i, y)
                        if ctx == 0:
                            continue
                        pi[i] = 1
                        if is_raw:
                            b = dec.bit()
                            if b:
                                neg = dec.bit()
                                sig[i] = 1
                                sgn[i] = -1 if neg else 1
                                val[i] = bit
                        elif dec.decode(ctx):
                            neg = sc_decode(dec, i, y)
                            sig[i] = 1
                            sgn[i] = -1 if neg else 1
                            val[i] = bit
        elif ptype == 1:  # magnitude refinement
            for ys in range(0, h, 4):
                ye = min(ys + 4, h)
                for x in range(w):
                    for y in range(ys, ye):
                        i = idx(x, y)
                        if not sig[i] or pi[i]:
                            continue
                        if is_raw:
                            b = dec.bit()
                        else:
                            if refined[i]:
                                ctx = 16
                            else:
                                if causal and (y & 3) == 3:
                                    any_n = (sig[i - 1] or sig[i + 1]
                                             or sig[i - stride]
                                             or sig[i - stride - 1]
                                             or sig[i - stride + 1])
                                else:
                                    any_n = (sig[i - 1] or sig[i + 1]
                                             or sig[i - stride]
                                             or sig[i + stride]
                                             or sig[i - stride - 1]
                                             or sig[i - stride + 1]
                                             or sig[i + stride - 1]
                                             or sig[i + stride + 1])
                                ctx = 15 if any_n else 14
                            b = dec.decode(ctx)
                        val[i] += (1 << plane) if b else -(1 << plane)
                        refined[i] = 1
        else:  # cleanup
            for ys in range(0, h, 4):
                ye = min(ys + 4, h)
                full = (ye - ys) == 4
                for x in range(w):
                    y = ys
                    if full:
                        rl_ok = True
                        for yy in range(ys, ye):
                            i = idx(x, yy)
                            if sig[i] or pi[i] or zc_ctx(i, yy) != 0:
                                rl_ok = False
                                break
                        if rl_ok:
                            if dec.decode(_CTX_RL) == 0:
                                continue  # whole column stays zero
                            r = ((dec.decode(_CTX_UNI) << 1)
                                 | dec.decode(_CTX_UNI))
                            y = ys + r
                            i = idx(x, y)
                            neg = sc_decode(dec, i, y)
                            sig[i] = 1
                            sgn[i] = -1 if neg else 1
                            val[i] = bit
                            y += 1
                    while y < ye:
                        i = idx(x, y)
                        if not sig[i] and not pi[i]:
                            if dec.decode(zc_ctx(i, y)):
                                neg = sc_decode(dec, i, y)
                                sig[i] = 1
                                sgn[i] = -1 if neg else 1
                                val[i] = bit
                        y += 1
            if segsym and not is_raw:
                for _ in range(4):
                    dec.decode(_CTX_UNI)
            # end of plane: clear the pass-membership flags
            pi = bytearray(size)
        if resetctx and not is_raw:
            I[:] = [0] * N_CTX
            mps[:] = [0] * N_CTX
            I[0] = 4
            I[_CTX_RL] = 3
            I[_CTX_UNI] = 46

    # return the SIGNED value still in the shifted domain — the
    # reversible path truncates by 2, the irreversible path keeps the
    # half-step and folds the /2 into the quantization step.
    arr = np.array(val, np.int64).reshape(h + 2, stride)[1:-1, 1:-1]
    sgn_arr = np.array(sgn, np.int64).reshape(h + 2, stride)[1:-1, 1:-1]
    return arr * sgn_arr

# ---------------------------------------------------------------------------
# Inverse DWT (Annex F) — 5/3 reversible and 9/7 irreversible lifting
# ---------------------------------------------------------------------------

_K97 = 1.230174104914001
_A97 = 1.586134342059924
_B97 = 0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971


def _mirror_indices(i0: int, i1: int, margin: int) -> np.ndarray:
    """Absolute indices [i0-margin, i1+margin) folded by whole-sample
    symmetric extension about i0 and i1-1 (F.3.7), as offsets into the
    unextended array."""
    n = i1 - i0
    j = np.arange(i0 - margin, i1 + margin) - i0
    if n == 1:
        return np.zeros_like(j)
    period = 2 * (n - 1)
    m = np.abs(j) % period
    return np.where(m < n, m, period - m)


def _syn_1d(A: np.ndarray, i0: int, axis: int, reversible: bool) -> np.ndarray:
    """One 1D synthesis (SR) pass along ``axis``.  ``A`` holds the
    interleaved signal whose first sample has ABSOLUTE index ``i0``
    (even absolute indices are low-pass).  Vectorized across the other
    axis; in-place semantics not required (returns the result)."""
    if axis == 0:
        A = A.T  # operate along the last axis
    n = A.shape[-1]
    if n == 1:
        if i0 & 1:
            if reversible:
                # single high-pass sample: X = Y/2, C-style truncation
                A = -((-A) // 2) * (A < 0) + (A // 2) * (A >= 0)
            else:
                A = A / 2.0
        return A.T if axis == 0 else A
    sel = _mirror_indices(i0, i0 + n, 2)
    E = A[..., sel]
    if reversible:
        E = E.astype(np.int64, copy=True)
    else:
        E = E.astype(np.float64, copy=True)
    # extended array E covers absolute indices [i0-2, i0+n+2)
    ne = n + 4
    e0 = 0 if (i0 - 2) % 2 == 0 else 1  # first even slot in E
    o0 = 1 - e0
    ev = np.arange(e0, ne, 2)
    od = np.arange(o0, ne, 2)
    ev_in = ev[(ev >= 1) & (ev <= ne - 2)]
    od_in = od[(od >= 1) & (od <= ne - 2)]

    def refresh():
        # re-mirror the margins so every lifting step sees neighbor
        # values consistent with whole-sample symmetric extension —
        # in-place lifting invalidates them as soon as the interior
        # samples they reflect are updated
        E[..., 0] = E[..., sel[0] + 2]
        E[..., 1] = E[..., sel[1] + 2]
        E[..., ne - 2] = E[..., sel[ne - 2] + 2]
        E[..., ne - 1] = E[..., sel[ne - 1] + 2]

    if reversible:
        E[..., ev_in] -= (E[..., ev_in - 1] + E[..., ev_in + 1] + 2) >> 2
        refresh()
        E[..., od_in] += (E[..., od_in - 1] + E[..., od_in + 1]) >> 1
    else:
        # T.800 F.4.8.2 with the spec's signed constants (α, β < 0):
        # undo the 1/K / K scaling, then the four lifting steps in
        # reverse with opposite signs.
        E[..., ev] *= _K97
        E[..., od] *= 1.0 / _K97
        E[..., ev_in] -= _D97 * (E[..., ev_in - 1] + E[..., ev_in + 1])
        refresh()
        E[..., od_in] -= _G97 * (E[..., od_in - 1] + E[..., od_in + 1])
        refresh()
        E[..., ev_in] += _B97 * (E[..., ev_in - 1] + E[..., ev_in + 1])
        refresh()
        E[..., od_in] += _A97 * (E[..., od_in - 1] + E[..., od_in + 1])
    out = E[..., 2:2 + n]
    return out.T if axis == 0 else out


def _syn_2d(ll, hl, lh, hh, tx0, ty0, tx1, ty1, reversible):
    """One level of 2D synthesis (F.3.5): interleave the four subbands
    on the resolution grid by absolute coordinate parity, then
    horizontal + vertical 1D SR passes."""
    W = tx1 - tx0
    H = ty1 - ty0
    dtype = np.int64 if reversible else np.float64
    A = np.zeros((H, W), dtype)
    xe = (tx0 & 1)  # array column of first even absolute x: 0 if tx0 even else 1
    ye_ = (ty0 & 1)
    xo = 1 - xe
    yo = 1 - ye_
    if ll.size:
        A[ye_::2, xe::2] = ll
    if hl.size:
        A[ye_::2, xo::2] = hl
    if lh.size:
        A[yo::2, xe::2] = lh
    if hh.size:
        A[yo::2, xo::2] = hh
    A = _syn_1d(A, tx0, axis=1, reversible=reversible)
    A = _syn_1d(A, ty0, axis=0, reversible=reversible)
    return A


# ---------------------------------------------------------------------------
# Tile decode: Tier-1 over every codeblock → dequant → DWT → MCT
# ---------------------------------------------------------------------------


def _decode_tilecomp(tc: _TileComp, guard: int,
                     reduce: int = 0) -> np.ndarray:
    """Decode one tile-component to its spatial-domain array over
    [tc.x0, tc.x1) × [tc.y0, tc.y1); ``reduce`` skips that many
    highest resolution levels (the overview / thumbnail path — every
    JPEG 2000 codestream embeds its own pyramid)."""
    reversible = tc.cod.transform == 1
    N = tc.cod.levels
    ll = None
    upto = len(tc.resolutions) - min(reduce, N)
    for r, res in enumerate(tc.resolutions[:upto]):
        band_arrays = []
        for bi, b in enumerate(res.bands):
            bw = b.x1 - b.x0
            bh = b.y1 - b.y0
            arr = np.zeros((bh, bw), np.int64)
            for pr in res.precincts[bi]:
                for cb in pr.cbs:
                    mb = guard + b.exp - 1
                    dec = _decode_codeblock(cb, tc.cod, b.orient, mb)
                    arr[cb.y0 - b.y0:cb.y1 - b.y0,
                        cb.x0 - b.x0:cb.x1 - b.x0] = dec
            if reversible:
                band_arrays.append(np.sign(arr) * (np.abs(arr) >> 1))
            else:
                rb = tc.depth + b.gain
                delta = (2.0 ** (rb - b.exp)) * (1.0 + b.mant / 2048.0)
                band_arrays.append(arr.astype(np.float64) * (delta / 2.0))
        if r == 0:
            ll = band_arrays[0]
            continue
        prev = tc.resolutions[r - 1]
        ll = _syn_2d(ll, band_arrays[0], band_arrays[1], band_arrays[2],
                     res.x0, res.y0, res.x1, res.y1, reversible)
    if ll is None:
        ll = np.zeros((tc.y1 - tc.y0, tc.x1 - tc.x0),
                      np.int64 if reversible else np.float64)
    return ll


def _np_dtype(depth: int, signed: bool):
    if depth <= 8:
        return np.int8 if signed else np.uint8
    if depth <= 16:
        return np.int16 if signed else np.uint16
    return np.int32 if signed else np.uint32


def decode_j2k(data: bytes, reduce: int = 0) -> list[np.ndarray]:
    """Decode a raw JPEG 2000 codestream → one 2D array per component
    (component sample grids may differ under subsampling).  ``reduce``
    decodes the embedded overview ``reduce`` levels down (dimensions
    divide by 2^reduce, ceil)."""
    cs = parse_codestream(data)
    ncomp = len(cs.comps)
    sc = 1 << reduce
    ntx = _ceil_div(cs.xsiz - cs.xtosiz, cs.xtsiz)
    nty = _ceil_div(cs.ysiz - cs.ytosiz, cs.ytsiz)
    out = []
    for ci, (depth, signed, dx, dy) in enumerate(cs.comps):
        cw = _ceil_div(cs.xsiz, dx * sc) - _ceil_div(cs.xosiz, dx * sc)
        ch = _ceil_div(cs.ysiz, dy * sc) - _ceil_div(cs.yosiz, dy * sc)
        out.append(np.zeros((ch, cw), np.float64))
    for t in range(ntx * nty):
        if t not in cs.tiles:
            continue
        tdict = cs.tiles[t]
        ti = t % ntx
        tj = t // ntx
        tx0 = max(cs.xtosiz + ti * cs.xtsiz, cs.xosiz)
        ty0 = max(cs.ytosiz + tj * cs.ytsiz, cs.yosiz)
        tx1 = min(cs.xtosiz + (ti + 1) * cs.xtsiz, cs.xsiz)
        ty1 = min(cs.ytosiz + (tj + 1) * cs.ytsiz, cs.ysiz)
        cod = tdict.get("cod") or cs.cod
        qcd = tdict.get("qcd") or cs.qcd
        tcomps = []
        for ci in range(ncomp):
            ccod = tdict.get("coc", {}).get(ci) or cs.coc.get(ci) or cod
            cqcd = tdict.get("qcc", {}).get(ci) or cs.qcc.get(ci) or qcd
            tcomps.append(_TileComp(cs, tx0, ty0, tx1, ty1, ci, ccod, cqcd))
        order = _packet_order(cod, tcomps, tx0, ty0)
        _read_packets(b"".join(tdict["data"]), tcomps, cod, order)
        planes = []
        for ci, tc in enumerate(tcomps):
            qcd_ci = tdict.get("qcc", {}).get(ci) or cs.qcc.get(ci) or qcd
            planes.append(_decode_tilecomp(tc, qcd_ci.guard, reduce))
        # inverse multi-component transform over the first 3 components
        if cod.mct == 1 and ncomp >= 3:
            y0, y1, y2 = (p.astype(np.float64) if cod.transform == 0 else p
                          for p in planes[:3])
            if cod.transform == 1:  # RCT (G.2)
                g = y0 - ((y1 + y2) >> 2)
                r = y2 + g
                b = y1 + g
            else:  # ICT (G.3)
                r = y0 + 1.402 * y2
                g = y0 - 0.344136 * y1 - 0.714136 * y2
                b = y0 + 1.772 * y1
            planes[0], planes[1], planes[2] = r, g, b
        for ci, tc in enumerate(tcomps):
            depth, signed, dxc, dyc = cs.comps[ci]
            p = planes[ci]
            if not signed:
                p = p + (1 << (depth - 1))
            lo = -(1 << (depth - 1)) if signed else 0
            hi = (1 << (depth - 1)) - 1 if signed else (1 << depth) - 1
            if p.dtype.kind == "f":
                p = np.rint(p)
            p = np.clip(p, lo, hi)
            # paste into the component image (reduced coords divide
            # by 2^reduce with the same ceil rule)
            ox = _ceil_div(tc.x0, sc) - _ceil_div(cs.xosiz, dxc * sc)
            oy = _ceil_div(tc.y0, sc) - _ceil_div(cs.yosiz, dyc * sc)
            out[ci][oy:oy + p.shape[0], ox:ox + p.shape[1]] = p
    return [o.astype(_np_dtype(d, s))
            for o, (d, s, _, _) in zip(out, cs.comps)]

# ---------------------------------------------------------------------------
# JP2 container (ISO 15444-1 Annex I) + GeoJP2 / GMLJP2 georeferencing
# ---------------------------------------------------------------------------

#: GeoTIFF-in-UUID box signature (the public GeoJP2 convention)
_GEOJP2_UUID = bytes.fromhex("b14bf8bd083d4b43a5ae8cd7d5a6ce03")
#: XMP packet UUID (Adobe XMP Specification Part 3)
_XMP_UUID = bytes.fromhex("be7acfcb97a942e89c71999491e3afac")


def _iter_boxes(data: bytes, pos: int = 0, end: int | None = None):
    end = len(data) if end is None else end
    while pos + 8 <= end:
        ln = struct.unpack_from(">I", data, pos)[0]
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if ln == 1:
            ln = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif ln == 0:
            ln = end - pos
        yield typ, pos + hdr, min(pos + ln, end)
        pos += max(ln, hdr)


def find_codestream(data: bytes) -> bytes:
    """Raw J2K codestream from either a bare .j2k or a .jp2 wrapper."""
    if data[:4] == b"\xff\x4f\xff\x51":
        return data
    for typ, a, b in _iter_boxes(data):
        if typ == b"jp2c":
            return data[a:b]
    raise ValueError("JP2: no codestream box")


def _parse_gmljp2(xml_text: str):
    """GMLJP2 RectifiedGrid → (geotransform, crs).  Handles the
    EPSG:4326 lat/lon axis order the reference's gmljp2 fixtures use
    (offsetVector with zero first component ⇒ axes swapped)."""
    import re as _re

    def _floats(tag):
        m = _re.search(rf"<gml:{tag}[^>]*>(.*?)</gml:{tag}>", xml_text,
                       _re.S)
        if not m:
            return None
        inner = _re.sub(r"<[^>]+>", " ", m.group(1))
        return [float(t) for t in inner.replace(",", " ").split()]

    origin = _floats("origin") or _floats("pos")
    vecs = _re.findall(r"<gml:offsetVector[^>]*>(.*?)</gml:offsetVector>",
                       xml_text, _re.S)
    if origin is None or len(vecs) < 2:
        return None, ""
    v1 = [float(t) for t in vecs[0].split()]
    v2 = [float(t) for t in vecs[1].split()]
    crs = ""
    m = _re.search(r'srsName="([^"]+)"', xml_text)
    if m:
        crs = m.group(1)
    # EPSG:4326 positions come in lat/lon axis order: swap the
    # COMPONENTS of the origin and of each offset vector (the vector
    # roles — column step, row step — are unchanged).
    if "4326" in crs and abs(v1[0]) < abs(v1[1]):
        origin = origin[::-1]
        v1 = [v1[1], v1[0]]
        v2 = [v2[1], v2[0]]
    gt = (origin[0] - v1[0] / 2 - v2[0] / 2, v1[0], v2[0],
          origin[1] - v1[1] / 2 - v2[1] / 2, v1[1], v2[1])
    return gt, crs


def decode_jp2(data: bytes) -> dict:
    """Full .jp2/.j2k decode → the decode_geotiff-shaped dict
    {"bands", "crs", "geotransform", "nodata"} (+ "xmp" when an XMP
    UUID box is present).  GeoJP2 (degenerate GeoTIFF in a UUID box)
    wins over GMLJP2 when both are present, matching the reference's
    default order (gdaljp2metadata.cpp role)."""
    bands = decode_j2k(find_codestream(data))
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    crs = ""
    xmp = None
    if data[:4] != b"\xff\x4f":
        gml_xml = None
        geojp2 = None
        def walk(pos, end):
            nonlocal xmp, gml_xml, geojp2
            for typ, a, b in _iter_boxes(data, pos, end):
                if typ == b"uuid":
                    if data[a:a + 16] == _GEOJP2_UUID:
                        geojp2 = data[a + 16:b]
                    elif data[a:a + 16] == _XMP_UUID:
                        xmp = data[a + 16:b]
                elif typ in (b"asoc", b"jp2h"):
                    walk(a, b)
                elif typ == b"xml ":
                    txt = data[a:b].decode("utf-8", "replace")
                    if "RectifiedGrid" in txt:
                        gml_xml = txt
        walk(0, len(data))
        if geojp2 is not None:
            from gdal_ray.raster.gtiff import probe_geotiff

            try:
                info = probe_geotiff(geojp2)
                gt = info["geotransform"]
                crs = info["crs"]
            except Exception:
                pass
        elif gml_xml is not None:
            g, c = _parse_gmljp2(gml_xml)
            if g is not None:
                gt, crs = g, c
    out = {"bands": bands, "crs": crs, "geotransform": tuple(gt),
           "nodata": None}
    if xmp is not None:
        out["xmp"] = xmp.decode("utf-8", "replace")
    return out


def read_jp2(paths, tile_size: int = 256):
    """Ray Data reader: one task per .jp2 file → tile-table rows
    (same shape as ``read_geotiff``).  JPEG2000 scenes are
    independently decodable, so a directory of them streams through
    ``map_batches`` with no driver state; at 100 TB each worker holds
    one decoded scene at a time and the object store spills the tile
    rows."""
    import pyarrow as pa

    from gdal_ray.formats import _binary_ds
    from gdal_ray.raster import model

    ds = _binary_ds(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for data in batch["bytes"]:
            d = decode_jp2(bytes(data.as_py()))
            for bi, arr in enumerate(d["bands"], start=1):
                if arr.dtype == np.int8:  # tile table carries int16 up
                    arr = arr.astype(np.int16)
                tables.append(model.from_array(
                    arr, d["crs"], d["geotransform"], band=bi,
                    tile_size=tile_size))
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")
