"""Lossy VP8 intra-frame (keyframe) decoder — RFC 6386, from scratch.

Reference role: frmts/webp/webpdataset.cpp (the reference delegates to
libwebp; this module re-implements the still-image decode path from
the published RFC).  Scope: the boolean arithmetic decoder (§7), frame
+ first-partition headers (§9) with segmentation and loop-filter
deltas, keyframe intra-mode decoding (§11: 16×16 modes, B_PRED 4×4
sub-modes with above/left contexts, chroma modes), token decoding
(§13: coefficient tree with bands/contexts, cat1-6 extra bits, Y2
WHT), dequantization (§14.1), the exact integer inverse DCT/WHT
(§14.3-14.4), intra prediction (§12 — the 127/129 edge conventions and
the rightmost-MB above-right replication), and the normal + simple
loop filters (§15) applied in macroblock raster order.

The probability / quantizer tables in vp8_tables.py are normative RFC
6386 constants.  Correctness: tests/test_webp_vp8.py drives this
decoder AND libwebp (present as a system library, via ctypes) over the
reference's own lossy fixtures and compares the YUV planes per-pixel.

Interframes (golden/altref prediction) are out of scope — WebP stills
are single keyframes by construction.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_ray.raster.vp8_tables import (
    AC_QLOOKUP,
    COEF_PROBS,
    COEF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# --- mode numbering (§11) --------------------------------------------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)
_BMODE_TREE = (-B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
               -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)
#: implied sub-modes of a non-B_PRED neighbour (context only)
_IMPLIED_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# The bmode probability table in vp8_tables.py is stored in libwebp's
# mode numbering, which permutes RD/VR/LD relative to the RFC enum
# used throughout this module — remap its [above][left] context
# indices to RFC order once at import.
_RFC2LW = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
_KF_BMODE = [[KF_BMODE_PROBS[_RFC2LW[a]][_RFC2LW[l]] for l in range(10)]
             for a in range(10)]

# token tree (§13.2); leaves are token indices 0..11
_DCT_EOB, _DCT_0, _DCT_1, _DCT_2, _DCT_3, _DCT_4 = range(6)
_CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6 = range(6, 12)
_COEF_TREE = (-_DCT_EOB, 2, -_DCT_0, 4, -_DCT_1, 6, 8, 12,
              -_DCT_2, 10, -_DCT_3, -_DCT_4, 14, 16,
              -_CAT1, -_CAT2, 18, 20, -_CAT3, -_CAT4, -_CAT5, -_CAT6)
_CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
              (180, 157, 141, 134, 130),
              (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
_CAT_BASE = (5, 7, 11, 19, 35, 67)

_COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


class _Bool:
    """Boolean arithmetic decoder (§7.3)."""

    __slots__ = ("data", "pos", "value", "range", "bits")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bits = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                b = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= b
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


# --- inverse transforms (§14.3, §14.4) -------------------------------------

_C1 = 20091   # cos(pi/8)*sqrt(2) - 1, Q16
_C2 = 35468   # sin(pi/8)*sqrt(2), Q16


def _idct4x4(b):
    """Exact integer inverse DCT; ``b`` is a flat 16-list (raster)."""
    t = [0] * 16
    for i in range(4):
        i0, i4, i8, i12 = b[i], b[i + 4], b[i + 8], b[i + 12]
        a1 = i0 + i8
        b1 = i0 - i8
        c1 = ((i4 * _C2) >> 16) - (i12 + ((i12 * _C1) >> 16))
        d1 = (i4 + ((i4 * _C1) >> 16)) + ((i12 * _C2) >> 16)
        t[i] = a1 + d1
        t[i + 12] = a1 - d1
        t[i + 4] = b1 + c1
        t[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        i0, i1, i2, i3 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = i0 + i2
        b1 = i0 - i2
        c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
        d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(b):
    """Inverse Walsh-Hadamard for the Y2 block (§14.3)."""
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[i + 12]
        b1 = b[i + 4] + b[i + 8]
        c1 = b[i + 4] - b[i + 8]
        d1 = b[i] - b[i + 12]
        t[i] = a1 + b1
        t[i + 4] = c1 + d1
        t[i + 8] = a1 - b1
        t[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# --- frame header ----------------------------------------------------------


class _Frame:
    pass


def _parse_header(data: bytes) -> _Frame:
    f = _Frame()
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    f.keyframe = not (tag & 1)
    f.version = (tag >> 1) & 7
    f.part0_size = tag >> 5
    if not f.keyframe:
        raise NotImplementedError(
            "VP8 interframe — WebP stills are keyframes")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w = struct.unpack_from("<H", data, 6)[0]
    h = struct.unpack_from("<H", data, 8)[0]
    f.width = w & 0x3FFF
    f.height = h & 0x3FFF
    f.part0 = data[10:10 + f.part0_size]
    f.rest = data[10 + f.part0_size:]
    return f


# --- intra prediction (§12) ------------------------------------------------


def _pred_whole(plane, r, c, mode, have_above, have_left, size):
    """DC/V/H/TM prediction into plane[r:r+size, c:c+size]; row r-1 is
    the above row, column c-1 the left column (margins always valid —
    they hold the 127/129 borders at frame edges)."""
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(plane[r - 1, c:c + size].sum()
                    + plane[r:r + size, c - 1].sum())
            dc = (s + size) >> (5 if size == 16 else 4)
        elif have_above:
            s = int(plane[r - 1, c:c + size].sum())
            dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            s = int(plane[r:r + size, c - 1].sum())
            dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        plane[r:r + size, c:c + size] = dc
    elif mode == V_PRED:
        plane[r:r + size, c:c + size] = plane[r - 1, c:c + size]
    elif mode == H_PRED:
        plane[r:r + size, c:c + size] = plane[r:r + size, c - 1][:, None]
    else:  # TM
        a = plane[r - 1, c:c + size].astype(np.int32)
        left = plane[r:r + size, c - 1].astype(np.int32)
        p = int(plane[r - 1, c - 1])
        blk = left[:, None] + a[None, :] - p
        plane[r:r + size, c:c + size] = np.clip(blk, 0, 255)


def _pred_b(plane, r, c, mode, ar):
    """4×4 sub-block prediction (§12.3) → 4×4 int array.
    ``ar`` = the 4 above-right pixels."""
    A = [int(plane[r - 1, c + i]) for i in range(4)]
    L = [int(plane[r + i, c - 1]) for i in range(4)]
    X = int(plane[r - 1, c - 1])
    E = A + [int(v) for v in ar]  # top row extended: E[0..7]
    o = np.empty((4, 4), np.int32)
    I, J, K, Lh = L
    if mode == B_DC:
        o[:, :] = (sum(A) + sum(L) + 4) >> 3
    elif mode == B_TM:
        for y in range(4):
            for x in range(4):
                o[y, x] = _clip255(L[y] + A[x] - X)
    elif mode == B_VE:
        row = [_avg3(X, E[0], E[1]), _avg3(E[0], E[1], E[2]),
               _avg3(E[1], E[2], E[3]), _avg3(E[2], E[3], E[4])]
        o[:, :] = np.array(row)[None, :]
    elif mode == B_HE:
        col = [_avg3(X, I, J), _avg3(I, J, K), _avg3(J, K, Lh),
               _avg3(K, Lh, Lh)]
        o[:, :] = np.array(col)[:, None]
    elif mode == B_LD:
        for y in range(4):
            for x in range(4):
                i = x + y
                if i < 6:
                    o[y, x] = _avg3(E[i], E[i + 1], E[i + 2])
                else:
                    o[y, x] = _avg3(E[6], E[7], E[7])
    elif mode == B_RD:
        g = [_avg3(Lh, K, J), _avg3(K, J, I), _avg3(J, I, X),
             _avg3(I, X, E[0]), _avg3(X, E[0], E[1]),
             _avg3(E[0], E[1], E[2]), _avg3(E[1], E[2], E[3])]
        for y in range(4):
            for x in range(4):
                o[y, x] = g[x - y + 3]
    elif mode == B_VR:
        o[0, 0] = o[2, 1] = _avg2(X, E[0])
        o[0, 1] = o[2, 2] = _avg2(E[0], E[1])
        o[0, 2] = o[2, 3] = _avg2(E[1], E[2])
        o[0, 3] = _avg2(E[2], E[3])
        o[3, 0] = _avg3(K, J, I)
        o[2, 0] = _avg3(J, I, X)
        o[1, 0] = o[3, 1] = _avg3(I, X, E[0])
        o[1, 1] = o[3, 2] = _avg3(X, E[0], E[1])
        o[1, 2] = o[3, 3] = _avg3(E[0], E[1], E[2])
        o[1, 3] = _avg3(E[1], E[2], E[3])
    elif mode == B_VL:
        o[0, 0] = _avg2(E[0], E[1])
        o[0, 1] = o[2, 0] = _avg2(E[1], E[2])
        o[0, 2] = o[2, 1] = _avg2(E[2], E[3])
        o[0, 3] = o[2, 2] = _avg2(E[3], E[4])
        o[1, 0] = _avg3(E[0], E[1], E[2])
        o[1, 1] = o[3, 0] = _avg3(E[1], E[2], E[3])
        o[1, 2] = o[3, 1] = _avg3(E[2], E[3], E[4])
        o[1, 3] = o[3, 2] = _avg3(E[3], E[4], E[5])
        o[2, 3] = _avg3(E[4], E[5], E[6])
        o[3, 3] = _avg3(E[5], E[6], E[7])
    elif mode == B_HD:
        o[0, 0] = o[1, 2] = _avg2(I, X)
        o[0, 1] = o[1, 3] = _avg3(I, X, E[0])
        o[0, 2] = _avg3(X, E[0], E[1])
        o[0, 3] = _avg3(E[0], E[1], E[2])
        o[1, 0] = o[2, 2] = _avg2(J, I)
        o[1, 1] = o[2, 3] = _avg3(J, I, X)
        o[2, 0] = o[3, 2] = _avg2(K, J)
        o[2, 1] = o[3, 3] = _avg3(K, J, I)
        o[3, 0] = _avg2(Lh, K)
        o[3, 1] = _avg3(Lh, K, J)
    else:  # B_HU
        o[0, 0] = _avg2(I, J)
        o[0, 1] = _avg3(I, J, K)
        o[0, 2] = o[1, 0] = _avg2(J, K)
        o[0, 3] = o[1, 1] = _avg3(J, K, Lh)
        o[1, 2] = o[2, 0] = _avg2(K, Lh)
        o[1, 3] = o[2, 1] = _avg3(K, Lh, Lh)
        o[2, 2] = o[2, 3] = Lh
        o[3, 0] = o[3, 1] = o[3, 2] = o[3, 3] = Lh
    return o


# --- main decode -----------------------------------------------------------


def decode_vp8(data: bytes):
    """Keyframe VP8 bitstream → (Y, U, V) uint8 planes, cropped to the
    declared frame size (chroma = ceil(size/2))."""
    f = _parse_header(data)
    bd = _Bool(f.part0)
    bd.literal(1)  # color space (0 in valid streams)
    bd.literal(1)  # clamping type

    # segmentation (§9.3)
    seg_enabled = bd.bool(128)
    update_map = False
    seg_tree_probs = [255, 255, 255]
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_abs = False
    if seg_enabled:
        update_map = bool(bd.bool(128))
        update_data = bd.bool(128)
        if update_data:
            seg_abs = bool(bd.bool(128))
            for i in range(4):
                if bd.bool(128):
                    seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.bool(128):
                    seg_lf[i] = bd.signed_literal(6)
        if update_map:
            for i in range(3):
                if bd.bool(128):
                    seg_tree_probs[i] = bd.literal(8)

    # loop filter header (§9.4)
    filter_type = bd.literal(1)   # 0 = normal, 1 = simple
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.bool(128)
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled and bd.bool(128):
        for i in range(4):
            if bd.bool(128):
                ref_lf_deltas[i] = bd.signed_literal(6)
        for i in range(4):
            if bd.bool(128):
                mode_lf_deltas[i] = bd.signed_literal(6)

    # token partitions (§9.5)
    nparts = 1 << bd.literal(2)
    rest = f.rest
    off = 3 * (nparts - 1)
    parts = []
    for i in range(nparts):
        if i < nparts - 1:
            sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
            parts.append(rest[off:off + sz])
            off += sz
        else:
            parts.append(rest[off:])
    token_bd = [_Bool(p) for p in parts]

    # quantizers (§9.6 / §14.1)
    yac_qi = bd.literal(7)
    ydc_d = bd.signed_literal(4) if bd.bool(128) else 0
    y2dc_d = bd.signed_literal(4) if bd.bool(128) else 0
    y2ac_d = bd.signed_literal(4) if bd.bool(128) else 0
    uvdc_d = bd.signed_literal(4) if bd.bool(128) else 0
    uvac_d = bd.signed_literal(4) if bd.bool(128) else 0

    def _q(idx, table):
        return table[min(127, max(0, idx))]

    def quants_for(qi):
        return (_q(qi + ydc_d, DC_QLOOKUP),
                _q(qi, AC_QLOOKUP),
                _q(qi + y2dc_d, DC_QLOOKUP) * 2,
                max(8, _q(qi + y2ac_d, AC_QLOOKUP) * 155 // 100),
                min(132, _q(qi + uvdc_d, DC_QLOOKUP)),
                _q(qi + uvac_d, AC_QLOOKUP))

    seg_quants = []
    for s in range(4):
        if seg_enabled:
            qi = seg_quant[s] if seg_abs else yac_qi + seg_quant[s]
        else:
            qi = yac_qi
        seg_quants.append(quants_for(qi))

    bd.bool(128)  # refresh_entropy_probs — no effect within one frame

    # token probability updates (§13.4)
    coef_probs = [[[list(COEF_PROBS[i][j][k]) for k in range(3)]
                   for j in range(8)] for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                up = COEF_UPDATE_PROBS[i][j][k]
                row = coef_probs[i][j][k]
                for n in range(11):
                    if bd.bool(up[n]):
                        row[n] = bd.literal(8)

    mb_no_skip = bd.bool(128)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    mb_w = (f.width + 15) >> 4
    mb_h = (f.height + 15) >> 4

    # --- per-MB mode decode (first partition, §11) ------------------------
    mb_ymode = np.zeros((mb_h, mb_w), np.int32)
    mb_uvmode = np.zeros((mb_h, mb_w), np.int32)
    mb_skip = np.zeros((mb_h, mb_w), np.uint8)
    mb_seg = np.zeros((mb_h, mb_w), np.int32)
    bmodes = {}
    above_b = [[B_DC] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_b = [B_DC] * 4
        for mx in range(mb_w):
            if seg_enabled and update_map:
                mb_seg[my, mx] = bd.tree(_SEGMENT_TREE, seg_tree_probs)
            if mb_no_skip:
                mb_skip[my, mx] = bd.bool(prob_skip_false)
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            mb_ymode[my, mx] = ym
            if ym == B_PRED:
                sub = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        a = above_b[mx][sx] if sy == 0 \
                            else sub[(sy - 1) * 4 + sx]
                        lft = left_b[sy] if sx == 0 else sub[sy * 4 + sx - 1]
                        sub[sy * 4 + sx] = bd.tree(
                            _BMODE_TREE, _KF_BMODE[a][lft])
                    left_b[sy] = sub[sy * 4 + 3]
                above_b[mx] = sub[12:16]
                bmodes[(my, mx)] = sub
            else:
                ib = _IMPLIED_B[ym]
                above_b[mx] = [ib] * 4
                left_b = [ib] * 4
            mb_uvmode[my, mx] = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)

    # --- token decode + reconstruction ------------------------------------
    W = mb_w * 16
    H = mb_h * 16
    # planes with a 1-px top/left margin (127 above / 129 left / the
    # 127-or-129 corner) and a 4-px right margin for above-right reads
    Y = np.full((H + 1, W + 5), 0, np.int32)
    U = np.full((H // 2 + 1, W // 2 + 1), 0, np.int32)
    V = np.full((H // 2 + 1, W // 2 + 1), 0, np.int32)
    Y[0, :] = 127
    U[0, :] = 127
    V[0, :] = 127
    Y[1:, 0] = 129
    U[1:, 0] = 129
    V[1:, 0] = 129

    above_nz_y = np.zeros((mb_w, 4), np.uint8)
    above_nz_u = np.zeros((mb_w, 2), np.uint8)
    above_nz_v = np.zeros((mb_w, 2), np.uint8)
    above_nz_y2 = np.zeros(mb_w, np.uint8)
    mb_has_coeffs = np.zeros((mb_h, mb_w), np.uint8)

    def decode_coeffs(t_bd, ptype, ctx, first, probs):
        coefs = [0] * 16
        n = first
        start = 0
        nonzero = False
        p = probs[ptype][_COEF_BANDS[n]][ctx]
        while n < 16:
            tok = t_bd.tree(_COEF_TREE, p, start)
            if tok == _DCT_EOB:
                break
            if tok == _DCT_0:
                n += 1
                if n >= 16:
                    break
                p = probs[ptype][_COEF_BANDS[n]][0]
                start = 2  # after a zero, EOB cannot follow
                continue
            if tok <= _DCT_4:
                v = tok - _DCT_0  # 1..4
            else:
                cat = tok - _CAT1
                extra = 0
                for pb in _CAT_PROBS[cat]:
                    extra = (extra << 1) | t_bd.bool(pb)
                v = _CAT_BASE[cat] + extra
            if t_bd.bool(128):
                v = -v
            coefs[_ZIGZAG[n]] = v
            nonzero = True
            n += 1
            if n >= 16:
                break
            p = probs[ptype][_COEF_BANDS[n]][1 if abs(v) == 1 else 2]
            start = 0
        return coefs, nonzero

    for my in range(mb_h):
        left_nz_y = [0, 0, 0, 0]
        left_nz_u = [0, 0]
        left_nz_v = [0, 0]
        left_nz_y2 = 0
        t_bd = token_bd[my % nparts]
        for mx in range(mb_w):
            seg = int(mb_seg[my, mx])
            ydc_q, yac_q, y2dc_q, y2ac_q, uvdc_q, uvac_q = seg_quants[seg]
            ym = int(mb_ymode[my, mx])
            has_y2 = ym != B_PRED
            skip = bool(mb_skip[my, mx])

            y_coefs = None
            u_coefs = None
            v_coefs = None
            any_nz = False

            if not skip:
                y_coefs = [None] * 16
                u_coefs = [None] * 4
                v_coefs = [None] * 4
                y2_out = None
                if has_y2:
                    ctx = int(above_nz_y2[mx]) + left_nz_y2
                    c2, nz2 = decode_coeffs(t_bd, 1, ctx, 0, coef_probs)
                    above_nz_y2[mx] = left_nz_y2 = 1 if nz2 else 0
                    any_nz |= nz2
                    dq = [c2[i] * (y2dc_q if i == 0 else y2ac_q)
                          for i in range(16)]
                    y2_out = _iwht4x4(dq)
                    ptype, first = 0, 1
                else:
                    ptype, first = 3, 0
                for b in range(16):
                    sy, sx = divmod(b, 4)
                    ctx = int(above_nz_y[mx][sx]) + left_nz_y[sy]
                    c, nz = decode_coeffs(t_bd, ptype, ctx, first,
                                          coef_probs)
                    above_nz_y[mx][sx] = left_nz_y[sy] = 1 if nz else 0
                    any_nz |= nz
                    dq = [c[i] * (ydc_q if i == 0 else yac_q)
                          for i in range(16)]
                    if y2_out is not None:
                        dq[0] = y2_out[b]
                    y_coefs[b] = dq
                for coefs4, anz, lnz in ((u_coefs, above_nz_u, left_nz_u),
                                         (v_coefs, above_nz_v, left_nz_v)):
                    for b in range(4):
                        sy, sx = divmod(b, 2)
                        ctx = int(anz[mx][sx]) + lnz[sy]
                        c, nz = decode_coeffs(t_bd, 2, ctx, 0, coef_probs)
                        anz[mx][sx] = lnz[sy] = 1 if nz else 0
                        any_nz |= nz
                        coefs4[b] = [c[i] * (uvdc_q if i == 0 else uvac_q)
                                     for i in range(16)]
            else:
                above_nz_y[mx][:] = 0
                left_nz_y[:] = [0, 0, 0, 0]
                above_nz_u[mx][:] = 0
                left_nz_u[:] = [0, 0]
                above_nz_v[mx][:] = 0
                left_nz_v[:] = [0, 0]
                if has_y2:
                    # skipped MB with a Y2 block: context zeroed; a
                    # B_PRED MB leaves the Y2 context untouched (§13.1)
                    above_nz_y2[mx] = left_nz_y2 = 0
            mb_has_coeffs[my, mx] = 1 if any_nz else 0

            _recon_mb(Y, U, V, my, mx, mb_w, mb_h, f.width, ym,
                      int(mb_uvmode[my, mx]), bmodes.get((my, mx)),
                      y_coefs, u_coefs, v_coefs)

    if filter_level > 0:
        _loop_filter(Y, U, V, mb_w, mb_h, filter_type, filter_level,
                     sharpness, seg_enabled, seg_abs, seg_lf, mb_seg,
                     lf_delta_enabled, ref_lf_deltas, mode_lf_deltas,
                     mb_ymode, mb_skip, mb_has_coeffs)

    y = Y[1:1 + f.height, 1:1 + f.width].astype(np.uint8)
    ch = (f.height + 1) // 2
    cw = (f.width + 1) // 2
    u = U[1:1 + ch, 1:1 + cw].astype(np.uint8)
    v = V[1:1 + ch, 1:1 + cw].astype(np.uint8)
    return y, u, v


def _recon_mb(Y, U, V, my, mx, mb_w, mb_h, frame_w, ym, uvm, bmode,
              y_coefs, u_coefs, v_coefs):
    """Intra-predict + add residuals for one macroblock.  Plane
    margins: row 0 = 127 above border, col 0 = 129 left border."""
    r = 1 + my * 16
    c = 1 + mx * 16
    have_above = my > 0
    have_left = mx > 0

    if ym != B_PRED:
        _pred_whole(Y, r, c, ym, have_above, have_left, 16)
        if y_coefs is not None:
            for b in range(16):
                dq = y_coefs[b]
                if any(dq):
                    res = _idct4x4(dq)
                    sy, sx = divmod(b, 4)
                    blk = Y[r + sy * 4:r + sy * 4 + 4,
                            c + sx * 4:c + sx * 4 + 4]
                    blk += np.array(res, np.int32).reshape(4, 4)
                    np.clip(blk, 0, 255, out=blk)
    else:
        # above-right pixels for the 4 rightmost sub-blocks: from the
        # row above this MB, columns [16,20) — replicated from pixel
        # 15 on the rightmost MB (libwebp convention); 127 on the top
        # row (margin row is already 127)
        if mx >= mb_w - 1:
            Y[r - 1, c + 16:c + 20] = Y[r - 1, c + 15]
        for b in range(16):
            sy, sx = divmod(b, 4)
            rr = r + sy * 4
            cc = c + sx * 4
            if sy > 0 and sx == 3:
                # above-right of an interior right-column sub-block is
                # not yet decoded — the spec substitutes the pixels
                # above the MB's right edge (same rule as libwebp's
                # single top-right row replicated downward)
                ar = Y[r - 1, c + 16:c + 20]
            else:
                ar = Y[rr - 1, cc + 4:cc + 8]
            pred = _pred_b(Y, rr, cc, bmode[b], ar)
            if y_coefs is not None and any(y_coefs[b]):
                pred = pred + np.array(_idct4x4(y_coefs[b]),
                                       np.int32).reshape(4, 4)
            Y[rr:rr + 4, cc:cc + 4] = np.clip(pred, 0, 255)

    rc = 1 + my * 8
    cc8 = 1 + mx * 8
    for plane, coefs in ((U, u_coefs), (V, v_coefs)):
        _pred_whole(plane, rc, cc8, uvm, have_above, have_left, 8)
        if coefs is not None:
            for b in range(4):
                dq = coefs[b]
                if any(dq):
                    res = _idct4x4(dq)
                    sy, sx = divmod(b, 2)
                    blk = plane[rc + sy * 4:rc + sy * 4 + 4,
                                cc8 + sx * 4:cc8 + sx * 4 + 4]
                    blk += np.array(res, np.int32).reshape(4, 4)
                    np.clip(blk, 0, 255, out=blk)


# --- loop filter (§15) -----------------------------------------------------


def _s(v):
    """uint8 → signed (value-128) domain."""
    return v - 128


def _c(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def _filter_common(p1, p0, q0, q1, use_outer_taps):
    """§15.3 common adjustment; returns (p0', q0', a_for_q1p1)."""
    a = _c(_c(p1 - q1) * int(use_outer_taps) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    return _c(p0 + f2), _c(q0 - f1), f1


def _hev(p1, p0, q0, q1, thresh):
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge):
    return (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _filter_seg(px, mb_edge, interior, edge, thresh):
    """Filter one 8-pixel segment [p3 p2 p1 p0 q0 q1 q2 q3] (signed
    domain); returns the new values or None if masked out."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    if not _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge):
        return None
    hev = _hev(p1, p0, q0, q1, thresh)
    if not mb_edge:
        p0n, q0n, f1 = _filter_common(p1, p0, q0, q1, hev)
        if not hev:
            a = (f1 + 1) >> 1
            q1 = _c(q1 - a)
            p1 = _c(p1 + a)
        return p3, p2, p1, p0n, q0n, q1, q2, q3
    if hev:
        p0n, q0n, _ = _filter_common(p1, p0, q0, q1, True)
        return p3, p2, p1, p0n, q0n, q1, q2, q3
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    q0 = _c(q0 - a)
    p0 = _c(p0 + a)
    a = _c((18 * w + 63) >> 7)
    q1 = _c(q1 - a)
    p1 = _c(p1 + a)
    a = _c((9 * w + 63) >> 7)
    q2 = _c(q2 - a)
    p2 = _c(p2 + a)
    return p3, p2, p1, p0, q0, q1, q2, q3


def _filter_edge(plane, r0, c0, n, horiz, mb_edge, interior, edge,
                 thresh):
    """Filter an ``n``-pixel-long edge.  ``horiz``: the edge is
    horizontal (filter runs vertically across rows)."""
    for k in range(n):
        if horiz:
            rr = r0
            cc = c0 + k
            px = [int(plane[rr + d, cc]) - 128 for d in range(-4, 4)]
        else:
            rr = r0 + k
            cc = c0
            px = [int(plane[rr, cc + d]) - 128 for d in range(-4, 4)]
        out = _filter_seg(px, mb_edge, interior, edge, thresh)
        if out is None:
            continue
        for d, v in zip(range(-4, 4), out):
            if horiz:
                plane[rr + d, cc] = v + 128
            else:
                plane[rr, cc + d] = v + 128


def _simple_edge(plane, r0, c0, n, horiz, edge):
    for k in range(n):
        if horiz:
            rr, cc = r0, c0 + k
            p1, p0, q0, q1 = (int(plane[rr - 2, cc]) - 128,
                              int(plane[rr - 1, cc]) - 128,
                              int(plane[rr, cc]) - 128,
                              int(plane[rr + 1, cc]) - 128)
        else:
            rr, cc = r0 + k, c0
            p1, p0, q0, q1 = (int(plane[rr, cc - 2]) - 128,
                              int(plane[rr, cc - 1]) - 128,
                              int(plane[rr, cc]) - 128,
                              int(plane[rr, cc + 1]) - 128)
        if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > edge:
            continue
        p0n, q0n, _ = _filter_common(p1, p0, q0, q1, True)
        if horiz:
            plane[rr - 1, cc] = p0n + 128
            plane[rr, cc] = q0n + 128
        else:
            plane[rr, cc - 1] = p0n + 128
            plane[rr, cc] = q0n + 128


def _loop_filter(Y, U, V, mb_w, mb_h, filter_type, base_level,
                 sharpness, seg_enabled, seg_abs, seg_lf, mb_seg,
                 lf_delta_enabled, ref_lf_deltas, mode_lf_deltas,
                 mb_ymode, mb_skip, mb_has_coeffs):
    for my in range(mb_h):
        for mx in range(mb_w):
            lvl = base_level
            if seg_enabled:
                s = int(mb_seg[my, mx])
                lvl = seg_lf[s] if seg_abs else lvl + seg_lf[s]
            if lf_delta_enabled:
                lvl += ref_lf_deltas[0]  # intra frame
                if mb_ymode[my, mx] == B_PRED:
                    lvl += mode_lf_deltas[0]
            lvl = min(63, max(0, lvl))
            if lvl == 0:
                continue
            interior = lvl
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_edge_limit = ((lvl + 2) * 2) + interior
            sub_edge_limit = (lvl * 2) + interior

            inner = bool(mb_has_coeffs[my, mx]) or \
                mb_ymode[my, mx] == B_PRED
            r = 1 + my * 16
            c = 1 + mx * 16
            rc = 1 + my * 8
            cc = 1 + mx * 8
            if filter_type == 1:  # simple: luma only
                if mx > 0:
                    _simple_edge(Y, r, c, 16, False, mb_edge_limit)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_edge(Y, r, c + dx, 16, False,
                                     sub_edge_limit)
                if my > 0:
                    _simple_edge(Y, r, c, 16, True, mb_edge_limit)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_edge(Y, r + dy, c, 16, True,
                                     sub_edge_limit)
                continue
            if mx > 0:
                _filter_edge(Y, r, c, 16, False, True, interior,
                             mb_edge_limit, hev_t)
                _filter_edge(U, rc, cc, 8, False, True, interior,
                             mb_edge_limit, hev_t)
                _filter_edge(V, rc, cc, 8, False, True, interior,
                             mb_edge_limit, hev_t)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, r, c + dx, 16, False, False,
                                 interior, sub_edge_limit, hev_t)
                _filter_edge(U, rc, cc + 4, 8, False, False, interior,
                             sub_edge_limit, hev_t)
                _filter_edge(V, rc, cc + 4, 8, False, False, interior,
                             sub_edge_limit, hev_t)
            if my > 0:
                _filter_edge(Y, r, c, 16, True, True, interior,
                             mb_edge_limit, hev_t)
                _filter_edge(U, rc, cc, 8, True, True, interior,
                             mb_edge_limit, hev_t)
                _filter_edge(V, rc, cc, 8, True, True, interior,
                             mb_edge_limit, hev_t)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, r + dy, c, 16, True, False,
                                 interior, sub_edge_limit, hev_t)
                _filter_edge(U, rc + 4, cc, 8, True, False, interior,
                             sub_edge_limit, hev_t)
                _filter_edge(V, rc + 4, cc, 8, True, False, interior,
                             sub_edge_limit, hev_t)


# --- YUV 4:2:0 → RGB (libwebp "fancy upsampler" geometry) ------------------


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    """BT.601 limited-range conversion with bilinear (4:2:0 "fancy")
    chroma upsampling at the half-pel positions libwebp uses."""
    h, w = y.shape

    def up(ch):
        # 2x upsample with the (9a+3b+3c+d+8)/16 kernel; edges clamp
        ph, pw = ch.shape
        e = np.pad(ch.astype(np.int32), 1, mode="edge")
        a = e[:-1, :-1]
        b = e[:-1, 1:]
        c = e[1:, :-1]
        d = e[1:, 1:]
        # each source cell (i,j) contributes to a 2x2 output block
        out = np.empty((2 * ph, 2 * pw), np.int32)
        tl = (9 * d[:-1, :-1] + 3 * (b[:-1, :-1] + c[:-1, :-1])
              + a[:-1, :-1] + 8) >> 4
        tr = (9 * c[:-1, 1:] + 3 * (a[:-1, 1:] + d[:-1, 1:])
              + b[:-1, 1:] + 8) >> 4
        bl = (9 * b[1:, :-1] + 3 * (d[1:, :-1] + a[1:, :-1])
              + c[1:, :-1] + 8) >> 4
        br = (9 * a[1:, 1:] + 3 * (c[1:, 1:] + b[1:, 1:])
              + d[1:, 1:] + 8) >> 4
        out[0::2, 0::2] = tl
        out[0::2, 1::2] = tr
        out[1::2, 0::2] = bl
        out[1::2, 1::2] = br
        return out[:h, :w]

    uu = up(u)
    vv = up(v)
    yy = y.astype(np.int32)
    # libwebp's 14-bit fixed-point BT.601 kernel (dsp/yuv.h):
    #   R = clip(((y·19077)>>8) + ((v·26149)>>8) − 14234) >> 6
    #   G = clip(((y·19077)>>8) − ((u·6419)>>8) − ((v·13320)>>8) + 8708) >> 6
    #   B = clip(((y·19077)>>8) + ((u·33050)>>8) − 17685) >> 6
    ys = (yy * 19077) >> 8
    r = ys + ((vv * 26149) >> 8) - 14234
    g = ys - ((uu * 6419) >> 8) - ((vv * 13320) >> 8) + 8708
    b = ys + ((uu * 33050) >> 8) - 17685
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb >> 6, 0, 255).astype(np.uint8)
