"""CCITT Group 3 / Group 4 bilevel fax codecs (ITU-T T.4 / T.6).

Reference role: frmts/gtiff (libtiff tif_fax3.c consumption of
COMPRESSION_CCITTRLE/CCITTFAX3/CCITTFAX4) and the NITF IC=C1 role.
Implemented from the published recommendations: the T.4 modified
Huffman white/black run-length code tables (terminating + makeup +
shared extended makeup — normative spec constants), 1-D MH decoding
(TIFF compression 2, rows byte-aligned), G3 (compression 3) with
EOL synchronisation and optional 2-D lines, and T.6 G4 (compression
4) two-dimensional coding with pass / horizontal / vertical modes.

Output is an (h, w) uint8 array of 0/1 pixel INDICES in coding order
(0 = white run colour); the TIFF layer maps them through photometric
interpretation / colour maps.  Correctness is pinned against the
reference's own slim_g4.tif at its autotest checksum (tiff_read.py
test_tiff_g4_split → 3322) and against libtiff (system library,
ctypes) on synthetic roundtrips.
"""

from __future__ import annotations

import numpy as np

# (run, nbits, code) — T.4 Table 2 (white) terminating codes
_WHITE_TERM = (
    (0, 8, 0x35), (1, 6, 0x07), (2, 4, 0x07), (3, 4, 0x08),
    (4, 4, 0x0B), (5, 4, 0x0C), (6, 4, 0x0E), (7, 4, 0x0F),
    (8, 5, 0x13), (9, 5, 0x14), (10, 5, 0x07), (11, 5, 0x08),
    (12, 6, 0x08), (13, 6, 0x03), (14, 6, 0x34), (15, 6, 0x35),
    (16, 6, 0x2A), (17, 6, 0x2B), (18, 7, 0x27), (19, 7, 0x0C),
    (20, 7, 0x08), (21, 7, 0x17), (22, 7, 0x03), (23, 7, 0x04),
    (24, 7, 0x28), (25, 7, 0x2B), (26, 7, 0x13), (27, 7, 0x24),
    (28, 7, 0x18), (29, 8, 0x02), (30, 8, 0x03), (31, 8, 0x1A),
    (32, 8, 0x1B), (33, 8, 0x12), (34, 8, 0x13), (35, 8, 0x14),
    (36, 8, 0x15), (37, 8, 0x16), (38, 8, 0x17), (39, 8, 0x28),
    (40, 8, 0x29), (41, 8, 0x2A), (42, 8, 0x2B), (43, 8, 0x2C),
    (44, 8, 0x2D), (45, 8, 0x04), (46, 8, 0x05), (47, 8, 0x0A),
    (48, 8, 0x0B), (49, 8, 0x52), (50, 8, 0x53), (51, 8, 0x54),
    (52, 8, 0x55), (53, 8, 0x24), (54, 8, 0x25), (55, 8, 0x58),
    (56, 8, 0x59), (57, 8, 0x5A), (58, 8, 0x5B), (59, 8, 0x4A),
    (60, 8, 0x4B), (61, 8, 0x32), (62, 8, 0x33), (63, 8, 0x34),
)
# T.4 Table 3 (white makeup)
_WHITE_MAKEUP = (
    (64, 5, 0x1B), (128, 5, 0x12), (192, 6, 0x17), (256, 7, 0x37),
    (320, 8, 0x36), (384, 8, 0x37), (448, 8, 0x64), (512, 8, 0x65),
    (576, 8, 0x68), (640, 8, 0x67), (704, 9, 0xCC), (768, 9, 0xCD),
    (832, 9, 0xD2), (896, 9, 0xD3), (960, 9, 0xD4), (1024, 9, 0xD5),
    (1088, 9, 0xD6), (1152, 9, 0xD7), (1216, 9, 0xD8),
    (1280, 9, 0xD9), (1344, 9, 0xDA), (1408, 9, 0xDB),
    (1472, 9, 0x98), (1536, 9, 0x99), (1600, 9, 0x9A),
    (1664, 6, 0x18), (1728, 9, 0x9B),
)
_BLACK_TERM = (
    (0, 10, 0x37), (1, 3, 0x02), (2, 2, 0x03), (3, 2, 0x02),
    (4, 3, 0x03), (5, 4, 0x03), (6, 4, 0x02), (7, 5, 0x03),
    (8, 6, 0x05), (9, 6, 0x04), (10, 7, 0x04), (11, 7, 0x05),
    (12, 7, 0x07), (13, 8, 0x04), (14, 8, 0x07), (15, 9, 0x18),
    (16, 10, 0x17), (17, 10, 0x18), (18, 10, 0x08), (19, 11, 0x67),
    (20, 11, 0x68), (21, 11, 0x6C), (22, 11, 0x37), (23, 11, 0x28),
    (24, 11, 0x17), (25, 11, 0x18), (26, 12, 0xCA), (27, 12, 0xCB),
    (28, 12, 0xCC), (29, 12, 0xCD), (30, 12, 0x68), (31, 12, 0x69),
    (32, 12, 0x6A), (33, 12, 0x6B), (34, 12, 0xD2), (35, 12, 0xD3),
    (36, 12, 0xD4), (37, 12, 0xD5), (38, 12, 0xD6), (39, 12, 0xD7),
    (40, 12, 0x6C), (41, 12, 0x6D), (42, 12, 0xDA), (43, 12, 0xDB),
    (44, 12, 0x54), (45, 12, 0x55), (46, 12, 0x56), (47, 12, 0x57),
    (48, 12, 0x64), (49, 12, 0x65), (50, 12, 0x52), (51, 12, 0x53),
    (52, 12, 0x24), (53, 12, 0x37), (54, 12, 0x38), (55, 12, 0x27),
    (56, 12, 0x28), (57, 12, 0x58), (58, 12, 0x59), (59, 12, 0x2B),
    (60, 12, 0x2C), (61, 12, 0x5A), (62, 12, 0x66), (63, 12, 0x67),
)
_BLACK_MAKEUP = (
    (64, 10, 0x0F), (128, 12, 0xC8), (192, 12, 0xC9), (256, 12, 0x5B),
    (320, 12, 0x33), (384, 12, 0x34), (448, 12, 0x35), (512, 13, 0x6C),
    (576, 13, 0x6D), (640, 13, 0x4A), (704, 13, 0x4B), (768, 13, 0x4C),
    (832, 13, 0x4D), (896, 13, 0x72), (960, 13, 0x73), (1024, 13, 0x74),
    (1088, 13, 0x75), (1152, 13, 0x76), (1216, 13, 0x77),
    (1280, 13, 0x52), (1344, 13, 0x53), (1408, 13, 0x54),
    (1472, 13, 0x55), (1536, 13, 0x5A), (1600, 13, 0x5B),
    (1664, 13, 0x64), (1728, 13, 0x65),
)
# shared extended makeup codes (T.4 Table 4)
_EXT_MAKEUP = (
    (1792, 11, 0x08), (1856, 11, 0x0C), (1920, 11, 0x0D),
    (1984, 12, 0x12), (2048, 12, 0x13), (2112, 12, 0x14),
    (2176, 12, 0x15), (2240, 12, 0x16), (2304, 12, 0x17),
    (2368, 12, 0x1C), (2432, 12, 0x1D), (2496, 12, 0x1E),
    (2560, 12, 0x1F),
)


def _build(entries):
    t = {}
    for run, n, code in entries:
        t[(n, code)] = run
    return t


_WHITE = _build(_WHITE_TERM + _WHITE_MAKEUP + _EXT_MAKEUP)
_BLACK = _build(_BLACK_TERM + _BLACK_MAKEUP + _EXT_MAKEUP)


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.data):
            raise EOFError("CCITT: out of data")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def eod(self) -> bool:
        return self.pos >> 3 >= len(self.data)


def _read_run(br: _Bits, white: bool) -> int:
    """One complete run length (makeup* + terminating) for one colour."""
    table = _WHITE if white else _BLACK
    total = 0
    while True:
        code = 0
        n = 0
        run = None
        while n < 14:
            code = (code << 1) | br.bit()
            n += 1
            run = table.get((n, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("CCITT: bad run code")
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _row_from_transitions(cur, w):
    row = np.zeros(w, np.uint8)
    # transitions alternate starting white→black
    for i in range(0, len(cur) - 1, 2):
        row[cur[i]:cur[i + 1]] = 1
    if len(cur) % 2 == 1:
        row[cur[-1]:] = 1
    return row


def _decode_2d_row(br: _Bits, ref, w):
    """One T.6-coded row given the reference line's transition list."""
    cur = []
    a0 = -1
    color = 0  # 0 white

    def b1b2():
        # first transition in ref strictly right of a0 with correct
        # parity (even index = white→black) and the one after it
        i = 0
        n = len(ref)
        while i < n and (ref[i] <= a0 if a0 >= 0 else False):
            i += 1
        # parity fix: transition to !color has index parity == color
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < n else w
        b2 = ref[i + 1] if i + 1 < n else w
        return b1, b2

    while a0 < w:
        b1, b2 = b1b2()
        # mode code
        if br.bit():
            mode = "V0"
            d = 0
        else:
            if br.bit():
                d = 1 if br.bit() else -1
                mode = "V"
            elif br.bit():
                mode = "H"
            else:
                if br.bit():
                    mode = "P"
                else:
                    if br.bit():
                        d = 2 if br.bit() else -2
                        mode = "V"
                    elif br.bit():
                        d = 3 if br.bit() else -3
                        mode = "V"
                    else:
                        # 0000000…: EOL / EOFB territory — end of data
                        raise EOFError("CCITT: EOL in 2-D data")
        if mode == "P":
            a0 = b2
            continue
        if mode == "H":
            s = a0 if a0 > 0 else 0
            r1 = _read_run(br, color == 0)
            r2 = _read_run(br, color != 0)
            a1 = s + r1
            a2 = a1 + r2
            cur.append(min(a1, w))
            cur.append(min(a2, w))
            a0 = a2
            continue
        a1 = b1 + (0 if mode == "V0" else d)
        cur.append(min(max(a1, 0), w))
        a0 = a1
        color ^= 1
    return cur


def decode_g4(data: bytes, w: int, h: int) -> np.ndarray:
    """T.6 (TIFF compression 4) → (h, w) uint8 of 0/1."""
    br = _Bits(data)
    out = np.zeros((h, w), np.uint8)
    ref = [w, w]
    for y in range(h):
        try:
            cur = _decode_2d_row(br, ref, w)
        except EOFError:
            break
        out[y] = _row_from_transitions(cur, w)
        ref = [t for t in cur if t < w] + [w, w]
    return out


def _decode_1d_row(br: _Bits, w: int):
    cur = []
    pos = 0
    color = 0
    while pos < w:
        run = _read_run(br, color == 0)
        pos += run
        cur.append(min(pos, w))
        color ^= 1
    return cur


def decode_mh(data: bytes, w: int, h: int) -> np.ndarray:
    """TIFF compression 2 ("CCITT RLE"): pure 1-D modified Huffman,
    each row starting on a byte boundary, no EOLs."""
    br = _Bits(data)
    out = np.zeros((h, w), np.uint8)
    for y in range(h):
        if br.eod():
            break
        cur = _decode_1d_row(br, w)
        out[y] = _row_from_transitions(cur, w)
        br.align()
    return out


def _sync_eol(br: _Bits) -> int:
    """Consume fill bits + one EOL (000000000001); returns the tag bit
    for 2-D G3 (1 = next row 1-D) or -1 at end of data."""
    zeros = 0
    while True:
        if br.eod():
            return -1
        b = br.bit()
        if b:
            if zeros >= 11:
                return 1
            zeros = 0
        else:
            zeros += 1


def decode_g3(data: bytes, w: int, h: int, two_d: bool = False) -> np.ndarray:
    """TIFF compression 3 (T.4): EOL-synchronised rows; with
    ``two_d`` (T4Options bit 0) each EOL carries a 1-D/2-D tag bit."""
    br = _Bits(data)
    out = np.zeros((h, w), np.uint8)
    ref = [w, w]
    y = 0
    # leading EOL is customary
    while y < h:
        try:
            if _sync_eol(br) < 0:
                break
            one_d = True
            if two_d:
                one_d = bool(br.bit())
            if one_d:
                cur = _decode_1d_row(br, w)
            else:
                cur = _decode_2d_row(br, ref, w)
        except (EOFError, ValueError):
            break
        out[y] = _row_from_transitions(cur, w)
        ref = [t for t in cur if t < w] + [w, w]
        y += 1
    return out


# ---------------------------------------------------------------------------
# G4 ENCODER (T.6 coder, the libtiff Fax3Encode2DRow role) — used by the
# CALS writer and CCITT-compressed TIFF output.  Input is an (h, w) uint8
# 0/1 index array (0 = white), output a byte-aligned T.6 stream closed by
# EOFB (two EOLs).

_ENC_WHITE = {run: (n, code) for run, n, code in
              _WHITE_TERM + _WHITE_MAKEUP + _EXT_MAKEUP}
_ENC_BLACK = {run: (n, code) for run, n, code in
              _BLACK_TERM + _BLACK_MAKEUP + _EXT_MAKEUP}


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _put_run(bw: _BitWriter, run: int, white: bool):
    table = _ENC_WHITE if white else _ENC_BLACK
    while run >= 64:
        if run >= 2624:
            makeup = 2560
        else:
            makeup = (run // 64) * 64
        n, code = table[makeup]
        bw.put(code, n)
        run -= makeup
    n, code = table[run]
    bw.put(code, n)


def _transitions(row: np.ndarray, w: int) -> list:
    """Changing-element positions (colour differs from pixel to the
    left; position 0 counts if the row starts black)."""
    d = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    if row[0]:
        return [0] + d.tolist()
    return d.tolist()


def encode_g4(arr: np.ndarray) -> bytes:
    """T.6 two-dimensional coding of an (h, w) 0/1 uint8 array
    (0 = white).  Emits vertical / horizontal / pass modes against the
    previous row (imaginary all-white row above row 0) and closes with
    EOFB, byte-aligned."""
    a = np.ascontiguousarray(arr, np.uint8)
    h, w = a.shape
    bw = _BitWriter()
    ref = [w, w]  # imaginary all-white reference row
    for y in range(h):
        cur = _transitions(a[y], w) + [w, w]
        a0 = -1
        color = 0
        ci = 0  # index of a1 in cur
        while a0 < w:
            # b1: first ref transition > a0 with same parity as ci
            bi = 0
            n = len(ref)
            while bi < n and (ref[bi] <= a0 or ((bi ^ ci) & 1)):
                bi += 1
            b1 = ref[bi] if bi < n else w
            b2 = ref[bi + 1] if bi + 1 < n else w
            a1 = cur[ci] if ci < len(cur) else w
            if b2 < a1:
                bw.put(0x1, 4)  # pass: 0001
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                # vertical codes V0/VR/VL
                bw.put((0x1, 0x3, 0x03, 0x03)[abs(d)] if d >= 0
                       else (0, 0x2, 0x02, 0x02)[-d],
                       (1, 3, 6, 7)[abs(d)])
                a0 = a1
                ci += 1
                color ^= 1
                continue
            # horizontal: 001 + run(a0a1) + run(a1a2)
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            bw.put(0x1, 3)
            s = a0 if a0 > 0 else 0
            _put_run(bw, a1 - s, color == 0)
            _put_run(bw, a2 - a1, color != 0)
            a0 = a2
            ci += 2
        ref = [t for t in cur if t < w] + [w, w]
    bw.put(0x001, 12)  # EOFB
    bw.put(0x001, 12)
    return bw.flush()
