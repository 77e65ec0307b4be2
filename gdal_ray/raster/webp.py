"""WebP lossless (VP8L) decoder + minimal encoder, pure Python/numpy —
from the PUBLIC "WebP Lossless Bitstream Specification" (the reference
delegates to libwebp in frmts/webp/; no line correspondence here).

Scope: full VP8L decode — all four transforms (predictor, color,
subtract-green, color-indexing incl. pixel bundling), color cache,
meta prefix codes, LZ77 with the 2-D distance map, simple and
code-length-coded prefix codes.  Lossy "VP8 " chunks decode through
the from-scratch RFC 6386 keyframe decoder (raster/vp8.py) — the
round-4 boundary is closed — with ALPH-chunk alpha planes (raw and
headerless-VP8L compression, all four prediction filters).

VP8L correctness is pinned the way the MVT codec was: hand-assembled
bitstreams from the spec with known pixel output (tests/test_webp.py)
+ encoder↔decoder roundtrips on random images through the
normal-prefix-code path.  Lossy VP8 correctness is pinned per-pixel
against libwebp itself (present as a system library, driven via
ctypes in tests/test_webp_vp8.py) on the reference's own rgbsmall
fixture and on freshly encoded streams.

Distance map: the spec's 120-entry 2-D neighborhood. It is exactly
the (dx, dy) pairs with dy∈[0,7], dx∈[-8,8] (dx≥1 when dy=0) sorted
by (dx²+dy², |dx|, dx<0), truncated to 120 — verified term-for-term
against the table's published first 54 entries; the constructive rule
is used instead of retyping 120 literals.
"""

from __future__ import annotations

import struct

import numpy as np

ARGB_BLACK = 0xFF000000


def _distance_map() -> list[tuple[int, int]]:
    cand = []
    for dy in range(0, 8):
        for dx in range(-8, 9):
            if dy == 0 and dx < 1:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]),
                             p[0] < 0))
    return cand[:120]


_DIST_MAP = _distance_map()

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


class BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            b = (self.data[self.byte] >> self.bit) & 1
            v |= b << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class PrefixCode:
    """Canonical prefix code (deflate-style assignment; the first bit
    read from the stream is the MSB of the canonical code)."""

    def __init__(self, lengths):
        self.max_len = 0
        self.table: dict[tuple[int, int], int] = {}
        self.codes: dict[int, tuple[int, int]] = {}
        counts: dict[int, int] = {}
        for ln in lengths:
            if ln:
                counts[ln] = counts.get(ln, 0) + 1
        if not counts:
            raise ValueError("VP8L: empty prefix code")
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if len(nz) == 1:
            # degenerate single-symbol code: zero bits per use
            self.single = nz[0][0]
            return
        self.single = None
        code = 0
        next_code = {}
        for ln in range(1, max(counts) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            next_code[ln] = code
        kraft = sum(counts.get(ln, 0) * 2 ** (max(counts) - ln)
                    for ln in counts)
        if kraft != 1 << max(counts):
            raise ValueError("VP8L: incomplete/over-subscribed code")
        for sym, ln in sorted(nz, key=lambda t: (t[1], t[0])):
            c = next_code[ln]
            next_code[ln] += 1
            self.table[(ln, c)] = sym
            self.codes[sym] = (c, ln)
            self.max_len = max(self.max_len, ln)

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code word")

    def write(self, bw: BitWriter, sym: int) -> None:
        if self.single is not None:
            return
        c, ln = self.codes[sym]
        for i in range(ln - 1, -1, -1):
            bw.bits((c >> i) & 1, 1)


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.bits(1):  # simple code
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            pc = PrefixCode.__new__(PrefixCode)
            pc.single = sym0
            pc.table = {}
            pc.codes = {sym0: (0, 0)}
            pc.max_len = 0
            return pc
        sym1 = br.bits(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return PrefixCode(lengths)
    # normal: code-length code first
    num_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = PrefixCode(clc_lengths)
    if br.bits(1):  # limited symbol count
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return PrefixCode(lengths)


def _lz77_value(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(br: BitReader, w: int, h: int,
                          is_level0: bool):
    """→ (argb uint32 array (h, w), transforms list) — transforms only
    collected at level 0."""
    transforms = []
    xsize = w
    if is_level0:
        seen = set()
        while br.bits(1):
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / color
                size_bits = br.bits(3) + 2
                tw = _subsample_size(xsize, size_bits)
                th = _subsample_size(h, size_bits)
                timg, _ = _decode_entropy_image(br, tw, th, False)
                transforms.append((ttype, size_bits, timg))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.bits(8) + 1
                pal, _ = _decode_entropy_image(br, pal_size, 1, False)
                pal = pal.reshape(-1)
                # palette entries are delta-coded per channel
                acc = pal.astype(np.uint32)
                for i in range(1, len(acc)):
                    a0 = (acc[i - 1] >> 24) & 0xFF
                    r0 = (acc[i - 1] >> 16) & 0xFF
                    g0 = (acc[i - 1] >> 8) & 0xFF
                    b0 = acc[i - 1] & 0xFF
                    a1 = (int(acc[i]) >> 24) & 0xFF
                    r1 = (int(acc[i]) >> 16) & 0xFF
                    g1 = (int(acc[i]) >> 8) & 0xFF
                    b1 = int(acc[i]) & 0xFF
                    acc[i] = (
                        (((a0 + a1) & 0xFF) << 24)
                        | (((r0 + r1) & 0xFF) << 16)
                        | (((g0 + g1) & 0xFF) << 8)
                        | ((b0 + b1) & 0xFF)
                    )
                if pal_size <= 2:
                    wbits = 3
                elif pal_size <= 4:
                    wbits = 2
                elif pal_size <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, wbits, acc))
                xsize = _subsample_size(xsize, wbits)

    # color cache
    cache_bits = br.bits(4) if br.bits(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("VP8L: bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix codes
    meta_img = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.bits(1):
        meta_bits = br.bits(3) + 2
        mw = _subsample_size(xsize, meta_bits)
        mh = _subsample_size(h, meta_bits)
        meta_img, _ = _decode_entropy_image(br, mw, mh, False)
        num_groups = int(((meta_img >> 8) & 0xFFFF).max()) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))

    n = xsize * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta_img is not None:
            x = pos % xsize
            y = pos // xsize
            gi = int(
                (meta_img[y >> meta_bits, x >> meta_bits] >> 8) & 0xFFFF
            )
        else:
            gi = 0
        g_code, r_code, b_code, a_code, d_code = groups[gi]
        s = g_code.read(br)
        if s < 256:  # literal
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(d_code.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: invalid backward reference")
            for i in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                pos += 1
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(h, xsize), transforms


# ------------------------------------------------------ transforms


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(img: np.ndarray, wbits: int, palette: np.ndarray,
                        xsize: int) -> np.ndarray:
    h = img.shape[0]
    if wbits == 0:
        idx = (img >> 8) & 0xFF
        safe = np.minimum(idx, len(palette) - 1)
        out = palette[safe]
        out[idx >= len(palette)] = 0
        return out
    px_per = 1 << wbits
    bits = 8 >> wbits
    green = ((img >> 8) & 0xFF).astype(np.uint32)
    out = np.zeros((h, xsize), dtype=np.uint32)
    for k in range(px_per):
        xs = np.arange(img.shape[1]) * px_per + k
        vals = (green >> (k * bits)) & ((1 << bits) - 1)
        keep = xs < xsize
        safe = np.minimum(vals[:, keep], len(palette) - 1)
        col = palette[safe]
        col[vals[:, keep] >= len(palette)] = 0
        out[:, xs[keep]] = col
    return out


def _avg2(a, b):
    return ((a & 0xFEFEFEFE) >> 1) + (a & b & 0x01010101)


def _channels(v):
    return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)


def _clamp_add_subtract_full(a, b, c):
    out = 0
    for sh in (24, 16, 8, 0):
        va = (a >> sh) & 0xFF
        vb = (b >> sh) & 0xFF
        vc = (c >> sh) & 0xFF
        v = min(255, max(0, va + vb - vc))
        out |= v << sh
    return out


def _clamp_add_subtract_half(ave, tl):
    """Mode 13 per channel: clip255(a + trunc((a − b) / 2)) with C
    truncation toward zero."""
    out = 0
    for sh in (24, 16, 8, 0):
        va = (ave >> sh) & 0xFF
        vb = (tl >> sh) & 0xFF
        d = va - vb
        half = d // 2 if d >= 0 else -((-d) // 2)
        v = min(255, max(0, va + half))
        out |= v << sh
    return out


def _inv_predictor(img: np.ndarray, size_bits: int,
                   pred_img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.astype(np.uint32).copy()

    def add(px, pred):
        s = 0
        for sh in (24, 16, 8, 0):
            s |= (((px >> sh) + (pred >> sh)) & 0xFF) << sh
        return s

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = ARGB_BLACK
            elif y == 0:
                pred = int(out[y, x - 1])           # L
            elif x == 0:
                pred = int(out[y - 1, x])           # T
            else:
                mode = int(
                    (pred_img[y >> size_bits, x >> size_bits] >> 8) & 0xFF
                )
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # flat-buffer TR: for the last column this wraps to the
                # first (already reconstructed) pixel of the current row
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                if mode == 0:
                    pred = ARGB_BLACK
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    pl = sum(abs(a - b) for a, b in zip(
                        _channels(T), _channels(TL)))
                    pt = sum(abs(a - b) for a, b in zip(
                        _channels(L), _channels(TL)))
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = _clamp_add_subtract_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_subtract_half(_avg2(L, T), TL)
                else:
                    raise ValueError(f"VP8L: bad predictor mode {mode}")
            out[y, x] = add(int(out[y, x]), int(pred))
    return out


def _inv_color_transform(img: np.ndarray, size_bits: int,
                         timg: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    cte = timg[np.ix_(ys, xs)]
    g2r = ((cte >> 16) & 0xFF).astype(np.int8).astype(np.int32)
    g2b = ((cte >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    r2b = (cte & 0xFF).astype(np.int8).astype(np.int32)
    g = ((out >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    r = (((out >> 16) & 0xFF).astype(np.int32)
         + ((g2r * g) >> 5)) & 0xFF
    rs = r.astype(np.int8).astype(np.int32)
    b = ((out & 0xFF).astype(np.int32)
         + ((g2b * g) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((out & 0xFF00FF00)
            | (r.astype(np.uint32) << 16) | b.astype(np.uint32))


# ------------------------------------------------------------- decode


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L payload (after the chunk header) → (h, w, 4) RGBA uint8."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(data, 1)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)   # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unknown version")
    img, transforms = _decode_entropy_image(br, w, h, True)
    for ttype, arg, timg in reversed(transforms):
        if ttype == 3:
            img = _inv_color_indexing(img, arg, timg, w)
        elif ttype == 2:
            img = _inv_subtract_green(img)
        elif ttype == 1:
            img = _inv_color_transform(img, arg, timg)
        else:
            img = _inv_predictor(img, arg, timg)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (img >> 16) & 0xFF
    out[..., 1] = (img >> 8) & 0xFF
    out[..., 2] = img & 0xFF
    out[..., 3] = (img >> 24) & 0xFF
    return out


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk → (h, w) alpha plane.  Container-spec layout: one
    header byte (compression bits 0-1, filter 2-3, preprocessing 4-5),
    then either raw bytes or a headerless VP8L stream whose GREEN
    channel carries the alpha values."""
    comp = body[0] & 0x03
    filt = (body[0] >> 2) & 0x03
    if comp == 0:
        a = np.frombuffer(body[1:1 + w * h], np.uint8).reshape(h, w).copy()
    elif comp == 1:
        br = BitReader(body, 1)
        img, transforms = _decode_entropy_image(br, w, h, True)
        for ttype, arg, timg in reversed(transforms):
            if ttype == 3:
                img = _inv_color_indexing(img, arg, timg, w)
            elif ttype == 2:
                img = _inv_subtract_green(img)
            elif ttype == 1:
                img = _inv_color_transform(img, arg, timg)
            else:
                img = _inv_predictor(img, arg, timg)
        a = ((img >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"WebP ALPH: unknown compression {comp}")
    if filt:
        a = a.astype(np.int32)
        for y in range(h):
            for x in range(w):
                left = a[y, x - 1] if x > 0 else (a[y - 1, 0] if y else 0)
                top = a[y - 1, x] if y > 0 else (a[0, x - 1] if x else 0)
                if filt == 1:
                    p = left
                elif filt == 2:
                    p = top
                else:
                    tl = a[y - 1, x - 1] if (x > 0 and y > 0) else \
                        (a[0, 0] if (x or y) else 0)
                    p = min(255, max(0, int(left) + int(top) - int(tl)))
                a[y, x] = (a[y, x] + p) & 0xFF
        a = a.astype(np.uint8)
    return a


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF container → RGBA array.  VP8L lossless and lossy VP8
    keyframes (raster/vp8.py, RFC 6386) both decode; an ALPH chunk
    supplies the alpha plane of a lossy image."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    alph = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"ALPH":
            alph = body
        elif tag == b"VP8L":
            return decode_vp8l(body)
        elif tag == b"VP8 ":
            from gdal_ray.raster.vp8 import decode_vp8, yuv420_to_rgb

            y, u, v = decode_vp8(body)
            rgb = yuv420_to_rgb(y, u, v)
            h, w = y.shape
            out = np.empty((h, w, 4), np.uint8)
            out[..., :3] = rgb
            out[..., 3] = _decode_alpha(alph, w, h) if alph is not None \
                else 255
            return out
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no image chunk found")


# ------------------------------------------------------------- encode


def _write_code_lengths(bw: BitWriter, lengths: list[int]) -> None:
    """Emit a normal (non-simple) prefix-code header for ``lengths``
    using a tiny fixed code-length code over the distinct values
    (zeros included when present — sparse alphabets supported)."""
    distinct = sorted(set(lengths))
    if len(distinct) == 1:
        clc_lens = {distinct[0]: 1}
    elif len(distinct) == 2:
        clc_lens = {distinct[0]: 1, distinct[1]: 1}
    else:
        raise ValueError("encoder supports <=2 distinct code lengths")
    # num_code_lengths must cover every used symbol's position in the
    # spec order
    used = set(clc_lens)
    need = max(i for i, s in enumerate(_CLC_ORDER) if s in used) + 1
    need = max(need, 4)
    bw.bits(0, 1)              # not simple
    bw.bits(need - 4, 4)
    for i in range(need):
        bw.bits(clc_lens.get(_CLC_ORDER[i], 0), 3)
    full = [0] * 19
    for s, ln in clc_lens.items():
        full[s] = ln
    if len(distinct) == 1:
        clc = None             # single-symbol code: zero bits each
    else:
        clc = PrefixCode(full)
    bw.bits(0, 1)              # no max_symbol shortcut
    for ln in lengths:
        if clc is None:
            continue           # every length is the same symbol
        clc.write(bw, ln)


def _fixed_lengths(alphabet: int) -> list[int]:
    """Complete canonical code lengths for a full alphabet: the
    largest power of two ≤ alphabet gets the base length, the
    remainder is split one level deeper (Kraft-exact)."""
    base = 1
    while (1 << (base + 1)) <= alphabet:   # floor(log2(alphabet))
        base += 1
    if (1 << base) == alphabet:
        return [base] * alphabet
    # Kraft-exact split over lengths {base, base+1}: in units of
    # 2^-(base+1), a short symbol costs 2 and a long one 1:
    #   2a + b = 2^(base+1),  a + b = alphabet  →  a = 2^(base+1) − n
    a = (1 << (base + 1)) - alphabet
    b = alphabet - a
    return [base] * a + [base + 1] * b


def encode_vp8l(rgba: np.ndarray) -> bytes:
    """(h, w, 4) uint8 RGBA → VP8L payload: no transforms, no cache,
    one prefix-code group, literals only, fixed-length complete codes
    (a valid if uncompressed-sized stream — the roundtrip test vector
    generator, exercising the decoder's normal-code path)."""
    h, w = rgba.shape[:2]
    bw = BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if (rgba.shape[2] > 3 and (rgba[..., 3] != 255).any())
            else 0, 1)
    bw.bits(0, 3)
    bw.bits(0, 1)   # no more transforms
    bw.bits(0, 1)   # no color cache
    bw.bits(0, 1)   # no meta prefix codes
    glens = _fixed_lengths(280)
    clens = _fixed_lengths(256)
    gcode = PrefixCode(glens)
    ccode = PrefixCode(clens)
    _write_code_lengths(bw, glens)
    for _ in range(3):
        _write_code_lengths(bw, clens)
    # distance: simple code, single symbol 0
    bw.bits(1, 1)   # simple
    bw.bits(0, 1)   # one symbol
    bw.bits(0, 1)   # 1-bit symbol
    bw.bits(0, 1)   # symbol 0
    a = rgba[..., 3] if rgba.shape[2] > 3 else np.full((h, w), 255,
                                                       np.uint8)
    for y in range(h):
        for x in range(w):
            gcode.write(bw, int(rgba[y, x, 1]))
            ccode.write(bw, int(rgba[y, x, 0]))
            ccode.write(bw, int(rgba[y, x, 2]))
            ccode.write(bw, int(a[y, x]))
    return bw.finish()


def encode_webp_lossless(rgba: np.ndarray) -> bytes:
    payload = encode_vp8l(rgba)
    if len(payload) & 1:
        chunk = payload + b"\0"
    else:
        chunk = payload
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
