"""WebP VP8L lossless codec (raster/webp.py) — hand-assembled
bitstreams from the public spec with known pixel output (no VP8L
fixture ships in the offline reference checkout; its .webp files are
lossy VP8), plus encoder↔decoder roundtrips through the
normal-prefix-code path."""

import numpy as np
import pytest

from gdal_ray.raster import webp as W


def _header(bw, w, h):
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)


def _simple1(bw, sym):
    """Simple prefix code with one symbol (0 bits per use)."""
    bw.bits(1, 1)
    bw.bits(0, 1)
    if sym < 2:
        bw.bits(0, 1)
        bw.bits(sym, 1)
    else:
        bw.bits(1, 1)
        bw.bits(sym, 8)


def _normal_sparse(bw, alphabet, ones):
    """Normal prefix code: listed symbols get length 1, rest 0."""
    lengths = [0] * alphabet
    for s in ones:
        lengths[s] = 1
    W._write_code_lengths(bw, lengths)
    return W.PrefixCode(lengths)


class TestRoundtrip:
    def test_random_images(self):
        rng = np.random.default_rng(1)
        for shape in [(1, 1), (2, 3), (16, 16), (9, 31)]:
            img = rng.integers(0, 256, shape + (4,), dtype=np.uint8)
            out = W.decode_webp(W.encode_webp_lossless(img))
            assert np.array_equal(out, img)

    def test_rgb_opaque(self):
        img = np.zeros((4, 4, 4), np.uint8)
        img[..., :3] = np.arange(48).reshape(4, 4, 3)
        img[..., 3] = 255
        out = W.decode_webp(W.encode_webp_lossless(img))
        assert np.array_equal(out, img)

    def test_container_roundtrip_magic(self):
        img = np.full((2, 2, 4), 7, np.uint8)
        data = W.encode_webp_lossless(img)
        assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"


class TestHandCraftedStreams:
    def test_literals_simple_codes(self):
        """2x1, each channel a 1-symbol simple code → constant pixel."""
        bw = W.BitWriter()
        _header(bw, 2, 1)
        bw.bits(0, 1)  # no transforms
        bw.bits(0, 1)  # no cache
        bw.bits(0, 1)  # no meta
        _simple1(bw, 10)    # green
        _simple1(bw, 20)    # red
        _simple1(bw, 30)    # blue
        _simple1(bw, 255)   # alpha
        _simple1(bw, 0)     # distance
        # two literal pixels: all codes are 0-bit
        out = W.decode_vp8l(bw.finish())
        assert out.shape == (1, 2, 4)
        assert (out == [20, 10, 30, 255]).all()

    def test_lz77_distance_map_row_copy(self):
        """4x2: 4 literals then one backward ref (length 4, distance
        map entry 1 = (0, 1) = the pixel straight above) — row 1 must
        equal row 0."""
        bw = W.BitWriter()
        _header(bw, 4, 2)
        bw.bits(0, 1)
        bw.bits(0, 1)
        bw.bits(0, 1)
        # green: symbols 10 (literal) and 259 (length code 3 -> 4)
        gcode = _normal_sparse(bw, 280, [10, 259])
        _simple1(bw, 20)
        _simple1(bw, 30)
        _simple1(bw, 255)
        _simple1(bw, 0)   # distance code 0 -> value 1 -> map (0,1)
        for _ in range(4):
            gcode.write(bw, 10)
        gcode.write(bw, 259)
        out = W.decode_vp8l(bw.finish())
        assert out.shape == (2, 4, 4)
        assert (out == [20, 10, 30, 255]).all()

    def test_color_cache(self):
        """2x1 with a 1-bit color cache: literal, then a cache hit."""
        px = (255 << 24) | (20 << 16) | (10 << 8) | 30
        idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> 31
        bw = W.BitWriter()
        _header(bw, 2, 1)
        bw.bits(0, 1)
        bw.bits(1, 1)   # cache present
        bw.bits(1, 4)   # 1 bit
        bw.bits(0, 1)   # no meta prefix codes
        gcode = _normal_sparse(bw, 256 + 24 + 2, [10, 280 + idx])
        _simple1(bw, 20)
        _simple1(bw, 30)
        _simple1(bw, 255)
        _simple1(bw, 0)
        gcode.write(bw, 10)            # literal
        gcode.write(bw, 280 + idx)     # cache hit
        out = W.decode_vp8l(bw.finish())
        assert (out == [20, 10, 30, 255]).all()

    def test_subtract_green_transform(self):
        """literal (a=255 r=5 g=10 b=250) + subtract-green inverse →
        r=15, b=(250+10)&255=4."""
        bw = W.BitWriter()
        _header(bw, 1, 1)
        bw.bits(1, 1)
        bw.bits(2, 2)   # subtract green
        bw.bits(0, 1)   # no more transforms
        bw.bits(0, 1)
        bw.bits(0, 1)
        _simple1(bw, 10)
        _simple1(bw, 5)
        _simple1(bw, 250)
        _simple1(bw, 255)
        _simple1(bw, 0)
        out = W.decode_vp8l(bw.finish())
        assert (out[0, 0] == [15, 10, 4, 255]).all()

    def test_predictor_transform_mode_T(self):
        """2x2 with one predictor block, mode 2 (T). Residuals chosen
        so: (0,0)=black+delta, row0 uses L, col0 uses T, (1,1) uses
        mode T."""
        bw = W.BitWriter()
        _header(bw, 2, 2)
        bw.bits(1, 1)
        bw.bits(0, 2)    # predictor transform
        bw.bits(2, 3)    # size_bits = 4 -> one block
        # sub-image 1x1: green holds the mode (2)
        bw.bits(0, 1)    # its cache bit
        _simple1(bw, 2)  # green = mode 2
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 0)
        bw.bits(0, 1)    # no more transforms
        bw.bits(0, 1)    # no cache
        bw.bits(0, 1)    # no meta
        # main image: residual literals, green from {1,2}, others const
        gcode = _normal_sparse(bw, 280, [1, 2])
        _simple1(bw, 3)   # red residual
        _simple1(bw, 4)   # blue residual
        _simple1(bw, 0)   # alpha residual
        _simple1(bw, 0)
        for g in (1, 2, 1, 2):
            gcode.write(bw, g)
        out = W.decode_vp8l(bw.finish())
        # (0,0): pred black (a=255) + (3,1,4,0) = r3 g1 b4 a255
        assert (out[0, 0] == [3, 1, 4, 255]).all()
        # (0,1): pred = L -> + (3,2,4,0)
        assert (out[0, 1] == [6, 3, 8, 255]).all()
        # (1,0): pred = T = out[0,0], residual green 1
        assert (out[1, 0] == [6, 2, 8, 255]).all()
        # (1,1): mode T -> pred = out[0,1]
        assert (out[1, 1] == [9, 5, 12, 255]).all()

    def test_color_indexing_bundled(self):
        """8x1 image, 2-color palette → 8 pixels bundled into one
        green byte (1 bit each)."""
        bw = W.BitWriter()
        _header(bw, 8, 1)
        bw.bits(1, 1)
        bw.bits(3, 2)     # color indexing
        bw.bits(1, 8)     # palette size - 1 = 1 -> 2 colors
        # palette image 2x1 (delta-coded): first literal = color0,
        # second = color1 - color0 (per channel mod 256)
        bw.bits(0, 1)     # palette stream: no cache
        g0, g1 = 10, 200
        r0, r1 = 20, 100
        b0, b1 = 30, 50
        gpal = _normal_sparse(bw, 280, [g0, (g1 - g0) % 256])
        rpal = _normal_sparse(bw, 256, [r0, (r1 - r0) % 256])
        bpal = _normal_sparse(bw, 256, [b0, (b1 - b0) % 256])
        apal = _normal_sparse(bw, 256, [255, 0])
        _simple1(bw, 0)
        gpal.write(bw, g0)
        rpal.write(bw, r0)
        bpal.write(bw, b0)
        apal.write(bw, 255)
        gpal.write(bw, (g1 - g0) % 256)
        rpal.write(bw, (r1 - r0) % 256)
        bpal.write(bw, (b1 - b0) % 256)
        apal.write(bw, 0)
        bw.bits(0, 1)     # no more transforms
        bw.bits(0, 1)     # no cache
        bw.bits(0, 1)     # no meta
        # bundled main image: 1 green byte = bits 0b10110010 ->
        # pixel k takes bit k
        pattern = 0b10110010
        _simple1(bw, pattern)   # green (the bundled byte)
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 0)
        out = W.decode_vp8l(bw.finish())
        assert out.shape == (1, 8, 4)
        for k in range(8):
            want = ([r1, g1, b1, 255] if (pattern >> k) & 1
                    else [r0, g0, b0, 255])
            assert (out[0, k] == want).all(), k

    def test_lossy_vp8_decodes(self):
        # round-5: the lossy boundary is closed (raster/vp8.py);
        # per-pixel oracle parity lives in test_webp_vp8.py
        data = open(
            "/root/reference/autotest/gdrivers/data/webp/rgbsmall.webp",
            "rb",
        ).read()
        out = W.decode_webp(data)
        assert out.shape == (50, 50, 4)
        assert (out[..., 3] == 255).all()


class TestDistanceMap:
    def test_published_prefix(self):
        """First entries of the spec's 120-entry table."""
        m = W._DIST_MAP
        assert m[:12] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
            (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        ]
        assert m[12:22] == [
            (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
            (2, 3), (-2, 3), (3, 2), (-3, 2),
        ]
        # the d²=25 tie: (0,5), (3,4), (-3,4), (4,3), (-4,3), (5,0)
        i = m.index((0, 5))
        assert m[i : i + 6] == [
            (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)
        ]
        assert len(m) == 120 and len(set(m)) == 120

    def test_prefix_code_completeness_guard(self):
        with pytest.raises(ValueError):
            W.PrefixCode([1, 2, 2, 2])   # over-subscribed
        with pytest.raises(ValueError):
            W.PrefixCode([2, 2, 2])      # incomplete
