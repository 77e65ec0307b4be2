"""Baseline JPEG codec tests (gdal_ray/raster/jpeg.py) — mirrors the
PNG codec's golden-byte discipline: a hand-crafted spec-table JPEG
(built in this file directly from ITU-T T.81 Annex K constants,
independent of encode_jpeg), component-level IDCT/zigzag pins, and
encode→decode round-trip error bounds."""

import struct

import numpy as np
import pytest

from gdal_ray.raster import jpeg as J


class TestComponents:
    def test_idct_matches_direct_formula(self):
        """IDCT vs the literal T.81 A.3.3 cosine sum."""
        rng = np.random.default_rng(4)
        X = rng.normal(0, 50, (8, 8))
        direct = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += cu * cv * X[u, v] * np.cos((2 * y + 1) * u * np.pi / 16) \
                            * np.cos((2 * x + 1) * v * np.pi / 16)
                direct[y, x] = s / 4.0
        np.testing.assert_allclose(J._idct2(X), direct, atol=1e-10)

    def test_dct_idct_inverse(self):
        rng = np.random.default_rng(5)
        X = rng.normal(0, 50, (8, 8))
        np.testing.assert_allclose(J._idct2(J._dct2(X)), X, atol=1e-10)

    def test_zigzag_is_spec_table(self):
        # T.81 Figure A.6 first/last rows and involution property
        assert list(J.ZIGZAG[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
        assert list(J.ZIGZAG[-4:]) == [47, 55, 62, 63]
        assert sorted(J.ZIGZAG) == list(range(64))

    def test_huffman_table_construction(self):
        # T.81 C.2: DC luminance codes are canonical
        t = J._build_decode_table(*J.HUFF_DC_LUM)
        assert t[(2, 0b00)] == 0
        assert t[(3, 0b010)] == 1
        assert t[(3, 0b110)] == 5
        assert t[(4, 0b1110)] == 6
        assert t[(9, 0b111111110)] == 11

    def test_extend(self):
        # T.81 Table F.1 EXTEND examples
        assert J._extend(0b1, 1) == 1 and J._extend(0b0, 1) == -1
        assert J._extend(0b11, 2) == 3 and J._extend(0b00, 2) == -3
        assert J._extend(0b100100, 6) == 36


class TestSpecGolden:
    """An 8×8 constant-200 grayscale JPEG hand-assembled from the
    Annex K tables: DC diff 36 → category 6 → code 1110 + 100100,
    EOB 1010, padded with 1s ⇒ entropy bytes E9 2B.  decode_jpeg must
    return exactly 200 everywhere."""

    def _golden_bytes(self) -> bytes:
        out = bytearray(b"\xff\xd8")
        zz = J.QT_LUM[J.ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz.tobytes()
        out += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
            ">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        for tc, (bits, vals) in ((0, J.HUFF_DC_LUM), (1, J.HUFF_AC_LUM)):
            payload = bytes([tc << 4]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 1, 0x00, 0, 63, 0])
        out += bytes([0xE9, 0x2B])  # hand-coded entropy bits
        out += b"\xff\xd9"
        return bytes(out)

    def test_constant_gray_golden(self):
        img = J.decode_jpeg(self._golden_bytes())
        assert img.shape == (8, 8)
        assert (img == 200).all()

    def test_golden_matches_own_encoder_semantics(self):
        # encode_jpeg at quality 50 uses the unscaled Annex K table, so
        # its output must decode to the same constant
        img = J.decode_jpeg(J.encode_jpeg(np.full((8, 8), 200, np.uint8),
                                          quality=50))
        assert (img == 200).all()


class TestRoundtrip:
    def test_smooth_gradient_exact(self):
        gy, gx = np.mgrid[0:32, 0:48]
        img = (gy * 2 + gx).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) == 0

    def test_noise_error_bounded(self):
        rng = np.random.default_rng(3)
        img = np.clip(rng.normal(128, 30, (40, 56)), 0, 255).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        rmse = float(np.sqrt(((out.astype(float) - img) ** 2).mean()))
        assert rmse < 4.0

    def test_color_roundtrip(self):
        gy, gx = np.mgrid[0:24, 0:40]
        img = np.stack([gx * 3 % 256, gy * 5 % 256, (gx + gy) * 2 % 256],
                       axis=-1).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4

    def test_non_multiple_of_8_size(self):
        rng = np.random.default_rng(9)
        img = np.clip(rng.normal(100, 20, (13, 21)), 0, 255).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
        assert out.shape == (13, 21)

    def test_quality_monotone(self):
        rng = np.random.default_rng(10)
        img = np.clip(rng.normal(128, 40, (32, 32)), 0, 255).astype(np.uint8)
        errs = []
        for q in (30, 60, 90):
            out = J.decode_jpeg(J.encode_jpeg(img, quality=q))
            errs.append(float(np.sqrt(((out.astype(float) - img) ** 2).mean())))
        assert errs[0] > errs[1] > errs[2]


class TestSampling420:
    def _craft_420(self, y_const: float, cb_const: float, cr_const: float,
                   h: int = 16, w: int = 16) -> bytes:
        """Hand-assemble a one-MCU 4:2:0 color JPEG with constant
        planes (DC-only blocks) using the encoder's bit-writer but NOT
        encode_jpeg (which is 4:4:4) — exercises the decoder's MCU
        sampling walk + upsampling."""
        out = bytearray(b"\xff\xd8")
        for tq, q in ((0, J.QT_LUM), (1, J.QT_CHROM)):
            zz = q[J.ZIGZAG].astype(np.uint8)
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
        out += b"\xff\xc0" + struct.pack(">H", 17) + struct.pack(
            ">BHHB", 8, h, w, 3) + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        enc = {}
        for tc, th, tab in ((0, 0, J.HUFF_DC_LUM), (1, 0, J.HUFF_AC_LUM),
                            (0, 1, J.HUFF_DC_CHROM), (1, 1, J.HUFF_AC_CHROM)):
            payload = bytes([tc << 4 | th]) + bytes(tab[0]) + bytes(tab[1])
            out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
            enc[(tc, th)] = J._build_encode_table(*tab)
        out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
            [3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        bw = J._BitWriter()

        def dc(val, qtab, dct, act, pred):
            coef = int(np.round((val - 128.0) * 8.0 / qtab[0]))
            diff = coef - pred
            t = J._cat(diff)
            ln, code = enc[dct][t]
            bw.write(code, ln)
            if t:
                u = diff if diff >= 0 else diff + (1 << t) - 1
                bw.write(u & ((1 << t) - 1), t)
            ln, code = enc[act][0x00]  # EOB
            bw.write(code, ln)
            return coef

        py = 0
        for _ in range(4):  # 4 luma blocks in the 4:2:0 MCU
            py = dc(y_const, J.QT_LUM, (0, 0), (1, 0), py)
        dc(cb_const, J.QT_CHROM, (0, 1), (1, 1), 0)
        dc(cr_const, J.QT_CHROM, (0, 1), (1, 1), 0)
        bw.flush()
        out += bw.out + b"\xff\xd9"
        return bytes(out)

    def test_420_constant_color(self):
        y, cb, cr = 80.0, 151.0, 109.0
        img = J.decode_jpeg(self._craft_420(y, cb, cr))
        assert img.shape == (16, 16, 3)
        # independent expected values: quantized DC reconstruction +
        # BT.601 conversion computed here from the spec formulas
        yq = round((y - 128.0) * 8.0 / J.QT_LUM[0]) * J.QT_LUM[0] / 8.0 + 128.0
        cbq = round((cb - 128.0) * 8.0 / J.QT_CHROM[0]) * J.QT_CHROM[0] / 8.0 + 128.0
        crq = round((cr - 128.0) * 8.0 / J.QT_CHROM[0]) * J.QT_CHROM[0] / 8.0 + 128.0
        exp_r = int(np.clip(round(yq + 1.402 * (crq - 128.0)), 0, 255))
        exp_g = int(np.clip(round(yq - 0.344136 * (cbq - 128.0)
                                  - 0.714136 * (crq - 128.0)), 0, 255))
        exp_b = int(np.clip(round(yq + 1.772 * (cbq - 128.0)), 0, 255))
        assert (img[..., 0] == exp_r).all()
        assert (img[..., 1] == exp_g).all()
        assert (img[..., 2] == exp_b).all()


class TestErrors:
    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            J.decode_jpeg(b"\x89PNG")

    def test_progressive_raises(self):
        gy, gx = np.mgrid[0:8, 0:8]
        buf = bytearray(J.encode_jpeg((gy + gx).astype(np.uint8)))
        i = bytes(buf).find(b"\xff\xc0")
        buf[i + 1] = 0xC2  # flip SOF0 -> SOF2
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(bytes(buf))


class TestStage:
    def test_jpeg_decode_stage(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.stages.multimodal import jpeg_decode_stage

        rng = np.random.default_rng(21)
        imgs = [np.clip(rng.normal(120, 25, (16, 24)), 0, 255).astype(np.uint8)
                for _ in range(6)]
        media = [J.encode_jpeg(im, quality=92) for im in imgs]
        ds = rd.from_arrow(pa.table({
            "media_id": pa.array(range(6), pa.int64()),
            "media": pa.array(media, pa.binary()),
        }))
        out = jpeg_decode_stage(ds, concurrency=(1, 2)).to_pandas()
        assert len(out) == 6
        for _, row in out.iterrows():
            shp = list(row["pixels_shape"])
            assert shp == [16, 24, 1]
            t = np.frombuffer(row["pixels"], np.uint8).reshape(shp)
            src = imgs[int(row["media_id"])]
            rmse = float(np.sqrt(((t[..., 0].astype(float) - src) ** 2).mean()))
            assert rmse < 5.0
