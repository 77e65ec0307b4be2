"""PNG codec + tile sink tests: spec-correctness (chunk CRCs, filter
reconstruction), roundtrip, frozen golden bytes, and the resumable
z/x/y.png pyramid sink."""

import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.raster import png


class TestCodec:
    def test_roundtrip_rgba(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (37, 23, 4), dtype=np.uint8)
        assert (png.decode_png(png.encode_png(img)) == img).all()

    def test_roundtrip_grey_and_rgb(self):
        rng = np.random.default_rng(4)
        g = rng.integers(0, 256, (16, 9), dtype=np.uint8)
        assert (png.decode_png(png.encode_png(g)) == g).all()
        c = rng.integers(0, 256, (8, 11, 3), dtype=np.uint8)
        assert (png.decode_png(png.encode_png(c)) == c).all()

    def test_golden_bytes(self):
        """Deterministic gradient tile → frozen digest (byte-golden,
        decode-free: catches any drift in chunk layout/compression)."""
        i, j = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        img = ((i * 4 + j) % 256).astype(np.uint8)
        data = png.encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert hashlib.sha256(data).hexdigest() == (
            "13fdf0cdf42a55dd7ef8bc2b5795249b1669915b99ced8a0c8a19e7d94ffa1ad"
        )

    def test_chunk_crcs_valid(self):
        img = np.zeros((4, 4, 4), dtype=np.uint8)
        data = png.encode_png(img)
        # walk chunks, verify CRCs independently
        pos = 8
        tags = []
        while pos < len(data):
            ln = int.from_bytes(data[pos : pos + 4], "big")
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + ln]
            crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
            assert zlib.crc32(tag + payload) & 0xFFFFFFFF == crc
            tags.append(tag)
            pos += 12 + ln
        assert tags == [b"IHDR", b"IDAT", b"IEND"]

    def test_decoder_handles_all_filters(self):
        """Hand-build a PNG using filters 1-4 and verify the decoder
        reconstructs (future-proofing: any baseline encoder output)."""
        import struct

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
        h, w, c = img.shape
        bpp = c
        lines = []
        prev = np.zeros(w * c, dtype=np.int64)
        for y, f in zip(range(h), (1, 2, 3, 4, 0)):
            cur = img[y].reshape(-1).astype(np.int64)
            enc = np.zeros(w * c, dtype=np.int64)
            for x in range(w * c):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    enc[x] = cur[x]
                elif f == 1:
                    enc[x] = (cur[x] - a) % 256
                elif f == 2:
                    enc[x] = (cur[x] - b) % 256
                elif f == 3:
                    enc[x] = (cur[x] - (a + b) // 2) % 256
                else:
                    p = a + b - cc
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                        b if pb_ <= pc_ else cc
                    )
                    enc[x] = (cur[x] - pred) % 256
            lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
            prev = cur
        raw = b"".join(lines)

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert (png.decode_png(data) == img).all()


class TestPngSink:
    def test_write_and_resume(self, ray_session, tmp_path):
        import ray.data as rd

        from gdal_ray.pipelines import tilepyramid

        rows = []
        for z, x, y in ((3, 1, 2), (3, 1, 3), (2, 0, 1)):
            arr = np.full((8, 8), float(z * 10), dtype=np.float32)
            arr[0, 0] = np.nan
            rows.append(
                {"z": z, "x": x, "y": y, "width": 8, "height": 8,
                 "dtype": "float32", "data": arr.tobytes()}
            )
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = tilepyramid.write_png_tiles(
            ds, str(tmp_path), vmin=0.0, vmax=40.0
        ).to_pandas()
        assert out["written"].all()
        p = tmp_path / "3" / "1" / "2.png"
        assert p.exists()
        img = png.decode_png(p.read_bytes())
        assert img.shape == (8, 8, 4)
        assert img[0, 0, 3] == 0          # NaN → transparent
        assert img[1, 1, 3] == 255
        assert img[1, 1, 0] == int(round(30 / 40 * 255))
        # resume: second run skips everything
        out2 = tilepyramid.write_png_tiles(
            rd.from_arrow(pa.Table.from_pylist(rows)), str(tmp_path),
            vmin=0.0, vmax=40.0,
        ).to_pandas()
        assert not out2["written"].any()
        assert (out2["n_bytes"] > 0).all()
