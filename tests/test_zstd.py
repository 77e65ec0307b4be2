"""zstd decompressor tests (RFC 8878; raster/zstd.py). The real
compressed-path coverage lives in test_zarr.py (reference fixtures:
v2 zstd chunk, sharded zstd inner chunks with Huffman literals + FSE
sequences); here: hand-assembled frames for the block plumbing and
the crc32c check-vector."""

import struct

import pytest

from gdal_ray.raster.zarr import _crc32c
from gdal_ray.raster.zstd import zstd_decompress

MAGIC = struct.pack("<I", 0xFD2FB528)


def _frame(blocks: list[bytes]) -> bytes:
    # FHD: single_segment=1, fcs_flag=0 → 1-byte FCS
    total = sum(b[0] for b in [])  # noqa: F841  (doc aid)
    return MAGIC + bytes([0x20, 0]) + b"".join(blocks)


def _raw_block(payload: bytes, last: bool) -> bytes:
    hdr = (len(payload) << 3) | (0 << 1) | (1 if last else 0)
    return hdr.to_bytes(3, "little") + payload


def _rle_block(byte: int, count: int, last: bool) -> bytes:
    hdr = (count << 3) | (1 << 1) | (1 if last else 0)
    return hdr.to_bytes(3, "little") + bytes([byte])


class TestFrames:
    def test_raw_block(self):
        f = MAGIC + bytes([0x20, 5]) + _raw_block(b"hello", True)
        assert zstd_decompress(f) == b"hello"

    def test_rle_block(self):
        f = MAGIC + bytes([0x20, 6]) + _rle_block(ord("x"), 6, True)
        assert zstd_decompress(f) == b"xxxxxx"

    def test_multiple_blocks_and_frames(self):
        f1 = MAGIC + bytes([0x20, 8]) + _raw_block(b"ab", False) + \
            _rle_block(ord("c"), 6, True)
        f2 = MAGIC + bytes([0x20, 2]) + _raw_block(b"!!", True)
        assert zstd_decompress(f1 + f2) == b"abcccccc!!"

    def test_skippable_frame(self):
        skip = struct.pack("<II", 0x184D2A50, 3) + b"xyz"
        f = MAGIC + bytes([0x20, 2]) + _raw_block(b"ok", True)
        assert zstd_decompress(skip + f) == b"ok"

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            zstd_decompress(b"\x00\x00\x00\x00")

    def test_reference_fixture(self):
        # the v2 zstd.zarr chunk (raw-block frame) — [1, 2]
        d = open("/root/reference/autotest/gdrivers/data/zarr/"
                 "zstd.zarr/0", "rb").read()
        assert zstd_decompress(d) == b"\x01\x02"

    def test_compressed_block_via_shard_fixture(self):
        # one zstd frame with a COMPRESSED block (Huffman literals +
        # FSE sequences) extracted from the reference shard fixture
        import numpy as np
        shard = open("/root/reference/autotest/gdrivers/data/zarr/v3/"
                     "simple_sharding.zarr/c/0/0", "rb").read()
        pairs = np.frombuffer(shard[-(16 * 4 + 4):-4], "<u8").reshape(4, 2)
        off, nb = pairs[0]
        vals = np.frombuffer(
            zstd_decompress(shard[int(off): int(off + nb)]), "<f4")
        # inner chunk (0,0) = rows 0-4, cols 0-5 of the 24×26 arange
        want = [float(26 * r + c) for r in range(5) for c in range(6)]
        assert vals.tolist() == want


class TestCrc32c:
    def test_check_vector(self):
        # the canonical CRC-32C check vector
        assert _crc32c(b"123456789") == 0xE3069283

    def test_empty(self):
        assert _crc32c(b"") == 0
