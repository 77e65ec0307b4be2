"""DDS driver — uncompressed parity vs the reference's own fixture
(stefan_full_rgba_no_compression.dds == stefan_full_rgba.tif band
checksums, autotest gdrivers/dds.py test_dds_no_compression) and
spec-pinned S3TC block expansions for DXT1/3/5."""

import struct

import numpy as np
import pytest

from gdal_ray.raster import gtiff
from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.dds import decode_dds, encode_dds, read_dds

FIX = ("/root/reference/autotest/gdrivers/data/dds/"
       "stefan_full_rgba_no_compression.dds")
TIF = "/root/reference/autotest/gcore/data/stefan_full_rgba.tif"


def _header(h, w, fourcc):
    hd = bytearray(128)
    hd[0:4] = b"DDS "
    struct.pack_into("<I", hd, 4, 124)
    struct.pack_into("<II", hd, 12, h, w)
    struct.pack_into("<I", hd, 76, 32)
    struct.pack_into("<I", hd, 80, 0x4)
    hd[84:88] = fourcc
    return bytes(hd)


_SEL = sum((i % 4) << (2 * i) for i in range(16))


class TestUncompressed:
    def test_fixture_matches_tif(self):
        d = read_dds(FIX)
        ref = gtiff.decode_geotiff(open(TIF, "rb").read())
        assert d["compression"] == "NONE"
        assert len(d["bands"]) == 4
        for got, want in zip(d["bands"], ref["bands"]):
            assert checksum_array(got) == checksum_array(want)

    def test_write_roundtrip(self):
        ref = gtiff.decode_geotiff(open(TIF, "rb").read())
        d = decode_dds(encode_dds(ref["bands"]))
        for got, want in zip(d["bands"], ref["bands"]):
            assert (got == want).all()
        # RGB (3-band) variant
        d3 = decode_dds(encode_dds(ref["bands"][:3]))
        assert len(d3["bands"]) == 3
        assert (d3["bands"][0] == ref["bands"][0]).all()


class TestDXT:
    def test_dxt1_four_color(self):
        blk = struct.pack("<HHI", 0xF800, 0x001F, _SEL)
        d = decode_dds(_header(4, 4, b"DXT1") + blk)
        img = np.stack(d["bands"], -1)
        assert d["compression"] == "DXT1"
        assert img[0].tolist() == [[255, 0, 0, 255], [0, 0, 255, 255],
                                   [170, 0, 85, 255], [85, 0, 170, 255]]

    def test_dxt1_three_color_transparent(self):
        blk = struct.pack("<HHI", 0x001F, 0xF800, _SEL)
        img = np.stack(decode_dds(_header(4, 4, b"DXT1") + blk)["bands"],
                       -1)
        assert img[0].tolist() == [[0, 0, 255, 255], [255, 0, 0, 255],
                                   [127, 0, 127, 255], [0, 0, 0, 0]]

    def test_dxt3_explicit_alpha(self):
        alpha = bytes(i | ((i + 1) << 4) for i in range(0, 16, 2))
        blk = alpha + struct.pack("<HHI", 0xF800, 0x001F, _SEL)
        img = np.stack(decode_dds(_header(4, 4, b"DXT3") + blk)["bands"],
                       -1)
        # 4-bit nibbles replicate: 0x0→0, 0x1→17, 0x2→34, 0x3→51
        assert img[0, :, 3].tolist() == [0, 17, 34, 51]
        # color selectors always use the 4-color palette
        assert img[0, 2, :3].tolist() == [170, 0, 85]

    def test_dxt5_interpolated_alpha(self):
        abits = sum((i % 8) << (3 * i) for i in range(16))
        ab = struct.pack("<BB", 240, 16) + abits.to_bytes(6, "little")
        blk = ab + struct.pack("<HHI", 0xF800, 0x001F, _SEL)
        img = np.stack(decode_dds(_header(4, 4, b"DXT5") + blk)["bands"],
                       -1)
        # 8-level palette: 240, 16, (6·240+16)/7=208, (5·240+2·16)/7=176
        assert img[0, :, 3].tolist() == [240, 16, 208, 176]

    def test_dxt5_six_level_mode(self):
        # a0 <= a1 → 6 interpolants + literal 0/255 at codes 6/7
        abits = (6 << (3 * 0)) | (7 << (3 * 1))
        ab = struct.pack("<BB", 16, 240) + abits.to_bytes(6, "little")
        blk = ab + struct.pack("<HHI", 0xF800, 0x001F, 0)
        img = np.stack(decode_dds(_header(4, 4, b"DXT5") + blk)["bands"],
                       -1)
        assert img[0, 0, 3] == 0
        assert img[0, 1, 3] == 255

    def test_non_multiple_of_four(self):
        # 6x5 image: 2x2 blocks with clipped edges
        nblocks = 4
        blk = struct.pack("<HHI", 0xF800, 0xF800, 0) * nblocks
        d = decode_dds(_header(5, 6, b"DXT1") + blk)
        assert d["bands"][0].shape == (5, 6)
        assert (d["bands"][0] == 255).all()

    def test_unknown_fourcc(self):
        with pytest.raises(NotImplementedError):
            decode_dds(_header(4, 4, b"ETC1") + b"\x00" * 8)
