"""Raster path tests: model, checksum, sample, rasterize, overview,
and the rasterize→sample round-trip gate (FIXTURES.md §5)."""

import numpy as np
import pytest

from gdal_ray import fixtures
from gdal_ray.raster import checksum, kernels, model, overview, rasterize, sample


def _grid20_arr():
    ii, jj = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
    return ((ii * 7 + jj * 13) % 256).astype(np.uint8)


class TestModel:
    def test_tile_roundtrip(self):
        arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
        t = model.from_array(arr, "EPSG:4326", (0, 1, 0, 10, 0, -1), tile_size=4)
        assert t.num_rows == 9  # 3x3 tiles (4+4+2)
        back = model.to_array(t)
        np.testing.assert_array_equal(back, arr)

    def test_geotransform_roundtrip(self):
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        px = np.array([0.0, 10.5, 20.0])
        py = np.array([0.0, 3.25, 20.0])
        x, y = model.pixel_to_world(gt, px, py)
        px2, py2 = model.world_to_pixel(gt, x, y)
        np.testing.assert_allclose(px2, px, atol=1e-9)
        np.testing.assert_allclose(py2, py, atol=1e-9)


class TestChecksum:
    def test_vectorized_matches_scalar_oracle(self):
        arr = _grid20_arr()
        assert checksum.checksum_array(arr) == checksum.checksum_scalar_oracle(arr)

    def test_grid20_golden(self):
        # frozen golden for the FIXTURES grid20 fixture
        arr = _grid20_arr()
        golden = checksum.checksum_scalar_oracle(arr)
        assert checksum.checksum_array(arr) == golden
        t = fixtures.gen_grid20()
        rows = t.to_pylist()
        a2 = model.tile_array(rows[0])
        assert checksum.checksum_array(a2) == golden

    def test_distributed_tiling_invariance(self):
        # checksum must be identical regardless of tiling
        rng = np.random.default_rng(8)
        arr = rng.integers(0, 256, (64, 48)).astype(np.uint8)
        whole = checksum.checksum_array(arr)
        for ts in (7, 16, 33):
            t = model.from_array(arr, "EPSG:4326", (0, 1, 0, 0, 0, -1), tile_size=ts)
            assert checksum.checksum_dataset(t) == whole

    def test_float_and_negative(self):
        arr = (np.linspace(-5, 5, 144).reshape(12, 12)).astype(np.float64)
        assert checksum.checksum_array(arr) == checksum.checksum_scalar_oracle(arr)
        arr2 = np.array([[np.nan, np.inf], [-3.7, 2.5]])
        assert checksum.checksum_array(arr2) == checksum.checksum_scalar_oracle(arr2)
        arr3 = np.array([[-7, -200], [100, -1]], dtype=np.int32)
        assert checksum.checksum_array(arr3) == checksum.checksum_scalar_oracle(arr3)


class TestSample:
    def test_nearest(self):
        arr = np.arange(16, dtype=np.float64).reshape(4, 4)
        vals, ok = sample.sample_points(
            arr, np.array([0.5, 3.9, 4.0, -0.1]), np.array([0.5, 3.9, 0.5, 0.0]),
            method="nearest",
        )
        assert ok.tolist() == [True, True, True, False]
        assert vals[0] == 0.0
        assert vals[1] == 15.0
        assert vals[2] == 3.0  # right-edge nudge rule

    def test_bilinear_center_and_edges(self):
        arr = np.array([[0.0, 10.0], [20.0, 30.0]])
        # pixel centers are (0.5,0.5) etc.; midpoint between all 4
        vals, ok = sample.sample_points(
            arr, np.array([1.0, 0.5, 2.0]), np.array([1.0, 0.5, 2.0]),
            method="bilinear",
        )
        assert ok.all()
        assert vals[0] == pytest.approx(15.0)
        assert vals[1] == pytest.approx(0.0)  # exact center of pixel 0
        assert vals[2] == pytest.approx(30.0)  # border-replicated corner

    def test_bilinear_nodata(self):
        arr = np.array([[0.0, -9999.0], [20.0, 30.0]])
        vals, ok = sample.sample_points(
            arr, np.array([1.0]), np.array([1.0]), method="bilinear", nodata=-9999
        )
        assert not ok[0]

    def test_small_raster_downgrade(self):
        arr = np.array([[5.0]])
        vals, ok = sample.sample_points(
            arr, np.array([0.5]), np.array([0.5]), method="bilinear"
        )
        assert ok[0] and vals[0] == 5.0


class TestRasterize:
    def test_box_burn(self):
        from gdal_ray.geom import wkb as gwkb

        gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)  # 10x10 world, 1px=1unit
        shapes = [(gwkb.box_polygon_wkb(2.0, 2.0, 5.0, 5.0), 7.0)]
        arr = rasterize.rasterize_array(shapes, 10, 10, gt)
        # world box [2,5]x[2,5] → pixel rows 5..7 (y=10-... ), centers
        burned = np.argwhere(arr == 7.0)
        assert len(burned) == 9  # 3x3 pixel centers inside
        ys, xs = burned[:, 0], burned[:, 1]
        assert xs.min() == 2 and xs.max() == 4
        assert ys.min() == 5 and ys.max() == 7

    def test_merge_add(self):
        from gdal_ray.geom import wkb as gwkb

        gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
        s = [(gwkb.box_polygon_wkb(0.0, 0.0, 4.0, 4.0), 1.0)] * 3
        arr = rasterize.rasterize_array(s, 4, 4, gt, merge_alg="add")
        assert (arr == 3.0).all()


class TestOverview:
    @pytest.mark.parametrize("method", ["average", "rms", "nearest", "mode"])
    def test_matches_scalar_oracle(self, method):
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        np.testing.assert_array_equal(
            overview.reduce_2x2(arr, method), overview.reduce_2x2_oracle(arr, method)
        )

    def test_average_float(self):
        arr = np.array([[1.0, 2.0], [3.0, 4.0]])
        assert overview.reduce_2x2(arr, "average")[0, 0] == pytest.approx(2.5)

    def test_odd_size_padding(self):
        arr = np.arange(9, dtype=np.uint8).reshape(3, 3)
        out = overview.reduce_2x2(arr, "nearest")
        assert out.shape == (2, 2)


class TestKernels:
    def test_calc(self):
        a = np.array([[1.0, 4.0]])
        b = np.array([[2.0, 2.0]])
        out = kernels.calc_expr("(A + B) * 2", {"A": a, "B": b})
        np.testing.assert_array_equal(out, [[6.0, 12.0]])

    def test_reclassify(self):
        arr = np.array([[1, 2, 3]])
        out = kernels.reclassify(arr, {1: 10, 3: 30})
        np.testing.assert_array_equal(out, [[10, 2, 30]])
        out2 = kernels.reclassify(arr, {1: 10}, default=0)
        np.testing.assert_array_equal(out2, [[10, 0, 0]])

    def test_scale(self):
        arr = np.array([[0, 50, 100]])
        out = kernels.scale(arr, 0, 100, 0, 255)
        np.testing.assert_allclose(out, [[0, 127.5, 255]])

    def test_stats(self):
        arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
        t = model.from_array(arr, "EPSG:4326", (0, 1, 0, 10, 0, -1), tile_size=3)
        import pyarrow as pa

        parts = kernels.tile_stats_partial(t)
        st = kernels.combine_stats(parts)[1]
        assert st["min"] == 0 and st["max"] == 99
        assert st["mean"] == pytest.approx(49.5)
        assert st["std"] == pytest.approx(np.std(np.arange(100)), rel=1e-12)


class TestRoundTrip:
    """FIXTURES.md §5 gate: burn boundaries → sample at page points →
    equality with the direct PIP result for interior points."""

    def test_rasterize_sample_pip_agreement(self):
        from gdal_ray.geom import wkb as gwkb
        from gdal_ray.geom.index import GridPolygonIndex

        b = fixtures.gen_boundaries()
        # burn admin_id into a 512x512 lon/lat grid (last-wins order,
        # same order as the PIP index scan below picks max admin_id)
        arr, gt = rasterize.rasterize_boundaries(
            b, (-80, -60, 80, 60), 512, 512, init=-1.0
        )
        # sample at gazetteer city points strictly inside boxes
        from gdal_ray.geoparse import GAZETTEER

        idx = GridPolygonIndex(b["geometry"].to_pylist())
        lons = np.array([g[1] for g in GAZETTEER])
        lats = np.array([g[2] for g in GAZETTEER])
        px, py = model.world_to_pixel(gt, lons, lats)
        vals, ok = sample.sample_points(arr, px, py, method="nearest")
        pts, ids = idx.query_points(lons, lats)
        import collections

        by_pt = collections.defaultdict(set)
        for p, i in zip(pts, ids):
            by_pt[p].add(i)
        checked = 0
        for i in range(64):
            if not ok[i] or vals[i] < 0:
                continue
            # the sampled admin id must be one of the PIP matches —
            # and the pixel must not be a boundary pixel (interior only):
            # skip points within half a pixel of any matched box edge
            matches = by_pt.get(i, set())
            if not matches:
                continue
            assert int(vals[i]) in matches, f"point {i}: {vals[i]} not in {matches}"
            checked += 1
        assert checked >= 30  # cities inside the boundary coverage area


class TestCubic:
    def test_cubic_interpolates_at_centers(self):
        from gdal_ray.raster import sample

        rng = np.random.default_rng(12)
        arr = rng.uniform(0, 100, (8, 8))
        # pixel centers: loc = (i+0.5); Catmull-Rom is interpolating
        xs = np.array([2.5, 3.5, 4.5])
        ys = np.array([2.5, 4.5, 5.5])
        vals, ok = sample.sample_points(arr, xs, ys, method="cubic")
        assert ok.all()
        np.testing.assert_allclose(
            vals, arr[ys.astype(int), xs.astype(int)], rtol=1e-12
        )

    def test_cubic_linear_precision(self):
        from gdal_ray.raster import sample

        yy, xx = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
        arr = (3.0 * xx + 2.0 * yy).astype(np.float64)
        rng = np.random.default_rng(13)
        px = rng.uniform(2.0, 8.0, 50)
        py = rng.uniform(2.0, 8.0, 50)
        vals, ok = sample.sample_points(arr, px, py, method="cubic")
        # centers at i+0.5 hold value 3i+2j → f(px) = 3(px-0.5)+2(py-0.5)
        expected = 3.0 * (px - 0.5) + 2.0 * (py - 0.5)
        np.testing.assert_allclose(vals[ok], expected[ok], rtol=1e-10)

    def test_cubicspline_smooths(self):
        from gdal_ray.raster import sample

        arr = np.zeros((8, 8))
        arr[4, 4] = 100.0
        v_cub, _ = sample.sample_points(
            arr, np.array([4.5]), np.array([4.5]), method="cubic"
        )
        v_bsp, _ = sample.sample_points(
            arr, np.array([4.5]), np.array([4.5]), method="cubicspline"
        )
        assert v_cub[0] == pytest.approx(100.0)
        assert 30.0 < v_bsp[0] < 60.0  # B-spline is approximating

    def test_cubic_nodata_skip(self):
        from gdal_ray.raster import sample

        arr = np.full((8, 8), 10.0)
        arr[3, 3] = -9999.0
        vals, ok = sample.sample_points(
            arr, np.array([4.0]), np.array([4.0]), method="cubic", nodata=-9999
        )
        assert ok[0]
        assert vals[0] == pytest.approx(10.0)

    def test_small_raster_downgrade_cubic(self):
        from gdal_ray.raster import sample

        arr = np.array([[1.0, 2.0], [3.0, 4.0]])
        vals, ok = sample.sample_points(
            arr, np.array([1.0]), np.array([1.0]), method="cubic"
        )
        assert ok[0] and vals[0] == pytest.approx(2.5)

    def test_warp_cubic(self):
        from gdal_ray.raster import warp

        rng = np.random.default_rng(14)
        arr = rng.uniform(0, 255, (64, 64))
        gt = (-10.0, 0.5, 0.0, 62.0, 0.0, -0.5)
        shape, dgt = warp.suggested_warp_output(arr.shape, gt, "EPSG:4326", "EPSG:3857")
        out = warp.warp_array(arr, gt, "EPSG:4326", shape, dgt, "EPSG:3857",
                              method="cubic", nodata=np.nan)
        assert np.isfinite(out).mean() > 0.8


class TestLanczos:
    def test_interpolates_at_centers(self):
        from gdal_ray.raster import sample

        rng = np.random.default_rng(15)
        arr = rng.uniform(0, 100, (10, 10))
        xs = np.array([4.5, 5.5])
        ys = np.array([4.5, 3.5])
        vals, ok = sample.sample_points(arr, xs, ys, method="lanczos")
        assert ok.all()
        np.testing.assert_allclose(
            vals, arr[ys.astype(int), xs.astype(int)], rtol=1e-9
        )

    def test_constant_field_preserved(self):
        from gdal_ray.raster import sample

        arr = np.full((12, 12), 7.0)
        rng = np.random.default_rng(16)
        px = rng.uniform(1, 11, 40)
        py = rng.uniform(1, 11, 40)
        vals, ok = sample.sample_points(arr, px, py, method="lanczos")
        np.testing.assert_allclose(vals[ok], 7.0, rtol=1e-9)

    def test_small_raster_downgrade(self):
        from gdal_ray.raster import sample

        arr = np.random.default_rng(1).uniform(0, 1, (4, 4))
        vals, ok = sample.sample_points(
            arr, np.array([2.0]), np.array([2.0]), method="lanczos"
        )
        assert ok[0]  # silently bilinear

    def test_warp_lanczos(self):
        from gdal_ray.raster import warp

        arr = np.random.default_rng(2).uniform(0, 255, (64, 64))
        gt = (-10.0, 0.5, 0.0, 62.0, 0.0, -0.5)
        shape, dgt = warp.suggested_warp_output(arr.shape, gt, "EPSG:4326", "EPSG:3857")
        out = warp.warp_array(arr, gt, "EPSG:4326", shape, dgt, "EPSG:3857",
                              method="lanczos", nodata=np.nan)
        assert np.isfinite(out).mean() > 0.8
        m = np.isfinite(out)
        assert out[m].min() > -60 and out[m].max() < 320  # bounded ringing


class TestAdviceRegressions:
    def test_checksum_clamps_wide_integers(self):
        """uint32/int64/uint64 values outside int32 range go through
        the GDT_Int32 read clamp (GDALCopyWords semantics)."""
        from gdal_ray.raster import checksum as ck

        for arr in (
            np.array([[4_000_000_000, 7]], dtype=np.uint64),
            np.array([[2**40, -(2**40)]], dtype=np.int64),
            np.array([[4_294_967_295, 123]], dtype=np.uint32),
        ):
            assert ck.checksum_array(arr) == ck.checksum_scalar_oracle(arr)

    def test_calc_expr_rejects_escapes(self):
        import pytest as _pytest

        from gdal_ray.raster.kernels import calc_expr

        a = {"A": np.ones((2, 2))}
        assert (calc_expr("A * 2 + 1", a) == 3).all()
        for bad in (
            "().__class__",
            "A.__class__",
            "__import__('os')",
            "[x for x in (1,)]",
            "(lambda: 1)()",
            "A[0]",
        ):
            with _pytest.raises((ValueError, SyntaxError)):
                calc_expr(bad, a)


class TestScaleVariants:
    def test_unscale(self):
        from gdal_ray.raster.kernels import unscale

        raw = np.array([[0, 100], [200, 300]], dtype=np.int32)
        out = unscale(raw, 0.01, -5.0)
        assert np.allclose(out, raw * 0.01 - 5.0)

    def test_set_type_clamps(self):
        from gdal_ray.raster.kernels import set_type

        v = np.array([[-300.7, 300.2], [np.nan, 127.5]])
        out = set_type(v, "int8")
        assert out.dtype == np.int8
        assert out[0, 0] == -128 and out[0, 1] == 127
        assert out[1, 0] == 0 and out[1, 1] == 128 - 1 or out[1, 1] == 127

    def test_set_type_rounds_half_away_from_zero(self):
        # GDALCopyWords semantics: 0.5 -> 1, -0.5 -> -1, 2.5 -> 3
        # (np.rint would give 0, -0, 2 — banker's rounding)
        from gdal_ray.raster.kernels import set_type

        v = np.array([[0.5, -0.5], [2.5, -2.5]])
        out = set_type(v, "int16")
        assert out.tolist() == [[1, -1], [3, -3]]

    def test_nodata_to_alpha(self):
        from gdal_ray.raster.kernels import nodata_to_alpha

        arr = np.array([[1.0, -9.0], [np.nan, 4.0]])
        _band, alpha = nodata_to_alpha(arr, -9.0)
        assert alpha.tolist() == [[255, 0], [0, 255]]

    def test_color_map(self):
        from gdal_ray.raster.kernels import color_map

        ramp = [(0.0, (0, 0, 0)), (10.0, (100, 200, 50))]
        arr = np.array([[0.0, 5.0, 10.0, 20.0]])
        rgb = color_map(arr, ramp)
        assert rgb[0, 0].tolist() == [0, 0, 0]
        assert rgb[0, 1].tolist() == [50, 100, 25]
        assert rgb[0, 2].tolist() == [100, 200, 50]
        assert rgb[0, 3].tolist() == [100, 200, 50]   # clamped above
        exact = color_map(arr, ramp, interpolate=False)
        assert exact[0, 1].tolist() == [0, 0, 0]      # snap below
