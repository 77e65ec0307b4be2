"""Warp tests: identity, approx-transformer error bound, round trip."""

import numpy as np
import pytest

from gdal_ray.raster import model, warp


def _src():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    # geographic raster over [0,64]x[0,64] degrees-ish region... use a
    # realistic lon/lat window: [-10, 22] x [30, 62], 0.5 deg/px
    gt = (-10.0, 0.5, 0.0, 62.0, 0.0, -0.5)
    return arr, gt


def test_identity_warp():
    arr, gt = _src()
    out = warp.warp_array(
        arr, gt, "EPSG:4326", arr.shape, gt, "EPSG:4326",
        method="nearest", approx=False,
    )
    np.testing.assert_array_equal(out.astype(np.uint8), arr)


def test_suggested_output_and_forward_warp():
    arr, gt = _src()
    shape, dgt = warp.suggested_warp_output(arr.shape, gt, "EPSG:4326", "EPSG:3857")
    assert 40 <= shape[0] <= 120 and 40 <= shape[1] <= 120
    out = warp.warp_array(arr, gt, "EPSG:4326", shape, dgt, "EPSG:3857",
                          method="nearest", approx=False, nodata=255)
    # interior is populated from the source value set
    assert (out >= 0).all()
    interior = out[10:-10, 10:-10]
    assert len(np.unique(interior)) > 10


def test_approx_error_bound():
    # the approx transformer must stay within 0.125 px of the exact
    # transform (the gdalwarp contract, gdalwarp_lib.cpp:1598)
    arr, gt = _src()
    shape, dgt = warp.suggested_warp_output(arr.shape, gt, "EPSG:4326", "EPSG:3857")
    tr = warp.ApproxGridTransform(shape, dgt, "EPSG:3857", gt, "EPSG:4326", step=16)
    rng = np.random.default_rng(5)
    px = rng.uniform(0, shape[1], 4000)
    py = rng.uniform(0, shape[0], 4000)
    ax, ay = tr(px, py)
    ex, ey = warp.exact_transform(dgt, "EPSG:3857", gt, "EPSG:4326", px, py)
    err = np.hypot(ax - ex, ay - ey)
    assert np.nanmax(err) <= 0.125


def test_roundtrip_reprojection_preserves_smooth_data():
    # smooth gradient: 4326 -> 3857 -> 4326 bilinear round trip ~ equal
    h, w = 64, 64
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    arr = (xx * 2.0 + yy * 1.0).astype(np.float64)
    gt = (-10.0, 0.5, 0.0, 62.0, 0.0, -0.5)
    shape, dgt = warp.suggested_warp_output(arr.shape, gt, "EPSG:4326", "EPSG:3857")
    mid = warp.warp_array(arr, gt, "EPSG:4326", shape, dgt, "EPSG:3857",
                          method="bilinear", nodata=np.nan)
    back = warp.warp_array(mid, dgt, "EPSG:3857", arr.shape, gt, "EPSG:4326",
                           method="bilinear", nodata=np.nan)
    # compare away from borders (border pixels lose support)
    a = arr[4:-4, 4:-4]
    b = back[4:-4, 4:-4]
    m = np.isfinite(b)
    assert m.mean() > 0.95
    assert np.nanmax(np.abs(a[m] - b[m])) < 1.0  # < 1 source unit


def test_tiled_warp_matches_whole():
    # distributed contract: warping per 16px dst tile with offsets
    # equals the whole-window warp
    arr, gt = _src()
    shape, dgt = warp.suggested_warp_output(arr.shape, gt, "EPSG:4326", "EPSG:3857")
    whole = warp.warp_array(arr, gt, "EPSG:4326", shape, dgt, "EPSG:3857",
                            method="nearest", approx=False, nodata=0)
    h, w = shape
    tiled = np.zeros_like(whole)
    for y0 in range(0, h, 16):
        for x0 in range(0, w, 16):
            th = min(16, h - y0)
            tw = min(16, w - x0)
            tiled[y0:y0+th, x0:x0+tw] = warp.warp_array(
                arr, gt, "EPSG:4326", (th, tw), dgt, "EPSG:3857",
                method="nearest", approx=False, nodata=0,
                dst_y0=y0, dst_x0=x0,
            )
    np.testing.assert_array_equal(tiled, whole)


class TestAggregateKernels:
    """GRA_Average/Mode/Min/Max/Med/Q1/Q3/Sum/RMS (gdalwarper.h:35-67)."""

    GT_SRC = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    GT_DST = (0.0, 2.0, 0.0, 0.0, 0.0, -2.0)

    def _src(self):
        rng = np.random.default_rng(17)
        return rng.integers(0, 50, (32, 32)).astype(np.float64)

    def test_exact_2x_blocks(self):
        from gdal_ray.raster.warp import warp_array_aggregate

        src = self._src()
        blocks = src.reshape(16, 2, 16, 2).transpose(0, 2, 1, 3).reshape(16, 16, 4)
        want = {
            "average": blocks.mean(axis=2),
            "sum": blocks.sum(axis=2),
            "min": blocks.min(axis=2),
            "max": blocks.max(axis=2),
            "med": np.median(blocks, axis=2),
            "q1": np.percentile(blocks, 25.0, axis=2),
            "q3": np.percentile(blocks, 75.0, axis=2),
            "rms": np.sqrt((blocks**2).mean(axis=2)),
        }
        for m, exp in want.items():
            got = warp_array_aggregate(
                src, self.GT_SRC, "EPSG:4326", (16, 16), self.GT_DST,
                "EPSG:4326", method=m,
            )
            assert np.allclose(got, exp, atol=1e-12), m

    def test_mode_smallest_wins_ties(self):
        from gdal_ray.raster.warp import warp_array_aggregate

        src = np.array([[5.0, 5.0], [2.0, 2.0]])
        got = warp_array_aggregate(
            src, self.GT_SRC, "EPSG:4326", (1, 1), self.GT_DST,
            "EPSG:4326", method="mode",
        )
        assert got[0, 0] == 2.0

    def test_nodata_excluded(self):
        from gdal_ray.raster.warp import warp_array_aggregate

        src = np.array([[1.0, -9.0], [3.0, -9.0]])
        got = warp_array_aggregate(
            src, self.GT_SRC, "EPSG:4326", (1, 1), self.GT_DST,
            "EPSG:4326", method="average", nodata=-9.0,
        )
        assert got[0, 0] == 2.0
        # all-nodata pixel -> nodata
        src2 = np.full((2, 2), -9.0)
        got2 = warp_array_aggregate(
            src2, self.GT_SRC, "EPSG:4326", (1, 1), self.GT_DST,
            "EPSG:4326", method="max", nodata=-9.0,
        )
        assert got2[0, 0] == -9.0

    def test_tiled_equals_whole_all_kernels(self):
        """Windowed (dst_x0/dst_y0) output must be bit-identical to
        the whole-array warp for every aggregate kernel — including a
        genuine reprojection (4326 -> 3857)."""
        from gdal_ray.raster.warp import warp_array_aggregate

        rng = np.random.default_rng(23)
        src = rng.normal(10, 5, (40, 40))
        src_gt = (-20.0, 1.0, 0.0, 20.0, 0.0, -1.0)
        dst_gt = (-2000000.0, 250000.0, 0.0, 2300000.0, 0.0, -250000.0)
        for m in ("average", "sum", "rms", "min", "max", "med", "q1",
                  "q3", "mode"):
            whole = warp_array_aggregate(
                src, src_gt, "EPSG:4326", (16, 16), dst_gt, "EPSG:3857",
                method=m,
            )
            tiled = np.empty_like(whole)
            for y0 in (0, 8):
                for x0 in (0, 8):
                    tiled[y0:y0+8, x0:x0+8] = warp_array_aggregate(
                        src, src_gt, "EPSG:4326", (8, 8), dst_gt,
                        "EPSG:3857", method=m, dst_y0=y0, dst_x0=x0,
                    )
            w_nan = np.isnan(whole)
            assert (np.isnan(tiled) == w_nan).all(), m
            assert (tiled[~w_nan] == whole[~w_nan]).all(), m


class TestGCPTransformer:
    def test_affine_recovery_exact(self):
        """GCPs sampled from a known affine map -> order-1 fit recovers
        it to float precision, both directions."""
        from gdal_ray.raster.warp import GCPTransformer

        rng = np.random.default_rng(3)
        gt = (100.0, 0.5, 0.1, 200.0, -0.05, -0.5)
        px = rng.uniform(0, 1000, 20)
        py = rng.uniform(0, 1000, 20)
        gx = gt[0] + gt[1] * px + gt[2] * py
        gy = gt[3] + gt[4] * px + gt[5] * py
        t = GCPTransformer(np.column_stack([px, py, gx, gy]), order=1)
        assert t.max_residual < 1e-9
        qx, qy = rng.uniform(0, 1000, 5), rng.uniform(0, 1000, 5)
        fx, fy = t.pixel_to_geo(qx, qy)
        assert np.allclose(fx, gt[0] + gt[1]*qx + gt[2]*qy, atol=1e-8)
        assert np.allclose(fy, gt[3] + gt[4]*qx + gt[5]*qy, atol=1e-8)
        bx, by = t.geo_to_pixel(fx, fy)
        assert np.allclose(bx, qx, atol=1e-7)
        assert np.allclose(by, qy, atol=1e-7)
        rec = t.as_geotransform()
        assert np.allclose(rec, gt, atol=1e-9)

    def test_order2_fits_quadratic(self):
        from gdal_ray.raster.warp import GCPTransformer

        rng = np.random.default_rng(5)
        px = rng.uniform(0, 100, 30)
        py = rng.uniform(0, 100, 30)
        gx = 1.0 + 2.0*px + 0.5*py + 0.01*px*py + 0.002*px*px
        gy = -3.0 + 0.1*px + 1.5*py + 0.005*py*py
        t = GCPTransformer(np.column_stack([px, py, gx, gy]), order=2)
        assert t.max_residual < 1e-6
        t1 = GCPTransformer(np.column_stack([px, py, gx, gy]), order=1)
        assert t1.max_residual > 1.0  # affine can't fit the quadratic


class TestTPSTransformer:
    def test_interpolates_gcps_exactly(self):
        from gdal_ray.raster.warp import TPSTransformer

        rng = np.random.default_rng(11)
        px = rng.uniform(0, 100, 12)
        py = rng.uniform(0, 100, 12)
        # smooth warped targets
        gx = 2 * px + 0.3 * py + 5 * np.sin(px / 30)
        gy = -py + 0.1 * px + 3 * np.cos(py / 25)
        t = TPSTransformer(np.column_stack([px, py, gx, gy]))
        fx, fy = t.pixel_to_geo(px, py)
        assert np.allclose(fx, gx, atol=1e-8)
        assert np.allclose(fy, gy, atol=1e-8)

    def test_reduces_to_affine(self):
        """For GCPs sampled from an affine map the spline weights
        vanish and TPS == the affine everywhere."""
        from gdal_ray.raster.warp import TPSTransformer

        rng = np.random.default_rng(13)
        px = rng.uniform(0, 50, 10)
        py = rng.uniform(0, 50, 10)
        gx = 3.0 + 2.0 * px - 0.5 * py
        gy = -1.0 + 0.25 * px + 1.5 * py
        t = TPSTransformer(np.column_stack([px, py, gx, gy]))
        qx = rng.uniform(0, 50, 20)
        qy = rng.uniform(0, 50, 20)
        fx, fy = t.pixel_to_geo(qx, qy)
        assert np.allclose(fx, 3.0 + 2.0 * qx - 0.5 * qy, atol=1e-6)
        assert np.allclose(fy, -1.0 + 0.25 * qx + 1.5 * qy, atol=1e-6)


class TestRPCTransformer:
    def _synthetic_rpc(self):
        """An affine-dominant RPC with mild nonlinear terms (valid
        denominators): exercises the full 20-term path."""
        num_line = np.zeros(20)
        num_line[0:4] = [0.002, 0.1, -1.0, 0.01]
        num_line[7] = 0.0005
        den_line = np.zeros(20)
        den_line[0] = 1.0
        den_line[2] = 0.0008
        num_samp = np.zeros(20)
        num_samp[0:4] = [-0.001, 1.0, 0.12, -0.02]
        num_samp[8] = 0.0004
        den_samp = np.zeros(20)
        den_samp[0] = 1.0
        den_samp[1] = 0.0005
        return {
            "LINE_OFF": 5000.0, "LINE_SCALE": 5000.0,
            "SAMP_OFF": 6000.0, "SAMP_SCALE": 6000.0,
            "LAT_OFF": 40.0, "LAT_SCALE": 0.5,
            "LONG_OFF": -105.0, "LONG_SCALE": 0.5,
            "HEIGHT_OFF": 1500.0, "HEIGHT_SCALE": 1000.0,
            "LINE_NUM_COEFF": num_line, "LINE_DEN_COEFF": den_line,
            "SAMP_NUM_COEFF": num_samp, "SAMP_DEN_COEFF": den_samp,
        }

    def test_inverse_round_trip(self):
        from gdal_ray.raster.warp import RPCTransformer

        t = RPCTransformer(self._synthetic_rpc())
        rng = np.random.default_rng(7)
        lng = rng.uniform(-105.4, -104.6, 200)
        lat = rng.uniform(39.6, 40.4, 200)
        samp, line = t.ground_to_image(lng, lat, 1500.0)
        lng2, lat2 = t.image_to_ground(samp, line, 1500.0)
        assert np.abs(lng2 - lng).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_height_dependence(self):
        from gdal_ray.raster.warp import RPCTransformer

        t = RPCTransformer(self._synthetic_rpc())
        s0, l0 = t.ground_to_image(-105.0, 40.0, 1500.0)
        s1, l1 = t.ground_to_image(-105.0, 40.0, 2500.0)
        assert (s0 != s1) or (l0 != l1)  # parallax present


class TestGeoLocTransformer:
    """Geolocation-array transformer (alg/gdalgeoloc.cpp role) —
    synthetic curved swath: lon/lat arrays from a known smooth
    mapping, forward pinned at nodes, inverse round-trips to sub-1e-3
    pixel, out-of-swath queries return NaN."""

    @staticmethod
    def _swath(gw=24, gh=18):
        jj, ii = np.meshgrid(np.arange(gh, dtype=float), np.arange(gw, dtype=float),
                             indexing="ij")
        # curved, non-affine but invertible mapping
        lon = 10.0 + 0.05 * ii + 0.012 * jj + 0.001 * jj * jj
        lat = 45.0 - 0.04 * jj + 0.008 * ii + 0.0005 * ii * ii
        return lon, lat

    def test_forward_exact_at_nodes(self):
        from gdal_ray.raster.warp import GeoLocTransformer

        lon, lat = self._swath()
        t = GeoLocTransformer(lon, lat)
        px = np.array([0.0, 5.0, 23.0, 11.0])
        py = np.array([0.0, 7.0, 17.0, 3.0])
        gx, gy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(gx, lon[py.astype(int), px.astype(int)],
                                   rtol=1e-14)
        np.testing.assert_allclose(gy, lat[py.astype(int), px.astype(int)],
                                   rtol=1e-14)

    def test_forward_bilinear_between_nodes(self):
        from gdal_ray.raster.warp import GeoLocTransformer

        lon, lat = self._swath()
        t = GeoLocTransformer(lon, lat)
        gx, gy = t.pixel_to_geo([3.5], [4.5])
        exp_x = 0.25 * (lon[4, 3] + lon[4, 4] + lon[5, 3] + lon[5, 4])
        assert abs(gx[0] - exp_x) < 1e-12

    def test_inverse_roundtrip(self):
        from gdal_ray.raster.warp import GeoLocTransformer

        lon, lat = self._swath()
        t = GeoLocTransformer(lon, lat)
        rng = np.random.default_rng(8)
        px = rng.uniform(1.0, 22.0, 200)
        py = rng.uniform(1.0, 16.0, 200)
        gx, gy = t.pixel_to_geo(px, py)
        px2, py2 = t.geo_to_pixel(gx, gy)
        assert np.isfinite(px2).all()
        np.testing.assert_allclose(px2, px, atol=1e-3)
        np.testing.assert_allclose(py2, py, atol=1e-3)

    def test_offsets_and_steps(self):
        from gdal_ray.raster.warp import GeoLocTransformer

        lon, lat = self._swath()
        # geoloc arrays subsampled 4x in pixel space starting at 2
        t = GeoLocTransformer(lon, lat, pixel_offset=2.0, line_offset=1.0,
                              pixel_step=4.0, line_step=3.0)
        gx, gy = t.pixel_to_geo([2.0 + 4.0 * 5], [1.0 + 3.0 * 7])
        assert abs(gx[0] - lon[7, 5]) < 1e-12
        px2, py2 = t.geo_to_pixel(gx, gy)
        assert abs(px2[0] - 22.0) < 1e-2 and abs(py2[0] - 22.0) < 1e-2

    def test_outside_swath_nan(self):
        from gdal_ray.raster.warp import GeoLocTransformer

        lon, lat = self._swath()
        t = GeoLocTransformer(lon, lat)
        px, py = t.geo_to_pixel([0.0, 170.0], [0.0, 89.0])
        assert np.isnan(px).all() and np.isnan(py).all()
