"""Proximity (exact EDT) + contour (marching squares) tests."""

import numpy as np
import pytest

from gdal_ray.raster import proximity


class TestProximity:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(17)
        arr = (rng.uniform(0, 1, (24, 24)) > 0.95).astype(np.int32)
        if not arr.any():
            arr[5, 5] = 1
        d = proximity.proximity_array(arr)
        ty, tx = np.nonzero(arr)
        for _ in range(50):
            y = rng.integers(0, 24)
            x = rng.integers(0, 24)
            bf = np.sqrt(((ty - y) ** 2 + (tx - x) ** 2).min())
            assert d[y, x] == pytest.approx(bf, abs=1e-9)

    def test_max_distance_cap(self):
        arr = np.zeros((10, 10), np.int32)
        arr[0, 0] = 1
        d = proximity.proximity_array(arr, max_distance=3.0, nodata=-1)
        assert d[0, 0] == 0
        assert d[0, 3] == 3.0
        assert d[9, 9] == -1

    def test_target_values(self):
        arr = np.zeros((5, 5), np.int32)
        arr[0, 0] = 7
        arr[4, 4] = 9
        d = proximity.proximity_array(arr, target_values=[9])
        assert d[4, 4] == 0
        assert d[0, 0] == pytest.approx(np.sqrt(32))

    def test_no_targets(self):
        d = proximity.proximity_array(np.zeros((4, 4), np.int32), nodata=-5)
        assert (d == -5).all()


class TestContour:
    def test_linear_field_contours_are_straight(self):
        yy, xx = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
        arr = xx.astype(np.float64)  # value = column index at centers
        lines = proximity.contour_lines(arr, level=7.5)
        assert len(lines) == 1
        ln = lines[0]
        # contour x==7.5 between centers 7 and 8 → pixel-center x = 8.0
        np.testing.assert_allclose(ln[:, 0], 8.0, atol=1e-12)
        assert len(ln) >= 19

    def test_circle_contour_closed_and_radius(self):
        yy, xx = np.meshgrid(np.arange(41), np.arange(41), indexing="ij")
        r = np.hypot(xx - 20, yy - 20)
        lines = proximity.contour_lines(r, level=10.0)
        # one closed ring around the center
        assert len(lines) == 1
        ln = lines[0]
        np.testing.assert_allclose(ln[0], ln[-1], atol=1e-9)
        rad = np.hypot(ln[:, 0] - 20.5, ln[:, 1] - 20.5)
        assert np.abs(rad - 10.0).max() < 0.3  # linear-interp accuracy

    def test_world_coords(self):
        arr = np.tile(np.arange(10, dtype=float), (10, 1))
        gt = (100.0, 2.0, 0.0, 50.0, 0.0, -2.0)
        lines = proximity.contour_lines(arr, 4.5, gt)
        # pixel x=5.0 → world 100 + 5*2 = 110
        np.testing.assert_allclose(lines[0][:, 0], 110.0, atol=1e-9)

    def test_level_outside_range(self):
        arr = np.zeros((5, 5))
        assert proximity.contour_lines(arr, 10.0) == []
