"""Contour polygon (band area) and footprint tests — closed-form
analytic surfaces, tiled==whole, and exact outline areas."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.raster import contour_poly as cp
from gdal_ray.raster import model, polygonize


class TestThresholdAreas:
    def test_column_ramp_exact(self):
        """z = j: the {z >= L} region is a vertical strip; linear
        interpolation reproduces it exactly."""
        H = W = 16
        i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        z = j.astype(np.float64)
        for L in (0.25, 3.0, 7.5, 14.9):
            got = cp.cell_threshold_areas(z, L).sum()
            want = (H - 1) * max(0.0, (W - 1) - L)
            assert got == pytest.approx(want, abs=1e-10), L

    def test_diagonal_ramp_exact(self):
        """z = i + j: level sets are diagonal lines; the per-cell walk
        is exact for a linear surface."""
        H = W = 12
        i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        z = (i + j).astype(np.float64)

        def halfplane_area(L):
            # area of {x + y >= L} in [0, W-1] x [0, H-1]
            a, b = W - 1.0, H - 1.0
            tot = a * b
            if L <= 0:
                return tot
            if L >= a + b:
                return 0.0
            # area of {x + y < L}
            if L <= min(a, b):
                below = 0.5 * L * L
            elif L <= max(a, b):
                m = min(a, b)
                below = 0.5 * m * m + (L - m) * m
            else:
                below = tot - 0.5 * (a + b - L) ** 2
            return tot - below

        for L in (0.5, 3.0, 10.5, 17.2, 21.5):
            got = cp.cell_threshold_areas(z, L).sum()
            assert got == pytest.approx(halfplane_area(L), abs=1e-9), L

    def test_full_and_empty(self):
        z = np.full((5, 7), 10.0)
        assert cp.cell_threshold_areas(z, 5.0).sum() == pytest.approx(24.0)
        assert cp.cell_threshold_areas(z, 15.0).sum() == pytest.approx(0.0)

    def test_band_table(self):
        H = W = 16
        i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        z = j.astype(np.float64)
        t = cp.band_areas(z, [2.0, 6.0, 12.0]).to_pandas()
        assert t.loc[0, "area"] == pytest.approx(15 * 4.0)
        assert t.loc[1, "area"] == pytest.approx(15 * 6.0)
        assert t.loc[2, "area"] == pytest.approx(15 * 3.0)


class TestDistributed:
    def test_tiled_equals_whole(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        z = rng.normal(10, 4, (40, 56))
        levels = [6.0, 10.0, 14.0]
        whole = cp.band_areas(z, levels).to_pandas().set_index("band")["area"]
        tiles = model.from_array(
            z, "EPSG:4326", (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), tile_size=16
        )
        nbx = int(np.ceil(56 / 16))
        nby = int(np.ceil(40 / 16))
        got = (
            cp.band_areas_tiles(rd.from_arrow(tiles), levels, nbx, nby)
            .to_pandas()
            .set_index("band")["area"]
        )
        for b in range(len(levels)):
            assert got[b] == pytest.approx(whole[b], rel=1e-12), b


class TestFootprint:
    def test_disk_mask(self):
        N = 48
        i, j = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        arr = np.where((i - 24.0) ** 2 + (j - 24.0) ** 2 <= 15.0**2, 1.0, np.nan)
        fp = polygonize.footprint(arr)
        n_valid = int(np.isfinite(arr).sum())
        assert fp["n_pixels"] == n_valid
        assert fp["n_parts"] == 1
        # exact pixel outlines: shoelace area == pixel count
        from gdal_ray.geom import wkb as gwkb

        g = gwkb.parse(fp["geometry"])
        area = 0.0
        for part in g["parts"]:
            for k, rg in enumerate(part["rings"]):
                a = 0.5 * np.sum(
                    rg[:-1, 0] * rg[1:, 1] - rg[1:, 0] * rg[:-1, 1]
                )
                area += abs(a) if k == 0 else -abs(a)
        assert area == pytest.approx(n_valid)

    def test_donut_has_hole_and_nodata_value(self):
        N = 32
        i, j = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        r2 = (i - 16.0) ** 2 + (j - 16.0) ** 2
        arr = np.where((r2 <= 12.0**2) & (r2 >= 5.0**2), 7.0, -999.0)
        fp = polygonize.footprint(arr, nodata=-999.0)
        from gdal_ray.geom import wkb as gwkb

        g = gwkb.parse(fp["geometry"])
        assert fp["n_parts"] == 1
        assert len(g["parts"][0]["rings"]) == 2  # exterior + hole
        assert fp["n_pixels"] == int(
            ((r2 <= 144.0) & (r2 >= 25.0)).sum()
        )
