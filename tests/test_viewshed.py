"""Viewshed tests: analytic occlusion geometry on constructed DEMs."""

import numpy as np

from gdal_ray.raster.viewshed import viewshed


class TestViewshed:
    def test_flat_dem_all_visible(self):
        dem = np.zeros((32, 32))
        vis = viewshed(dem, 16, 16, observer_height=2.0)
        assert vis.all()

    def test_wall_shadow(self):
        """A wall east of the observer hides exactly the cells whose
        sight line passes below the wall top (similar triangles)."""
        dem = np.zeros((21, 41))
        dem[:, 25] = 10.0  # north-south wall at x=25
        ox, oy = 10.0, 10.0
        oh = 2.0
        vis = viewshed(dem, ox, oy, observer_height=oh, target_height=0.0)
        # along the center row: sight line from (10, z=2) over wall top
        # (25, z=10): at x, line height = 2 + (x-10)*(10-2)/(25-10);
        # ground (z=0) behind the wall is hidden until the line regains
        # z<=0 — never — so ALL cells strictly behind the wall are
        # hidden on this row
        row = vis[10]
        assert row[:25].all()          # in front of the wall: visible
        assert not row[26:].any()      # behind the wall: hidden
        # west side unaffected
        assert vis[10, :10].all()

    def test_hill_partial_shadow(self):
        """A 5-high ridge: a 8-high target tower behind it becomes
        visible when its top clears the sight line."""
        dem = np.zeros((11, 31))
        dem[:, 15] = 5.0
        ox, oy = 5.0, 5.0
        # target height 0: hidden behind ridge
        v0 = viewshed(dem, ox, oy, observer_height=1.0, target_height=0.0)
        assert not v0[5, 20]
        # sight line at x=20: 1 + (20-5)*(5-1)/(15-5) = 7 → a 8-high
        # target clears it
        v8 = viewshed(dem, ox, oy, observer_height=1.0, target_height=8.0)
        assert v8[5, 20]

    def test_radius_limit(self):
        dem = np.zeros((21, 21))
        vis = viewshed(dem, 10, 10, radius=5.0)
        yy, xx = np.meshgrid(np.arange(21), np.arange(21), indexing="ij")
        d = np.hypot(xx - 10, yy - 10)
        assert (vis == (d <= 5.0)).all()

    def test_matches_scalar_oracle(self):
        """Random rough terrain: vectorized result equals a per-cell
        scalar LOS oracle with identical sampling."""
        rng = np.random.default_rng(5)
        dem = rng.uniform(0, 3, (16, 16))
        ox, oy, oh = 8.0, 8.0, 2.0
        vis = viewshed(dem, ox, oy, observer_height=oh, samples_per_cell=2.0)
        from gdal_ray.raster.viewshed import _bilinear

        yy, xx = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
        dist = np.hypot(xx - ox, yy - oy)
        n_s = max(2, int(np.ceil(dist.max() * 2.0)))
        oz = _bilinear(dem, np.array([ox]), np.array([oy]))[0] + oh
        for y in range(16):
            for x in range(16):
                d = dist[y, x]
                if d < 1e-9:
                    assert vis[y, x]
                    continue
                want = True
                for k in range(1, n_s):
                    t = k / n_s
                    sx, sy = ox + (x - ox) * t, oy + (y - oy) * t
                    terr = _bilinear(dem, np.array([sx]), np.array([sy]))[0]
                    line = oz + (dem[y, x] - oz) * t
                    if terr > line + 1e-9:
                        want = False
                        break
                assert vis[y, x] == want, (x, y)
