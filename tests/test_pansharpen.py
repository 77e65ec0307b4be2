"""Pansharpen (weighted Brovey) tests: exact identities + sharpening
behavior on a synthetic scene."""

import numpy as np
import pytest

from gdal_ray.raster.pansharpen import pansharpen, upsample


class TestPansharpen:
    def test_brovey_identity(self):
        """If pan == pseudo_pan of the upsampled bands, the output is
        exactly the upsampled bands (ratio == 1 everywhere)."""
        rng = np.random.default_rng(3)
        ms = [rng.uniform(10, 100, (16, 16)) for _ in range(3)]
        w = [0.2, 0.5, 0.3]
        ups = [upsample(b, (32, 32)) for b in ms]
        pan = sum(wi * u for wi, u in zip(w, ups))
        out = pansharpen(pan, ms, weights=w)
        for o, u in zip(out, ups):
            assert np.allclose(o, u, rtol=1e-12)

    def test_constant_scene_scales_with_pan(self):
        """Constant MS bands: output = pan * (band / pseudo) exactly."""
        ms = [np.full((8, 8), 40.0), np.full((8, 8), 80.0)]
        rng = np.random.default_rng(5)
        pan = rng.uniform(30, 90, (16, 16))
        out = pansharpen(pan, ms, weights=[0.5, 0.5])
        # pseudo = 60 everywhere; band ratios 40/60 and 80/60
        assert np.allclose(out[0], pan * (40.0 / 60.0), rtol=1e-12)
        assert np.allclose(out[1], pan * (80.0 / 60.0), rtol=1e-12)

    def test_detail_injection(self):
        """High-frequency pan detail appears in the sharpened output
        (variance increases vs plain upsampling)."""
        i, j = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        detail = 10.0 * ((i + j) % 2)  # checkerboard detail
        base = 50.0 + 0.5 * i
        pan = base + detail
        ms = [(base)[::2, ::2].copy()]  # low-res, no detail
        out = pansharpen(pan, ms, weights=[1.0])[0]
        up = upsample(ms[0], (32, 32))
        assert out.var() > up.var() * 1.5

    def test_nodata_passthrough(self):
        ms = [np.full((4, 4), 10.0)]
        pan = np.full((8, 8), 20.0)
        pan[0, 0] = -9999.0
        out = pansharpen(pan, ms, weights=[1.0], nodata=-9999.0)[0]
        assert out[0, 0] == -9999.0
        assert out[1, 1] == pytest.approx(20.0)
