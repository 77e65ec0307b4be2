"""Median-cut palette + Floyd-Steinberg dither tests."""

import numpy as np
import pytest

from gdal_ray.raster.dither import (
    dither_rgb_to_pct,
    median_cut_palette,
    nearest_palette_index,
)


class TestMedianCut:
    def test_few_colors_exact(self):
        """An image with k distinct colors gets a palette containing
        exactly those colors."""
        colors = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [128, 128, 0]],
            dtype=np.uint8,
        )
        idx = np.random.default_rng(1).integers(0, 4, (32, 32))
        img = colors[idx]
        pal = median_cut_palette(img, 8)
        got = {tuple(c) for c in pal}
        for c in colors:
            assert tuple(c) in got

    def test_palette_size_and_error(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        pal = median_cut_palette(img, 64)
        assert len(pal) <= 64
        idx = nearest_palette_index(img, pal)
        err = np.abs(
            pal[idx].astype(float) - img.astype(float)
        ).mean()
        assert err < 40.0  # quantization error bounded


class TestDither:
    def test_mean_preservation(self):
        """Error diffusion preserves the local mean: a uniform gray
        between two palette entries dithers to a mix whose mean is
        within 1 level of the input."""
        img = np.full((64, 64, 3), 127, dtype=np.uint8)
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        out = dither_rgb_to_pct(img, pal)
        mean = pal[out].astype(float).mean()
        assert mean == pytest.approx(127.0, abs=1.5)
        # both entries used (checkerboard-ish mix, not a flat fill)
        assert 0.4 < (out == 1).mean() < 0.6

    def test_reference_kernel_scalar_parity(self):
        """The vectorized kernel matches a pure-Python transcription
        of alg/gdaldither.cpp's /6 integer loop (L1 nearest, trunc
        division, set-then-accumulate panError slots)."""
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)

        h, w, _ = img.shape
        exp = np.zeros((h, w), dtype=np.uint8)
        pan = [[0, 0, 0] for _ in range(w + 2)]
        for y in range(h):
            line = []
            for i in range(w):
                line.append([
                    max(0, min(255, int(img[y, i, c]) + pan[i + 1][c]))
                    for c in range(3)
                ])
            pan = [[0, 0, 0] for _ in range(w + 2)]
            last = [0, 0, 0]
            for i in range(w):
                v = [max(0, min(255, line[i][c] + last[c])) for c in range(3)]
                best, bd = 0, 1 << 30
                for k in range(len(pal)):
                    d = sum(abs(v[c] - int(pal[k, c])) for c in range(3))
                    if d < bd:
                        best, bd = k, d
                exp[y, i] = best
                for c in range(3):
                    e = v[c] - int(pal[best, c])
                    sixth = int(e / 6)  # trunc toward zero, like C
                    pan[i][c] += sixth
                    pan[i + 2][c] = sixth
                    pan[i + 1][c] += e - 5 * sixth
                    last[c] = 2 * sixth

        got = dither_rgb_to_pct(img, pal)
        assert (got == exp).all()

    def test_exact_palette_colors_pass_through(self):
        pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:4] = pal[0]
        img[4:] = pal[1]
        out = dither_rgb_to_pct(img, pal)
        assert (out[:4] == 0).all() and (out[4:] == 1).all()
