"""8-bit palette quantization: median-cut palette computation +
Floyd-Steinberg error-diffusion dithering — the GDALComputeMedianCutPCT
/ GDALDitherRGB2PCT roles (reference: alg/gdalmediancut.cpp,
alg/gdaldither.cpp).

Median cut is vectorized (numpy partitioning per box); dithering is
the standard serpentine error diffusion — sequential per image by
nature, run per tile/image inside map_batches (the reference dithers
whole images the same way)."""

from __future__ import annotations

import numpy as np


def median_cut_palette(rgb: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """(H, W, 3) uint8 → (n, 3) uint8 palette via median cut: split
    the box with the largest (count-weighted) longest side at the
    median of its dominant channel until n boxes, then average."""
    px = rgb.reshape(-1, 3).astype(np.int64)
    boxes = [px]
    while len(boxes) < n_colors:
        # pick the box with the largest spread (ties: most pixels)
        spreads = [
            (int((b.max(0) - b.min(0)).max()), len(b), i)
            for i, b in enumerate(boxes)
            if len(b) > 1 and (b.max(0) - b.min(0)).max() > 0
        ]
        if not spreads:
            break
        _, _, bi = max(spreads)
        b = boxes.pop(bi)
        ch = int((b.max(0) - b.min(0)).argmax())
        order = np.argsort(b[:, ch], kind="stable")
        vals = b[order, ch]
        half = len(b) // 2
        # split on a VALUE-run boundary nearest the count median so
        # equal channel values stay together (pure colors isolate)
        med = vals[half]
        lo = int(np.searchsorted(vals, med, side="left"))
        hi = int(np.searchsorted(vals, med, side="right"))
        split = lo if lo > 0 else hi
        boxes.append(b[order[:split]])
        boxes.append(b[order[split:]])
    pal = np.array([b.mean(axis=0) for b in boxes if len(b)])
    return np.clip(np.rint(pal), 0, 255).astype(np.uint8)


def nearest_palette_index(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """(..., 3) → palette indices (vectorized nearest in RGB space)."""
    flat = rgb.reshape(-1, 3).astype(np.int64)
    d = (
        (flat[:, None, :] - palette[None, :, :].astype(np.int64)) ** 2
    ).sum(-1)
    return d.argmin(axis=1).astype(np.uint8).reshape(rgb.shape[:-1])


def dither_rgb_to_pct(
    rgb: np.ndarray, palette: np.ndarray, serpentine: bool = True
) -> np.ndarray:
    """Floyd-Steinberg error diffusion onto a palette → (H, W) uint8
    index raster (GDALDitherRGB2PCT semantics)."""
    h, w, _ = rgb.shape
    work = rgb.astype(np.float64).copy()
    pal = palette.astype(np.float64)
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        rng_x = range(w - 1, -1, -1) if (serpentine and y % 2) else range(w)
        sign = -1 if (serpentine and y % 2) else 1
        for x in rng_x:
            old = np.clip(work[y, x], 0, 255)
            k = int(((pal - old) ** 2).sum(axis=1).argmin())
            out[y, x] = k
            err = old - pal[k]
            if 0 <= x + sign < w:
                work[y, x + sign] += err * (7 / 16)
            if y + 1 < h:
                if 0 <= x - sign < w:
                    work[y + 1, x - sign] += err * (3 / 16)
                work[y + 1, x] += err * (5 / 16)
                if 0 <= x + sign < w:
                    work[y + 1, x + sign] += err * (1 / 16)
    return out
