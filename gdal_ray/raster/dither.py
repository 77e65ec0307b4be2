"""8-bit palette quantization: median-cut palette computation +
error-diffusion dithering — the GDALComputeMedianCutPCT /
GDALDitherRGB2PCT roles (reference: alg/gdalmediancut.cpp,
alg/gdaldither.cpp).

Median cut is vectorized (numpy partitioning per box); dithering uses
the reference's integer error/6 left-to-right kernel (NOT classic
7/16-FS) — sequential per image by nature, run per tile/image inside
map_batches (the reference dithers whole images the same way)."""

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


def dither_rgb_to_pct(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """GDALDitherRGB2PCT error diffusion onto a palette → (H, W) uint8
    index raster. Reference-parity kernel (alg/gdaldither.cpp:427-634):
    strict left-to-right scan, integer error/6 distribution — per
    channel ``sixth = trunc(err/6)`` goes to next-line left and right
    neighbours, ``err - 5*sixth`` to next-line below, ``2*sixth``
    carries right on the same line — and L1 (sum-of-abs) nearest-color
    with first-wins ties (FindNearestColor, gdaldither.cpp:742-757).
    Sequential per image by nature; run per tile inside map_batches."""
    h, w, _ = rgb.shape
    pal = palette.astype(np.int64)
    src = rgb.astype(np.int64)
    out = np.zeros((h, w), dtype=np.uint8)
    # next-line error, one slot per pixel + 2 guard slots (ref layout:
    # slot i+1 feeds pixel i of the next line)
    pan = np.zeros((w + 2, 3), dtype=np.int64)
    cache: dict[int, int] = {}
    for y in range(h):
        line = np.clip(src[y] + pan[1:w + 1], 0, 255)
        pan[:] = 0
        last = np.zeros(3, dtype=np.int64)
        for i in range(w):
            v = np.clip(line[i] + last, 0, 255)
            code = int(v[0]) | (int(v[1]) << 8) | (int(v[2]) << 16)
            k = cache.get(code)
            if k is None:
                k = int(np.abs(pal - v).sum(axis=1).argmin())
                cache[code] = k
            out[y, i] = k
            err = v - pal[k]
            # C integer division truncates toward zero
            sixth = np.fix(err / 6).astype(np.int64)
            pan[i] += sixth                  # next line, pixel i-1
            pan[i + 2] = sixth               # next line, pixel i+1 (set)
            pan[i + 1] += err - 5 * sixth    # next line, pixel i
            last = 2 * sixth
    return out
