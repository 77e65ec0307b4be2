"""Pansharpening — the gdal_pansharpen weighted-Brovey algorithm
(reference: alg/gdalpansharpen.cpp: out_i = ms_i * pan / pseudo_pan
with pseudo_pan = sum(w_i * ms_i_upsampled); MS bands upsampled to
the pan grid with the interpolating warp kernels).

Lifts the round-1 Appendix-B descope: pure numpy + the engine's own
warp resampler; distributed form = per-pan-tile map_batches with the
MS bands broadcast (they are 1/ratio^2 the pan size)."""

from __future__ import annotations

import numpy as np

from gdal_ray.raster.warp import warp_array


def upsample(ms: np.ndarray, shape: tuple[int, int],
             method: str = "bilinear") -> np.ndarray:
    """MS band → pan grid via the engine's warp resampler (identity
    CRS, scaled geotransform)."""
    h, w = ms.shape
    H, W = shape
    # both grids share the world extent [0, W] x [0, H] in pan-pixel
    # units: one MS pixel spans (W/w, H/h) pan pixels
    gt_ms = (0.0, W / w, 0.0, 0.0, 0.0, H / h)
    return warp_array(
        ms.astype(np.float64), gt_ms, "EPSG:4326", shape,
        (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "EPSG:4326",
        method=method, approx=False,
    )


def pansharpen(
    pan: np.ndarray,
    ms_bands: list[np.ndarray],
    weights: list[float] | None = None,
    method: str = "bilinear",
    nodata: float | None = None,
) -> list[np.ndarray]:
    """Weighted-Brovey pansharpen → one sharpened band per MS input."""
    H, W = pan.shape
    n = len(ms_bands)
    if weights is None:
        weights = [1.0 / n] * n
    if len(weights) != n:
        raise ValueError("one weight per band")
    ups = [upsample(b, (H, W), method) for b in ms_bands]
    pseudo = np.zeros((H, W))
    for w_, b in zip(weights, ups):
        pseudo += w_ * b
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(pseudo != 0, pan.astype(np.float64) / pseudo, 0.0)
    out = [b * ratio for b in ups]
    if nodata is not None:
        mask = pan == nodata
        for b in out:
            b[mask] = nodata
    return out
