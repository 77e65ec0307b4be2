"""Viewshed / line-of-sight over a DEM — the gdal_viewshed role
(reference: alg/viewshed.cpp).  Sampled-ray LOS semantics: a cell is
visible iff no sampled point strictly between observer and target
rises above the sight line (bilinear DEM interpolation along the ray,
sub-cell sampling).  The reference's Wang et al. plane-sweep is an
optimization of the same visibility definition; this implementation
is the vectorized exact-sampling form, radius-limited, with
observer/target height offsets.

Distributed form: each tile computes LOS for its own targets against
the broadcast observer + the DEM band it needs (rays are
observer-centred, so per-tile work needs the sub-rect between tile
and observer — the sampling indices below already express that)."""

from __future__ import annotations

import numpy as np


def _bilinear(dem: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = dem.shape
    x = np.clip(x, 0, w - 1.000001)
    y = np.clip(y, 0, h - 1.000001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = x - x0
    fy = y - y0
    return (
        dem[y0, x0] * (1 - fx) * (1 - fy)
        + dem[y0, x0 + 1] * fx * (1 - fy)
        + dem[y0 + 1, x0] * (1 - fx) * fy
        + dem[y0 + 1, x0 + 1] * fx * fy
    )


def viewshed(
    dem: np.ndarray,
    ox: float,
    oy: float,
    observer_height: float = 2.0,
    target_height: float = 0.0,
    radius: float | None = None,
    samples_per_cell: float = 2.0,
) -> np.ndarray:
    """→ bool (H, W): True where the cell center is visible from the
    observer at pixel (ox, oy). Vectorized: cells are processed in
    distance-sorted ~8k chunks, each sampled at its own ray length,
    so memory is O(chunk × longest-ray-in-chunk) — a 1024² DEM peaks
    around tens of MB instead of tens of GB. Still O(n·d) compute;
    for DEMs much beyond ~4k² use a radius limit (as gdal_viewshed
    requires via -md) or tile the targets."""
    h, w = dem.shape
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    dx = xx - ox
    dy = yy - oy
    dist = np.hypot(dx, dy)
    oz = _bilinear(dem, np.array([ox]), np.array([oy]))[0] + observer_height
    tz = dem + target_height
    out = np.zeros((h, w), dtype=bool)
    in_range = (
        dist <= (radius if radius is not None else np.inf)
    )
    # observer's own cell is visible
    near = dist < 1e-9
    out |= near & in_range

    flat = np.flatnonzero(in_range.ravel() & ~near.ravel())
    if len(flat) == 0:
        return out
    fx = xx.ravel()[flat]
    fy = yy.ravel()[flat]
    fd = dist.ravel()[flat]
    ftz = tz.ravel()[flat]
    vis = np.zeros(h * w, dtype=bool)
    # ADVICE r2: one (n_cells, n_samples_global_max) matrix OOMs on
    # real DEMs (1024² × ~2900 samples ≈ 24 GB). Process cells in
    # distance-sorted chunks so each chunk's sample count matches its
    # OWN longest ray, and the working set stays ≲ _CHUNK × n_s × 8 B
    # (≈ tens of MB). Sorting by distance keeps short rays from
    # paying for the longest ray in the image.
    order = np.argsort(fd, kind="stable")
    _CHUNK = 8192
    for s in range(0, len(order), _CHUNK):
        idx = order[s:s + _CHUNK]
        cd = fd[idx]
        n_s = max(2, int(np.ceil(cd.max() * samples_per_cell)))
        # parametric samples strictly between observer and target
        t = (np.arange(1, n_s) / n_s)[None, :]
        sx = ox + (fx[idx, None] - ox) * t
        sy = oy + (fy[idx, None] - oy) * t
        terrain = _bilinear(dem, sx.ravel(), sy.ravel()).reshape(len(idx), -1)
        sight = oz + (ftz[idx] - oz)[:, None] * t
        # samples beyond each ray's own useful resolution still lie on
        # the segment, so the strict comparison stays correct for
        # short rays
        blocked = (terrain > sight + 1e-9).any(axis=1)
        vis[flat[idx]] = ~blocked
    out |= vis.reshape(h, w) & in_range
    return out
