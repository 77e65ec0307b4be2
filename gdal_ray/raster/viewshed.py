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
    observer at pixel (ox, oy). Vectorized: all cells' rays are
    sampled in one padded (n_cells, n_samples) pass."""
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
    n_s = max(2, int(np.ceil(fd.max() * samples_per_cell)))
    # parametric samples strictly between observer and target
    t = (np.arange(1, n_s) / n_s)[None, :]
    sx = ox + (fx[:, None] - ox) * t
    sy = oy + (fy[:, None] - oy) * t
    terrain = _bilinear(dem, sx.ravel(), sy.ravel()).reshape(len(flat), -1)
    sight = oz + (ftz - oz)[:, None] * t
    # samples beyond each ray's own useful resolution still lie on the
    # segment, so the strict comparison stays correct for short rays
    blocked = (terrain > sight + 1e-9).any(axis=1)
    vis = np.zeros(h * w, dtype=bool)
    vis[flat] = ~blocked
    out |= vis.reshape(h, w) & in_range
    return out
