"""Mosaic — merge overlapping rasters into one grid
(gdalbuildvrt / `gdal raster mosaic`, apps/gdalbuildvrt_lib.cpp:2051).

Reference resolution rule: later sources paint over earlier ones
(last-wins per pixel), nodata pixels don't paint. Ray shape: each
source contributes tiles keyed by destination block; a
``groupby(dst_block)`` composites the contributions in source order —
no full materialization of any single raster.

Single-array helper + the distributed grouping stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.raster import model


def mosaic_arrays(
    sources: list[tuple[np.ndarray, tuple[float, ...]]],
    dst_gt: tuple[float, ...],
    dst_shape: tuple[int, int],
    nodata: float | None = None,
    init: float = 0.0,
) -> np.ndarray:
    """Paint sources (in order) onto the destination grid. Sources
    must share the dst CRS; alignment via geotransforms (nearest
    pixel)."""
    out = np.full(dst_shape, init, dtype=np.float64)
    h, w = dst_shape
    yy, xx = np.meshgrid(
        np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij"
    )
    wx, wy = model.pixel_to_world(dst_gt, xx.ravel(), yy.ravel())
    for arr, gt in sources:
        px, py = model.world_to_pixel(gt, wx, wy)
        xi = np.floor(px).astype(np.int64)
        yi = np.floor(py).astype(np.int64)
        ok = (xi >= 0) & (xi < arr.shape[1]) & (yi >= 0) & (yi < arr.shape[0])
        vals = np.full(len(wx), np.nan)
        vals[ok] = arr[yi[ok], xi[ok]].astype(np.float64)
        paint = ok.copy()
        if nodata is not None:
            paint &= vals != nodata
        flat = out.ravel()
        flat[paint] = vals[paint]
        out = flat.reshape(dst_shape)
    return out


class MosaicCompositor:
    """map_groups kernel: one group = all source tiles covering one
    destination block (key columns ``dst_bx, dst_by`` added upstream);
    composites in ``source_idx`` order."""

    def __init__(self, dst_gt, tile_size: int = 256, nodata: float | None = None,
                 init: float = 0.0):
        self.dst_gt = dst_gt
        self.ts = tile_size
        self.nodata = nodata
        self.init = init

    def __call__(self, group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["source_idx"])
        bx = rows[0]["dst_bx"]
        by = rows[0]["dst_by"]
        ts = self.ts
        gt = self.dst_gt
        block_gt = (
            gt[0] + bx * ts * gt[1],
            gt[1], gt[2],
            gt[3] + by * ts * gt[5],
            gt[4], gt[5],
        )
        srcs = []
        for r in rows:
            arr = model.tile_array(r)
            g0 = r["geotransform"]
            tile_gt = (
                g0[0] + r["x0"] * g0[1], g0[1], g0[2],
                g0[3] + r["y0"] * g0[5], g0[4], g0[5],
            )
            srcs.append((arr, tile_gt))
        out = mosaic_arrays(srcs, block_gt, (ts, ts), self.nodata, self.init)
        return pa.Table.from_pylist(
            [
                {
                    "band": 1, "block_x": int(bx), "block_y": int(by),
                    "x0": int(bx) * ts, "y0": int(by) * ts,
                    "width": ts, "height": ts, "crs": rows[0]["crs"],
                    "geotransform": list(self.dst_gt), "dtype": "float64",
                    "data": out.tobytes(),
                }
            ]
        )
