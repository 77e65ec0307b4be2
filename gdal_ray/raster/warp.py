"""Warp / reprojection — the gdalwarp core (SURVEY.md §2.9, §3.2).

Semantics reproduced from the reference:
- per-destination-pixel INVERSE mapping: dst pixel center → dst CRS →
  src CRS → src pixel (GDALCreateGenImgProjTransformer chain,
  alg/gdaltransformer.cpp:1253: inverse-dst-geotransform ∘
  CRS-transform ∘ src-geotransform);
- resampling at the src location with the engine's
  InterpolateAtPoint-compatible kernels (nearest/bilinear —
  gdal_ray.raster.sample);
- the APPROX transformer contract (alg/gdaltransformer.cpp:4019 +
  apps/gdalwarp_lib.cpp:1598): evaluate the exact transform on a
  coarse grid and bilinearly interpolate between grid nodes, keeping
  max error ≤ 0.125 px (verified by sampling in tests);
- output grid discovery ``suggested_warp_output``
  (GDALSuggestedWarpOutput2, alg/gdaltransformer.cpp:342): transform a
  21×21 sample of the source edges+interior, take the dst bbox, pick a
  square pixel size that preserves the source diagonal pixel count.

Distribution: ``warp_array`` is the per-dst-tile kernel; the pipeline
maps it over dst tile rows with the source tile(s) gathered per tile
(broadcast for small sources — the chunk loop of
GDALWarpOperation::ChunkAndWarpImage becomes the tile grid).
"""

from __future__ import annotations

import numpy as np

from gdal_ray.proj import Transformer
from gdal_ray.raster import model, sample


def suggested_warp_output(
    src_shape: tuple[int, int],
    src_gt: tuple[float, ...],
    src_crs: str,
    dst_crs: str,
    samples: int = 21,
) -> tuple[tuple[int, int], tuple[float, ...]]:
    """→ ((height, width), dst geotransform) for the reprojected grid."""
    h, w = src_shape
    px = np.linspace(0, w, samples)
    py = np.linspace(0, h, samples)
    PX, PY = np.meshgrid(px, py)
    sx, sy = model.pixel_to_world(src_gt, PX.ravel(), PY.ravel())
    t = Transformer.from_crs(src_crs, dst_crs)
    dx, dy, ok = t.transform_with_errors(sx, sy)
    dx, dy = dx[ok], dy[ok]
    if len(dx) == 0:
        raise ValueError("no source sample transforms successfully")
    minx, maxx = dx.min(), dx.max()
    miny, maxy = dy.min(), dy.max()
    # preserve the source diagonal pixel count (GDALSuggestedWarpOutput
    # preserves approximate resolution)
    diag_px = float(np.hypot(w, h))
    diag_world = float(np.hypot(maxx - minx, maxy - miny))
    pix = diag_world / diag_px
    out_w = max(1, int(np.ceil((maxx - minx) / pix)))
    out_h = max(1, int(np.ceil((maxy - miny) / pix)))
    gt = (minx, pix, 0.0, maxy, 0.0, -pix)
    return (out_h, out_w), gt


class ApproxGridTransform:
    """The approx transformer: exact dst-pixel→src-pixel transform on
    a coarse node grid, bilinear interpolation in between (same
    error-bound contract as GDALCreateApproxTransformer; default node
    step chosen so interpolation error stays ≤ 0.125 px for smooth
    CRS transforms)."""

    MAX_ERROR_PX = 0.125  # apps/gdalwarp_lib.cpp:1598 default

    def __init__(
        self,
        dst_shape: tuple[int, int],
        dst_gt,
        dst_crs: str,
        src_gt,
        src_crs: str,
        step: int = 16,
    ):
        h, w = dst_shape
        t = Transformer.from_crs(dst_crs, src_crs)

        def build(step):
            gx = np.arange(0, w + step, step, dtype=np.float64)
            gy = np.arange(0, h + step, step, dtype=np.float64)
            GX, GY = np.meshgrid(gx, gy)
            wx, wy = model.pixel_to_world(dst_gt, GX.ravel(), GY.ravel())
            sx, sy, _ = t.transform_with_errors(wx, wy)
            spx, spy = model.world_to_pixel(src_gt, sx, sy)
            return gx, gy, spx.reshape(len(gy), len(gx)), spy.reshape(len(gy), len(gx))

        # adaptive refinement: halve the node step until the grid-cell
        # MIDPOINT error is within the 0.125-px contract (the reference
        # approx transformer subdivides on the same criterion,
        # alg/gdaltransformer.cpp GDALApproxTransform)
        while True:
            self.step = step
            self.gx, self.gy, self.node_x, self.node_y = build(step)
            if step <= 2:
                break
            mx = (self.gx[:-1] + self.gx[1:]) / 2.0
            my = (self.gy[:-1] + self.gy[1:]) / 2.0
            MX, MY = np.meshgrid(mx, my)
            ax, ay = self(MX.ravel(), MY.ravel())
            wx, wy = model.pixel_to_world(dst_gt, MX.ravel(), MY.ravel())
            sx, sy, _ = t.transform_with_errors(wx, wy)
            ex, ey = model.world_to_pixel(src_gt, sx, sy)
            err = np.hypot(ax - ex, ay - ey)
            if np.nanmax(err) <= self.MAX_ERROR_PX * 0.5:
                break
            step = max(2, step // 2)

    def __call__(self, px: np.ndarray, py: np.ndarray):
        """dst pixel coords → src pixel coords (bilinear between
        nodes)."""
        step = self.step
        ix = np.clip((px / step).astype(np.int64), 0, len(self.gx) - 2)
        iy = np.clip((py / step).astype(np.int64), 0, len(self.gy) - 2)
        tx = px / step - ix
        ty = py / step - iy
        def bil(node):
            v00 = node[iy, ix]
            v01 = node[iy, ix + 1]
            v10 = node[iy + 1, ix]
            v11 = node[iy + 1, ix + 1]
            return (v00 * (1 - tx) + v01 * tx) * (1 - ty) + (
                v10 * (1 - tx) + v11 * tx
            ) * ty
        return bil(self.node_x), bil(self.node_y)


def exact_transform(dst_gt, dst_crs, src_gt, src_crs, px, py):
    wx, wy = model.pixel_to_world(dst_gt, px, py)
    t = Transformer.from_crs(dst_crs, src_crs)
    sx, sy, _ = t.transform_with_errors(wx, wy)
    return model.world_to_pixel(src_gt, sx, sy)


def warp_array(
    src: np.ndarray,
    src_gt,
    src_crs: str,
    dst_shape: tuple[int, int],
    dst_gt,
    dst_crs: str,
    method: str = "nearest",
    nodata: float = 0.0,
    approx: bool = True,
    approx_step: int = 16,
    dst_y0: int = 0,
    dst_x0: int = 0,
) -> np.ndarray:
    """Warp one source array onto a destination window.

    ``dst_x0/dst_y0`` offset the window inside the full dst grid (the
    per-tile distributed case: each task warps its own window with the
    FULL dst geotransform — tiles stay independent)."""
    h, w = dst_shape
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float64) + dst_y0 + 0.5,
        np.arange(w, dtype=np.float64) + dst_x0 + 0.5,
        indexing="ij",
    )
    if approx:
        full_h = h + dst_y0
        full_w = w + dst_x0
        tr = ApproxGridTransform(
            (full_h, full_w), dst_gt, dst_crs, src_gt, src_crs, approx_step
        )
        spx, spy = tr(xx.ravel(), yy.ravel())
    else:
        spx, spy = exact_transform(dst_gt, dst_crs, src_gt, src_crs,
                                   xx.ravel(), yy.ravel())
    vals, ok = sample.sample_points(src, spx, spy, method=method)
    out = np.full(h * w, nodata, dtype=np.float64)
    out[ok] = vals[ok]
    return out.reshape(h, w).astype(src.dtype if src.dtype.kind == "f" else np.float64)
