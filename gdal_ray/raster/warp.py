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


_AGG_METHODS = ("average", "sum", "rms", "min", "max", "med", "q1", "q3", "mode")


def warp_array_aggregate(
    src: np.ndarray,
    src_gt,
    src_crs: str,
    dst_shape: tuple[int, int],
    dst_gt,
    dst_crs: str,
    method: str = "average",
    nodata: float = np.nan,
    dst_y0: int = 0,
    dst_x0: int = 0,
) -> np.ndarray:
    """Aggregate-resampling warp — the GRA_Average/Mode/Min/Max/Med/
    Q1/Q3/Sum/RMS kernel family (reference: alg/gdalwarper.h:35-67,
    GWKAverageOrMode). Each destination pixel aggregates every source
    pixel whose CENTER falls inside the half-open source-space rect
    spanned by the transformed corners of that destination pixel.

    Windowed calls (``dst_x0/dst_y0`` + a window ``dst_shape``) use the
    exact per-corner transform, so tiled output == whole output
    bit-for-bit.

    Vectorization: average/sum/rms via integral images (O(1) per
    pixel); min/max via offset sweeps over the max rect size;
    med/q1/q3/mode via one padded gather + row-wise reduction."""
    if method not in _AGG_METHODS:
        raise ValueError(f"unknown aggregate method {method}")
    h, w = dst_shape
    H, W = src.shape
    ys = (np.arange(h + 1, dtype=np.float64) + dst_y0)
    xs = (np.arange(w + 1, dtype=np.float64) + dst_x0)
    YY, XX = np.meshgrid(ys, xs, indexing="ij")
    spx, spy = exact_transform(
        dst_gt, dst_crs, src_gt, src_crs, XX.ravel(), YY.ravel()
    )
    spx = spx.reshape(h + 1, w + 1)
    spy = spy.reshape(h + 1, w + 1)
    xmin = np.minimum.reduce([spx[:-1, :-1], spx[:-1, 1:], spx[1:, :-1], spx[1:, 1:]])
    xmax = np.maximum.reduce([spx[:-1, :-1], spx[:-1, 1:], spx[1:, :-1], spx[1:, 1:]])
    ymin = np.minimum.reduce([spy[:-1, :-1], spy[:-1, 1:], spy[1:, :-1], spy[1:, 1:]])
    ymax = np.maximum.reduce([spy[:-1, :-1], spy[:-1, 1:], spy[1:, :-1], spy[1:, 1:]])
    # source pixels with center i+0.5 in [min, max)
    j0 = np.clip(np.ceil(xmin - 0.5).astype(np.int64), 0, W)
    j1 = np.clip(np.ceil(xmax - 0.5).astype(np.int64), 0, W)
    i0 = np.clip(np.ceil(ymin - 0.5).astype(np.int64), 0, H)
    i1 = np.clip(np.ceil(ymax - 0.5).astype(np.int64), 0, H)
    empty = (j1 <= j0) | (i1 <= i0)

    v = src.astype(np.float64)
    valid = np.isfinite(v)
    if not np.isnan(nodata):
        valid &= v != nodata
    vz = np.where(valid, v, 0.0)

    if method in ("average", "sum", "rms"):
        def integral(a):
            out = np.zeros((H + 1, W + 1))
            np.cumsum(np.cumsum(a, axis=0), axis=1, out=out[1:, 1:])
            return out

        def rectsum(ii):
            return (
                ii[i1, j1] - ii[i0, j1] - ii[i1, j0] + ii[i0, j0]
            )

        cnt = rectsum(integral(valid.astype(np.float64)))
        good = (~empty) & (cnt > 0)
        if method == "sum":
            res = rectsum(integral(vz))
        elif method == "average":
            res = np.divide(
                rectsum(integral(vz)), cnt,
                out=np.zeros_like(cnt), where=good,
            )
        else:  # rms
            res = np.sqrt(
                np.divide(
                    rectsum(integral(vz * vz)), cnt,
                    out=np.zeros_like(cnt), where=good,
                )
            )
        return np.where(good, res, nodata)

    if method in ("min", "max"):
        acc = np.full((h, w), np.inf if method == "min" else -np.inf)
        any_valid = np.zeros((h, w), dtype=bool)
        max_dh = int((i1 - i0).max(initial=0))
        max_dw = int((j1 - j0).max(initial=0))
        for di in range(max_dh):
            ii = i0 + di
            row_ok = ii < i1
            for dj in range(max_dw):
                jj = j0 + dj
                ok = row_ok & (jj < j1)
                iic = np.clip(ii, 0, H - 1)
                jjc = np.clip(jj, 0, W - 1)
                ok &= valid[iic, jjc]
                vv = v[iic, jjc]
                if method == "min":
                    acc = np.where(ok, np.minimum(acc, vv), acc)
                else:
                    acc = np.where(ok, np.maximum(acc, vv), acc)
                any_valid |= ok
        return np.where(any_valid, acc, nodata)

    # med / q1 / q3 / mode: padded gather (npix, maxrect)
    max_dh = int((i1 - i0).max(initial=0))
    max_dw = int((j1 - j0).max(initial=0))
    m = max(1, max_dh * max_dw)
    gat = np.full((h * w, m), np.nan)
    slot = 0
    for di in range(max_dh):
        ii = (i0 + di).ravel()
        row_ok = ii < i1.ravel()
        for dj in range(max_dw):
            jj = (j0 + dj).ravel()
            ok = row_ok & (jj < j1.ravel())
            iic = np.clip(ii, 0, H - 1)
            jjc = np.clip(jj, 0, W - 1)
            ok &= valid[iic, jjc]
            gat[ok, slot] = v[iic[ok], jjc[ok]]
            slot += 1
    cnt = np.sum(~np.isnan(gat), axis=1)
    good = cnt > 0
    out = np.full(h * w, nodata, dtype=np.float64)
    if method in ("med", "q1", "q3"):
        qq = {"med": 50.0, "q1": 25.0, "q3": 75.0}[method]
        with np.errstate(all="ignore"):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                out_q = np.nanpercentile(gat, qq, axis=1)
        out[good] = out_q[good]
    else:  # mode: most frequent value, smallest value wins ties
        s = np.sort(gat, axis=1)  # NaNs sort to the end
        best_val = np.full(h * w, np.nan)
        best_run = np.zeros(h * w, dtype=np.int64)
        run = np.zeros(h * w, dtype=np.int64)
        prev = np.full(h * w, np.nan)
        for c in range(m):
            col = s[:, c]
            is_new = ~np.isclose(col, prev, equal_nan=False) | np.isnan(prev)
            run = np.where(np.isnan(col), 0, np.where(is_new, 1, run + 1))
            take = (~np.isnan(col)) & (run > best_run)
            best_run = np.where(take, run, best_run)
            best_val = np.where(take, col, best_val)
            prev = col
        out[good] = best_val[good]
    return out.reshape(h, w)


class GCPTransformer:
    """Ground-control-point polynomial transformer — the
    GDALGCPTransformer role (alg/gdal_crs.cpp): least-squares fit of
    order-1 (affine) or order-2 polynomials mapping pixel/line ↔
    geo X/Y from the GCP set, both directions fitted independently
    (the reference's CRS_compute_georef_equations).

    GCPs: iterable of (pixel, line, geo_x, geo_y).
    """

    def __init__(self, gcps, order: int = 1):
        if order not in (1, 2):
            raise ValueError("order must be 1 or 2")
        g = np.asarray(gcps, dtype=np.float64)
        need = 3 if order == 1 else 6
        if len(g) < need:
            raise ValueError(f"order {order} needs >= {need} GCPs")
        self.order = order
        px, py, gx, gy = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
        A_fwd = self._design(px, py)
        A_inv = self._design(gx, gy)
        self.cx, *_ = np.linalg.lstsq(A_fwd, gx, rcond=None)
        self.cy, *_ = np.linalg.lstsq(A_fwd, gy, rcond=None)
        self.ix, *_ = np.linalg.lstsq(A_inv, px, rcond=None)
        self.iy, *_ = np.linalg.lstsq(A_inv, py, rcond=None)
        # fit quality (max residual in geo units) for callers to gate on
        self.max_residual = float(
            np.max(np.hypot(A_fwd @ self.cx - gx, A_fwd @ self.cy - gy))
        )

    def _design(self, u, v):
        cols = [np.ones_like(u), u, v]
        if self.order == 2:
            cols += [u * v, u * u, v * v]
        return np.column_stack(cols)

    def pixel_to_geo(self, px, py):
        A = self._design(np.asarray(px, np.float64), np.asarray(py, np.float64))
        return A @ self.cx, A @ self.cy

    def geo_to_pixel(self, gx, gy):
        A = self._design(np.asarray(gx, np.float64), np.asarray(gy, np.float64))
        return A @ self.ix, A @ self.iy

    def as_geotransform(self):
        """Order-1 fit → the equivalent GDAL geotransform tuple
        (GDALGCPsToGeoTransform role)."""
        if self.order != 1:
            raise ValueError("geotransform requires order 1")
        c0x, c1x, c2x = self.cx
        c0y, c1y, c2y = self.cy
        return (c0x, c1x, c2x, c0y, c1y, c2y)


class TPSTransformer:
    """Thin-plate-spline transformer — the GDALTPSTransformer role
    (alg/gdal_tps.cpp; kernel U(r) = r^2 log r^2 with an affine part,
    both directions fitted independently).  Interpolates the GCPs
    exactly; smooth in between."""

    def __init__(self, gcps):
        g = np.asarray(gcps, dtype=np.float64)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = self._fit(g[:, 0:2], g[:, 2:4])
        self._inv = self._fit(g[:, 2:4], g[:, 0:2])

    @staticmethod
    def _kernel(r2):
        with np.errstate(divide="ignore", invalid="ignore"):
            k = r2 * np.log(r2)
        return np.where(r2 > 0, k, 0.0)

    def _fit(self, src, dst):
        n = len(src)
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
        K = self._kernel(d2)
        P = np.column_stack([np.ones(n), src])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        coef = np.linalg.solve(A, rhs)
        return (src.copy(), coef)

    @staticmethod
    def _apply(model, pts):
        src, coef = model
        pts = np.asarray(pts, dtype=np.float64)
        d2 = ((pts[:, None, :] - src[None, :, :]) ** 2).sum(-1)
        K = TPSTransformer._kernel(d2)
        P = np.column_stack([np.ones(len(pts)), pts])
        out = K @ coef[: len(src)] + P @ coef[len(src):]
        return out[:, 0], out[:, 1]

    def pixel_to_geo(self, px, py):
        pts = np.column_stack([np.asarray(px, np.float64),
                               np.asarray(py, np.float64)])
        return self._apply(self._fwd, pts)

    def geo_to_pixel(self, gx, gy):
        pts = np.column_stack([np.asarray(gx, np.float64),
                               np.asarray(gy, np.float64)])
        return self._apply(self._inv, pts)


class RPCTransformer:
    """Rational Polynomial Coefficients transformer — the
    GDALRPCTransformer role (alg/gdal_rpc.cpp): the RPC00B satellite
    model, (lat, lng, height) → (line, sample) through four cubic
    20-coefficient polynomials with offset/scale normalization;
    ground→image is the model's native direction, image→ground
    inverts per point by damped Newton iteration on the 2x2 Jacobian
    (finite differences), matching the reference's iterative inverse.

    ``rpc``: dict with LINE_OFF/_SCALE, SAMP_OFF/_SCALE, LAT_OFF/
    _SCALE, LONG_OFF/_SCALE, HEIGHT_OFF/_SCALE and the four
    20-element arrays LINE_NUM/LINE_DEN/SAMP_NUM/SAMP_DEN_COEFF.
    """

    _TERMS = (
        # RPC00B ordering of the 20 cubic terms in (L=long, P=lat, H)
        lambda L, P, H: np.ones_like(L),
        lambda L, P, H: L, lambda L, P, H: P, lambda L, P, H: H,
        lambda L, P, H: L * P, lambda L, P, H: L * H,
        lambda L, P, H: P * H, lambda L, P, H: L * L,
        lambda L, P, H: P * P, lambda L, P, H: H * H,
        lambda L, P, H: P * L * H, lambda L, P, H: L ** 3,
        lambda L, P, H: L * P * P, lambda L, P, H: L * H * H,
        lambda L, P, H: L * L * P, lambda L, P, H: P ** 3,
        lambda L, P, H: P * H * H, lambda L, P, H: L * L * H,
        lambda L, P, H: P * P * H, lambda L, P, H: H ** 3,
    )

    def __init__(self, rpc: dict):
        self.rpc = {k: np.asarray(v, np.float64) if hasattr(v, "__len__")
                    else float(v) for k, v in rpc.items()}
        for k in ("LINE_NUM_COEFF", "LINE_DEN_COEFF", "SAMP_NUM_COEFF",
                  "SAMP_DEN_COEFF"):
            if len(self.rpc[k]) != 20:
                raise ValueError(f"{k} must have 20 coefficients")

    def _poly(self, coeff, L, P, H):
        out = np.zeros_like(L)
        for c, term in zip(coeff, self._TERMS):
            if c != 0.0:
                out = out + c * term(L, P, H)
        return out

    def ground_to_image(self, lng, lat, height=0.0):
        r = self.rpc
        L = (np.asarray(lng, np.float64) - r["LONG_OFF"]) / r["LONG_SCALE"]
        P = (np.asarray(lat, np.float64) - r["LAT_OFF"]) / r["LAT_SCALE"]
        H = (np.asarray(height, np.float64) - r["HEIGHT_OFF"]) / r["HEIGHT_SCALE"]
        H = np.broadcast_to(H, L.shape).astype(np.float64)
        line = self._poly(r["LINE_NUM_COEFF"], L, P, H) / self._poly(
            r["LINE_DEN_COEFF"], L, P, H
        )
        samp = self._poly(r["SAMP_NUM_COEFF"], L, P, H) / self._poly(
            r["SAMP_DEN_COEFF"], L, P, H
        )
        return (
            samp * r["SAMP_SCALE"] + r["SAMP_OFF"],
            line * r["LINE_SCALE"] + r["LINE_OFF"],
        )

    def image_to_ground(self, samp, line, height=0.0, iters: int = 12):
        r = self.rpc
        samp = np.asarray(samp, np.float64)
        line = np.asarray(line, np.float64)
        lng = np.full_like(samp, r["LONG_OFF"])
        lat = np.full_like(samp, r["LAT_OFF"])
        eps_lng = r["LONG_SCALE"] * 1e-7
        eps_lat = r["LAT_SCALE"] * 1e-7
        for _ in range(iters):
            s0, l0 = self.ground_to_image(lng, lat, height)
            fx = s0 - samp
            fy = l0 - line
            sx1, lx1 = self.ground_to_image(lng + eps_lng, lat, height)
            sy1, ly1 = self.ground_to_image(lng, lat + eps_lat, height)
            j11 = (sx1 - s0) / eps_lng
            j12 = (sy1 - s0) / eps_lat
            j21 = (lx1 - l0) / eps_lng
            j22 = (ly1 - l0) / eps_lat
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            lng = lng - (j22 * fx - j12 * fy) / det
            lat = lat - (-j21 * fx + j11 * fy) / det
        return lng, lat


class GeoLocTransformer:
    """Geolocation-array transformer — the GDALCreateGeoLocTransformer
    role (alg/gdalgeoloc.cpp): per-node lon/lat arrays (satellite
    swath GEOLOCATION metadata) define pixel/line ↔ geo.

    Forward (pixel_to_geo): bilinear interpolation in the geoloc
    arrays at array coords (px − PIXEL_OFFSET)/PIXEL_STEP (the
    reference's GDALGeoLoc<>::PixelLineToGeoLoc).

    Inverse (geo_to_pixel): a regular BACKMAP over the geo bounding
    box seeded by splatting the geoloc nodes (GeoLocGenerateBackMap,
    alg/gdalgeoloc.cpp:1013 — here with inverse-distance node
    weights and ring-dilation hole fill), then refined per query by
    damped Gauss-Newton on the forward mapping (the reference's
    post-3.5 iterative update) to sub-1e-3-pixel accuracy inside the
    swath.  Points outside the swath return NaN.

    Construction is once-per-worker (actor ``__init__`` /
    per-process cache), queries are vectorized — the stateful-stage
    pattern of SURVEY.md §2.3.
    """

    def __init__(self, lon: np.ndarray, lat: np.ndarray,
                 pixel_offset: float = 0.0, line_offset: float = 0.0,
                 pixel_step: float = 1.0, line_step: float = 1.0,
                 oversample: float = 1.3):
        self.lon = np.asarray(lon, np.float64)
        self.lat = np.asarray(lat, np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2:
            raise ValueError("lon/lat must be equal-shape 2-D arrays")
        self.px_off, self.ln_off = float(pixel_offset), float(line_offset)
        self.px_step, self.ln_step = float(pixel_step), float(line_step)
        gh, gw = self.lon.shape
        # --- backmap (geo grid -> fractional geoloc-array coords) ----
        self.bm_w = max(4, int(gw * oversample))
        self.bm_h = max(4, int(gh * oversample))
        minx, maxx = float(self.lon.min()), float(self.lon.max())
        miny, maxy = float(self.lat.min()), float(self.lat.max())
        padx = (maxx - minx) * 0.05 + 1e-9
        pady = (maxy - miny) * 0.05 + 1e-9
        self.bm_x0, self.bm_y0 = minx - padx, miny - pady
        self.bm_dx = (maxx - minx + 2 * padx) / self.bm_w
        self.bm_dy = (maxy - miny + 2 * pady) / self.bm_h
        accw = np.zeros((self.bm_h, self.bm_w))
        accx = np.zeros((self.bm_h, self.bm_w))
        accy = np.zeros((self.bm_h, self.bm_w))
        jj, ii = np.meshgrid(np.arange(gh, dtype=np.float64),
                             np.arange(gw, dtype=np.float64), indexing="ij")
        bx = (self.lon.ravel() - self.bm_x0) / self.bm_dx - 0.5
        by = (self.lat.ravel() - self.bm_y0) / self.bm_dy - 0.5
        ix = np.clip(np.round(bx).astype(np.int64), 0, self.bm_w - 1)
        iy = np.clip(np.round(by).astype(np.int64), 0, self.bm_h - 1)
        d = np.hypot(bx - ix, by - iy)
        w = 1.0 / (d + 1e-3)
        np.add.at(accw, (iy, ix), w)
        np.add.at(accx, (iy, ix), w * ii.ravel())
        np.add.at(accy, (iy, ix), w * jj.ravel())
        filled = accw > 0
        bmx = np.where(filled, accx / np.where(filled, accw, 1.0), np.nan)
        bmy = np.where(filled, accy / np.where(filled, accw, 1.0), np.nan)
        # ring-dilation hole fill (bounded passes)
        for _ in range(max(self.bm_w, self.bm_h)):
            holes = np.isnan(bmx)
            if not holes.any():
                break
            for arr in (bmx, bmy):
                p = np.pad(arr, 1, constant_values=np.nan)
                stack = np.stack([p[:-2, 1:-1], p[2:, 1:-1],
                                  p[1:-1, :-2], p[1:-1, 2:]])
                import warnings

                with np.errstate(invalid="ignore"), warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    mean = np.nanmean(stack, axis=0)
                arr[holes] = mean[holes]
            if np.isnan(bmx).sum() == holes.sum():
                break  # isolated — nothing reachable
        self.bmx, self.bmy = bmx, bmy

    def _bilinear(self, arr, fx, fy):
        gh, gw = arr.shape
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, gw - 2)
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, gh - 2)
        tx = np.clip(fx - x0, 0.0, 1.0)
        ty = np.clip(fy - y0, 0.0, 1.0)
        return ((1 - ty) * ((1 - tx) * arr[y0, x0] + tx * arr[y0, x0 + 1])
                + ty * ((1 - tx) * arr[y0 + 1, x0] + tx * arr[y0 + 1, x0 + 1]))

    def _geoloc_coords(self, px, py):
        return ((np.asarray(px, np.float64) - self.px_off) / self.px_step,
                (np.asarray(py, np.float64) - self.ln_off) / self.ln_step)

    def pixel_to_geo(self, px, py):
        fx, fy = self._geoloc_coords(px, py)
        return self._bilinear(self.lon, fx, fy), self._bilinear(self.lat, fx, fy)

    def _fwd_arr(self, fx, fy):
        return (self._bilinear(self.lon, fx, fy),
                self._bilinear(self.lat, fx, fy))

    def geo_to_pixel(self, gx, gy, iters: int = 8):
        gx = np.asarray(gx, np.float64)
        gy = np.asarray(gy, np.float64)
        bx = np.clip((gx - self.bm_x0) / self.bm_dx - 0.5, 0, self.bm_w - 1.001)
        by = np.clip((gy - self.bm_y0) / self.bm_dy - 0.5, 0, self.bm_h - 1.001)
        fx = self._bilinear(self.bmx, bx, by)
        fy = self._bilinear(self.bmy, bx, by)
        bad = ~(np.isfinite(fx) & np.isfinite(fy))
        fx = np.where(bad, 0.0, fx)
        fy = np.where(bad, 0.0, fy)
        eps = 1e-3
        for _ in range(iters):
            lx, ly = self._fwd_arr(fx, fy)
            rx, ry = lx - gx, ly - gy
            j11 = (self._bilinear(self.lon, fx + eps, fy) - lx) / eps
            j12 = (self._bilinear(self.lon, fx, fy + eps) - lx) / eps
            j21 = (self._bilinear(self.lat, fx + eps, fy) - ly) / eps
            j22 = (self._bilinear(self.lat, fx, fy + eps) - ly) / eps
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, np.nan, det)
            with np.errstate(invalid="ignore"):
                fx = fx - (j22 * rx - j12 * ry) / det
                fy = fy - (-j21 * rx + j11 * ry) / det
            # degenerate Jacobian (flat hole-filled backmap region) →
            # park the point; the final residual check rejects it
            diverged = ~(np.isfinite(fx) & np.isfinite(fy))
            bad |= diverged
            fx = np.where(diverged, 0.0, fx)
            fy = np.where(diverged, 0.0, fy)
            gh, gw = self.lon.shape
            fx = np.clip(fx, 0.0, gw - 1.0)
            fy = np.clip(fy, 0.0, gh - 1.0)
        # reject points that failed to converge (outside the swath)
        lx, ly = self._fwd_arr(fx, fy)
        tol = 2.0 * max(abs(self.bm_dx), abs(self.bm_dy))
        ok = (np.hypot(lx - gx, ly - gy) < tol) & ~bad
        px = self.px_off + fx * self.px_step
        py = self.ln_off + fy * self.ln_step
        return np.where(ok, px, np.nan), np.where(ok, py, np.nan)
