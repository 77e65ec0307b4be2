"""gdal_translate core ops: band select, window crop, resize, rescale,
type conversion (apps/gdal_translate_lib.cpp roles -b -srcwin -projwin
-outsize -scale -ot -a_nodata).

Array-level ``translate()`` mirrors the reference's single-process
semantics exactly; ``translate_dataset`` applies it over the engine's
tile-table Datasets (assemble window → subset → re-tile), which is the
right shape because -srcwin/-projwin output is bounded by the window,
not the input.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.raster.kernels import set_type


__all__ = ["translate", "translate_dataset"]


def _parse_outsize(v, full: int) -> int:
    """'50%' | int | 0 (keep ratio handled by caller)."""
    if isinstance(v, str) and v.endswith("%"):
        return max(1, int(round(full * float(v[:-1]) / 100.0)))
    return int(v)


def translate(
    bands: list[np.ndarray],
    gt: tuple[float, ...],
    band_list: list[int] | None = None,
    srcwin: tuple[int, int, int, int] | None = None,
    projwin: tuple[float, float, float, float] | None = None,
    outsize: tuple | None = None,
    resample: str = "nearest",
    scale: tuple[float, float, float, float] | None = None,
    ot: str | None = None,
    nodata: float = 0.0,
) -> tuple[list[np.ndarray], tuple[float, ...]]:
    """Subset/resize bands; returns (bands', geotransform').

    - ``band_list``: 1-based band numbers in output order (-b).
    - ``srcwin``: (xoff, yoff, xsize, ysize) pixel window (-srcwin).
    - ``projwin``: (ulx, uly, lrx, lry) georeferenced window (-projwin)
      — converted to the enclosing srcwin exactly like the reference
      (floor(ul)+ceil(extent), gdal_translate_lib.cpp:1376 role).
    - ``outsize``: (w, h) where entries are ints or 'NN%'; 0 keeps the
      aspect ratio from the other axis (-outsize).
    - ``scale``: (src_min, src_max, dst_min, dst_max) linear rescale.
    - ``ot``: output dtype name; float→int uses GDALCopyWords
      half-away-from-zero rounding via kernels.set_type.
    """
    if geotransform_rotated(gt):
        raise ValueError("rotated geotransforms not supported")
    if band_list:
        bands = [bands[b - 1] for b in band_list]
    h, w = bands[0].shape

    if projwin is not None:
        if srcwin is not None:
            raise ValueError("srcwin and projwin are mutually exclusive")
        ulx, uly, lrx, lry = projwin
        xoff = int(np.floor((ulx - gt[0]) / gt[1] + 1e-8))
        yoff = int(np.floor((uly - gt[3]) / gt[5] + 1e-8))
        xsz = int(np.ceil((lrx - ulx) / gt[1] - 1e-8))
        ysz = int(np.ceil((lry - uly) / gt[5] - 1e-8))
        srcwin = (xoff, yoff, xsz, ysz)
    if srcwin is not None:
        xoff, yoff, xsz, ysz = srcwin
        if xoff < 0 or yoff < 0 or xoff + xsz > w or yoff + ysz > h:
            raise ValueError(f"window {srcwin} outside raster {w}x{h}")
        bands = [b[yoff : yoff + ysz, xoff : xoff + xsz] for b in bands]
        gt = (gt[0] + xoff * gt[1], gt[1], gt[2],
              gt[3] + yoff * gt[5], gt[4], gt[5])
        h, w = ysz, xsz

    if outsize is not None:
        ow = _parse_outsize(outsize[0], w) if outsize[0] else 0
        oh = _parse_outsize(outsize[1], h) if outsize[1] else 0
        if ow == 0 and oh == 0:
            raise ValueError("outsize needs at least one non-zero axis")
        if ow == 0:
            ow = max(1, int(round(w * oh / h)))
        if oh == 0:
            oh = max(1, int(round(h * ow / w)))
        dst_gt = (gt[0], gt[1] * w / ow, gt[2],
                  gt[3], gt[4], gt[5] * h / oh)
        # same-CRS resize: dst pixel centers → src pixel coords
        # directly (no CRS transform), then the shared sampling kernels
        yy, xx = np.meshgrid(
            (np.arange(oh, dtype=np.float64) + 0.5) * h / oh,
            (np.arange(ow, dtype=np.float64) + 0.5) * w / ow,
            indexing="ij",
        )
        from gdal_ray.raster import sample as _sample

        resized = []
        for b in bands:
            vals, ok = _sample.sample_points(
                b, xx.ravel(), yy.ravel(), method=resample)
            out = np.full(oh * ow, nodata, dtype=np.float64)
            out[ok] = vals[ok]
            resized.append(
                out.reshape(oh, ow).astype(
                    b.dtype if resample == "nearest" else np.float64))
        bands = resized
        gt = dst_gt

    if scale is not None:
        smin, smax, dmin, dmax = scale
        k = (dmax - dmin) / (smax - smin) if smax != smin else 0.0
        bands = [b.astype(np.float64) * k + (dmin - smin * k) for b in bands]

    if ot is not None:
        bands = [set_type(np.asarray(b), ot) for b in bands]
    return bands, gt


def geotransform_rotated(gt) -> bool:
    return bool(gt[2]) or bool(gt[4])


def translate_dataset(
    tiles,
    band: int = 1,
    tile_size: int = 256,
    **kwargs,
):
    """Tile-table Dataset → translated tile-table Dataset.

    The window is assembled once (windows are bounded by -srcwin/
    -projwin by definition), translated, and re-tiled — the same
    assemble-window pattern the distributed warp uses per dst window.
    """
    from gdal_ray.raster import model

    import ray.data as rd

    t = tiles if not hasattr(tiles, "to_arrow_refs") else None
    if t is None:
        import pyarrow as pa

        t = pa.concat_tables(
            tiles.iter_batches(batch_format="pyarrow", batch_size=None)
        )
    arr = model.to_array(t, band=band)
    gt = tuple(t["geotransform"][0].as_py())
    crs = t["crs"][0].as_py() or ""
    out, out_gt = translate([arr], gt, **kwargs)
    table = model.from_array(out[0], crs, out_gt, band=band,
                             tile_size=tile_size)
    return rd.from_arrow(table)
