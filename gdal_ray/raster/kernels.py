"""Per-tile raster kernels: calc, reclassify, scale, stats.

Each is a pure-array function + a map_batches wrapper over tile rows
(SURVEY.md §2.2 raster rows):
- ``calc``      — band algebra expression over aligned tiles
  (apps/gdalalg_raster_calc.cpp muparser expressions → numpy eval on a
  restricted namespace);
- ``reclassify``— value remap table (apps/gdalalg_raster_reclassify.cpp);
- ``scale``     — linear rescale src→dst range incl. clip
  (apps/gdalalg_raster_scale.cpp / GDALTranslate -scale);
- ``stats``     — per-band min/max/mean/std/count via per-tile partial
  moments + combine (gcore/gdalrasterband.cpp ComputeStatistics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.raster import model

_SAFE_FUNCS = {
    "abs": np.abs,
    "sqrt": np.sqrt,
    "log": np.log,
    "log10": np.log10,
    "exp": np.exp,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "where": np.where,
    "floor": np.floor,
    "ceil": np.ceil,
}


def calc_expr(expr: str, arrays: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate a band-algebra expression (variables = band names) in
    a restricted numpy namespace — the muparser role."""
    ns = dict(_SAFE_FUNCS)
    ns.update(arrays)
    return eval(expr, {"__builtins__": {}}, ns)  # noqa: S307 — restricted ns


def reclassify(arr: np.ndarray, mapping: dict[float, float], default=None) -> np.ndarray:
    """Value remap; unmapped values keep (default=None) or get default."""
    out = (
        arr.astype(np.float64).copy()
        if default is None
        else np.full(arr.shape, default, dtype=np.float64)
    )
    for src, dst in mapping.items():
        out[arr == src] = dst
    return out


def scale(
    arr: np.ndarray,
    src_min: float,
    src_max: float,
    dst_min: float = 0.0,
    dst_max: float = 255.0,
    clip: bool = True,
) -> np.ndarray:
    """Linear rescale (GDALTranslate -scale semantics: linear map of
    [src_min, src_max] → [dst_min, dst_max])."""
    a = arr.astype(np.float64)
    ratio = (dst_max - dst_min) / max(src_max - src_min, 1e-300)
    out = (a - src_min) * ratio + dst_min
    if clip:
        out = np.clip(out, min(dst_min, dst_max), max(dst_min, dst_max))
    return out


def tile_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-tile moment partials → combine with ``combine_stats``."""
    rows = []
    for row in batch.to_pylist():
        arr = model.tile_array(row).astype(np.float64)
        rows.append(
            {
                "band": row["band"],
                "n": arr.size,
                "sum": float(arr.sum()),
                "sum2": float((arr * arr).sum()),
                "min": float(arr.min()),
                "max": float(arr.max()),
            }
        )
    return pa.Table.from_pylist(rows)


def combine_stats(partials: pa.Table) -> dict:
    """Final min/max/mean/std per band (population std, GDAL
    ComputeStatistics semantics)."""
    import pandas as pd

    df = partials.to_pandas()
    out = {}
    for band, g in df.groupby("band"):
        n = g["n"].sum()
        mean = g["sum"].sum() / n
        var = g["sum2"].sum() / n - mean * mean
        out[int(band)] = {
            "min": g["min"].min(),
            "max": g["max"].max(),
            "mean": mean,
            "std": float(np.sqrt(max(var, 0.0))),
            "count": int(n),
        }
    return out


def map_tiles(fn, **kwargs):
    """Lift an array→array kernel to a tile-table map_batches fn."""

    def _apply(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            arr = model.tile_array(row)
            out = fn(arr, **kwargs)
            row = dict(row)
            row["dtype"] = str(out.dtype)
            row["data"] = out.tobytes()
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=batch.schema)

    return _apply
