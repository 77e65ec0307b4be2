"""k-nearest-neighbor stage against a broadcast reference point set.

Reference semantics: GDALGridInverseDistanceToAPowerNearestNeighbor —
planar search over a point quadtree, per output location
(alg/gdalgrid.cpp:241-276, quadtree alg/gdalgrid.cpp:260 /
port/cpl_quad_tree.h:48). Metric is **planar in the input coordinate
units** (degrees here — documented, matching the FIXTURES.md §4
oracle).

Ray mapping (SURVEY.md §2.3): the reference set is broadcast once
(``ray.put`` → actor ``__init__``); each batch is answered with a
vectorized chunked brute-force scan (numpy argpartition). Brute force
is the exact baseline; at 100 TB the scale path is cell-partitioned
kNN — partition queries by cell, replicate reference points to each
cell + its neighbor halo, brute-force within the group (same output,
shuffle-local; see pipelines docstring).

Determinism: ties broken by (distance², point_id) lexicographic order
so ranks are reproducible across engines and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


class KNNJoiner:
    """Actor-pool stage: append k nearest reference points per row.

    Output: k rows per input row with ``knn_rank`` (1-based),
    ``point_id``, ``dist2`` (squared planar distance — exactly
    reproducible arithmetic, no sqrt), and optionally the reference
    ``value`` and the inverse-distance-weighted estimate.
    """

    def __init__(
        self,
        ref,
        k: int = 5,
        lon_col: str = "lon",
        lat_col: str = "lat",
        chunk: int = 2048,
        include_value: bool = False,
    ):
        if isinstance(ref, ray.ObjectRef):
            ref = ray.get(ref)
        if isinstance(ref, str):
            import pyarrow.parquet as pq

            ref = pq.read_table(ref)
        self.rx = ref["lon"].to_numpy()
        self.ry = ref["lat"].to_numpy()
        self.rid = ref["point_id"].to_numpy()
        self.rval = ref["value"].to_numpy() if "value" in ref.schema.names else None
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.chunk = chunk
        self.include_value = include_value and self.rval is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch[self.lon_col].to_numpy(zero_copy_only=False)
        qy = batch[self.lat_col].to_numpy(zero_copy_only=False)
        n = len(qx)
        k = min(self.k, len(self.rx))
        out_idx = np.empty((n, k), dtype=np.int64)
        out_d2 = np.empty((n, k), dtype=np.float64)
        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            dx = qx[s:e, None] - self.rx[None, :]
            dy = qy[s:e, None] - self.ry[None, :]
            d2 = dx * dx + dy * dy
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
            pd2 = np.take_along_axis(d2, part, axis=1)
            pid = self.rid[part]
            # deterministic (dist2, point_id) order within the k set
            order = np.lexsort((pid, pd2), axis=1)
            out_idx[s:e] = np.take_along_axis(part, order, axis=1)
            out_d2[s:e] = np.take_along_axis(pd2, order, axis=1)
        rows = np.repeat(np.arange(n), k)
        out = batch.take(pa.array(rows))
        out = out.append_column(
            "knn_rank", pa.array(np.tile(np.arange(1, k + 1), n))
        )
        flat = out_idx.ravel()
        out = out.append_column("point_id", pa.array(self.rid[flat]))
        out = out.append_column("dist2", pa.array(out_d2.ravel()))
        if self.include_value:
            out = out.append_column("ref_value", pa.array(self.rval[flat]))
        return out


def knn_join(
    points,
    ref,
    k: int = 5,
    lon_col: str = "lon",
    lat_col: str = "lat",
    include_value: bool = False,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 16384,
):
    """points Dataset → k rows per point with nearest reference ids."""
    if isinstance(ref, pa.Table):
        ref = ray.put(ref)
    return points.map_batches(
        KNNJoiner,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "ref": ref,
            "k": k,
            "lon_col": lon_col,
            "lat_col": lat_col,
            "include_value": include_value,
        },
    )


def idw_estimate(
    points,
    ref,
    k: int = 5,
    power: float = 2.0,
    smoothing: float = 0.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    concurrency: int | tuple[int, int] = (1, 4),
):
    """Inverse-distance-to-a-power estimate from the k nearest
    reference values (GDALGridInverseDistanceToAPower semantics,
    alg/gdalgrid.cpp: weight = 1/dist^power, exact hit → value)."""

    class IDW(KNNJoiner):
        def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D401
            qx = batch[self.lon_col].to_numpy(zero_copy_only=False)
            qy = batch[self.lat_col].to_numpy(zero_copy_only=False)
            n = len(qx)
            kk = min(self.k, len(self.rx))
            est = np.empty(n, dtype=np.float64)
            for s in range(0, n, self.chunk):
                e = min(s + self.chunk, n)
                dx = qx[s:e, None] - self.rx[None, :]
                dy = qy[s:e, None] - self.ry[None, :]
                d2 = dx * dx + dy * dy + smoothing * smoothing
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                pd2 = np.take_along_axis(d2, part, axis=1)
                vals = self.rval[part]
                with np.errstate(divide="ignore"):
                    w = 1.0 / np.power(np.sqrt(pd2), power)
                exact = ~np.isfinite(w)
                w = np.where(exact, 0.0, w)
                num = (w * vals).sum(axis=1)
                den = w.sum(axis=1)
                block = np.where(den > 0, num / np.maximum(den, 1e-300), np.nan)
                # exact hits take the reference value (gdalgrid rule)
                hit_rows, hit_cols = np.nonzero(exact)
                block[hit_rows] = vals[hit_rows, hit_cols]
                est[s:e] = block
            return batch.append_column("idw_value", pa.array(est))

    if isinstance(ref, pa.Table):
        ref = ray.put(ref)
    return points.map_batches(
        IDW,
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "ref": ref,
            "k": k,
            "lon_col": lon_col,
            "lat_col": lat_col,
            "include_value": True,
        },
    )
