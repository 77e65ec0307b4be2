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
        # indexed path: GridKNN buckets the reference set once per
        # actor/worker; queries stay exact (certified-radius check +
        # brute-force fallback) but stage time is flat in |ref|
        self.index = GridKNN(self.rx, self.ry, self.rid, k=k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch[self.lon_col].to_numpy(zero_copy_only=False)
        qy = batch[self.lat_col].to_numpy(zero_copy_only=False)
        n = len(qx)
        k = min(self.k, len(self.rx))
        pid, pd2, pidx = self.index.query(qx, qy)
        rows = np.repeat(np.arange(n), k)
        out = batch.take(pa.array(rows))
        out = out.append_column(
            "knn_rank", pa.array(np.tile(np.arange(1, k + 1), n))
        )
        out = out.append_column("point_id", pa.array(pid.ravel()))
        out = out.append_column("dist2", pa.array(pd2.ravel()))
        if self.include_value:
            out = out.append_column(
                "ref_value", pa.array(self.rval[pidx.ravel()])
            )
        return out


class GridKNN:
    """Grid-accelerated exact kNN (the CPLQuadTree replacement,
    alg/gdalgrid.cpp:260-276 — bucketed search instead of per-pixel
    tree descent, vectorized over the whole batch).

    Build: bucket reference points on a uniform grid sized for
    ``target_per_cell`` refs/cell; precompute per-cell padded candidate
    arrays for the 3×3 neighborhood.

    Query: one (Q × M) masked distance matrix over the padded
    candidates + argpartition. EXACTNESS: if a query's kth distance²
    exceeds ``cell_size²`` (the guaranteed-correct radius from any
    in-cell position to the 3×3 boundary), that query is re-answered
    brute-force — results are always exact; the grid only accelerates.
    """

    def __init__(self, rx, ry, rid, k: int = 5, target_per_cell: float = 8.0):
        self.rx = np.asarray(rx, dtype=np.float64)
        self.ry = np.asarray(ry, dtype=np.float64)
        self.rid = np.asarray(rid, dtype=np.int64)
        self.k = k
        n = max(1, len(self.rx))
        self.minx, self.maxx = self.rx.min(), self.rx.max()
        self.miny, self.maxy = self.ry.min(), self.ry.max()
        area = max((self.maxx - self.minx) * (self.maxy - self.miny), 1e-12)
        self.s = float(np.sqrt(area * target_per_cell / n))
        self.nx = max(1, int(np.ceil((self.maxx - self.minx) / self.s)))
        self.ny = max(1, int(np.ceil((self.maxy - self.miny) / self.s)))
        cx = np.clip(((self.rx - self.minx) / self.s).astype(np.int64), 0, self.nx - 1)
        cy = np.clip(((self.ry - self.miny) / self.s).astype(np.int64), 0, self.ny - 1)
        cell = cx * self.ny + cy
        order = np.argsort(cell, kind="stable")
        sorted_cell = cell[order]
        # bucket start/end per cell (CSR layout)
        ncells = self.nx * self.ny
        counts = np.bincount(sorted_cell, minlength=ncells)
        starts = np.zeros(ncells + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        self._order = order
        self._starts = starts
        # padded 3x3 candidate table per cell
        neigh_counts = np.zeros(ncells, dtype=np.int64)
        cxs, cys = np.divmod(np.arange(ncells), self.ny)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nxc = cxs + dx
                nyc = cys + dy
                valid = (nxc >= 0) & (nxc < self.nx) & (nyc >= 0) & (nyc < self.ny)
                idx = np.where(valid, nxc * self.ny + nyc, 0)
                neigh_counts += np.where(valid, counts[idx], 0)
        M = max(int(neigh_counts.max()), k)
        self._cand = np.full((ncells, M), -1, dtype=np.int64)
        fill = np.zeros(ncells, dtype=np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nxc = cxs + dx
                nyc = cys + dy
                valid = (nxc >= 0) & (nxc < self.nx) & (nyc >= 0) & (nyc < self.ny)
                src = np.where(valid, nxc * self.ny + nyc, 0)
                for c in np.flatnonzero(valid):
                    s0, e0 = self._starts[src[c]], self._starts[src[c] + 1]
                    cnt = e0 - s0
                    if cnt:
                        self._cand[c, fill[c] : fill[c] + cnt] = self._order[s0:e0]
                        fill[c] += cnt

    _CHUNK = 8192

    def _buffers(self):
        """Lazily-allocated per-instance work buffers, reused across
        batches (this sandbox — and large-page-less containers in
        general — pays heavily for first-touch allocation; an actor /
        cached-worker stage amortizes it once)."""
        if not hasattr(self, "_buf"):
            M = self._cand.shape[1]
            c = self._CHUNK
            self._buf = {
                "ci": np.empty((c, M), dtype=np.int64),
                "dx": np.empty((c, M), dtype=np.float64),
                "dy": np.empty((c, M), dtype=np.float64),
                "d2": np.empty((c, M), dtype=np.float64),
            }
        return self._buf

    def query(self, qx, qy):
        """→ (ids (Q,k), d2 (Q,k), ref positions) sorted by
        (d2, point_id). Exact."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        q = len(qx)
        k = min(self.k, len(self.rx))
        pid = np.empty((q, k), dtype=np.int64)
        pd2 = np.empty((q, k), dtype=np.float64)
        pidx = np.empty((q, k), dtype=np.int64)
        buf = self._buffers()
        cxa = np.clip(((qx - self.minx) / self.s).astype(np.int64), 0, self.nx - 1)
        cya = np.clip(((qy - self.miny) / self.s).astype(np.int64), 0, self.ny - 1)
        cells = cxa * self.ny + cya
        M = self._cand.shape[1]
        for s0 in range(0, q, self._CHUNK):
            e0 = min(s0 + self._CHUNK, q)
            n0 = e0 - s0
            ci = buf["ci"][:n0]
            dx = buf["dx"][:n0]
            dy = buf["dy"][:n0]
            d2 = buf["d2"][:n0]
            np.take(self._cand, cells[s0:e0], axis=0, out=ci)
            mask = ci >= 0
            np.maximum(ci, 0, out=ci)
            np.take(self.rx, ci, out=dx)
            np.take(self.ry, ci, out=dy)
            np.subtract(qx[s0:e0, None], dx, out=dx)
            np.subtract(qy[s0:e0, None], dy, out=dy)
            np.multiply(dx, dx, out=dx)
            np.multiply(dy, dy, out=dy)
            np.add(dx, dy, out=d2)
            d2[~mask] = np.inf
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
            cd2 = np.take_along_axis(d2, part, axis=1)
            cidx = np.take_along_axis(ci, part, axis=1)
            cpid = self.rid[cidx]
            order = np.lexsort((cpid, cd2), axis=1)
            pd2[s0:e0] = np.take_along_axis(cd2, order, axis=1)
            pid[s0:e0] = np.take_along_axis(cpid, order, axis=1)
            pidx[s0:e0] = np.take_along_axis(cidx, order, axis=1)
        # exactness guarantee: kth neighbor must lie within the certain
        # radius (one cell size); also any query outside the grid or
        # with too few in-neighborhood candidates falls back
        inside = (
            (qx >= self.minx) & (qx <= self.maxx)
            & (qy >= self.miny) & (qy <= self.maxy)
        )
        need_bf = ~inside | (pd2[:, k - 1] > self.s * self.s) | ~np.isfinite(
            pd2[:, k - 1]
        )
        bf = np.flatnonzero(need_bf)
        if len(bf):
            # chunked vectorized brute force for the uncertain queries,
            # with reusable buffers (allocation is expensive here)
            nref = len(self.rx)
            bchunk = 1024
            if "bf_d" not in self._buffers():
                self._buf["bf_d"] = np.empty((bchunk, nref), dtype=np.float64)
                self._buf["bf_t"] = np.empty((bchunk, nref), dtype=np.float64)
            da_full = self._buf["bf_d"]
            tmp = self._buf["bf_t"]
            for s0 in range(0, len(bf), bchunk):
                sel = bf[s0 : s0 + bchunk]
                n0 = len(sel)
                da = da_full[:n0]
                tm = tmp[:n0]
                np.subtract(qx[sel, None], self.rx[None, :], out=da)
                np.multiply(da, da, out=da)
                np.subtract(qy[sel, None], self.ry[None, :], out=tm)
                np.multiply(tm, tm, out=tm)
                np.add(da, tm, out=da)
                part2 = np.argpartition(da, k - 1, axis=1)[:, :k]
                d2b = np.take_along_axis(da, part2, axis=1)
                pidb = self.rid[part2]
                ob = np.lexsort((pidb, d2b), axis=1)
                pid[sel] = np.take_along_axis(pidb, ob, axis=1)
                pd2[sel] = np.take_along_axis(d2b, ob, axis=1)
                pidx[sel] = np.take_along_axis(part2, ob, axis=1)
        return pid, pd2, pidx

    def query_unique(self, qx, qy):
        """query() after deduplicating coordinate pairs — web corpora
        have heavy location duplication (many pages per place), so the
        kNN is solved once per distinct location and scattered back."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        pairs = np.empty(len(qx), dtype=[("x", "f8"), ("y", "f8")])
        pairs["x"] = qx
        pairs["y"] = qy
        uniq, inv = np.unique(pairs, return_inverse=True)
        pid_u, pd2_u, pidx_u = self.query(uniq["x"], uniq["y"])
        return pid_u[inv], pd2_u[inv], pidx_u[inv]


class GridKNNFeatures:
    """No-row-explosion kNN feature stage: appends ``nn_point_id``
    (nearest reference) and ``knn_mean_dist2`` (mean of k nearest
    squared distances) per input row — the per-page kNN signal for the
    flagship rollup without multiplying the stream by k."""

    def __init__(self, ref, k: int = 5, lon_col: str = "lon", lat_col: str = "lat"):
        if isinstance(ref, ray.ObjectRef):
            ref = ray.get(ref)
        if isinstance(ref, str):
            import pyarrow.parquet as pq

            ref = pq.read_table(ref)
        self.index = GridKNN(
            ref["lon"].to_numpy(), ref["lat"].to_numpy(),
            ref["point_id"].to_numpy(), k=k,
        )
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch[self.lon_col].to_numpy(zero_copy_only=False)
        qy = batch[self.lat_col].to_numpy(zero_copy_only=False)
        pid, pd2, _ = self.index.query_unique(qx, qy)
        return batch.append_column(
            "nn_point_id", pa.array(pid[:, 0])
        ).append_column("knn_mean_dist2", pa.array(pd2.mean(axis=1)))


def knn_join(
    points,
    ref,
    k: int = 5,
    lon_col: str = "lon",
    lat_col: str = "lat",
    include_value: bool = False,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
):
    """points Dataset → k rows per point with nearest reference ids.

    Default: worker-cached tasks (index built once per warm worker,
    no actor-pool startup). Pass ``concurrency`` to pin a dedicated
    actor pool instead (long-running pipelines)."""
    from gdal_ray.stages.cache import worker_cached

    if isinstance(ref, pa.Table):
        ref = ray.put(ref)
    kwargs = {
        "ref": ref,
        "k": k,
        "lon_col": lon_col,
        "lat_col": lat_col,
        "include_value": include_value,
    }
    if concurrency is not None:
        return points.map_batches(
            KNNJoiner,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=kwargs,
        )
    return points.map_batches(
        worker_cached(KNNJoiner, **kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
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
            # indexed candidate selection (exact); smoothing shifts all
            # distances equally so the k-set is unchanged
            _pid, pd2, pidx = self.index.query(qx, qy)
            pd2 = pd2 + smoothing * smoothing
            vals = self.rval[pidx]
            with np.errstate(divide="ignore"):
                w = 1.0 / np.power(np.sqrt(pd2), power)
            exact = ~np.isfinite(w)
            w = np.where(exact, 0.0, w)
            num = (w * vals).sum(axis=1)
            den = w.sum(axis=1)
            est = np.where(den > 0, num / np.maximum(den, 1e-300), np.nan)
            # exact hits take the reference value (gdalgrid rule)
            hit_rows, hit_cols = np.nonzero(exact)
            est[hit_rows] = vals[hit_rows, hit_cols]
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
