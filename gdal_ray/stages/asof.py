"""As-of join — the time-series lookup the reference lacks
(SURVEY.md §2.4 last row: "no as-of joins in GDAL"; a required custom
operator for the training-pipeline surface).

Semantics (ASOF JOIN ... MATCH backward): for each left row, the
single right row with the same key and the greatest right-ts ≤
left-ts. Shape per the guide: co-partition both sides by key
(groupby), sort within the group, and merge with
``pandas.merge_asof`` — a composition of groupby + map_groups, no raw
actors.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def range_join(
    left: rd.Dataset,
    intervals,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    interval_cols: list[str] | None = None,
    closed: str = "both",
):
    """Interval join: each left row matched to every interval with
    lo ≤ value ≤ hi (the range join the reference only approximates
    via spatial filters — SURVEY.md §2.4 last row).

    The interval side is broadcast (small side: banding tables,
    histograms, SLA windows); the probe is one vectorized comparison
    matrix per batch, emitting one row per (row, interval) match.
    For two large sides, bucket both by value range and reuse the
    cell-partitioned-join pattern (stages.join.cell_partitioned_pip).
    """
    import numpy as np
    import ray

    if not isinstance(intervals, pa.Table):
        intervals = pa.Table.from_pylist(list(intervals))
    lo = np.asarray(intervals[lo_col].to_pylist(), dtype=np.float64)
    hi = np.asarray(intervals[hi_col].to_pylist(), dtype=np.float64)
    cols = interval_cols or [
        c for c in intervals.column_names if c not in (lo_col, hi_col)
    ]
    extra = {c: intervals[c] for c in cols}
    ref = ray.put((lo, hi, {c: v.to_pylist() for c, v in extra.items()}))

    def probe(batch: pa.Table) -> pa.Table:
        lo_, hi_, ex = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if closed == "both":
            m = (v[:, None] >= lo_[None, :]) & (v[:, None] <= hi_[None, :])
        elif closed == "left":
            m = (v[:, None] >= lo_[None, :]) & (v[:, None] < hi_[None, :])
        else:
            raise ValueError(closed)
        ri, ii = np.nonzero(m)
        out = batch.take(pa.array(ri))
        for c, vals in ex.items():
            out = out.append_column(
                c, pa.array([vals[j] for j in ii])
            )
        out = out.append_column("lo", pa.array(lo_[ii]))
        out = out.append_column("hi", pa.array(hi_[ii]))
        return out

    return left.map_batches(probe, batch_format="pyarrow")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_r",
    num_partitions: int = 8,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Backward as-of join on (key, ts).

    Both sides are tagged and unioned, then ONE groupby(key) shuffle
    co-locates each key's rows; the per-group merge sorts by ts and
    applies merge_asof. Right columns arrive suffixed when colliding.

    ``left_schema``/``right_schema``: pass when known — ``.schema()``
    on a transformed Dataset triggers a limit-1 probe execution
    (~1 s fixed cost each).
    """
    lt = left.map_batches(
        lambda t: t.append_column("__side", pa.array([0] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda t: t.append_column("__side", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    # align schemas for the union: missing columns become nulls
    lbase0 = left_schema if left_schema is not None else left.schema().base_schema
    rbase0 = right_schema if right_schema is not None else right.schema().base_schema
    lcols = set(lbase0.names)
    rcols = set(rbase0.names)

    def pad(missing):
        def f(t: pa.Table) -> pa.Table:
            for c, typ in missing:
                t = t.append_column(c, pa.nulls(t.num_rows, typ))
            return t

        return f

    lschema = {f.name: f.type for f in lbase0}
    rschema = {f.name: f.type for f in rbase0}
    lt = lt.map_batches(
        pad([(c, rschema[c]) for c in sorted(rcols - lcols)]),
        batch_format="pyarrow",
    )
    rt = rt.map_batches(
        pad([(c, lschema[c]) for c in sorted(lcols - rcols)]),
        batch_format="pyarrow",
    )
    both = lt.union(rt)
    return asof_join_union(both, key, ts, right_cols, suffix,
                           num_partitions, lbase0, rbase0)


def asof_join_union(
    both: rd.Dataset,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_r",
    num_partitions: int = 8,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """As-of join over a PRE-TAGGED union: ``both`` already carries
    every left+right column (missing side columns null-padded) plus
    ``__side`` (0 = left, 1 = right). The fast path when both sides
    derive from ONE source (self-as-of: events vs their own marks) —
    the caller emits the union in a single scan instead of Ray
    executing the shared read twice, once per union branch."""
    lbase0, rbase0 = left_schema, right_schema
    lcols = set(lbase0.names)

    # canonical output schema: every group block must agree (empty
    # groups otherwise degrade int columns to float64 via pandas NaN)
    lbase = lbase0
    rbase = rbase0
    fields = [lbase.field(c) for c in lbase.names]
    for c in right_cols:
        out_name = c + suffix if c in lcols else c
        fields.append(pa.field(out_name, rbase.field(c).type))
    target = pa.schema(fields)

    def merge(g: pd.DataFrame) -> pa.Table:
        import pyarrow.compute as pc

        lg = g[g["__side"] == 0].sort_values(ts, kind="mergesort")
        rg = g[g["__side"] == 1].sort_values(ts, kind="mergesort")
        lg = lg[[c for c in lg.columns if c in lcols]]
        rg = rg[[c for c in rg.columns if c in ([key, ts] + right_cols)]]
        out = pd.merge_asof(
            lg, rg, on=ts, by=key, direction="backward", suffixes=("", suffix)
        )
        out = out.reindex(columns=target.names)
        # Arrow-native NULL (not float NaN) for unmatched right columns —
        # pd.merge_asof emits NaN, which DuckDB/SQL semantics (and the
        # driver's value hash) distinguish from NULL.
        t = pa.Table.from_pandas(out, preserve_index=False)
        cols = []
        for f in target:
            col = t[f.name]
            if pa.types.is_floating(col.type):
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        return pa.table(dict(zip(target.names, cols)))

    # COARSE co-partitioning: shuffle on hash(key) % num_partitions,
    # not on the raw key — map_groups fires its callback once per
    # group, and per-KEY groups mean thousands of ~1 ms pandas calls
    # (measured: the dominant cost at sf0.1, 6k users). One partition
    # = one vectorized merge_asof(by=key) over every key it holds —
    # identical semantics (merge_asof partitions by `by` internally,
    # in C), ~num_partitions Python calls total. Skewed keys spread no
    # worse than the raw-key groupby: one key still lives in one
    # partition (the merge needs that), but small keys batch together.
    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t[key].to_pandas(), index=False
        ).to_numpy()
        return t.append_column(
            "__part", pa.array((h % num_partitions).astype("int64")))

    both = both.map_batches(add_part, batch_format="pyarrow")

    def merge_partition(g: pd.DataFrame) -> pa.Table:
        return merge(g.drop(columns="__part"))

    return both.groupby("__part", num_partitions=num_partitions).map_groups(
        merge_partition, batch_format="pandas"
    )
