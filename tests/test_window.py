"""Grouped window functions (stages/window.py) — DuckDB-verified
ANSI semantics over the events table."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df, cols):
    return df[cols].sort_values(cols, ignore_index=True)


class TestWindow:
    def test_vs_duckdb_over_events(self, ray_session):
        import ray.data as rd

        from gdal_ray.stages.window import window

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "value"])
        got = window(
            ds, key="user_id", order_by="ts", tiebreak="event_id",
            funcs=[
                ("row_number", None, "rn"),
                ("lag", "value", "prev_value", 1),
                ("lead", "value", "next_value", 1),
                ("cumsum", "value", "running"),
                ("cummax", "value", "peak"),
            ],
        ).to_pandas()

        con = duckdb.connect()
        ora = con.execute(f"""
            SELECT event_id, ts, user_id, value,
                   ROW_NUMBER() OVER w AS rn,
                   LAG(value, 1) OVER w AS prev_value,
                   LEAD(value, 1) OVER w AS next_value,
                   SUM(value) OVER (w ROWS UNBOUNDED PRECEDING)
                     AS running,
                   MAX(value) OVER (w ROWS UNBOUNDED PRECEDING) AS peak
            FROM read_parquet('{SF}/events.parquet')
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """).fetchdf()
        cols = sorted(got.columns)
        a, b = _canon(got, cols), _canon(ora, cols)
        assert len(a) == len(b)
        for c in cols:
            x, y = a[c].to_numpy(), b[c].to_numpy()
            if x.dtype.kind == "f":
                x, y = np.nan_to_num(x, nan=-9e9), np.nan_to_num(
                    y.astype(np.float64), nan=-9e9)
                np.testing.assert_allclose(x, y, rtol=1e-12)
            else:
                assert (x == y).all(), c

    def test_null_edges_and_rank(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.stages.window import window

        t = pa.table({
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "o": pa.array([10, 20, 20, 5], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0]),
            "id": pa.array([1, 2, 3, 4], pa.int64()),
        })
        out = window(
            rd.from_arrow(t), key="k", order_by="o", tiebreak="id",
            funcs=[("lag", "v", "pv"), ("rank", None, "rk")],
        ).to_pandas().sort_values("id").reset_index(drop=True)
        # first row of each partition: NULL (not NaN-as-value)
        assert pd.isna(out.loc[0, "pv"]) and pd.isna(out.loc[3, "pv"])
        # ties share min rank
        assert list(out["rk"]) == [1, 2, 2, 1]

    def test_unknown_function_rejected(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.stages.window import window

        with pytest.raises(ValueError):
            window(rd.from_arrow(pa.table({"k": [1], "o": [1]})),
                   "k", "o", [("ntile", None, "x")])
