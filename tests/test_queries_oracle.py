"""Driver-style correctness gate, run locally: every queries() entry
with an oracle must match DuckDB on row count, schema and values
(order-insensitive, columns sorted by name) at sf0.001.
"""

from __future__ import annotations

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # timestamps → ns for cross-engine comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(f))[0]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')"
        )
    return con.execute(sql).df()


def _compare(name: str, sf_dir: str):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ray_df = _canon(_to_pandas(q(sf_dir)))
    ora_df = _canon(_run_oracle(sql, sf_dir))
    assert len(ray_df) == len(ora_df), f"{name}: row count {len(ray_df)} vs {len(ora_df)}"
    assert list(ray_df.columns) == list(ora_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(ora_df.columns)}"
    )
    for c in ray_df.columns:
        a, b = ray_df[c].to_numpy(), ora_df[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # distributed sums differ from serial SQL sums by summation
            # order (last-ulp, measured maxrel ~1e-14); everything
            # non-aggregated compares bit-exact in practice
            np.testing.assert_allclose(
                a.astype(np.float64), b.astype(np.float64),
                rtol=1e-9, atol=1e-12,
                err_msg=f"{name}.{c}",
            )
        else:
            assert (a == b).all(), f"{name}.{c} values differ"


def _oracle_query_names():
    import __ray_entry__ as entrymod

    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_query_names())
def test_query_matches_oracle(ray_session, sf_small, name):
    _compare(name, sf_small)


def test_all_queries_have_callables():
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in q, f"oracle {name} has no queries() entry"


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    ds = entrymod.entry()
    assert ds.count() >= 0
    assert ds.schema() is not None
