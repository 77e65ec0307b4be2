"""Pipeline CLI tests (spec parsing + execution + real subprocess)."""

import subprocess
import sys

import pytest

from gdal_ray import cli


def test_where_predicate_parsing():
    import pyarrow as pa

    p = cli._where_predicate("l_quantity > 45")
    t = pa.table({"l_quantity": [44.0, 46.0]})
    assert p(t).to_pylist() == [False, True]
    p2 = cli._where_predicate("name = 'foo'")
    t2 = pa.table({"name": ["foo", "bar"]})
    assert p2(t2).to_pylist() == [True, False]
    with pytest.raises(ValueError):
        cli._where_predicate("l_quantity BETWEEN 1 AND 2")


def test_unknown_step():
    with pytest.raises(ValueError):
        cli.build_pipeline("read /x.parquet ! frobnicate")
    with pytest.raises(ValueError):
        cli.build_pipeline("filter --where 'a > 1'")  # must start with read


def test_run_pipeline_chain(ray_session, sf_small):
    n, kind = cli.run_pipeline(
        f"read {sf_small}/lineitem.parquet --cols l_orderkey,l_quantity "
        "! filter --where 'l_quantity > 45' ! count"
    )
    assert kind == "count"
    import duckdb

    expected = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_small}/lineitem.parquet') "
        "WHERE l_quantity > 45"
    ).fetchone()[0]
    assert n == expected


def test_geoparse_tile_steps(ray_session, sf_small, tmp_path):
    # pages fixture through geoparse + tile-encode + pip-join steps
    import pyarrow.parquet as pq

    from gdal_ray import fixtures

    p = tmp_path / "pages.parquet"
    pq.write_table(fixtures.gen_pages(200), str(p))
    ds, kind = cli.run_pipeline(
        f"read {p} ! geoparse ! tile-encode --zooms 7 ! pip-join"
    )
    df = ds.to_pandas()
    assert "tile_z7_x" in df.columns and "admin_id" in df.columns
    assert len(df) > 0


def test_cli_subprocess(sf_small):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "gdal_ray.cli",
            "vector",
            "pipeline",
            f"read {sf_small}/region.parquet ! count",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.strip().splitlines()[-1] == "5"


def test_sql_step(ray_session, tmp_path):
    """`... ! sql statement='SELECT ...'` runs the OGR SQL dialect
    over the piped dataset (table name: input)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {"a": pa.array([1, 2, 3, 4], pa.int64()),
         "b": pa.array([10.0, 20.0, 30.0, 40.0])}
    )
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    out, kind = cli.run_pipeline(
        f"read {p} ! sql --statement 'SELECT a, b * 2.0 AS b2 FROM input "
        f"WHERE a >= 2 ORDER BY a DESC LIMIT 2'"
    )
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert df["a"].tolist() == [4, 3]
    assert df["b2"].tolist() == [80.0, 60.0]
