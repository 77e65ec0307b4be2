"""OGR SQL dialect tests: parsed SELECTs over Ray Datasets must match
DuckDB running the identical statement on the identical table."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray import ogrsql


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(11)
    n = 2000
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "grp": pa.array(rng.integers(0, 5, n)),
            "val": pa.array(np.round(rng.uniform(0, 100, n), 2)),
            "name": pa.array(
                [f"item-{i % 37:03d}" for i in range(n)]
            ),
        }
    )


def run_both(sql, table, ray_session):
    import ray.data as rd

    got = ogrsql.execute(sql, {"t": rd.from_arrow(table)}).to_pandas()
    con = duckdb.connect()
    con.register("t", table)
    want = con.execute(sql).fetch_df()
    got = got[sorted(got.columns)].sort_values(
        sorted(got.columns), kind="mergesort"
    ).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        sorted(want.columns), kind="mergesort"
    ).reset_index(drop=True)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), sql
    for c in got.columns:
        g = got[c]
        w = want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(
                g.astype(float), w.astype(float), rtol=1e-9, equal_nan=True
            ), (sql, c)
        else:
            assert (g.astype(w.dtype) == w).all(), (sql, c)
    return got


QUERIES = [
    "SELECT id, val FROM t WHERE val > 50.0",
    "SELECT id, val * 2.0 AS dbl, name FROM t WHERE grp = 3 AND val < 20",
    "SELECT UPPER(name) AS uname, id FROM t WHERE name LIKE 'item-00%'",
    "SELECT id FROM t WHERE grp IN (1, 3) AND val BETWEEN 10 AND 20",
    "SELECT grp, COUNT(*) AS n, SUM(val) AS s, MIN(val) AS mn, "
    "MAX(val) AS mx FROM t GROUP BY grp",
    "SELECT grp, AVG(val) AS avg_val FROM t WHERE id < 500 GROUP BY grp",
    "SELECT COUNT(*) AS n FROM t WHERE NOT (grp = 2)",
    "SELECT DISTINCT grp FROM t",
    "SELECT id, val FROM t ORDER BY val DESC, id LIMIT 10",
    "SELECT CAST(val AS INTEGER) AS vi, id FROM t WHERE id < 50",
    "SELECT SUBSTR(name, 1, 4) AS pre, id FROM t WHERE id < 20",
    "SELECT id + grp * 100 AS key2 FROM t WHERE val >= 99.0",
    "SELECT SUM(val * val) AS ss FROM t",
    # DISTINCT combined with aggregation (ADVICE r2: was silently
    # dropped in the aggregate path)
    "SELECT DISTINCT COUNT(*) AS n FROM t GROUP BY grp",
    "SELECT DISTINCT grp, COUNT(*) AS n FROM t WHERE id < 1000 GROUP BY grp",
    # round-3 operator-registry completion (swq_op_registrar.cpp)
    "SELECT id FROM t WHERE name ILIKE 'ITEM-00%'",
    "SELECT id FROM t WHERE name NOT ILIKE 'ITEM-01%' AND id < 100",
    "SELECT grp, STDDEV_POP(val) AS sp, STDDEV_SAMP(val) AS ss "
    "FROM t GROUP BY grp",
    "SELECT id % 7 AS m, val FROM t WHERE id < 30",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_matches_duckdb(sql, table, ray_session):
    run_both(sql, table, ray_session)


def test_limit_offset(table, ray_session):
    import ray.data as rd

    got = ogrsql.execute(
        "SELECT id FROM t ORDER BY id LIMIT 5 OFFSET 3",
        {"t": rd.from_arrow(table)},
    ).to_pandas()
    assert got["id"].tolist() == [3, 4, 5, 6, 7]


def test_parse_errors():
    with pytest.raises(ValueError):
        ogrsql.parse_select("SELECT FROM t")
    with pytest.raises(ValueError):
        ogrsql.parse_select("SELECT a FROM t WHERE ^bad")
    with pytest.raises(ValueError):
        ogrsql.parse_select("SELECT a FROM t extra garbage ,")


def test_inner_join(table, ray_session):
    import ray.data as rd

    lut = pa.table(
        {"g": pa.array([0, 1, 2, 3, 4], pa.int64()),
         "label": pa.array(["a", "b", "c", "d", "e"])}
    )
    sql = ("SELECT t.id, lut.label FROM t JOIN lut ON t.grp = lut.g "
           "WHERE t.id < 100")
    got = ogrsql.execute(
        sql, {"t": rd.from_arrow(table), "lut": rd.from_arrow(lut)}
    ).to_pandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", table)
    con.register("lut", lut)
    want = con.execute(sql).fetch_df().sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == want["id"].tolist()
    assert got["label"].tolist() == want["label"].tolist()


def test_having(table, ray_session):
    import ray.data as rd

    sql = ("SELECT grp, COUNT(*) AS n, SUM(val) AS s FROM t "
           "GROUP BY grp HAVING SUM(val) > 15000 AND COUNT(*) > 100")
    got = ogrsql.execute(sql, {"t": rd.from_arrow(table)}).to_pandas()
    con = duckdb.connect()
    con.register("t", table)
    want = con.execute(sql).fetch_df()
    got = got.sort_values("grp").reset_index(drop=True)
    want = want.sort_values("grp").reset_index(drop=True)
    assert got["grp"].tolist() == want["grp"].tolist()
    assert np.allclose(got["s"], want["s"])


def test_hstore_get_value(ray_session):
    """swq HSTORE_GET_VALUE semantics: 'k=>v' lookup, NULL on miss."""
    import ray.data as rd

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "tags": pa.array(['a=>1, b=>2', 'b=>only', None, '"a" => "q"']),
    })
    out = ogrsql.execute(
        "SELECT id, HSTORE_GET_VALUE(tags, 'a') AS a FROM t",
        {"t": rd.from_arrow(t)},
    ).to_pandas().sort_values("id")
    assert out["a"].tolist() == ["1", None, None, "q"]


class TestSpecialFields:
    """OGR SQL special fields OGR_GEOMETRY / OGR_GEOM_WKT /
    OGR_GEOM_AREA (ogr_gensql special-field semantics)."""

    def _ds(self):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.geom.wkb import linestring_wkb, point_wkb, polygon_wkb

        t = pa.table(
            {
                "name": ["pt", "ln", "pg"],
                "geometry": pa.array(
                    [
                        point_wkb(1.0, 2.0),
                        linestring_wkb([[0, 0], [1, 1]]),
                        polygon_wkb([[0, 0], [4, 0], [4, 3], [0, 0]]),
                    ],
                    pa.binary(),
                ),
            }
        )
        return rd.from_arrow(t)

    def test_geometry_type_filter(self, ray_session):
        from gdal_ray import ogrsql

        df = ogrsql.execute(
            "SELECT name FROM t WHERE OGR_GEOMETRY = 'POLYGON'",
            {"t": self._ds()},
        ).to_pandas()
        assert df["name"].tolist() == ["pg"]

    def test_geom_area(self, ray_session):
        from gdal_ray import ogrsql

        df = ogrsql.execute(
            "SELECT name, OGR_GEOM_AREA AS a FROM t", {"t": self._ds()}
        ).to_pandas()
        areas = dict(zip(df["name"], df["a"]))
        assert areas["pg"] == 6.0  # 4x3 right triangle
        assert areas["pt"] == 0.0 and areas["ln"] == 0.0

    def test_geom_wkt(self, ray_session):
        from gdal_ray import ogrsql

        df = ogrsql.execute(
            "SELECT OGR_GEOM_WKT AS w FROM t WHERE name = 'pt'",
            {"t": self._ds()},
        ).to_pandas()
        assert df["w"][0].startswith("POINT")
        assert "1" in df["w"][0] and "2" in df["w"][0]
