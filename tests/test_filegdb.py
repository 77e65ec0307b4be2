"""OpenFileGDB reader (gdal_ray/filegdb.py) vs reference autotest
fixtures (autotest/ogr/data/filegdb/) — layer catalog, field values,
geometry decode incl. curves / ZM / multipatch, pinned to the literal
expectations of autotest/ogr/ogr_openfilegdb.py and the fixture CSVs."""
import csv
import datetime
import os
import re
import zipfile

import pytest

from gdal_ray import filegdb
from gdal_ray.geom import wkt as gwkt

DATA = "/root/reference/autotest/ogr/data/filegdb"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent")

_NUM = r"-?[\d.]+(?:[eE][-+]?\d+)?|nan"


@pytest.fixture(scope="module")
def gdb_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fgdb")
    for z in ("testopenfilegdb.gdb.zip", "testopenfilegdb92.gdb.zip",
              "testopenfilegdb93.gdb.zip", "sparse.gdb.zip",
              "test3005.gdb.zip", "test_utf16.gdb.zip"):
        zipfile.ZipFile(os.path.join(DATA, z)).extractall(root)
    return str(root)


def wkt_of(tbl, i=0):
    g = tbl["geometry"][i].as_py()
    return gwkt.to_wkt(g) if g else None


def assert_wkt_close(got: str | None, want: str | None, rel=2e-6):
    if want is None:
        assert got is None
        return
    gs = re.sub(_NUM, "#", got.replace(", ", ","))
    ws = re.sub(_NUM, "#", want.replace(", ", ","))
    assert gs == ws, f"structure:\n {got[:120]}\n {want[:120]}"
    gn = re.findall(_NUM, got)
    wn = re.findall(_NUM, want)
    assert len(gn) == len(wn)
    for a, b in zip(gn, wn):
        if a == "nan" or b == "nan":
            assert a == b
        else:
            assert abs(float(a) - float(b)) <= max(1e-6, abs(float(b)) * rel)


# the autotest datalist (ogr_openfilegdb.py:27-92), read-back form:
# lines/polygons promote to multi, empties read as NULL geometry
DATALIST = [
    ("point", "POINT (1 2)"),
    ("multipoint", "MULTIPOINT ((1 2), (3 4))"),
    ("linestring", "MULTILINESTRING ((1 2, 3 4))"),
    ("multilinestring", "MULTILINESTRING ((1 2, 3 4))"),
    ("multilinestring_multipart", "MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))"),
    ("polygon", "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)))"),
    ("multipolygon",
     "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0), (0.25 0.25, 0.75 0.25, "
     "0.75 0.75, 0.25 0.75, 0.25 0.25)), ((2 0, 2 1, 3 1, 3 0, 2 0)))"),
    ("point25D", "POINT Z (1 2 3)"),
    ("multipoint25D", "MULTIPOINT Z ((1 2 -10), (3 4 -20))"),
    ("linestring25D", "MULTILINESTRING Z ((1 2 -10, 3 4 -20))"),
    ("multilinestring25D", "MULTILINESTRING Z ((1 2 -10, 3 4 -20))"),
    ("multilinestring25D_multipart",
     "MULTILINESTRING Z ((1 2 -10, 3 4 -20), (5 6 -30, 7 8 -40))"),
    ("polygon25D",
     "MULTIPOLYGON Z (((0 0 -10, 0 1 -10, 1 1 -10, 1 0 -10, 0 0 -10)))"),
    ("multipolygon25D",
     "MULTIPOLYGON Z (((0 0 -10, 0 1 -10, 1 1 -10, 1 0 -10, 0 0 -10)))"),
    ("null_polygon", None),
    ("empty_polygon", None),
    ("empty_multipoint", None),
]

DATALIST_M = [
    ("pointm", "POINT M (1 2 3)"),
    ("pointzm", "POINT ZM (1 2 3 4)"),
    ("multipointm", "MULTIPOINT M ((1 2 3), (4 5 6))"),
    ("multipointzm", "MULTIPOINT ZM ((1 2 3 4), (5 6 7 8))"),
    ("linestringm", "MULTILINESTRING M ((1 2 3, 4 5 6))"),
    ("linestringzm", "MULTILINESTRING ZM ((1 2 3 4, 5 6 7 8))"),
    ("multilinestringm", "MULTILINESTRING M ((1 2 3, 4 5 6))"),
    ("multilinestringzm", "MULTILINESTRING ZM ((1 2 3 4, 5 6 7 8))"),
    ("polygonm",
     "MULTIPOLYGON M (((0 0 1, 0 1 2, 1 1 3, 1 0 4, 0 0 1)))"),
    ("polygonzm",
     "MULTIPOLYGON ZM (((0 0 1 -1, 0 1 2 -2, 1 1 3 -3, 1 0 4 -4, "
     "0 0 1 -1)))"),
    ("multipolygonm",
     "MULTIPOLYGON M (((0 0 1, 0 1 2, 1 1 3, 1 0 4, 0 0 1)))"),
    ("multipolygonzm",
     "MULTIPOLYGON ZM (((0 0 1 -1, 0 1 2 -2, 1 1 3 -3, 1 0 4 -4, "
     "0 0 1 -1)))"),
    ("empty_polygonm", None),
]


class TestMainFixture:
    def test_layer_catalog(self, gdb_root):
        layers = filegdb.list_layers(f"{gdb_root}/testopenfilegdb.gdb")
        for name, _ in DATALIST + DATALIST_M:
            assert name in layers
        assert "none" in layers and "big_layer" in layers
        assert not any(n.startswith("GDB_") for n in layers)

    @pytest.mark.parametrize("name,want",
                             DATALIST + DATALIST_M,
                             ids=[n for n, _ in DATALIST + DATALIST_M])
    def test_geometry(self, gdb_root, name, want):
        t = filegdb.read_filegdb_local(
            f"{gdb_root}/testopenfilegdb.gdb", name)
        assert len(t) >= 1  # XY layers hold 5 rows, M layers 1
        assert_wkt_close(wkt_of(t), want)

    def test_field_values(self, gdb_root):
        # the literal pins of ogr_openfilegdb.py test 1 (line 465-476)
        t = filegdb.read_filegdb_local(
            f"{gdb_root}/testopenfilegdb.gdb", "point")
        row = {k: v[0] for k, v in t.slice(0, 1).to_pydict().items()}
        assert row["id"] == 1
        assert row["str"] == "foo_é"
        assert row["smallint"] == -13
        assert row["int"] == 123
        assert row["float"] == 1.5
        assert row["real"] == 4.56
        assert row["adate"] == datetime.datetime(2013, 12, 26, 12, 34, 56)
        assert row["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
        assert row["xml"] == "<foo></foo>"
        assert row["binary"] == b"\x00\xFF\x7F"
        assert row["binary2"] == b"\x12\x34\x56"
        assert row["nullint"] is None

    def test_schema_types(self, gdb_root):
        import pyarrow as pa
        t = filegdb.read_filegdb_local(
            f"{gdb_root}/testopenfilegdb.gdb", "point")
        s = t.schema
        assert s.field("smallint").type == pa.int16()
        assert s.field("float").type == pa.float32()
        assert s.field("adate").type == pa.timestamp("ms")
        assert s.field("binary").type == pa.binary()

    def test_multipatch(self, gdb_root):
        t = filegdb.read_filegdb_local(
            f"{gdb_root}/testopenfilegdb.gdb", "multipatch")
        w = wkt_of(t)
        # autotest expectation: GC of 3 TINs + 1 MULTIPOLYGON (line 86)
        assert w.startswith("GEOMETRYCOLLECTION Z (TIN Z")
        assert w.count("TIN Z") == 3
        assert "MULTIPOLYGON Z" in w
        assert_wkt_close(
            w,
            "GEOMETRYCOLLECTION Z (TIN Z (((0 0 0, 0 1 0, 1 0 0, 0 0 0)), "
            "((0 1 0, 1 0 0, 1 1 0, 0 1 0))), TIN Z (((10 0 0, 10 1 0, "
            "11 0 0, 10 0 0)), ((10 0 0, 11 0 0, 10 -1 0, 10 0 0))), "
            "TIN Z (((5 0 0, 5 1 0, 6 0 0, 5 0 0))), MULTIPOLYGON Z "
            "(((100 0 0, 100 1 0, 101 1 0, 101 0 0, 100 0 0), "
            "(100.25 0.25 0, 100.75 0.25 0, 100.75 0.75 0, 100.75 0.25 0, "
            "100.25 0.25 0))))")

    def test_hole_layer_fid_order(self, gdb_root):
        """FID-order iteration across a deleted-row hole + relocated
        field-descriptor section (row written at offset 40)."""
        t = filegdb.read_filegdb_local(
            f"{gdb_root}/testopenfilegdb.gdb", "hole")
        fids = t["fid"].to_pylist()
        strs = t["str"].to_pylist()
        assert fids == list(range(2, 14))  # FID 1 deleted
        assert strs == [f"fid{i}" for i in range(2, 12)] + [None, "fid13"]

    def test_big_layer(self, gdb_root):
        t = filegdb.read_filegdb_local(
            f"{gdb_root}/testopenfilegdb.gdb", "big_layer")
        assert len(t) == 341
        reals = t["real"].to_pylist()
        assert reals[:5] == [0.0, 1.0, 2.0, 3.0, 0.0]  # real = i % 4

    def test_srs_wkt(self, gdb_root):
        w = filegdb.layer_srs_wkt(f"{gdb_root}/testopenfilegdb.gdb", "point")
        assert "GCS_WGS_1984" in w


class TestV9:
    @pytest.mark.parametrize("gdb", ["testopenfilegdb92.gdb",
                                     "testopenfilegdb93.gdb"])
    def test_v9_read(self, gdb_root, gdb):
        layers = filegdb.list_layers(f"{gdb_root}/{gdb}")
        assert "point" in layers
        t = filegdb.read_filegdb_local(f"{gdb_root}/{gdb}", "point")
        assert len(t) == 5
        assert_wkt_close(wkt_of(t), "POINT (1 2)")
        assert t["str"][0].as_py() == "foo_é"
        t = filegdb.read_filegdb_local(f"{gdb_root}/{gdb}", "multipolygon")
        assert_wkt_close(
            wkt_of(t),
            "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0), (0.25 0.25, "
            "0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25)), "
            "((2 0, 2 1, 3 1, 3 0, 2 0)))")


class TestCurves:
    @pytest.mark.parametrize("layer,csvf", [("line", "curves_line.csv"),
                                            ("polygon",
                                             "curves_polygon.csv")])
    def test_curves_vs_reference_csv(self, tmp_path, layer, csvf):
        import shutil
        shutil.copytree(f"{DATA}/curves.gdb", tmp_path / "curves.gdb")
        with open(f"{DATA}/{csvf}") as f:
            exp = list(csv.DictReader(f))
        t = filegdb.read_filegdb_local(str(tmp_path / "curves.gdb"), layer)
        assert len(t) == len(exp)
        for i in range(len(t)):
            assert_wkt_close(wkt_of(t, i), exp[i]["WKT"])

    @pytest.mark.parametrize("gdb", [
        "filegdb_polygonzm_nan_m_with_curves.gdb",
        "filegdb_polygonzm_m_not_closing_with_curves.gdb"])
    def test_zm_curve_fixtures(self, tmp_path, gdb):
        import shutil
        shutil.copytree(f"{DATA}/{gdb}", tmp_path / gdb)
        with open(f"{DATA}/{gdb}.csv") as f:
            exp = list(csv.DictReader(f))
        path = str(tmp_path / gdb)
        layer = next(iter(filegdb.list_layers(path)))
        t = filegdb.read_filegdb_local(path, layer)
        assert len(t) == len(exp)
        for i in range(len(t)):
            assert_wkt_close(wkt_of(t, i), exp[i]["WKT"], rel=2e-5)


class TestMisc:
    def test_sparse_table(self, gdb_root):
        """sparse.gdb exercises the .gdbtablx present-block bitmap."""
        t = filegdb.read_filegdb_local(f"{gdb_root}/sparse.gdb",
                                       "ogr_fgdb_20")
        assert len(t) == 12
        # FID set spans five sparse 1024-blocks up to FID 10000001
        assert t["fid"].to_pylist() == [
            2, 3, 4, 7, 8, 9, 10, 2049, 8191, 16384, 10000000, 10000001]

    def test_3005(self, gdb_root):
        t = filegdb.read_filegdb_local(f"{gdb_root}/test3005.gdb",
                                       "test3005")
        assert_wkt_close(wkt_of(t), "POINT (0 0)")

    def test_utf16_strings(self, gdb_root):
        t = filegdb.read_filegdb_local(f"{gdb_root}/test_utf16.gdb", "foo")
        assert t["str"][0].as_py() == "évenéven"

    def test_pro32_types(self, tmp_path):
        import shutil
        shutil.copytree(f"{DATA}/arcgis_pro_32_types.gdb",
                        tmp_path / "t.gdb")
        t = filegdb.read_filegdb_local(str(tmp_path / "t.gdb"), "big_int")
        assert t["big"].to_pylist() == [9007199254740991,
                                        -9007199254740991]
        assert t["short"].to_pylist() == [32767, -32768]
        t = filegdb.read_filegdb_local(str(tmp_path / "t.gdb"),
                                       "date_types")
        assert t["date"][0].as_py() == \
            datetime.datetime(2023, 11, 29, 13, 14, 15)
        assert t["date_only"][0].as_py() == datetime.date(2023, 11, 29)
        assert t["time_only"][0].as_py() == datetime.time(13, 14, 15)

    def test_table_outside_gdbitems(self, tmp_path):
        """Catalog-driven listing picks up tables missing from GDB_Items
        (the reference's table_outside_gdbitems regression case)."""
        import shutil
        shutil.copytree(f"{DATA}/table_outside_gdbitems.gdb",
                        tmp_path / "t.gdb")
        layers = filegdb.list_layers(str(tmp_path / "t.gdb"))
        assert {"aquaduct", "flat_table1", "flat_table2"} <= set(layers)

    def test_ray_dataset_read(self, gdb_root, ray_session):
        ds = filegdb.read_filegdb(f"{gdb_root}/testopenfilegdb.gdb",
                                  "point")
        t = ds.take_all()
        assert len(t) == 5
        assert t[0]["str"] == "foo_é"


import numpy as np


class TestWriter:
    """Round-5 write path: minimal V3 catalog + layer tables that the
    repo's own reader (and the reference's catalog fallback) decode."""

    def _roundtrip(self, tmp_path, table, layer="lyr"):
        from gdal_ray.filegdb import read_filegdb_local, write_filegdb

        p = str(tmp_path / "out.gdb")
        n = write_filegdb(table, p, layer=layer)
        assert n == table.num_rows
        return read_filegdb_local(p, layer)

    def test_attributes_and_nulls(self, tmp_path):
        import pyarrow as pa

        t = pa.table({
            "name": ["a", None, "ünïcode"],
            "i32": pa.array([1, 2, None], pa.int32()),
            "i64": pa.array([2**40, None, 3], pa.int64()),
            "f64": [1.5, None, -2.25],
            "blob": pa.array([b"\x00\x01", None, b""], pa.binary()),
        })
        r = self._roundtrip(tmp_path, t)
        assert r.column("name").to_pylist() == ["a", None, "ünïcode"]
        assert r.column("i32").to_pylist() == [1, 2, None]
        assert r.column("i64").to_pylist() == [2**40, None, 3]
        assert r.column("f64").to_pylist() == [1.5, None, -2.25]
        assert r.column("blob").to_pylist() == [b"\x00\x01", None, b""]
        assert r.column("fid").to_pylist() == [1, 2, 3]

    def test_geometries(self, tmp_path):
        import pyarrow as pa

        from gdal_ray.geom.wkt import from_wkt, to_wkt

        cases = [
            "POINT (1.25 2.5)",
            "MULTIPOINT (0 0, 1.5 2.5)",
            "LINESTRING (0 0, 1 1, 2 0.5)",
            "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 5))",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 1))",
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
            "((5 5, 6 5, 6 6, 5 5)))",
        ]
        t = pa.table({"geometry": [from_wkt(c) for c in cases]})
        r = self._roundtrip(tmp_path, t)
        from gdal_ray.geom import wkb as W

        for i, c in enumerate(cases):
            got = W.parse(r.column("geometry")[i].as_py())
            want = W.parse(from_wkt(c))
            # the reader promotes LineString/Polygon to Multi (layer
            # rule); compare coordinate multisets instead of types
            def flat(g):
                out = []
                def walk(n):
                    if "coords" in n:
                        out.append(np.asarray(n["coords"]))
                    for rr in n.get("rings", []):
                        out.append(np.asarray(rr))
                    for p in n.get("parts", []):
                        walk(p)
                walk(g)
                return np.vstack(out) if out else np.empty((0, 2))

            a = flat(got)
            b = flat(want)
            assert len(a) == len(b), c
            assert np.allclose(
                np.sort(a.round(7), axis=0),
                np.sort(b.round(7), axis=0)), c

    def test_many_rows_multiblock_tablx(self, tmp_path):
        import pyarrow as pa

        n = 1500  # crosses the 1024-entry .gdbtablx block boundary
        t = pa.table({"v": pa.array(list(range(n)), pa.int32())})
        r = self._roundtrip(tmp_path, t)
        assert r.num_rows == n
        assert r.column("v").to_pylist() == list(range(n))
        assert r.column("fid").to_pylist() == list(range(1, n + 1))

    def test_coordinate_precision(self, tmp_path):
        import pyarrow as pa

        from gdal_ray.geom import wkb as W
        from gdal_ray.geom.wkt import from_wkt

        t = pa.table({"geometry": [from_wkt(
            "POINT (123.456789012 -45.987654321)")]})
        r = self._roundtrip(tmp_path, t)
        g = W.parse(r.column("geometry")[0].as_py())
        # 1e-9 grid resolution
        assert np.allclose(g["coords"][0],
                           [123.456789012, -45.987654321], atol=2e-9)
