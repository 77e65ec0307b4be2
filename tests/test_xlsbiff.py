"""XLS (BIFF8) reader — CFB container + BIFF record stream, pinned to
the reference autotest ogr_xls.py expectations over
test972000xp.xls (field types Integer/Real/String/Date/DateTime and
the first feature's literal values)."""

import datetime

import pyarrow as pa
import pytest

from gdal_ray.xlsbiff import _rk_value, list_sheets, read_xls

P = "/root/reference/autotest/ogr/data/xls/test972000xp.xls"


class TestFixture:
    def test_sheets(self):
        assert list_sheets(P) == ["Feuille1", "Feuille2", "Feuille3"]

    def test_types_and_values(self):
        t = read_xls(P)
        assert t.num_rows == 3
        assert t.num_columns == 5
        assert t.schema.field(0).type == pa.int32()
        assert t.schema.field(1).type == pa.float64()
        assert t.schema.field(2).type == pa.string()
        assert t.schema.field(3).type == pa.date32()
        assert t.schema.field(4).type == pa.timestamp("ms")
        # first feature (ogr_xls.py literals)
        assert t.column(0)[0].as_py() == 1
        assert t.column(1)[0].as_py() == 1.0
        assert t.column(2)[0].as_py() is None
        assert t.column(3)[0].as_py() == datetime.date(1980, 1, 1)
        assert t.column(4)[0].as_py() == datetime.datetime(1980, 1, 1)
        # accents through the SST (latin-1/utf-16 segments)
        assert t.column(2)[2].as_py() == "Val_avec_é"
        # time-only cell promoted into the DateTime column on the
        # 1899-12-30 zero date
        assert t.column(4)[2].as_py() == datetime.datetime(
            1899, 12, 30, 12, 34, 56)

    def test_named_sheet_and_missing(self):
        t = read_xls(P, sheet="Feuille2")
        assert t.num_rows == 0
        with pytest.raises(ValueError):
            read_xls(P, sheet="nope")


class TestRK:
    def test_rk_decoding(self):
        import struct

        # integer RK: 42 << 2 | 0b10
        assert _rk_value((42 << 2) | 0x02) == 42.0
        # negative integer
        assert _rk_value(((-7 & 0x3FFFFFFF) << 2) | 0x02) == -7.0
        # float RK: top 30 bits of an f64
        (top,) = struct.unpack("<I", struct.pack("<d", 2.5)[4:])
        assert _rk_value(top & 0xFFFFFFFC) == 2.5
        # x100 flag
        assert _rk_value(((123 << 2) | 0x03)) == 1.23


class TestRay:
    def test_dataset_and_cli(self, tmp_path):
        from gdal_ray.xlsbiff import read_xls_dataset

        ds = read_xls_dataset(P)
        assert ds.count() == 3
        import subprocess
        import sys

        out = str(tmp_path / "o.csv")
        r = subprocess.run(
            [sys.executable, "-m", "gdal_ray.cli", "vector",
             "convert", P, out],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        import glob
        import os

        files = (glob.glob(os.path.join(out, "*")) if os.path.isdir(out)
                 else [out])
        assert any("FirstCol" in open(f).read() for f in files)
