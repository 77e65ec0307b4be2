"""ODS reader (gdal_ray/ods.py) vs the reference autotest pins
(autotest/ogr/ogr_ods.py ogr_ods_check + edge fixtures)."""
import datetime
import os

import pyarrow as pa
import pytest

from gdal_ray import ods

DATA = "/root/reference/autotest/ogr/data/ods"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent")


def test_check_pins():
    names = ods.list_sheets(f"{DATA}/test.ods")
    assert len(names) == 8
    assert names[0] == "Feuille1"
    t = ods.read_ods(f"{DATA}/test.ods", "Feuille1")
    assert len(t) == 26
    t = ods.read_ods(f"{DATA}/test.ods", "Feuille7")
    assert [f.type for f in t.schema] == [
        pa.string(), pa.int32(), pa.float64(), pa.float64(),
        pa.date32(), pa.timestamp("ms"), pa.float64(), pa.time32("s"),
        pa.float64(), pa.int32(), pa.float64(), pa.timestamp("ms")]
    row = [v[0] for v in t.slice(0, 1).to_pydict().values()]
    assert row[0] == "val"
    assert row[1] == 23
    assert row[2] == 3.45
    assert row[3] == 0.52
    assert row[4] == datetime.date(2012, 1, 22)
    assert row[5] == datetime.datetime(2012, 1, 22, 18, 49)
    assert t.column(2)[1].as_py() is None  # unset field on row 2


def test_kspread():
    t = ods.read_ods(f"{DATA}/test_kspread.ods")
    assert len(t) == 26
    assert t["Field1"][0].as_py() == "Hello world"


def test_repeated_cols_at_end_of_row():
    t = ods.read_ods(f"{DATA}/testrepeatedcolatendofrow.ods")
    assert t["vbz"].to_pylist() == [1001, 1002]
    assert t["b"].to_pylist() == [0, 0]


def test_multiple_text_p():
    t = ods.read_ods(f"{DATA}/multiple_text_p_elements.ods")
    assert t["value"][1].as_py() == "First line\nSecond line"


def test_ragged_header():
    t = ods.read_ods(
        f"{DATA}/first_line_3_cols_second_line_2_cols.ods")
    assert t.schema.names == ["primo", "secondo", "terzo"]
