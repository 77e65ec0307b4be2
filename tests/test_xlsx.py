"""XLSX reader (gdal_ray/xlsx.py) vs the reference autotest pins
(autotest/ogr/ogr_xlsx.py)."""
import datetime
import os

import pytest

from gdal_ray import xlsx

DATA = "/root/reference/autotest/ogr/data/xlsx"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent")


def test_sheet_inventory():
    """ogr_xlsx_check: 8 non-empty sheets, Feuille1 has 26 rows."""
    names = xlsx.list_sheets(f"{DATA}/test.xlsx")
    assert len(names) == 8
    assert names[0] == "Feuille1"
    t = xlsx.read_xlsx(f"{DATA}/test.xlsx", "Feuille1")
    assert len(t) == 26


def test_feuille7_types_and_values():
    import pyarrow as pa
    t = xlsx.read_xlsx(f"{DATA}/test.xlsx", "Feuille7")
    s = t.schema
    assert len(s) == 12
    want = [pa.string(), pa.int32(), pa.float64(), pa.float64(),
            pa.date32(), pa.timestamp("ms"), pa.float64(),
            pa.time32("s"), pa.float64(), pa.int32(), pa.float64(),
            pa.timestamp("ms")]
    assert [f.type for f in s] == want
    row = {k: v[0] for k, v in t.slice(0, 1).to_pydict().items()}
    vals = list(row.values())
    assert vals[0] == "val"
    assert vals[1] == 23
    assert vals[2] == 3.45
    assert vals[3] == 0.52
    assert vals[4] == datetime.date(2012, 1, 22)
    assert vals[5] == datetime.datetime(2012, 1, 22, 18, 49)
    assert vals[7] == datetime.time(12, 34, 56)


def test_datetime_seconds():
    t = xlsx.read_xlsx(f"{DATA}/datetime.xlsx")
    got = [v.strftime("%Y/%m/%d %H:%M:%S") for v in
           t["time"].to_pylist()]
    assert got == [
        "2020/04/07 09:58:00", "2020/04/07 09:58:01",
        "2020/04/07 09:58:02", "2020/04/07 09:58:03",
        "2020/04/07 09:58:04", "2020/04/07 09:58:05",
        "2020/04/07 10:03:00", "2020/04/07 10:10:00",
        "2020/04/07 10:29:00", "2020/04/07 10:42:00"]


def test_inline_str_forced_headers():
    t = xlsx.read_xlsx(f"{DATA}/inlineStr.xlsx", headers="FORCE")
    assert len(t) == 1
    assert t["Bl_District_t"][0].as_py() == "text6"
    assert float(t["Lat"][0].as_py()) == pytest.approx(23.6247122,
                                                       abs=1e-5)


def test_inline_formatting():
    t = xlsx.read_xlsx(f"{DATA}/cells_with_inline_formatting.xlsx")
    rows = list(zip(*[t[c].to_pylist() for c in t.schema.names]))
    assert rows == [(1, "text 2", "text 3"), (2, "text 4", "text5")]


def test_row_without_r():
    t = xlsx.read_xlsx(f"{DATA}/row_without_r_attribute.xlsx")
    assert t.schema.names == ["ID", "NAME"]
    assert len(t) == 1


def test_empty_last_field():
    t = xlsx.read_xlsx(f"{DATA}/test_empty_last_field.xlsx")
    assert len(t) == 254
