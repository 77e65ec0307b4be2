"""MapInfo TAB binary reader (gdal_ray/tab.py) vs reference autotest
fixtures (autotest/ogr/data/mitab/) — geometry decode pinned to the
reference's own all_geoms.mif.golden.csv, binary .dat field values
pinned to the .mid twins, compressed/deleted/charset cases."""
import csv
import os
import re
import zipfile

import numpy as np
import pytest

from gdal_ray import tab
from gdal_ray.geom import wkt as gwkt

DATA = "/root/reference/autotest/ogr/data/mitab"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data absent")

_NUM = r"-?[\d.]+(?:[eE][-+]?\d+)?"


def _mp_flat(w: str) -> str:
    """Old-style `MULTIPOINT (0 1,2 3)` → ISO `((0 1),(2 3))` so the
    golden CSV's form compares against our ISO WKT (idempotent)."""
    def fix(m):
        pts = m.group(1).split(",")
        return ("MULTIPOINT ("
                + ",".join("(" + p.strip() + ")" for p in pts) + ")")
    return re.sub(r"MULTIPOINT \(([^()]*)\)", fix, w.replace(", ", ","))


def assert_wkt_close(got, want, rel=1e-9):
    if want is None:
        assert got is None
        return
    gs = re.sub(_NUM, "#", _mp_flat(got))
    ws = re.sub(_NUM, "#", _mp_flat(want))
    assert gs == ws, f"structure:\n {got[:120]}\n {want[:120]}"
    gn = [float(x) for x in re.findall(_NUM, got)]
    wn = [float(x) for x in re.findall(_NUM, want)]
    assert len(gn) == len(wn)
    for a, b in zip(gn, wn):
        assert abs(a - b) <= max(1e-9, abs(b) * rel)


def _golden():
    with open(f"{DATA}/all_geoms.mif.golden.csv") as f:
        return list(csv.DictReader(f))


class TestAllGeoms:
    def test_geometries_vs_golden(self):
        t = tab.read_tab_local(f"{DATA}/all_geoms.tab")
        exp = _golden()
        assert len(t) == len(exp) == 16
        for i in range(len(t)):
            g = t["geometry"][i].as_py()
            assert_wkt_close(gwkt.to_wkt(g) if g else None, exp[i]["WKT"])

    def test_32256_block_size(self, tmp_path):
        zipfile.ZipFile(f"{DATA}/all_geoms_block_32256.zip").extractall(
            tmp_path)
        t = tab.read_tab_local(str(tmp_path / "all_geoms_block_32256.tab"))
        exp = _golden()
        assert len(t) == 16
        for i in range(len(t)):
            g = t["geometry"][i].as_py()
            assert_wkt_close(gwkt.to_wkt(g) if g else None, exp[i]["WKT"])

    def test_text_content(self):
        t = tab.read_tab_local(f"{DATA}/all_geoms.tab")
        texts = [x for x in t["mi_text"].to_pylist() if x]
        assert texts == ["text"]


class TestDatFields:
    def test_all_possible_fields(self):
        """Binary .dat values == the .mid twin's literal row."""
        t = tab.read_tab_local(f"{DATA}/all_possible_fields.tab")
        assert len(t) == 2
        row = {k: v[0] for k, v in t.to_pydict().items()}
        assert row["field1"] == "test"
        assert row["Field2"] == 120
        assert row["Field3"] == 12345
        assert row["Field4"] == 123456789012345
        assert row["Field5"] == 12.34
        assert row["Field6"] == 12.34
        assert row["Field7"] == "2022-12-31"
        assert row["Field8"] == 23 * 3600000 + 59 * 60000  # 23:59:00.000
        assert row["Field9"] == "2022-03-23T14:56:00.000"
        assert row["Field10"] is True
        assert t["Field10"][1].as_py() is False

    def test_first_table(self):
        t = tab.read_tab_local(f"{DATA}/first_table.tab")
        assert t["joint_field"][0].as_py() == 1
        assert t["foo"][0].as_py() == "foo"
        # (0.99, 2): the fixture's 33.33/66.67 int scale, as the
        # reference itself decodes it
        assert_wkt_close(gwkt.to_wkt(t["geometry"][0].as_py()),
                         "POINT (0.99 2)")

    def test_aspatial(self):
        t = tab.read_tab_local(f"{DATA}/aspatial-table.tab")
        assert len(t) == 2
        assert "geometry" not in t.schema.names or \
            t["geometry"].null_count == len(t)

    def test_win1251_charset(self):
        t = tab.read_tab_local(f"{DATA}/tab-win1251.TAB")
        assert t.schema.names[2] == "Поле_А"
        assert t["Поле_А"].to_pylist() == ["Значение А", "Значение 1",
                                           "Полигон"]
        assert t["Поле_Д"][2].as_py() == "ЪЫЁЩ"

    def test_win1251_text_object(self):
        t = tab.read_tab_local(f"{DATA}/tab-win1251_text.tab")
        assert t["mi_text"].to_pylist() == ["Поле"]


class TestCompressed:
    def test_deleted_records_grid(self, tmp_path):
        """100×100 point grid with interior deleted: 396 live edge
        points, compressed int16 deltas against per-block centers."""
        zipfile.ZipFile(
            f"{DATA}/compr_symb_deleted_records.zip").extractall(tmp_path)
        t = tab.read_tab_local(
            str(tmp_path / "compr_symb_deleted_records.tab"))
        assert len(t) == 10000
        geoms = [g for g in t["geometry"].to_pylist() if g]
        assert len(geoms) == 396
        pts = np.array([np.frombuffer(g[5:], "<f8") for g in geoms])
        # every live point lies on the grid edge within the file's
        # 0.01 coordinate precision (the reference test's tolerance)
        snapped = np.round(pts)
        assert np.abs(pts - snapped).max() <= 0.011
        on_edge = ((snapped[:, 0] % 99 == 0) | (snapped[:, 1] % 99 == 0))
        assert on_edge.all()


def test_ray_dataset(ray_session):
    ds = tab.read_tab(f"{DATA}/all_geoms.tab")
    rows = ds.take_all()
    assert len(rows) == 16
