"""MapInfo MIF/MID driver — reference-fixture parity."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as W
from gdal_ray.mif import read_mif, read_mif_dataset, write_mif

D = "/root/reference/autotest/ogr/data/mitab/"


class TestRead:
    def test_small_mif_reference_values(self):
        # ogr_mitab.py test_ogr_mitab_10's exact expectations
        t = read_mif(D + "small.mif")
        assert t.num_rows == 2
        assert t["NAME"][0].as_py() == " S. 11th St."
        assert t["FLOODZONE"][0].as_py() == 10
        assert t["OWNER"][1].as_py() == 'Guarino "Chucky" Sandra'
        g = W.parse(t["geometry"][0].as_py())
        want = np.array([
            [407131.721, 155322.441], [407134.468, 155329.616],
            [407142.741, 155327.242], [407141.503, 155322.467],
            [407140.875, 155320.049], [407131.721, 155322.441]])
        assert g["type"] == 3
        np.testing.assert_allclose(g["rings"][0], want, rtol=1e-12)

    def test_typed_columns(self):
        t = read_mif(D + "small.mif")
        assert t.schema.field("DATA").type == pa.int64()
        assert t.schema.field("APPRAISED_VALUE").type == pa.float64()
        assert t["APPRAISED_VALUE"][0].as_py() == 56115.58

    def test_mif_without_mid(self):
        # gdal #5141: geometry-only features
        t = read_mif(D + "nomid.mif")
        assert t.num_rows == 2
        assert t.column_names == ["geometry"]

    def test_tab_delimiter_and_empty_first_field(self):
        t = read_mif(D + "empty_first_field_with_tab_delimiter.mif")
        assert t["field1"][0].as_py() == ""
        assert t["field2"][0].as_py() == "foo"

    def test_core_geometry_grammar(self, tmp_path):
        mif = """Version 300
Delimiter ","
Columns 0
Data

Point 0 1

Line 0 1 2 3

Pline 3
0 0
1 1
2 0

Pline Multiple 2
2
0 1
2 3
2
3 4
5 6
Pen(1,2,3)

Rect -1 -1 1 1

Multipoint 2
0 1
2 3

Region 2
4
0 0
0 10
10 10
0 0
4
1 2
1 3
2 3
1 2

NONE
"""
        p = tmp_path / "g.mif"
        p.write_text(mif)
        t = read_mif(str(p))
        types = [None if t["geometry"][i].as_py() is None
                 else W.geometry_type(t["geometry"][i].as_py())
                 for i in range(t.num_rows)]
        assert types == [1, 2, 2, 5, 3, 4, 3, None]
        # region hole containment: second ring inside the first
        g = W.parse(t["geometry"][6].as_py())
        assert len(g["rings"]) == 2

    def test_arc_family_vs_golden(self):
        """Ellipse/Arc/RoundRect/Text records match the reference's
        all_geoms.mif.golden.csv discretizations exactly."""
        import csv
        import re
        from gdal_ray.geom import wkt as gwkt
        with open(D + "all_geoms.mif.golden.csv") as f:
            exp = list(csv.DictReader(f))
        t = read_mif(D + "all_geoms.mif")
        assert t.num_rows == len(exp) == 16
        num = r"-?[\d.]+(?:[eE][-+]?\d+)?"
        for i in range(t.num_rows):
            g = t["geometry"][i].as_py()
            got = gwkt.to_wkt(g) if g else None
            gn = [float(x) for x in re.findall(num, got or "")]
            wn = [float(x) for x in re.findall(num, exp[i]["WKT"])]
            assert len(gn) == len(wn), (i, got, exp[i]["WKT"])
            assert all(abs(a - b) <= max(1e-9, abs(b) * 1e-9)
                       for a, b in zip(gn, wn)), i
        assert t["mi_text"][12].as_py() == "text"


class TestWriteRoundtrip:
    def test_roundtrip(self, tmp_path):
        src = read_mif(D + "small.mif")
        p = str(tmp_path / "out.mif")
        write_mif(p, src)
        back = read_mif(p)
        assert back.num_rows == src.num_rows
        for c in ("NAME", "OWNER", "DATA", "FLOODZONE"):
            assert back[c].to_pylist() == src[c].to_pylist()
        for i in range(src.num_rows):
            a = W.parse(src["geometry"][i].as_py())
            b = W.parse(back["geometry"][i].as_py())
            np.testing.assert_allclose(a["rings"][0], b["rings"][0],
                                       rtol=1e-12)
        assert back["APPRAISED_VALUE"].to_pylist() == \
            src["APPRAISED_VALUE"].to_pylist()


class TestDataset:
    def test_distributed_read(self, ray_session):
        ds = read_mif_dataset([D + "small.mif", D + "nomid.mif"])
        t = pa.Table.from_pylist(ds.take_all())
        assert t.num_rows == 4
