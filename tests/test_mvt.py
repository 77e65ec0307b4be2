"""MVT 2.1 encoder — spec-example pins, roundtrips, Dataset sink."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_ray import mvt


class TestSpecPins:
    def test_point_25_17(self):
        """MVT 2.1 spec §4.3.5.1: Point(25,17) encodes as [9, 50, 34]."""
        cmds = mvt._geometry_commands(1, [[(25, 17)]])
        assert cmds == [9, 50, 34]

    def test_multipoint_example(self):
        """Spec: MultiPoint (5,7),(3,2) → [17, 10, 14, 3, 9]."""
        cmds = mvt._geometry_commands(1, [[(5, 7), (3, 2)]])
        assert cmds == [17, 10, 14, 3, 9]

    def test_linestring_example(self):
        """Spec: LineString (2,2)->(2,10)->(10,10) →
        [9, 4, 4, 18, 0, 16, 16, 0]."""
        cmds = mvt._geometry_commands(2, [[(2, 2), (2, 10), (10, 10)]])
        assert cmds == [9, 4, 4, 18, 0, 16, 16, 0]

    def test_polygon_example(self):
        """Spec: Polygon (3,6)(8,12)(20,34) closed →
        [9, 6, 12, 18, 10, 12, 24, 44, 15]."""
        cmds = mvt._geometry_commands(
            3, [[(3, 6), (8, 12), (20, 34), (3, 6)]])
        assert cmds == [9, 6, 12, 18, 10, 12, 24, 44, 15]

    def test_zigzag(self):
        for v, z in ((0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)):
            assert mvt._zigzag(v) == z
            assert mvt._unzigzag(z) == v


class TestRoundtrip:
    def test_full_tile(self):
        feats = [
            {"geom_type": 1, "parts": [[(100, 200)]],
             "properties": {"name": "a", "rank": 3, "score": 1.5,
                            "flag": True}},
            {"geom_type": 2, "parts": [[(0, 0), (50, 50), (100, 0)]],
             "properties": {"name": "b"}},
            {"geom_type": 3,
             "parts": [[(10, 10), (90, 10), (90, 90), (10, 10)]],
             "properties": {"rank": 3}},
        ]
        data = mvt.encode_tile({"lyr": feats}, extent=4096)
        back = mvt.decode_tile(data)
        lyr = back["lyr"]
        assert lyr["extent"] == 4096
        f = lyr["features"]
        assert len(f) == 3
        assert f[0]["parts"] == [[(100, 200)]]
        assert f[0]["properties"] == {"name": "a", "rank": 3, "score": 1.5,
                                      "flag": True}
        assert f[1]["parts"] == [[(0, 0), (50, 50), (100, 0)]]
        # polygon closed by ClosePath
        assert f[2]["parts"][0][0] == f[2]["parts"][0][-1]
        assert f[2]["properties"] == {"rank": 3}

    def test_value_dedup(self):
        feats = [
            {"geom_type": 1, "parts": [[(1, 1)]], "properties": {"k": "v"}}
            for _ in range(50)
        ]
        data = mvt.encode_tile({"l": feats})
        # 50 features sharing one key/value: layer stays small
        assert len(data) < 50 * 20
        back = mvt.decode_tile(data)
        assert all(
            f["properties"] == {"k": "v"} for f in back["l"]["features"]
        )

    def test_multi_layer(self):
        data = mvt.encode_tile(
            {
                "a": [{"geom_type": 1, "parts": [[(0, 0)]],
                       "properties": {}}],
                "b": [{"geom_type": 1, "parts": [[(5, 5)]],
                       "properties": {}}],
            }
        )
        back = mvt.decode_tile(data)
        assert set(back) == {"a", "b"}


class TestDatasetSink:
    def test_write_mvt_tiles(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import ray.data as rd

        rng = np.random.default_rng(3)
        n = 2000
        t = pa.table(
            {
                "lon": rng.uniform(-170, 170, n),
                "lat": rng.uniform(-80, 80, n),
                "name": [f"p{i}" for i in range(n)],
            }
        )
        ds = rd.from_arrow(t)
        n_tiles = mvt.write_mvt_tiles(
            ds, str(tmp_path), zoom=3, property_cols=["name"]
        )
        files = []
        for root, _d, fs in os.walk(tmp_path):
            files += [os.path.join(root, f) for f in fs if f.endswith(".mvt")]
        assert len(files) == n_tiles > 10
        total = 0
        for f in files:
            back = mvt.decode_tile(open(f, "rb").read())
            feats = back["points"]["features"]
            total += len(feats)
            for ft in feats:
                (x, y), = ft["parts"][0]
                assert 0 <= x < 4096 and 0 <= y < 4096
                assert ft["properties"]["name"].startswith("p")
        assert total == n
