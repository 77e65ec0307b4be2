"""Resume/lineage + skew-salting tests."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest


def _pages_tagged(n=2000):
    import ray.data as rd

    from gdal_ray import fixtures
    from gdal_ray.pipelines import flagship

    t = fixtures.gen_pages(n)
    ds = rd.from_arrow(t)
    return flagship.geotag_pages(ds)


class TestLineage:
    def test_write_resume_skip(self, ray_session, tmp_path):
        import ray.data as rd

        from gdal_ray.state.lineage import ManifestStore, write_partitioned

        out = str(tmp_path / "out")
        ds = _pages_tagged(1000).select_columns(["url", "tile_z7_x"])
        recs = write_partitioned(ds, out, "tile_z7_x")
        n_parts = len(recs)
        assert n_parts > 5
        assert all(r["status"] == "done" for r in recs)
        total_rows = sum(r["rows"] for r in recs)
        assert total_rows == 1000
        # data is readable back as hive partitions
        back = rd.read_parquet(
            [os.path.join(out, d, "data.parquet") for d in os.listdir(out)
             if d.startswith("part=")]
        )
        assert back.count() == 1000

        # simulate a partial failure: delete 3 partitions + manifests
        store = ManifestStore(out)
        victims = sorted(store.completed_keys())[:3]
        for k in victims:
            shutil.rmtree(store.partition_dir(k))
            os.remove(os.path.join(store.manifest_dir, f"{k}.json"))
        assert len(store.completed_keys()) == n_parts - 3

        # resume: only the 3 victims get recomputed (rows == -1 marks skips)
        ds2 = _pages_tagged(1000).select_columns(["url", "tile_z7_x"])
        recs2 = write_partitioned(ds2, out, "tile_z7_x")
        assert len(recs2) == n_parts
        assert len(store.completed_keys()) == n_parts
        # identical content hashes as an untouched fresh run
        out2 = str(tmp_path / "fresh")
        recs3 = write_partitioned(
            _pages_tagged(1000).select_columns(["url", "tile_z7_x"]),
            out2,
            "tile_z7_x",
        )
        h1 = {r["partition"]: r["content_hash"] for r in recs2}
        h2 = {r["partition"]: r["content_hash"] for r in recs3}
        assert h1 == h2

    def test_resume_filter(self, ray_session, tmp_path):
        import ray.data as rd

        from gdal_ray.state.lineage import resume_filter, write_partitioned

        out = str(tmp_path / "o2")
        t = pa.table({"k": pa.array([1, 1, 2, 3]), "v": pa.array([1, 2, 3, 4])})
        write_partitioned(rd.from_arrow(t), out, "k")
        # all partitions committed -> everything filtered
        left = resume_filter(rd.from_arrow(t), "k", out)
        assert left.count() == 0
        # empty store -> passthrough
        left2 = resume_filter(rd.from_arrow(t), "k", str(tmp_path / "empty"))
        assert left2.count() == 4


class TestSkew:
    def test_hot_key_detection_and_salted_count(self, ray_session):
        import ray.data as rd

        from gdal_ray.stages.skew import add_salt, hot_keys, salted_count

        # skewed key distribution: key 0 = 80%
        n = 20000
        keys = np.where(np.arange(n) % 5 != 0, 0, np.arange(n) % 97)
        t = pa.table({"k": pa.array(keys.astype(np.int64)),
                      "v": pa.array(np.arange(n, dtype=np.int64))})
        ds = rd.from_arrow(t)
        hot = hot_keys(ds, "k", threshold_frac=0.05, sample_frac=0.5)
        assert 0 in hot
        salted = add_salt(ds, "k", hot, n_salt=8, hash_col="v")
        sdf = salted.to_pandas()
        assert set(sdf.loc[sdf["k"] == 0, "salt"].unique()) == set(range(8))
        assert (sdf.loc[sdf["k"] != 0, "salt"] == 0).all()
        # counts are exact despite salting
        counts = salted_count(ds, "k", threshold_frac=0.05).to_pandas()
        import collections

        expected = collections.Counter(keys.tolist())
        got = dict(zip(counts["k"], counts["n"]))
        assert got == dict(expected)
