"""HLL + reservoir sampling tests."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import sketch


class TestHLL:
    def test_accuracy_within_bounds(self):
        # p=12 → relative error ~1.04/sqrt(4096) ≈ 1.6%
        for true_n in (1000, 50_000, 500_000):
            h = sketch.HLL(12)
            vals = np.arange(true_n, dtype=np.int64)
            h.add_hashes(sketch._hash64(vals))
            est = h.estimate()
            assert abs(est - true_n) / true_n < 0.06

    def test_merge_equals_union(self):
        a = sketch.HLL(12).add_hashes(sketch._hash64(np.arange(0, 30000)))
        b = sketch.HLL(12).add_hashes(sketch._hash64(np.arange(20000, 60000)))
        u = sketch.HLL(12).add_hashes(sketch._hash64(np.arange(0, 60000)))
        merged = a.merge(b)
        assert merged.estimate() == pytest.approx(u.estimate(), rel=1e-12)

    def test_serialize_roundtrip(self):
        h = sketch.HLL(10).add_hashes(sketch._hash64(np.arange(1000)))
        h2 = sketch.HLL.deserialize(h.serialize(), 10)
        assert h2.estimate() == h.estimate()

    def test_distributed(self, ray_session, sf_mid):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_mid}/lineitem.parquet", columns=["l_orderkey"])
        est = sketch.approx_count_distinct(ds, "l_orderkey")
        exact = len(ds.unique("l_orderkey"))
        assert abs(est - exact) / exact < 0.05

    def test_string_column(self):
        h = sketch.hash_any(pa.array(["a", "b", "a", None]))
        assert h[0] == h[2]
        assert h[0] != h[1]


class TestReservoir:
    def test_exact_size_and_determinism(self, ray_session, sf_small):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_small}/lineitem.parquet",
                             columns=["l_orderkey", "l_linenumber"])
        # composite unique key
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.append_column(
                "rowkey",
                pc.add(pc.multiply(t["l_orderkey"], 10), pc.cast(t["l_linenumber"], pa.int64())),
            ),
            batch_format="pyarrow",
        )
        s1 = sketch.reservoir_sample(ds, 100, "rowkey", seed=7).to_pandas()
        s2 = sketch.reservoir_sample(ds, 100, "rowkey", seed=7).to_pandas()
        assert len(s1) == 100
        assert sorted(s1["rowkey"]) == sorted(s2["rowkey"])
        s3 = sketch.reservoir_sample(ds, 100, "rowkey", seed=8).to_pandas()
        assert sorted(s3["rowkey"]) != sorted(s1["rowkey"])

    def test_uniformity(self, ray_session):
        import ray.data as rd

        # sample 200 of 2000 over many seeds: each item's inclusion
        # frequency ≈ 10%
        t = pa.table({"k": pa.array(np.arange(2000, dtype=np.int64))})
        counts = np.zeros(2000)
        trials = 30
        for seed in range(trials):
            s = sketch.reservoir_sample(rd.from_arrow(t), 200, "k", seed=seed)
            counts[np.array(s.to_pandas()["k"])] += 1
        freq = counts / trials
        assert abs(freq.mean() - 0.1) < 1e-9  # exactly 200/2000 overall
        assert freq.std() < 0.08  # no pathological bias


def test_reservoir_sample_batch_size_invariant(ray_session):
    """The sample must be identical regardless of batch boundaries
    (round-2 ADVICE regression: the int64-cast merge sorted hashes
    >= 2^63 negative-first, so samples depended on batching)."""
    import ray.data as rd

    t = pa.table({"k": pa.array([f"item-{i}" for i in range(3000)])})
    got = {}
    for bs in (7, 250, 3000):
        ds = rd.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=bs
        )
        out = sketch.reservoir_sample(ds, 40, "k").to_pandas()
        got[bs] = sorted(out["k"].tolist())
        assert len(out) == 40
    assert got[7] == got[250] == got[3000]


class TestTDigest:
    def test_accuracy_normal(self):
        import numpy as np

        from gdal_ray.stages.sketch import TDigest

        rng = np.random.default_rng(1)
        x = rng.normal(100, 15, 200_000)
        t = TDigest(200.0)
        for chunk in np.array_split(x, 40):
            t.add(chunk)
        for q in (0.01, 0.5, 0.99):
            exact = np.quantile(x, q)
            assert abs(t.quantile(q) - exact) / abs(exact) < 0.01, q
        assert len(t.means) <= 200

    def test_merge_matches_single(self):
        import numpy as np

        from gdal_ray.stages.sketch import TDigest

        rng = np.random.default_rng(2)
        x = rng.exponential(3.0, 100_000)
        acc = TDigest(300.0)
        for c in np.array_split(x, 16):
            acc.merge(TDigest(300.0).add(c))
        for q in (0.1, 0.5, 0.9, 0.99):
            exact = np.quantile(x, q)
            assert abs(acc.quantile(q) - exact) / abs(exact) < 0.02, q

    def test_serialize_roundtrip_and_edges(self):
        import numpy as np

        from gdal_ray.stages.sketch import TDigest

        t = TDigest(100.0).add(np.array([5.0]))
        assert t.quantile(0.5) == 5.0
        r = TDigest.deserialize(t.serialize(), 100.0)
        assert r.quantile(0.99) == 5.0
        assert np.isnan(TDigest(100.0).quantile(0.5))
        # nan/inf inputs filtered
        t2 = TDigest(100.0).add(np.array([np.nan, np.inf, 1.0, 3.0]))
        assert 1.0 <= t2.quantile(0.5) <= 3.0

    def test_distributed_approx_quantiles(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from gdal_ray.stages.sketch import approx_quantiles
        import ray.data as rd

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_extendedprice"])
        got = approx_quantiles(ds, "l_extendedprice", [0.5, 0.9])
        x = pq.read_table(f"{sf}/lineitem.parquet",
                          columns=["l_extendedprice"])[
            "l_extendedprice"].to_numpy()
        for g, q in zip(got, (0.5, 0.9)):
            exact = np.quantile(x, q)
            assert abs(g - exact) / abs(exact) < 0.02, (q, g, exact)
