"""Distributed Bloom filter (stages/bloom.py): no-false-negative
guarantee, FPR bound, associative merge, and the semi/anti probe
stages over real tables."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.bloom import (
    BloomFilter,
    bloom_anti,
    bloom_prefilter,
    build_bloom,
)
from gdal_ray.stages.sketch import _hash64

SF = "/root/testdata/sf0.001"


class TestCore:
    def test_no_false_negatives(self):
        b = BloomFilter(capacity=10_000, fpr=0.01)
        h = _hash64(np.arange(10_000, dtype=np.int64))
        b.add_hashes(h)
        assert b.contains_hashes(h).all()

    def test_fpr_within_bound(self):
        b = BloomFilter(capacity=10_000, fpr=0.01)
        b.add_hashes(_hash64(np.arange(10_000, dtype=np.int64)))
        probe = _hash64(np.arange(100_000, 200_000, dtype=np.int64))
        fpr = b.contains_hashes(probe).mean()
        assert fpr < 0.03, fpr  # 3x theoretical

    def test_empty_filter_rejects_all(self):
        b = BloomFilter(capacity=1000, fpr=0.01)
        assert not b.contains_hashes(
            _hash64(np.arange(1000, dtype=np.int64))
        ).any()

    def test_merge_is_union(self):
        a = BloomFilter(1000, 0.01)
        b = BloomFilter(1000, 0.01)
        ha = _hash64(np.arange(0, 500, dtype=np.int64))
        hb = _hash64(np.arange(500, 1000, dtype=np.int64))
        a.add_hashes(ha)
        b.add_hashes(hb)
        a.merge(b)
        assert a.contains_hashes(ha).all() and a.contains_hashes(hb).all()
        # merge grouping is irrelevant (associativity)
        c = BloomFilter(1000, 0.01).add_hashes(
            _hash64(np.arange(0, 1000, dtype=np.int64))
        )
        assert (a.words == c.words).all()

    def test_serialize_roundtrip(self):
        b = BloomFilter(1000, 0.01)
        b.add_hashes(_hash64(np.arange(100, dtype=np.int64)))
        r = BloomFilter.deserialize(b.serialize(), 1000, 0.01)
        assert (r.words == b.words).all() and r.k == b.k

    def test_incompatible_merge_raises(self):
        with pytest.raises(ValueError):
            BloomFilter(1000, 0.01).merge(BloomFilter(2000, 0.01))


class TestDistributed:
    def test_build_and_probe_orders(self, ray_session):
        import ray.data as rd

        orders = rd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_custkey"])
        customer = rd.read_parquet(f"{SF}/customer.parquet",
                                   columns=["c_custkey", "c_mktsegment"])
        seg = customer.filter(
            lambda r: r["c_mktsegment"] == "BUILDING")
        keys = set(r["c_custkey"] for r in seg.take_all())
        bloom = build_bloom(seg, "c_custkey", capacity=len(keys) or 1,
                            fpr=0.01)

        kept = bloom_prefilter(orders, "o_custkey", bloom).to_pandas()
        dropped = bloom_anti(orders, "o_custkey", bloom).to_pandas()
        all_orders = orders.to_pandas()

        # lossless semi pre-filter: every true member survived
        true_members = all_orders[all_orders["o_custkey"].isin(keys)]
        assert set(true_members["o_custkey"]) <= set(kept["o_custkey"])
        # anti never leaks a member
        assert not dropped["o_custkey"].isin(keys).any()
        # the two probes partition the input
        assert len(kept) + len(dropped) == len(all_orders)
        # false-positive volume stays near fpr
        fp = len(kept) - len(true_members)
        assert fp <= max(5, 0.03 * len(all_orders)), fp

    def test_build_parallelism_independent(self, ray_session):
        import ray.data as rd

        docs = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id"])
        b1 = build_bloom(docs, "doc_id", capacity=1000, fpr=0.01)
        b2 = build_bloom(docs.repartition(7), "doc_id",
                         capacity=1000, fpr=0.01)
        assert (b1.words == b2.words).all()
