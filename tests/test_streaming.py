"""Incremental ingest: actor-state result == batch groupby; snapshot/
restore resumes mid-stream."""

import numpy as np
import pyarrow as pa
import pytest


def test_incremental_equals_batch(ray_session, sf_small):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from gdal_ray.stages.streaming import IncrementalIngestor

    ds = rd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ing = IncrementalIngestor(n_buckets=3)
    ing.run(ds, "user_id", "ts", "value", batch_size=128)
    inc = ing.result().to_pandas().set_index("key").sort_index()

    batch = (
        ds.groupby("user_id", num_partitions=2)
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (inc["n"] == batch["n"]).all()
    np.testing.assert_allclose(inc["sum_value"], batch["sum_value"], rtol=1e-9)


def test_snapshot_restore_resume(ray_session, sf_small):
    import ray.data as rd

    from gdal_ray.stages.streaming import IncrementalIngestor

    ds = rd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts", "value"])
    df = ds.sort("ts").to_pandas()
    half = len(df) // 2
    first = rd.from_pandas(df.iloc[:half])
    second = rd.from_pandas(df.iloc[half:])

    ing = IncrementalIngestor(n_buckets=2)
    ing.run(first, "user_id", "ts", "value")
    snaps = ing.snapshots()

    # "crash": a NEW ingestor restores the snapshot, continues
    ing2 = IncrementalIngestor(n_buckets=2)
    ing2.restore(snaps)
    ing2.run(second, "user_id", "ts", "value")
    resumed = ing2.result().to_pandas().set_index("key").sort_index()

    full = IncrementalIngestor(n_buckets=2)
    full.run(rd.from_pandas(df), "user_id", "ts", "value")
    expect = full.result().to_pandas().set_index("key").sort_index()
    assert (resumed["n"] == expect["n"]).all()
    np.testing.assert_allclose(resumed["sum_value"], expect["sum_value"], rtol=1e-9)


def test_out_of_order_rejected(ray_session):
    import ray
    import ray.data as rd

    from gdal_ray.stages.streaming import IncrementalIngestor

    t1 = pa.table({"user_id": pa.array([1], pa.int64()),
                   "ts": pa.array([100], pa.int64()),
                   "value": pa.array([1.0])})
    t0 = pa.table({"user_id": pa.array([1], pa.int64()),
                   "ts": pa.array([50], pa.int64()),
                   "value": pa.array([1.0])})
    ing = IncrementalIngestor(n_buckets=1)
    ing.run(rd.from_arrow(t1), "user_id", "ts", "value")
    with pytest.raises(Exception, match="out-of-order"):
        ing.run(rd.from_arrow(t0), "user_id", "ts", "value")
