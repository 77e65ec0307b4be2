"""Cell-partitioned PIP join ≡ broadcast PIP join (the both-sides-
large fallback must produce the identical match multiset)."""

import numpy as np
import pyarrow as pa
import pytest


def test_cell_partitioned_equals_broadcast(ray_session):
    import ray.data as rd

    from gdal_ray import fixtures
    from gdal_ray.stages.join import cell_partitioned_pip, pip_join

    rng = np.random.default_rng(19)
    pts = pa.table(
        {
            "pid": pa.array(np.arange(2000, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-85, 85, 2000)),
            "lat": pa.array(rng.uniform(-65, 65, 2000)),
        }
    )
    b = fixtures.gen_boundaries()

    broadcast = (
        pip_join(rd.from_arrow(pts), b, id_cols=("admin_id",), concurrency=1)
        .to_pandas()
    )
    partitioned = cell_partitioned_pip(
        rd.from_arrow(pts),
        rd.from_arrow(b.select(["admin_id", "geometry"])),
        zoom=4,
        id_cols=("admin_id",),
        num_partitions=4,
    ).to_pandas()

    got = sorted(zip(partitioned["pid"], partitioned["admin_id"]))
    exp = sorted(zip(broadcast["pid"], broadcast["admin_id"]))
    assert got == exp
    assert len(exp) > 1000
