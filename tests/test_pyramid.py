"""Tile-pyramid reduction tests (local + distributed groupby path)."""

import numpy as np
import pytest

from gdal_ray.raster import model, overview


def test_pyramid_distributed_matches_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.rasterpipe import pyramid_distributed

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (256, 256)).astype(np.uint8)
    gt = (0.0, 1.0, 0.0, 256.0, 0.0, -1.0)
    t0 = model.from_array(arr, "EPSG:3857", gt, tile_size=64)
    t0 = t0.append_column("level", pa.array([0] * t0.num_rows, pa.int32()))
    ds = rd.from_arrow(t0)

    lvl1 = pyramid_distributed(ds, tile_size=64, method="average")
    out = lvl1.to_pandas()
    assert len(out) == 4  # 4x4 tiles -> 2x2 parents
    assert (out["level"] == 1).all()
    # assemble and compare against whole-array reduce
    rows = pa.Table.from_pandas(out)
    assembled = model.to_array(rows)
    expected = overview.reduce_2x2(arr, "average")
    np.testing.assert_array_equal(assembled, expected)
    # geotransform doubled
    g = out.iloc[0]["geotransform"]
    assert g[1] == 2.0 and g[5] == -2.0


def test_two_level_pyramid(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.rasterpipe import pyramid_distributed

    arr = np.arange(256 * 256, dtype=np.uint16).reshape(256, 256) % 4096
    arr = arr.astype(np.uint16)
    t0 = model.from_array(arr, "EPSG:3857", (0, 1, 0, 256, 0, -1), tile_size=64)
    t0 = t0.append_column("level", pa.array([0] * t0.num_rows, pa.int32()))
    lvl1 = pyramid_distributed(rd.from_arrow(t0), 64, "nearest")
    lvl2 = pyramid_distributed(lvl1, 64, "nearest")
    out = lvl2.to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["level"] == 2
    a = model.tile_array(out.iloc[0].to_dict())
    expected = overview.reduce_2x2(overview.reduce_2x2(arr, "nearest"), "nearest")
    np.testing.assert_array_equal(a, expected)
