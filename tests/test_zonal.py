"""Zonal statistics tests vs direct numpy masking."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as gwkb
from gdal_ray.raster import model, zonal


def test_zonal_array_matches_mask_oracle():
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 100, (40, 40))
    gt = (0.0, 1.0, 0.0, 40.0, 0.0, -1.0)
    shapes = [
        (gwkb.box_polygon_wkb(0, 0, 20, 20), 0.0),
        (gwkb.box_polygon_wkb(20, 20, 40, 40), 1.0),
        (gwkb.box_polygon_wkb(5, 5, 15, 15), 2.0),  # overlaps zone 0 (wins)
    ]
    out = zonal.zonal_stats_array(vals, gt, shapes).to_pandas().set_index("zone")
    # oracle: pixel centers, last-burn-wins
    yy, xx = np.meshgrid(np.arange(40) + 0.5, np.arange(40) + 0.5, indexing="ij")
    wx, wy = model.pixel_to_world(gt, xx, yy)
    zone = np.full((40, 40), -1)
    for zid, (x0, y0, x1, y1) in enumerate([(0, 0, 20, 20), (20, 20, 40, 40), (5, 5, 15, 15)]):
        m = (wx >= x0) & (wx <= x1) & (wy >= y0) & (wy <= y1)
        zone[m] = zid
    for zid in range(3):
        sel = vals[zone == zid]
        assert out.loc[zid, "n"] == len(sel)
        assert out.loc[zid, "mean"] == pytest.approx(sel.mean())
        assert out.loc[zid, "min"] == pytest.approx(sel.min())
        assert out.loc[zid, "max"] == pytest.approx(sel.max())
        assert out.loc[zid, "std"] == pytest.approx(sel.std(), rel=1e-9)


def test_zonal_distributed_matches_single(ray_session):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 50, (64, 64))
    gt = (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)
    shapes = [
        (gwkb.box_polygon_wkb(0, 0, 30, 30), 0.0),
        (gwkb.box_polygon_wkb(30, 0, 64, 64), 1.0),
    ]
    single = zonal.zonal_stats_array(vals, gt, shapes).to_pandas().set_index("zone")

    tiles = model.from_array(vals, "EPSG:3857", gt, tile_size=16)
    tiles = tiles.set_column(
        tiles.schema.get_field_index("dtype"),
        "dtype",
        pa.array(["float64"] * tiles.num_rows),
    )
    ds = rd.from_arrow(tiles)
    ref = ray.put(shapes)
    parts = ds.map_batches(
        zonal.ZonalPartialStage,
        batch_format="pyarrow",
        concurrency=(1, 2),
        fn_constructor_kwargs={"shapes_ref": ref, "n_zones": 2},
    )
    agg = parts.groupby("zone").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum", alias_name="sum"),
        Sum("sum2", alias_name="sum2"),
        Min("min", alias_name="min"),
        Max("max", alias_name="max"),
    ).to_pandas().set_index("zone")
    for zid in (0, 1):
        assert agg.loc[zid, "n"] == single.loc[zid, "n"]
        assert agg.loc[zid, "sum"] == pytest.approx(single.loc[zid, "sum"], rel=1e-12)
        assert agg.loc[zid, "min"] == pytest.approx(single.loc[zid, "min"])
        assert agg.loc[zid, "max"] == pytest.approx(single.loc[zid, "max"])
