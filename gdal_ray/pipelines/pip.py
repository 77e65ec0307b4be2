"""PIP-join pipeline: pages → points → admin-boundary join → rollups.

The north-rule core: stateful actor pools hold the broadcast
boundary index, the point side streams. Includes the hot-cell salting
pattern for the skewed aggregate (SURVEY.md §7.2 step 6).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from gdal_ray import fixtures
from gdal_ray.pipelines import flagship
from gdal_ray.stages.join import pip_join


def pages_pip(
    sf_dir: str,
    keep_unmatched: bool = False,
    concurrency: int | tuple[int, int] = (1, 4),
) -> rd.Dataset:
    """documents → pages → geoparse → PIP join vs the 100 admin boxes.

    Output: one row per (page, admin) intersection with url + admin
    attrs (Intersection semantics; ``keep_unmatched=True`` for the
    OGR-SQL-JOIN-style left join).
    """
    pages = flagship.geotag_pages(flagship.pages_from_documents(sf_dir))
    boundaries = fixtures.gen_boundaries()
    return pip_join(
        pages,
        boundaries,
        id_cols=("admin_id", "name"),
        keep_unmatched=keep_unmatched,
        concurrency=concurrency,
    )


def admin_page_counts(sf_dir: str, concurrency=(1, 4)) -> rd.Dataset:
    """Pages per admin polygon — pre-aggregated inside map_batches
    before the groupby (hot admins — the Jakarta box — produce many
    rows; the partial aggregate is the salting-equivalent that keeps
    the shuffle one row per (admin, batch))."""
    joined = pages_pip(sf_dir, concurrency=concurrency)

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["admin_id"])
            .group_by(["admin_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["admin_id", "partial_count"])

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("admin_id", num_partitions=4)
        .aggregate(Sum("partial_count", alias_name="n_pages"))
    )
