"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in anything these call.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → pages →
    geoparse → WebMercator tile encode (z 7/9/12). Returns the tagged
    Dataset (stable schema, ≥0 rows)."""
    from gdal_ray.pipelines import flagship

    return flagship.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from gdal_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names). Queries
    absent here get the driver's rows-only check."""
    from gdal_ray.queries import ORACLE

    return dict(ORACLE)
