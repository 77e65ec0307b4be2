"""Sinks: GeoParquet-convention parquet writes.

``write_geoparquet`` adds the GeoParquet ``geo`` file metadata + the
``ARROW:extension:name=ogc.wkb`` field metadata (GDAL's own Arrow
convention, ogrlayerarrow.cpp:2715; GeoParquet 1.0 metadata spec) so
outputs open directly in GDAL/GeoPandas.
"""

from __future__ import annotations

import json

import pyarrow as pa


def geoparquet_metadata(geom_col: str = "geometry",
                        crs: str = "EPSG:4326") -> dict:
    return {
        "version": "1.0.0",
        "primary_column": geom_col,
        "columns": {
            geom_col: {
                "encoding": "WKB",
                "geometry_types": [],
                "crs": crs,
            }
        },
    }


def attach_geo_metadata(table: pa.Table, geom_col: str = "geometry",
                        crs: str = "EPSG:4326") -> pa.Table:
    """Return the table with GeoParquet file metadata + ogc.wkb field
    metadata on the geometry column."""
    i = table.schema.get_field_index(geom_col)
    f = table.schema.field(i).with_metadata(
        {b"ARROW:extension:name": b"ogc.wkb"}
    )
    schema = table.schema.set(i, f).with_metadata(
        {
            **(table.schema.metadata or {}),
            b"geo": json.dumps(geoparquet_metadata(geom_col, crs)).encode(),
        }
    )
    return table.cast(schema)


def write_geoparquet(ds, path: str, geom_col: str = "geometry",
                     crs: str = "EPSG:4326", **kw) -> None:
    """Dataset → GeoParquet directory (metadata attached per block)."""
    ds.map_batches(
        lambda t: attach_geo_metadata(t, geom_col, crs),
        batch_format="pyarrow",
    ).write_parquet(path, **kw)
