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


# ---------------------------------------------------------------------------
# GeoParquet 1.1 bbox covering


def add_bbox_column(table: pa.Table, geom_col: str = "geometry",
                    bbox_col: str = "bbox") -> pa.Table:
    """Per-row bounds struct ``{xmin, ymin, xmax, ymax}`` (GeoParquet
    1.1 bbox covering). Parquet keeps min/max column statistics per
    row group for each struct field, so a reader's bbox predicate
    prunes row groups at the scan — the spatial-pushdown contract.
    Vectorized for all-point columns; per-geometry bounds otherwise."""
    import numpy as np

    from gdal_ray.geom import wkb as W

    col = table[geom_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    is_point = True
    for b in col:
        v = b.as_py()
        if v is not None and W.geometry_type(v) % 1000 != 1:
            is_point = False
            break
    if is_point:
        x, y = W.decode_points(col)
        xmin, ymin, xmax, ymax = x, y, x, y
    else:
        n = len(col)
        xmin = np.empty(n); ymin = np.empty(n)
        xmax = np.empty(n); ymax = np.empty(n)
        for i, b in enumerate(col):
            v = b.as_py()
            if v is None:
                xmin[i] = ymin[i] = xmax[i] = ymax[i] = float("nan")
            else:
                xmin[i], ymin[i], xmax[i], ymax[i] = W.bounds(v)
    bbox = pa.StructArray.from_arrays(
        [pa.array(np.asarray(v, dtype=float)) for v in
         (xmin, ymin, xmax, ymax)],
        names=["xmin", "ymin", "xmax", "ymax"],
    )
    return table.append_column(bbox_col, bbox)


def geoparquet_metadata_v11(geom_col: str = "geometry",
                            crs: str = "EPSG:4326",
                            bbox_col: str = "bbox") -> dict:
    md = geoparquet_metadata(geom_col, crs)
    md["version"] = "1.1.0"
    md["columns"][geom_col]["covering"] = {
        "bbox": {
            "xmin": [bbox_col, "xmin"], "ymin": [bbox_col, "ymin"],
            "xmax": [bbox_col, "xmax"], "ymax": [bbox_col, "ymax"],
        }
    }
    return md


def write_geoparquet_bbox(ds, path: str, geom_col: str = "geometry",
                          crs: str = "EPSG:4326",
                          bbox_col: str = "bbox", **kw) -> None:
    """GeoParquet 1.1 write: bbox covering column + covering metadata
    (readers without bbox support ignore both)."""

    def prep(t: pa.Table) -> pa.Table:
        t = add_bbox_column(t, geom_col, bbox_col)
        i = t.schema.get_field_index(geom_col)
        f = t.schema.field(i).with_metadata(
            {b"ARROW:extension:name": b"ogc.wkb"})
        schema = t.schema.set(i, f).with_metadata({
            **(t.schema.metadata or {}),
            b"geo": json.dumps(
                geoparquet_metadata_v11(geom_col, crs, bbox_col)
            ).encode(),
        })
        return t.cast(schema)

    ds.map_batches(prep, batch_format="pyarrow").write_parquet(path, **kw)


def read_geoparquet(paths, bbox=None, bbox_col: str = "bbox",
                    columns=None, **kw):
    """Read with GeoParquet 1.1 bbox pushdown: the rectangle predicate
    is expressed on the covering struct fields, so parquet row-group
    statistics prune at the scan (rows never leave storage). ``bbox``
    is (xmin, ymin, xmax, ymax); intersection test per the spec."""
    import pyarrow.compute as pc
    import ray.data as rd

    filt = None
    if bbox is not None:
        xmin, ymin, xmax, ymax = bbox
        filt = (
            (pc.field(bbox_col, "xmin") <= xmax)
            & (pc.field(bbox_col, "xmax") >= xmin)
            & (pc.field(bbox_col, "ymin") <= ymax)
            & (pc.field(bbox_col, "ymax") >= ymin)
        )
    return rd.read_parquet(paths, columns=columns, filter=filt, **kw)
