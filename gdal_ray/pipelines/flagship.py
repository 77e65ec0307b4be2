"""The flagship pipeline: pages → geoparse → cell/tile encode → PIP
join → tile assignment (SURVEY.md §7.1 milestone 0 + north_rule).

Every stage is a stateless ``map_batches(batch_format="pyarrow")``
kernel except the PIP join (actor pool, gdal_ray.stages.join). No
driver-side row loops, no full materialization: the pipeline streams.

The ``html`` column (potentially MBs/row at 100 TB) is projected away
at the READ (``columns=[...]``) — wide payloads never enter a shuffle
(SURVEY.md §7.4 "very wide rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray import tiles
from gdal_ray.geoparse import GAZETTEER, extract_coords

DEFAULT_ZOOMS = (7, 9, 12)

_HOT = 0  # gazetteer index of the hot city


def pages_from_documents(sf_dir: str) -> rd.Dataset:
    """Derive the FIXTURES.md §1 ``pages`` corpus deterministically
    from the driver's ``documents`` table (no external data; the same
    derivation is expressible in the DuckDB oracle SQL).

    url/warc_ts/place are pure functions of ``doc_id``; the text embeds
    the place name and literal 4-dp coordinates so geoparsing is
    exactly invertible.
    """
    names = np.array([g[0] for g in GAZETTEER], dtype=object)
    lons = np.array([g[1] for g in GAZETTEER])
    lats = np.array([g[2] for g in GAZETTEER])

    def derive(batch: pa.Table) -> pa.Table:
        i = batch["doc_id"].to_numpy()
        pidx = np.where(i % 5 == 0, _HOT, i % 64)
        place = names[pidx]
        lat_s = np.char.mod("%.4f", lats[pidx])
        lon_s = np.char.mod("%.4f", lons[pidx])
        istr = i.astype(str)
        text = np.char.add(
            np.char.add(np.char.add("Report ", istr), ": rain near "),
            np.char.add(
                place.astype(str),
                np.char.add(
                    np.char.add(np.char.add(" at ", lat_s), ","),
                    np.char.add(lon_s, " today."),
                ),
            ),
        )
        url = np.char.add(
            np.char.add(
                np.char.add("https://site", (i % 50).astype(str)), ".example/"
            ),
            istr,
        )
        base_us = np.int64(1735689600) * 1_000_000  # 2025-01-01T00:00:00Z
        warc_ts = base_us + i * 137 * 1_000_000
        return pa.table(
            {
                "url": pa.array(url.tolist(), pa.string()),
                "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
                "text": pa.array(text.tolist(), pa.string()),
                "lang": batch["lang"],
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    # note: doc text is replaced, not appended — keeps the derivation
    # exactly mirrorable in SQL without string-escaping pitfalls
    return ds.map_batches(derive, batch_format="pyarrow")


def encode_tiles(
    batch: pa.Table, zooms: tuple[int, ...] = DEFAULT_ZOOMS
) -> pa.Table:
    """lon/lat columns → XYZ tile columns ``tile_z{z}_x`` / ``_y`` per
    zoom + packed ``tile_id`` at the finest zoom (the shuffle key)."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    cols = {}
    for z in zooms:
        x, y = tiles.lonlat_to_xyz_tile(lon, lat, z)
        cols[f"tile_z{z}_x"] = x
        cols[f"tile_z{z}_y"] = y
    zmax = max(zooms)
    tid = tiles.tile_id(zmax, cols[f"tile_z{zmax}_x"], cols[f"tile_z{zmax}_y"])
    for k, v in cols.items():
        batch = batch.append_column(k, pa.array(v))
    return batch.append_column("tile_id", pa.array(tid))


def encode_cells(
    batch: pa.Table,
    hex_res: tuple[int, ...] = (7, 8, 9),
    s2_level: int = 16,
) -> pa.Table:
    """lon/lat → hierarchical cell ids: genuine H3 ids at res 7-9 (the
    north-rule "H3 (res 7-9)" role; gdal_ray.cells.h3 is spec-exact,
    golden-pinned in tests/test_h3.py) + S2 level-16 cell. One shared
    trig front-end for the three H3 resolutions. All vectorized."""
    from gdal_ray.cells import h3 as h3mod, s2 as s2mod

    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    cells = h3mod.latlng_to_cells_multi(lat, lon, hex_res)
    for r in hex_res:
        batch = batch.append_column(f"h3_res{r}", pa.array(cells[r]))
    return batch.append_column(
        "s2_cell", pa.array(s2mod.lonlat_to_cell(lon, lat, s2_level))
    )


def geotag_pages(pages: rd.Dataset, zooms: tuple[int, ...] = DEFAULT_ZOOMS) -> rd.Dataset:
    """pages (url, warc_ts, text, lang[, html]) → + lon/lat + tiles."""
    keep = [c for c in pages.schema().names if c != "html"]
    if keep != pages.schema().names:
        pages = pages.select_columns(keep)
    tagged = pages.map_batches(extract_coords, batch_format="pyarrow")
    return tagged.map_batches(
        lambda b: encode_tiles(b, zooms), batch_format="pyarrow"
    )


def tile_counts(tagged: rd.Dataset, zoom: int = 9, num_partitions: int = 8) -> rd.Dataset:
    """Pages per tile at a zoom — partial-aggregate inside map_batches
    first (one row per tile per batch), then a small groupby: the
    pre-aggregation pattern that keeps the shuffle tiny even when
    pages per tile is huge (SURVEY.md §4 skew note)."""
    xk, yk = f"tile_z{zoom}_x", f"tile_z{zoom}_y"

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: PLC0415

        g = batch.select([xk, yk]).group_by([xk, yk]).aggregate([([], "count_all")])
        return g.rename_columns([xk, yk, "partial_count"])

    partials = tagged.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return partials.groupby([xk, yk], num_partitions=num_partitions).aggregate(
        Sum("partial_count", alias_name="n_pages")
    )


def flagship(sf_dir: str, zooms: tuple[int, ...] = DEFAULT_ZOOMS) -> rd.Dataset:
    """documents → pages → geoparse → tile encode (the smoke slice;
    the PIP-join variant lives in gdal_ray.pipelines.pip)."""
    return geotag_pages(pages_from_documents(sf_dir), zooms)


# ---------------------------------------------------------------------------
# fused production stage (the ogr2ogr pattern: one task runs the whole
# per-record option chain, apps/ogr2ogr_lib.cpp:6529 LayerTranslator)

_WORKER_STATE: dict = {}


def fused_geotag_pip(
    batch: pa.Table,
    bnd_ref=None,
    knn_ref=None,
    emit: str = "admin_partials",
) -> pa.Table:
    """One fused kernel: geoparse → tile encode → cell encode → kNN
    features → PIP join → per-batch partial admin counts.

    Designed for TASK-based ``map_batches`` (not an actor pool): Ray
    reuses worker processes across tasks and executions, so the
    broadcast state (polygon index, kNN grid) is built once per worker
    via a module-global cache — actor-pool amortization without
    actor-pool startup latency (an autoscaling pool never ramps up
    inside a short job; measured in bench tuning).

    ``emit``: "admin_partials" (default, the rollup shuffle input) or
    "rows" (full joined rows).
    """
    from gdal_ray.stages.join import PIPJoiner
    from gdal_ray.stages.knn import GridKNNFeatures

    state = _WORKER_STATE.get("flagship")
    if state is None:
        state = {
            "pip": PIPJoiner(bnd_ref, id_cols=("admin_id",)),
            "knn": GridKNNFeatures(knn_ref) if knn_ref is not None else None,
        }
        _WORKER_STATE["flagship"] = state
    b = extract_coords(batch)
    if emit != "rows":
        # the rollup only needs coordinates downstream: drop the wide
        # text/url columns immediately after parsing so they don't flow
        # through 4 more kernels and the join's take() (wide-row rule,
        # SURVEY.md §7.4)
        b = b.select(["lon", "lat"])
    b = encode_tiles(b)
    b = encode_cells(b)
    if state["knn"] is not None:
        b = state["knn"](b)
    joined = state["pip"](b)
    if emit == "rows":
        return joined
    g = (
        joined.select(["admin_id"])
        .group_by(["admin_id"])
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["admin_id", "partial_count"])
