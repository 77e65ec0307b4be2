"""GeoPackage raster tiles — reference role
ogr/ogrsf_frmts/gpkg/gdalgeopackagedataset.cpp (tile pyramid user
tables + gpkg_tile_matrix / gpkg_tile_matrix_set metadata, OGC
GeoPackage spec clause 2.2).  Uses the stdlib sqlite3 module and the
engine's OWN image codecs (raster/png.py, raster/jpeg.py,
raster/webp.py) — no GDAL, no PIL.

Read: the raster window is the ``gpkg_contents`` extent cut out of
the zoom level's tile grid (anchored at the tile-matrix-set extent's
top-left), tiles decoded by magic-byte dispatch.
``read_gpkg_raster`` is the distributed surface: one descriptor row
per tile, each task opens the file read-only and fetches + decodes
ONLY its own blob (SQLite random reads are cheap; the driver ships
metadata only).

Write: ``write_gpkg_raster`` emits the reference's CreateCopy layout
(``TILE_FORMAT=PNG``): a single zoom level whose tile grid is
anchored at the raster's top-left corner, edge tiles padded with an
alpha channel (grey→grey+alpha, RGB→RGBA) exactly like the
reference's PNG padding, full-tile interiors stay alpha-free.
SQLite is single-writer by design — tile ENCODING is the distributed
stage (``write_gpkg_raster_dataset`` encodes PNG bytes inside Ray
tasks and the driver only inserts finished blobs).
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np

from gdal_ray.gpkg import _SQL_CONTENTS, _SQL_SRS, _local_path

_SQL_TMS = """CREATE TABLE IF NOT EXISTS gpkg_tile_matrix_set (
  table_name TEXT PRIMARY KEY, srs_id INTEGER NOT NULL,
  min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
  max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)"""

_SQL_TM = """CREATE TABLE IF NOT EXISTS gpkg_tile_matrix (
  table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
  matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,
  tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
  pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
  CONSTRAINT pk_ttm PRIMARY KEY (table_name, zoom_level))"""


def _decode_tile(blob: bytes) -> np.ndarray:
    """Magic-dispatched tile decode via the engine's own codecs."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from gdal_ray.raster.png import decode_png

        return decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        from gdal_ray.raster.jpeg import decode_jpeg

        return decode_jpeg(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from gdal_ray.raster.webp import decode_webp

        return decode_webp(blob)
    raise ValueError("unknown tile format (not PNG/JPEG/WebP)")


def tile_tables(path: str) -> list[str]:
    con = sqlite3.connect(_local_path(path))
    try:
        return [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type IN ('tiles', '2d-gridded-coverage')")]
    finally:
        con.close()


def _raster_meta(con: sqlite3.Connection, table: str,
                 zoom: int | None) -> dict:
    c = con.execute(
        "SELECT min_x, min_y, max_x, max_y, srs_id FROM gpkg_contents "
        "WHERE table_name = ?", (table,)).fetchone()
    if c is None:
        raise ValueError(f"no gpkg_contents row for {table!r}")
    tms = con.execute(
        "SELECT min_x, min_y, max_x, max_y, srs_id "
        "FROM gpkg_tile_matrix_set WHERE table_name = ?",
        (table,)).fetchone()
    if zoom is None:
        zoom = con.execute(
            "SELECT MAX(zoom_level) FROM gpkg_tile_matrix "
            "WHERE table_name = ?", (table,)).fetchone()[0]
    tm = con.execute(
        "SELECT matrix_width, matrix_height, tile_width, tile_height, "
        "pixel_x_size, pixel_y_size FROM gpkg_tile_matrix "
        "WHERE table_name = ? AND zoom_level = ?", (table, zoom)).fetchone()
    mw, mh, tw, th, px, py = tm
    # raster window = contents extent inside the TMS-anchored grid
    xoff = int(round((c[0] - tms[0]) / px))
    yoff = int(round((tms[3] - c[3]) / py))
    w = int(round((c[2] - c[0]) / px))
    h = int(round((c[3] - c[1]) / py))
    srs_id = c[4]
    crs = f"EPSG:{srs_id}" if srs_id and srs_id > 0 else ""
    gt = (c[0], px, 0.0, c[3], 0.0, -py)
    return {"zoom": zoom, "tile_w": tw, "tile_h": th,
            "matrix_w": mw, "matrix_h": mh,
            "px": px, "py": py, "xoff": xoff, "yoff": yoff,
            "width": w, "height": h, "crs": crs, "geotransform": gt}


def read_gpkg_raster_array(path: str, table: str | None = None,
                           zoom: int | None = None) -> dict:
    """Whole-raster load → the CLI ``load_raster`` dict shape."""
    con = sqlite3.connect(_local_path(path))
    try:
        if table is None:
            tabs = tile_tables(path)
            if not tabs:
                raise ValueError(f"no tile pyramid in {path}")
            table = tabs[0]
        m = _raster_meta(con, table, zoom)
        rows = con.execute(
            f'SELECT tile_column, tile_row, tile_data FROM "{table}" '
            "WHERE zoom_level = ?", (m["zoom"],)).fetchall()
        out = None
        for col, trow, blob in rows:
            img = _decode_tile(blob)
            if img.ndim == 2:
                img = img[:, :, None]
            if out is None:
                out = np.zeros((m["height"], m["width"], img.shape[2]),
                               dtype=img.dtype)
            # tile's pixel origin in the raster window
            x0 = col * m["tile_w"] - m["xoff"]
            y0 = trow * m["tile_h"] - m["yoff"]
            sy = slice(max(0, y0), min(m["height"], y0 + img.shape[0]))
            sx = slice(max(0, x0), min(m["width"], x0 + img.shape[1]))
            out[sy, sx] = img[sy.start - y0:sy.stop - y0,
                              sx.start - x0:sx.stop - x0,
                              :out.shape[2]]
        if out is None:
            raise ValueError(f"no tiles at zoom {m['zoom']} in {table}")
        bands = [np.ascontiguousarray(out[:, :, i])
                 for i in range(out.shape[2])]
        return {"bands": bands, "crs": m["crs"],
                "geotransform": m["geotransform"], "nodata": None}
    finally:
        con.close()


def read_gpkg_raster(path: str, table: str | None = None,
                     zoom: int | None = None):
    """GeoPackage tile pyramid → tile-table Dataset.  Driver reads
    METADATA only; each task opens the sqlite file read-only and
    fetches + decodes its own tile blobs."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.raster import model

    lp = _local_path(path)
    con = sqlite3.connect(lp)
    try:
        if table is None:
            table = tile_tables(path)[0]
        m = _raster_meta(con, table, zoom)
        keys = con.execute(
            f'SELECT tile_column, tile_row FROM "{table}" '
            "WHERE zoom_level = ?", (m["zoom"],)).fetchall()
    finally:
        con.close()
    items = [{"path": lp, "table": table, "col": c, "row": r}
             for c, r in keys]
    ds = rd.from_items(items)
    meta = dict(m)

    def decode(batch: pa.Table) -> pa.Table:
        con = sqlite3.connect(
            f"file:{batch['path'][0].as_py()}?mode=ro", uri=True)
        tables = []
        try:
            for item in batch.to_pylist():
                blob = con.execute(
                    f'SELECT tile_data FROM "{item["table"]}" '
                    "WHERE zoom_level = ? AND tile_column = ? "
                    "AND tile_row = ?",
                    (meta["zoom"], item["col"], item["row"])).fetchone()[0]
                img = _decode_tile(blob)
                if img.ndim == 2:
                    img = img[:, :, None]
                x0 = item["col"] * meta["tile_w"] - meta["xoff"]
                y0 = item["row"] * meta["tile_h"] - meta["yoff"]
                sy = slice(max(0, y0),
                           min(meta["height"], y0 + img.shape[0]))
                sx = slice(max(0, x0),
                           min(meta["width"], x0 + img.shape[1]))
                crop = img[sy.start - y0:sy.stop - y0,
                           sx.start - x0:sx.stop - x0]
                for b in range(crop.shape[2]):
                    t = model.from_array(
                        np.ascontiguousarray(crop[:, :, b]),
                        meta["crs"], meta["geotransform"], band=b + 1,
                        tile_size=max(crop.shape[0], crop.shape[1]))
                    t = t.set_column(
                        t.schema.get_field_index("x0"), "x0",
                        pa.array([sx.start] * t.num_rows, pa.int32()))
                    t = t.set_column(
                        t.schema.get_field_index("y0"), "y0",
                        pa.array([sy.start] * t.num_rows, pa.int32()))
                    t = t.set_column(
                        t.schema.get_field_index("block_x"), "block_x",
                        pa.array([item["col"]] * t.num_rows, pa.int32()))
                    t = t.set_column(
                        t.schema.get_field_index("block_y"), "block_y",
                        pa.array([item["row"]] * t.num_rows, pa.int32()))
                    tables.append(t)
        finally:
            con.close()
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# write (CreateCopy TILE_FORMAT=PNG role)
# ---------------------------------------------------------------------------


def _encode_tile_png(block: np.ndarray, full_w: int, full_h: int,
                     tile_w: int, tile_h: int) -> bytes:
    """Pad an edge block to the full tile size with an alpha channel
    (the reference's PNG padding); interior tiles stay alpha-free."""
    from gdal_ray.raster.png import encode_png

    h, w = block.shape[:2]
    c = 1 if block.ndim == 2 else block.shape[2]
    if h == tile_h and w == tile_w:
        return encode_png(block)
    img = block if block.ndim == 3 else block[:, :, None]
    out = np.zeros((tile_h, tile_w, c + 1), dtype=np.uint8)
    out[:h, :w, :c] = img
    out[:h, :w, c] = 255
    return encode_png(out)


def write_gpkg_raster(path: str, bands, gt, crs: str = "",
                      table: str = "raster", tile_size: int = 256,
                      append: bool = False) -> None:
    """North-up uint8 band arrays → GeoPackage tile pyramid (single
    zoom level 0, grid anchored at the raster's top-left corner,
    PNG tiles — the reference CreateCopy TILE_FORMAT=PNG layout)."""
    arr = np.dstack(bands) if len(bands) > 1 else np.asarray(bands[0])
    if arr.dtype != np.uint8:
        raise ValueError("GPKG PNG tiles are 8-bit; scale first "
                         "(reference gdal_translate -ot Byte role)")
    h, w = arr.shape[:2]
    code = int(crs.split(":")[1]) if ":" in crs else 0
    mw = -(-w // tile_size)
    mh = -(-h // tile_size)
    px, py = gt[1], -gt[5]
    min_x, max_y = gt[0], gt[3]
    if not append and os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 1196444487")
        con.execute("PRAGMA user_version = 10400")
        con.execute(_SQL_SRS)
        con.execute(_SQL_CONTENTS)
        con.execute(_SQL_TMS)
        con.execute(_SQL_TM)
        con.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
            "(?,?,?,?,?,?)",
            [("Undefined Cartesian", -1, "NONE", -1, "undefined", None),
             ("Undefined Geographic", 0, "NONE", 0, "undefined", None),
             (crs or "unknown", code, "EPSG", code,
              f"(delegated to EPSG:{code})", None)])
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?, 'tiles', ?, ?, ?, ?, ?, ?)",
            (table, table, min_x, max_y - h * py,
             min_x + w * px, max_y, code))
        con.execute(
            "INSERT INTO gpkg_tile_matrix_set VALUES (?,?,?,?,?,?)",
            (table, code, min_x, max_y - mh * tile_size * py,
             min_x + mw * tile_size * px, max_y))
        con.execute(
            "INSERT INTO gpkg_tile_matrix VALUES (?,0,?,?,?,?,?,?)",
            (table, mw, mh, tile_size, tile_size, px, py))
        con.execute(
            f'CREATE TABLE "{table}" (id INTEGER PRIMARY KEY '
            "AUTOINCREMENT, zoom_level INTEGER NOT NULL, "
            "tile_column INTEGER NOT NULL, tile_row INTEGER NOT NULL, "
            "tile_data BLOB NOT NULL, UNIQUE (zoom_level, tile_column, "
            "tile_row))")
        for trow in range(mh):
            for col in range(mw):
                block = arr[trow * tile_size:(trow + 1) * tile_size,
                            col * tile_size:(col + 1) * tile_size]
                blob = _encode_tile_png(block, w, h, tile_size, tile_size)
                con.execute(
                    f'INSERT INTO "{table}" (zoom_level, tile_column, '
                    "tile_row, tile_data) VALUES (0, ?, ?, ?)",
                    (col, trow, blob))
        con.commit()
    finally:
        con.close()


def write_gpkg_raster_dataset(ds, path: str, table: str = "raster",
                              tile_size: int = 256) -> None:
    """Tile-table Dataset → GeoPackage: PNG ENCODING runs inside Ray
    tasks (the expensive stage); the driver STREAMS finished blobs
    batch-by-batch into SQLite — single-writer by format design, so
    the serial tail is O(tiles) inserts at O(one batch) driver memory.
    Extent metadata is patched after the stream from the observed
    max tile row/col (tile-table blocks of one (block_y, block_x)
    travel together per the model's block-major layout)."""
    import pyarrow as pa

    from gdal_ray.raster import model

    first = ds.take(1)[0]
    crs, gt = first["crs"], tuple(first["geotransform"])

    def encode(batch: pa.Table) -> pa.Table:
        # regroup rows of one block: encode each (block_y, block_x)
        rows = batch.to_pylist()
        groups: dict[tuple, list] = {}
        for r in rows:
            groups.setdefault((r["block_y"], r["block_x"]), []).append(r)
        out = []
        for (_, _), same in sorted(groups.items()):
            same.sort(key=lambda q: q["band"])
            planes = [model.tile_array(q) for q in same]
            block = (np.dstack(planes) if len(planes) > 1
                     else planes[0])
            blob = _encode_tile_png(block.astype(np.uint8), 0, 0,
                                    tile_size, tile_size)
            out.append({"col": same[0]["x0"] // tile_size,
                        "row": same[0]["y0"] // tile_size,
                        "png": blob})
        return pa.Table.from_pylist(out) if out else pa.table(
            {"col": pa.array([], pa.int64()),
             "row": pa.array([], pa.int64()),
             "png": pa.array([], pa.binary())})

    encoded = ds.map_batches(encode, batch_format="pyarrow")
    placeholder = np.zeros((1, 1), np.uint8)
    write_gpkg_raster(path, [placeholder], gt, crs=crs, table=table,
                      tile_size=tile_size)
    max_col = max_row = -1
    con = sqlite3.connect(path)
    try:
        con.execute(f'DELETE FROM "{table}"')
        for batch in encoded.iter_batches(batch_format="pyarrow"):
            cols = batch.column("col").to_pylist()
            trows = batch.column("row").to_pylist()
            pngs = batch.column("png").to_pylist()
            if cols:
                max_col = max(max_col, max(cols))
                max_row = max(max_row, max(trows))
            con.executemany(
                f'INSERT INTO "{table}" (zoom_level, tile_column, '
                "tile_row, tile_data) VALUES (0, ?, ?, ?)",
                list(zip(cols, trows, pngs)))
        if max_col < 0:
            raise ValueError("empty dataset")
        w = (max_col + 1) * tile_size
        h = (max_row + 1) * tile_size
        con.execute("UPDATE gpkg_contents SET min_y = ?, max_x = ? "
                    "WHERE table_name = ?",
                    (gt[3] + h * gt[5], gt[0] + w * gt[1], table))
        con.execute("UPDATE gpkg_tile_matrix_set SET min_y = ?, "
                    "max_x = ? WHERE table_name = ?",
                    (gt[3] + h * gt[5], gt[0] + w * gt[1], table))
        con.execute("UPDATE gpkg_tile_matrix SET matrix_width = ?, "
                    "matrix_height = ? WHERE table_name = ?",
                    (w // tile_size, h // tile_size, table))
        con.commit()
    finally:
        con.close()
