"""MBTiles raster driver — reference role frmts/mbtiles/
mbtilesdataset.cpp (MapBox MBTiles 1.x spec): a SQLite db with a
``tiles`` table in TMS row order (``tile_row = 2^z - 1 - y_xyz``) on
the global WebMercator grid, plus a ``metadata`` key/value table
whose ``bounds`` (lon/lat) cut the raster window.

Shares the engine's tile machinery: the grid is tiles.py's
GlobalMercator parity math; tile blobs decode via the in-repo
PNG/JPEG/WebP codecs (magic dispatch, same as gpkg_raster).
``read_mbtiles`` is the distributed surface — driver ships tile
KEYS only, each task opens the db read-only and decodes its own
blobs.  ``write_mbtiles`` emits the reference CreateCopy layout
(PNG tiles, TMS rows, bounds metadata) — tile ENCODE runs in Ray
tasks, the driver inserts finished blobs (SQLite single-writer).
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np

from gdal_ray import tiles as T
from gdal_ray.gpkg import _local_path
from gdal_ray.gpkg_raster import _decode_tile, _encode_tile_png


def _connect(path: str) -> sqlite3.Connection:
    """Open an .mbtiles db — or an ``.mbtiles.sql`` TEXT DUMP
    (the reference's ENABLE_SQL_SQLITE_FORMAT path, test_mbtiles_11)
    executed into :memory:."""
    lp = _local_path(path)
    if lp.endswith(".sql"):
        # line-oriented dump: '--' comments, one statement per line,
        # trailing semicolons OPTIONAL (the reference's parser is
        # line-based too)
        con = sqlite3.connect(":memory:")
        for line in open(lp, encoding="utf-8",
                         errors="replace").read().splitlines():
            line = line.strip().rstrip(";")
            if line and not line.startswith("--"):
                con.execute(line)
        return con
    return sqlite3.connect(lp)


def mbtiles_metadata(path: str) -> dict:
    con = _connect(path)
    try:
        return dict(con.execute(
            "SELECT name, value FROM metadata").fetchall())
    finally:
        con.close()


def _window(con: sqlite3.Connection, zoom: int | None):
    """(zoom, xoff, yoff, w, h, gt) — the bounds metadata cut into
    the zoom level's global pixel grid (the reference's open path);
    falls back to the tile extent when bounds are absent."""
    if zoom is None:
        zoom = con.execute(
            "SELECT MAX(zoom_level) FROM tiles").fetchone()[0]
    md = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    res = T.resolution(zoom)
    n = 1 << zoom
    if "bounds" in md:
        lonmin, latmin, lonmax, latmax = [
            float(v) for v in md["bounds"].split(",")]
        xmin, ymin = T.lonlat_to_meters(lonmin, latmin)
        xmax, ymax = T.lonlat_to_meters(lonmax, latmax)
    else:
        lo = con.execute(
            "SELECT MIN(tile_column), MAX(tile_column), MIN(tile_row), "
            "MAX(tile_row) FROM tiles WHERE zoom_level = ?",
            (zoom,)).fetchone()
        xmin = lo[0] * T.TILE_SIZE * res - T.ORIGIN_SHIFT
        xmax = (lo[1] + 1) * T.TILE_SIZE * res - T.ORIGIN_SHIFT
        ymin = lo[2] * T.TILE_SIZE * res - T.ORIGIN_SHIFT
        ymax = (lo[3] + 1) * T.TILE_SIZE * res - T.ORIGIN_SHIFT
    # global pixel grid: (0,0) at the top-left of the mercator square
    xoff = int(round((xmin + T.ORIGIN_SHIFT) / res))
    yoff = int(round((T.ORIGIN_SHIFT - ymax) / res))
    w = int(round((xmax - xmin) / res))
    h = int(round((ymax - ymin) / res))
    gt = (xoff * res - T.ORIGIN_SHIFT, res, 0.0,
          T.ORIGIN_SHIFT - yoff * res, 0.0, -res)
    return zoom, xoff, yoff, max(w, 1), max(h, 1), gt, n


def read_mbtiles_array(path: str, zoom: int | None = None) -> dict:
    """Whole-raster load → the CLI ``load_raster`` dict shape."""
    con = _connect(path)
    try:
        zoom, xoff, yoff, w, h, gt, n = _window(con, zoom)
        rows = con.execute(
            "SELECT tile_column, tile_row, tile_data FROM tiles "
            "WHERE zoom_level = ?", (zoom,)).fetchall()
        out = None
        for col, tms_row, blob in rows:
            img = _decode_tile(blob)
            if img.ndim == 2:
                img = img[:, :, None]
            if out is None:
                out = np.zeros((h, w, img.shape[2]), dtype=img.dtype)
            y_xyz = (n - 1) - tms_row
            x0 = col * T.TILE_SIZE - xoff
            y0 = y_xyz * T.TILE_SIZE - yoff
            sy = slice(max(0, y0), min(h, y0 + img.shape[0]))
            sx = slice(max(0, x0), min(w, x0 + img.shape[1]))
            if sy.start >= sy.stop or sx.start >= sx.stop:
                continue
            out[sy, sx] = img[sy.start - y0:sy.stop - y0,
                              sx.start - x0:sx.stop - x0,
                              :out.shape[2]]
        if out is None:
            raise ValueError(f"no tiles at zoom {zoom} in {path}")
        bands = [np.ascontiguousarray(out[:, :, i])
                 for i in range(out.shape[2])]
        return {"bands": bands, "crs": "EPSG:3857",
                "geotransform": gt, "nodata": None}
    finally:
        con.close()


def read_mbtiles(path: str, zoom: int | None = None):
    """MBTiles → tile-table Dataset; driver ships tile KEYS only."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.raster import model

    lp = _local_path(path)
    if lp.endswith(".sql"):
        raise ValueError(
            "the .mbtiles.sql text-dump form is a single-file debug "
            "artifact — use read_mbtiles_array for it")
    con = sqlite3.connect(lp)
    try:
        zoom, xoff, yoff, w, h, gt, n = _window(con, zoom)
        keys = con.execute(
            "SELECT tile_column, tile_row FROM tiles "
            "WHERE zoom_level = ?", (zoom,)).fetchall()
    finally:
        con.close()
    ds = rd.from_items([{"path": lp, "col": c, "row": r}
                        for c, r in keys])
    meta = {"zoom": zoom, "xoff": xoff, "yoff": yoff, "w": w, "h": h,
            "gt": gt, "n": n}

    def decode(batch: pa.Table) -> pa.Table:
        con = sqlite3.connect(
            f"file:{batch['path'][0].as_py()}?mode=ro", uri=True)
        out = []
        try:
            for item in batch.to_pylist():
                blob = con.execute(
                    "SELECT tile_data FROM tiles WHERE zoom_level = ? "
                    "AND tile_column = ? AND tile_row = ?",
                    (meta["zoom"], item["col"],
                     item["row"])).fetchone()[0]
                img = _decode_tile(blob)
                if img.ndim == 2:
                    img = img[:, :, None]
                y_xyz = (meta["n"] - 1) - item["row"]
                x0 = item["col"] * T.TILE_SIZE - meta["xoff"]
                y0 = y_xyz * T.TILE_SIZE - meta["yoff"]
                sy = slice(max(0, y0), min(meta["h"], y0 + img.shape[0]))
                sx = slice(max(0, x0), min(meta["w"], x0 + img.shape[1]))
                if sy.start >= sy.stop or sx.start >= sx.stop:
                    continue
                crop = img[sy.start - y0:sy.stop - y0,
                           sx.start - x0:sx.stop - x0]
                for b in range(crop.shape[2]):
                    t = model.from_array(
                        np.ascontiguousarray(crop[:, :, b]),
                        "EPSG:3857", meta["gt"], band=b + 1,
                        tile_size=max(crop.shape[0], crop.shape[1]))
                    t = t.set_column(
                        t.schema.get_field_index("x0"), "x0",
                        pa.array([sx.start] * t.num_rows, pa.int32()))
                    t = t.set_column(
                        t.schema.get_field_index("y0"), "y0",
                        pa.array([sy.start] * t.num_rows, pa.int32()))
                    out.append(t)
        finally:
            con.close()
        return pa.concat_tables(out)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_mbtiles(path: str, bands, gt, zoom: int,
                  name: str = "raster") -> None:
    """North-up uint8 EPSG:3857 bands → MBTiles (single zoom, PNG
    tiles, TMS rows, bounds metadata — the reference CreateCopy
    layout).  ``gt`` must sit on the zoom's global pixel grid."""
    arr = np.dstack(bands) if len(bands) > 1 else np.asarray(bands[0])
    if arr.dtype != np.uint8:
        raise ValueError("MBTiles PNG tiles are 8-bit")
    h, w = arr.shape[:2]
    res = T.resolution(zoom)
    n = 1 << zoom
    xoff = int(round((gt[0] + T.ORIGIN_SHIFT) / res))
    yoff = int(round((T.ORIGIN_SHIFT - gt[3]) / res))
    lonmin, latmin = T.meters_to_lonlat(gt[0], gt[3] + h * gt[5])
    lonmax, latmax = T.meters_to_lonlat(gt[0] + w * gt[1], gt[3])
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        con.execute("CREATE TABLE tiles (zoom_level INTEGER, "
                    "tile_column INTEGER, tile_row INTEGER, "
                    "tile_data BLOB, UNIQUE (zoom_level, tile_column, "
                    "tile_row))")
        con.executemany(
            "INSERT INTO metadata VALUES (?, ?)",
            [("name", name), ("type", "overlay"), ("version", "1.1"),
             ("description", name), ("format", "png"),
             ("bounds", f"{lonmin},{latmin},{lonmax},{latmax}"),
             ("minzoom", str(zoom)), ("maxzoom", str(zoom))])
        tc0, ty0 = xoff // T.TILE_SIZE, yoff // T.TILE_SIZE
        px0, py0 = xoff % T.TILE_SIZE, yoff % T.TILE_SIZE
        ntx = -(-(px0 + w) // T.TILE_SIZE)
        nty = -(-(py0 + h) // T.TILE_SIZE)
        img = arr if arr.ndim == 3 else arr[:, :, None]
        full = np.zeros((nty * T.TILE_SIZE, ntx * T.TILE_SIZE,
                         img.shape[2]), np.uint8)
        full[py0:py0 + h, px0:px0 + w] = img
        for ty in range(nty):
            for tx in range(ntx):
                block = full[ty * T.TILE_SIZE:(ty + 1) * T.TILE_SIZE,
                             tx * T.TILE_SIZE:(tx + 1) * T.TILE_SIZE]
                if block.shape[2] == 1:
                    block = block[:, :, 0]
                blob = _encode_tile_png(block, 0, 0, T.TILE_SIZE,
                                        T.TILE_SIZE)
                tms_row = (n - 1) - (ty0 + ty)
                con.execute(
                    "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                    (zoom, tc0 + tx, tms_row, blob))
        con.commit()
    finally:
        con.close()
