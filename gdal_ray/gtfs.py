"""GTFS (General Transit Feed Specification) reader — the OGR GTFS
driver role (reference: ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp).

A GTFS feed is a directory or .zip of CSV ``.txt`` files.  Parity
choices mirror the reference exactly:

- every ``.txt`` whose first line is a real CSV header becomes a
  layer (headerless files like error_warning.txt are skipped);
- ``stops`` / ``shapes`` gain POINT geometry from their lat/lon
  columns; ``trips`` gains a LINESTRING joining its stops through
  stop_times (ordered by stop_sequence);
- a synthesized ``shapes_geom`` layer groups shapes.txt by shape_id
  (ordered by shape_pt_sequence) into one LINESTRING each;
- field typing: lat/lon + shape_dist_traveled → float64,
  date/start_date/end_date (YYYYMMDD) → date32, ``*_type`` +
  stop_sequence + shape_pt_sequence → int32, weekday flags → bool,
  arrival/departure times stay "HH:MM:SS" strings.

Scale: a feed is small-side data (a lookup table of a transit
network); each feed reads as one task, and the trips join is an
in-memory hash join per feed — the per-file shard contract of the
other vector sources.
"""
from __future__ import annotations

import io
import os
import struct
import zipfile

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv

from gdal_ray.geom import wkb as gwkb

_FLOAT_COLS = {"stop_lat", "stop_lon", "shape_pt_lat", "shape_pt_lon",
               "shape_dist_traveled", "min_transfer_time"}
_INT_COLS = {"stop_sequence", "shape_pt_sequence"}
_DATE_COLS = {"date", "start_date", "end_date"}
_BOOL_COLS = {"monday", "tuesday", "wednesday", "thursday", "friday",
              "saturday", "sunday"}


def _read_txt(data: bytes) -> pa.Table | None:
    """One GTFS CSV → typed Arrow table (None if headerless)."""
    if data.startswith(b"\xef\xbb\xbf"):
        data = data[3:]
    head = data.split(b"\n", 1)[0]
    if b"," not in head:
        return None  # headerless → not a layer (reference field_1 rule)
    t = pacsv.read_csv(
        io.BytesIO(data),
        convert_options=pacsv.ConvertOptions(
            column_types={}, strings_can_be_null=True),
        parse_options=pacsv.ParseOptions(newlines_in_values=True))
    cols = {}
    for name in t.schema.names:
        arr = t[name]
        low = name.strip().lower()
        if low in _FLOAT_COLS:
            arr = arr.cast(pa.float64())
        elif low in _INT_COLS or low.endswith("_type"):
            arr = arr.cast(pa.string()).cast(pa.int32())
        elif low in _BOOL_COLS:
            arr = arr.cast(pa.string()).cast(pa.int32()).cast(pa.bool_())
        elif low in _DATE_COLS:
            s = arr.cast(pa.string()).to_pylist()
            arr = pa.array(
                [None if not v or len(v) != 8 else
                 f"{v[:4]}-{v[4:6]}-{v[6:8]}" for v in s],
                pa.string()).cast(pa.date32())
        else:
            arr = arr.cast(pa.string())
        cols[name.strip()] = arr
    return pa.table(cols)


def _feed_files(path: str) -> dict[str, bytes]:
    out = {}
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".txt"):
                with open(os.path.join(path, fn), "rb") as f:
                    out[fn] = f.read()
    else:
        z = zipfile.ZipFile(path)
        for fn in sorted(z.namelist()):
            if fn.endswith(".txt"):
                out[os.path.basename(fn)] = z.read(fn)
    return out


def _linestring(lons, lats) -> bytes:
    pts = np.column_stack([lons, lats])
    return gwkb.linestring_wkb(pts)


def list_layers(path: str) -> list[str]:
    files = _feed_files(path)
    names = [fn[:-4] for fn, data in files.items()
             if _read_txt(data) is not None]
    if "shapes" in names:
        names.append("shapes_geom")
    return names


def read_gtfs_local(path: str, layer: str,
                    geom_col: str = "geometry") -> pa.Table:
    files = _feed_files(path)

    def table_of(name: str) -> pa.Table | None:
        data = files.get(name + ".txt")
        return _read_txt(data) if data is not None else None

    if layer == "shapes_geom":
        sh = table_of("shapes")
        if sh is None:
            raise ValueError("no shapes.txt in feed")
        import pandas as pd
        df = sh.to_pandas().sort_values(["shape_id", "shape_pt_sequence"])
        ids, geoms = [], []
        for sid, grp in df.groupby("shape_id", sort=True):
            ids.append(str(sid))
            geoms.append(_linestring(grp["shape_pt_lon"].to_numpy(),
                                     grp["shape_pt_lat"].to_numpy()))
        return pa.table({"shape_id": pa.array(ids, pa.string()),
                         geom_col: pa.array(geoms, pa.binary())})

    t = table_of(layer)
    if t is None:
        raise ValueError(f"no layer {layer!r} in {path}")

    low = {n.lower(): n for n in t.schema.names}
    if layer == "stops" and "stop_lat" in low and "stop_lon" in low:
        lon = t[low["stop_lon"]].to_numpy(zero_copy_only=False)
        lat = t[low["stop_lat"]].to_numpy(zero_copy_only=False)
        geom = gwkb.encode_points(lon, lat)
        return t.append_column(geom_col, geom)
    if layer == "shapes" and "shape_pt_lat" in low:
        lon = t[low["shape_pt_lon"]].to_numpy(zero_copy_only=False)
        lat = t[low["shape_pt_lat"]].to_numpy(zero_copy_only=False)
        geom = gwkb.encode_points(lon, lat)
        return t.append_column(geom_col, geom)
    if layer == "trips" and "trip_id" in low:
        stops = table_of("stops")
        stimes = table_of("stop_times")
        if stops is not None and stimes is not None:
            pos = {sid: (lon, lat) for sid, lon, lat in zip(
                stops["stop_id"].to_pylist(),
                stops["stop_lon"].to_pylist(),
                stops["stop_lat"].to_pylist())}
            trip_stops: dict[str, list] = {}
            for tid, seq, sid in zip(stimes["trip_id"].to_pylist(),
                                     stimes["stop_sequence"].to_pylist(),
                                     stimes["stop_id"].to_pylist()):
                trip_stops.setdefault(tid, []).append((seq, sid))
            geoms = []
            for tid in t[low["trip_id"]].to_pylist():
                seqs = trip_stops.get(tid)
                if not seqs:
                    geoms.append(None)
                    continue
                coords = [pos[s] for _, s in sorted(seqs) if s in pos]
                geoms.append(_linestring([c[0] for c in coords],
                                         [c[1] for c in coords])
                             if len(coords) >= 2 else None)
            return t.append_column(geom_col, pa.array(geoms, pa.binary()))
    return t


def read_gtfs(path: str, layer: str = "stops",
              geom_col: str = "geometry"):
    """Ray Dataset over one GTFS layer — one task per feed."""
    import ray.data as rd
    ds = rd.from_items([{"path": path}])

    def load(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [read_gtfs_local(p.as_py(), layer, geom_col)
             for p in batch["path"]])

    return ds.map_batches(load, batch_format="pyarrow")
