"""Per-partition lineage + checkpoint/resume (north_rule requirement).

The reference's resume story is file-existence checks
(``gdal raster tile --resume`` apps/gdalalg_raster_tile.cpp:280,
gdal2tiles.py:1497) and tile-index manifests (gdaltindex_lib.cpp:160).
Here it is transactional and content-addressed:

- every completed partition writes ``<out>/part=<key>/data.parquet``
  ATOMICALLY (tmp + rename) plus one manifest record
  ``<out>/_manifest/<key>.json`` carrying lineage: partition key, row
  count, content hash, input description, wall ms, engine version;
- a restarted run lists the manifest (cheap), broadcasts the completed
  key set, and ANTI-JOINS it inside ``map_batches`` before any
  expensive work — completed partitions are never recomputed;
- the manifest doubles as the run's metrics table (rows, bytes, wall
  per partition).

Layout intentionally matches hive partitioning (``part=<key>/``) so
the output is directly readable by ``read_parquet`` — the reference's
``gdal vector partition`` hive scheme (gdalalg_vector_partition.cpp:30).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class ManifestStore:
    """Checkpoint store over a directory (works on any fsspec-style
    mount; here a local path)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def completed_keys(self) -> set:
        keys = set()
        for f in os.listdir(self.manifest_dir):
            if f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    rec = json.load(fh)
                if rec.get("status") == "done":
                    keys.add(rec["partition"])
        return keys

    def records(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def partition_dir(self, key) -> str:
        return os.path.join(self.out_dir, f"part={key}")

    def commit(self, key, table: pa.Table, lineage: dict | None = None) -> dict:
        """Atomically write one partition + its manifest record."""
        t0 = time.perf_counter()
        pdir = self.partition_dir(key)
        tmp = pdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table, os.path.join(tmp, "data.parquet"))
        if os.path.isdir(pdir):  # a concurrent/previous attempt won
            import shutil

            shutil.rmtree(tmp)
        else:
            os.rename(tmp, pdir)
        rec = {
            "partition": key if not isinstance(key, np.generic) else key.item(),
            "rows": table.num_rows,
            "bytes": table.nbytes,
            "content_hash": content_hash(table),
            "wall_ms": round((time.perf_counter() - t0) * 1000, 2),
            "status": "done",
            **(lineage or {}),
        }
        mpath = os.path.join(self.manifest_dir, f"{key}.json")
        mtmp = mpath + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump(rec, fh)
        os.rename(mtmp, mpath)
        return rec


def content_hash(table: pa.Table) -> str:
    """Order-insensitive content hash: per-row hashes of the
    column-name-sorted table, combined by XOR + sum (stable across
    block order and parallelism)."""
    cols = sorted(table.column_names)
    h = hashlib.sha256()
    # per-column digest of sorted values (order-insensitive, cheap)
    for c in cols:
        arr = table[c]
        try:
            vals = arr.to_pandas().sort_values(ignore_index=True)
            data = vals.to_json().encode()
        except Exception:
            data = str(arr).encode()
        h.update(c.encode())
        h.update(hashlib.sha256(data).digest())
    return h.hexdigest()[:16]


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    lineage: dict | None = None,
) -> list[dict]:
    """Resumable partitioned write: groupby(partition_col) →
    per-group atomic commit, SKIPPING partitions already in the
    manifest. Returns the manifest records of this run."""
    store = ManifestStore(out_dir)
    done = store.completed_keys()

    def write_group(group: pa.Table) -> pa.Table:
        key = group[partition_col][0].as_py()
        if key in done:
            return pa.table({"partition": pa.array([key]),
                             "rows": pa.array([-1], pa.int64())})
        rec = ManifestStore(out_dir).commit(key, group, lineage)
        return pa.table({"partition": pa.array([rec["partition"]]),
                         "rows": pa.array([rec["rows"]], pa.int64())})

    ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow"
    ).materialize()
    return store.records()


def resume_filter(ds, partition_col: str, out_dir: str):
    """Drop rows whose partition is already committed — the anti-join
    against the checkpoint, applied BEFORE expensive stages (broadcast
    key set; for huge key sets use a Bloom filter instead)."""
    done = ManifestStore(out_dir).completed_keys()
    if not done:
        return ds
    import pyarrow.compute as pc

    done_arr = pa.array(list(done))

    def drop(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch[partition_col], value_set=done_arr))
        )

    return ds.map_batches(drop, batch_format="pyarrow")
