"""Incremental (micro-batch) ingestion with persistent actor state —
the §2.11 streaming-shaped surface.

The reference's only incremental-state reader is the OSM driver's
interleaved mode (ogr/ogrsf_frmts/osm/ogrosmdatasource.cpp:4658:
round-robins layers, resolves node→way references with bounded
memory). Generalized here: an ordered log (`events`) consumed in
ts-ordered micro-batches; a pool of KEY-HASH-BUCKETED state actors
(guide: "one actor per key-hash bucket, fed batches in ts order")
maintains incremental per-key state across batches. The final state
must equal the batch-mode groupby — asserted in tests.

This is the engine's pattern for resumable continuous ingestion: the
actor state doubles as the watermark/checkpoint (``snapshot()``/
``restore()``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class KeyedStateActor:
    """One bucket of incremental per-key aggregates (count, sum, max
    ts). Batches MUST arrive in non-decreasing ts order per key (the
    caller sorts micro-batches; the actor enforces the watermark)."""

    def __init__(self):
        self.state: dict = {}
        self.watermark = None

    def ingest(self, keys, values, ts_max) -> int:
        if self.watermark is not None and ts_max < self.watermark:
            raise ValueError(
                f"out-of-order micro-batch: {ts_max} < watermark {self.watermark}"
            )
        self.watermark = ts_max
        for k, v in zip(keys, values):
            st = self.state.get(k)
            if st is None:
                self.state[k] = [1, v]
            else:
                st[0] += 1
                st[1] += v
        return len(self.state)

    def snapshot(self) -> dict:
        return {"state": dict(self.state), "watermark": self.watermark}

    def restore(self, snap: dict) -> None:
        self.state = dict(snap["state"])
        self.watermark = snap["watermark"]


class IncrementalIngestor:
    """Drive an ordered Dataset through bucketed state actors in
    ts-ordered micro-batches."""

    def __init__(self, n_buckets: int = 4):
        self.n_buckets = n_buckets
        self.actors = [KeyedStateActor.remote() for _ in range(n_buckets)]

    def run(self, ds, key_col: str, ts_col: str, value_col: str,
            batch_size: int = 4096) -> None:
        ordered = ds.sort(ts_col)
        for batch in ordered.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            vals = batch[value_col].to_numpy(zero_copy_only=False)
            ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            bucket = (keys.astype(np.int64) * np.int64(2654435761)) % self.n_buckets
            refs = []
            for b in range(self.n_buckets):
                m = bucket == b
                if m.any():
                    refs.append(
                        self.actors[b].ingest.remote(
                            keys[m].tolist(), vals[m].tolist(), int(ts[m].max())
                        )
                    )
            ray.get(refs)  # barrier per micro-batch keeps per-key order

    def result(self) -> pa.Table:
        snaps = ray.get([a.snapshot.remote() for a in self.actors])
        keys, counts, sums = [], [], []
        for s in snaps:
            for k, (c, v) in s["state"].items():
                keys.append(k)
                counts.append(c)
                sums.append(v)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    def snapshots(self) -> list[dict]:
        return ray.get([a.snapshot.remote() for a in self.actors])

    def restore(self, snaps: list[dict]) -> None:
        ray.get(
            [a.restore.remote(s) for a, s in zip(self.actors, snaps)]
        )
