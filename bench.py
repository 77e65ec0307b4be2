#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship north-rule pipeline — pages (bench-scale corpus
derived deterministically from $GRAFT_SF_DIR's documents row count)
→ geoparse → WebMercator tile encode (z7/9/12) → hex/S2 cell encode
→ broadcast PIP join vs 100 admin polygons → per-admin + per-tile
rollups. Metric value = headline wall seconds; ``pages_per_sec`` and
per-query timings included.

``--scaling``: same job, same input, fresh processes at 8 and 32 CPUs
(the sandbox evidence for the N→4N cluster criterion, BASELINE.md) +
output parity hashes at both levels.

Usage:
  GRAFT_SF_DIR=/root/testdata/sf0.1 RAY_GRAFT_CPUS=32 python bench.py
  python bench.py --scaling
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_PER_DOC = int(os.environ.get("GRAFT_PAGES_PER_DOC", "400"))


def _doc_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def _bench_pages_path(sf_dir: str) -> str:
    from gdal_ray import fixtures

    n = _doc_rows(sf_dir) * PAGES_PER_DOC
    return fixtures.pages_path(n)


def _count_rows(path: str) -> int:
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.read_metadata(path).num_rows


def _hash_counts(df, cols) -> str:
    h = hashlib.sha256()
    for row in df.sort_values(list(cols)).itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]


REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "32"))


def run_headline() -> dict:
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from gdal_ray import fixtures
    from gdal_ray.pipelines import flagship

    path = _bench_pages_path(SF_DIR)
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    # sustained-throughput measurement: stream the corpus REPEAT times
    # in one pipeline (same bytes, REPEAT× the work) so the job is long
    # enough to amortize startup and expose scaling
    paths = files * REPEAT
    bnd_ref = ray.put(fixtures.gen_boundaries())
    knn_ref = ray.put(fixtures.gen_ref_points(5000))
    kwargs = {"bnd_ref": bnd_ref, "knn_ref": knn_ref}

    def pipeline(pths, nblocks):
        ds = rd.read_parquet(
            pths, columns=["text"], override_num_blocks=nblocks
        )
        return (
            ds.map_batches(
                flagship.fused_geotag_pip, batch_format="pyarrow", fn_kwargs=kwargs
            )
            .groupby("admin_id", num_partitions=2)
            .aggregate(Sum("partial_count", alias_name="n_pages"))
        )

    # warm-up: page cache + worker-process state (broadcast index build)
    pipeline(files[: max(1, len(files) // 4)], NCPU).to_pandas()

    # best-of-2: the sandbox VM carries intermittent background load
    # (loadavg swings 1..14); min wall = the least-interfered run
    best = None
    admin_counts = None
    runs = int(os.environ.get("GRAFT_BENCH_BEST_OF", "2"))
    for _ in range(runs):
        t0 = time.perf_counter()
        counts = pipeline(paths, max(NCPU * 2, len(paths) // 4)).to_pandas()
        wall = time.perf_counter() - t0
        if best is None or wall < best:
            best = wall
            admin_counts = counts

    n_pages = _count_rows(path) * REPEAT
    return {
        "sec": best,
        "pages": int(n_pages),
        "pages_per_sec": n_pages / best,
        "parity_admin": _hash_counts(admin_counts, ["admin_id"]),
    }


def run_queries() -> dict:
    """Time a representative subset of queries() at the sf dir."""
    import __ray_entry__ as entrymod

    names = [
        "tile_counts_z9",
        "pip_counts",
        "lineitem_agg",
        "join_orders_customer",
        "top10_orders",
        "events_hourly",
        "text_stats",
        "dedup_exact",
        "knn_k5",
        "vector_sample",
        "embed_topk",
        "asof_join",
        "box_overlay",
    ]
    q = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        res = q[name](SF_DIR)
        # consume
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    head = run_headline()
    queries = {} if os.environ.get("GRAFT_SKIP_QUERIES") else run_queries()
    result = {
        "metric": "flagship pages->geoparse->tiles->cells->PIP->rollup wall sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "pages": head["pages"],
        "pages_per_sec": round(head["pages_per_sec"], 1),
        "parity_admin": head["parity_admin"],
    }
    print(json.dumps(result))
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # best-of-2 per level: the sandbox shares cores with background
    # load (loadavg ~10); min wall = least-interfered measurement
    r_lo = min((run(lo) for _ in range(2)), key=lambda r: r["value"])
    r_hi = min((run(hi) for _ in range(2)), key=lambda r: r["value"])
    tp_lo = r_lo["pages_per_sec"]
    tp_hi = r_hi["pages_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (pages/sec, {lo} vs {hi} cpus)",
                "value": round(eff, 3),
                "unit": "efficiency",
                "cpus": [lo, hi],
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "pages_per_sec_lo": tp_lo,
                "pages_per_sec_hi": tp_hi,
                "parity_match": r_lo["parity_admin"] == r_hi["parity_admin"],
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
