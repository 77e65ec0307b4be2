"""SURVEY.md §5(d): identical outputs at two parallelism levels,
verified in FRESH processes (2 vs 4 CPUs) over the same input."""

import json
import subprocess
import sys

SCRIPT = r"""
import hashlib, json, os, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e
out = {}
for name in ("pip_counts", "tile_counts_z9", "dedup_exact"):
    df = e.queries()[name]("/root/testdata/sf0.001").to_pandas()
    df = df[sorted(df.columns)].sort_values(list(sorted(df.columns)),
                                            ignore_index=True)
    out[name] = hashlib.sha256(df.to_json().encode()).hexdigest()[:16]
print(json.dumps(out))
ray.shutdown()
"""


def _run(ncpu: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(ncpu)],
        capture_output=True,
        text=True,
        timeout=400,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_outputs_identical_at_two_parallelism_levels():
    h2 = _run(2)
    h4 = _run(4)
    assert h2 == h4
    assert len(h2) == 3
