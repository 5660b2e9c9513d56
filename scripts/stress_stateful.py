"""Stress artifact (round-2 VERDICT #7): the stateful FULL profile at
128x-256x replication — the heaviest realistic config (sliding 24h/6h,
all 13 stat columns incl. CTW, bounded k-gram sketch, bucket keying) —
with per-task peak rows and worker peak RSS recorded.

Writes BENCH_STRESS_r{N}.json at the repo root (one JSON object).

Usage:
    python scripts/stress_stateful.py [replicate] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> dict:
    import pyarrow.parquet as pq
    import ray
    from ray.data import DataContext

    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    import bench
    from fasta_windows_ray.state.engine import WindowConfig
    from fasta_windows_ray.state.runner import stateful_window_run

    n_turns = pq.ParquetFile(f"{sf}/events.parquet").metadata.num_rows
    pq.read_table(f"{sf}/events.parquet")        # warm page cache

    cfg = WindowConfig(kind="sliding", size_us=bench.SLIDE_SIZE_US,
                       step_us=bench.SLIDE_STEP_US, profile="full")
    # pilot absorbs worker spawn
    bench._consume(stateful_window_run(
        bench.read_transcripts_replicated(sf, 1),
        WindowConfig(kind="tumbling", size_us=bench.SLIDE_SIZE_US,
                     profile="counts"), num_buckets=ncpu))

    num_buckets = 1024
    blocks = max(1, 128 // replicate) if replicate < 128 else 1
    t0 = time.perf_counter()
    ds = stateful_window_run(
        bench.read_transcripts_replicated(sf, replicate, slices=blocks),
        cfg, num_buckets=num_buckets, diag=True).materialize()
    wall = time.perf_counter() - t0
    # cheap distributed aggregates over the materialized blocks (output
    # stays in the object store; nothing is pulled to the driver)
    n_out = ds.count()
    peak_rows = int(ds.max("_diag_rows"))
    rss = ds.max("_diag_maxrss_kb")
    out = {
        "metric": "stateful full-profile stress (sliding 24h/6h, CTW, "
                  "bounded sketch)",
        "replicate": replicate,
        "n_turns": int(n_turns * replicate),
        "num_cpus": ncpu,
        "num_buckets": num_buckets,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns * replicate / wall, 1),
        "windows_emitted": n_out,
        "peak_rows_per_task_group": peak_rows,
        "peak_worker_rss_mb": round(float(rss) / 1024, 1),
        "sf": sf,
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    res = main()
    path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_STRESS_r03.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
