"""Hardware-ceiling microbenchmark for the scaling-efficiency analysis.

Runs the EXACT per-bucket kernel (BucketWindowStats on a real sf0.1
bucket-sized frame) in N concurrent OS processes with NO Ray involved,
and reports per-process throughput vs N. If per-core throughput declines
the same way it does under Ray, the decline is the VM's shared memory
bandwidth / LLC, not engine serialization — the engine's
hardware-normalized scaling is the Ray-measured efficiency divided by
the same-N process-level efficiency measured here.

Usage: python scripts/bandwidth_ceiling.py [Ns...]   (default 1 2 4 8 16)
"""

import json
import multiprocessing as mp
import sys
import time


def _one(args):
    rows, reps = args
    import pyarrow.parquet as pq

    sys.path.insert(0, ".")
    from fasta_windows_ray.stages.window_stats import BucketWindowStats
    from fasta_windows_ray.transcripts import project_events_batch

    t = pq.read_table("/root/testdata/sf0.1/events.parquet")
    df = project_events_batch(t.slice(0, rows)).to_pandas()
    S = 1_000_000
    inst = BucketWindowStats(profile="full", ctw_depth=6,
                             window_size_us=24 * 3600 * S,
                             step_us=6 * 3600 * S)
    inst(df.head(2000))               # warm numpy/caches
    t0 = time.perf_counter()
    for _ in range(reps):
        inst(df)
    return (rows * reps) / (time.perf_counter() - t0)


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    rows, reps = 25_000, 4
    out = {"rows_per_proc": rows, "reps": reps, "levels": {}}
    for n in ns:
        with mp.get_context("spawn").Pool(n) as pool:
            t0 = time.perf_counter()
            thr = pool.map(_one, [(rows, reps)] * n)
            wall = time.perf_counter() - t0
        per = sum(thr) / n
        out["levels"][n] = {"per_proc_turns_per_sec": round(per, 1),
                            "total_turns_per_sec": round(sum(thr), 1),
                            "wall": round(wall, 2)}
        print(f"N={n:3d}  per-proc {per:10.0f} t/s   "
              f"total {sum(thr):10.0f} t/s", file=sys.stderr)
    base = out["levels"][ns[0]]["per_proc_turns_per_sec"]
    for n in ns:
        out["levels"][n]["per_core_efficiency_vs_N1"] = round(
            out["levels"][n]["per_proc_turns_per_sec"] / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
