"""Evidence for the bounded-group-size claim (round-1 VERDICT #3).

With plain conv-hash bucketing, the largest map_groups task grows
linearly with total dataset size (a group = 1/num_buckets of ALL rows).
With the composite (bucket x time-slab) key, the largest group is bounded
by the slab's row count / num_buckets — fixed as the dataset grows in
TIME (the way a 100 TB event log grows).

This script measures, at fixed num_buckets, the max/mean rows per group
and the headline wall time for plain vs slabbed keying on replicated
sf0.1 data (30-day span; slab_windows=8 -> 48 h slabs -> ~16 slabs), and
verifies identical output row counts. Results recorded in BASELINE.md.

Usage: python scripts/slab_evidence.py [replicate]
"""

import json
import sys
import time

import numpy as np

SLIDE_SIZE_US = 24 * 3600 * 1_000_000
SLIDE_STEP_US = 6 * 3600 * 1_000_000
NUM_BUCKETS = 32


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")
    from bench import read_transcripts_replicated
    from fasta_windows_ray.stages.window_stats import (add_bucket,
                                                       add_bucket_slab,
                                                       window_stats)

    out = {"replicate": rep, "num_buckets": NUM_BUCKETS}

    # group-size histogram: rows per grouping key
    def group_sizes(ds, key):
        sizes = {}
        for b in ds.select_columns([key]).iter_batches(
                batch_size=262144, batch_format="pyarrow"):
            vals, cnts = np.unique(b[key].to_numpy(), return_counts=True)
            for v, c in zip(vals.tolist(), cnts.tolist()):
                sizes[v] = sizes.get(v, 0) + c
        arr = np.asarray(list(sizes.values()))
        return {"n_groups": len(arr), "max_rows": int(arr.max()),
                "mean_rows": float(arr.mean())}

    base = read_transcripts_replicated("/root/testdata/sf0.1", rep)
    out["plain"] = group_sizes(add_bucket(base, NUM_BUCKETS), "bucket")
    slabbed, L = add_bucket_slab(
        read_transcripts_replicated("/root/testdata/sf0.1", rep),
        NUM_BUCKETS, SLIDE_SIZE_US, SLIDE_STEP_US, 0, slab_windows=8)
    out["slabbed"] = group_sizes(slabbed, "_gk")
    out["slab_hours"] = L / 3_600_000_000

    # wall time + output equality
    for name, sw in (("plain_sec", None), ("slabbed_sec", 8)):
        t0 = time.perf_counter()
        n = 0
        ds = window_stats(
            read_transcripts_replicated("/root/testdata/sf0.1", rep),
            SLIDE_SIZE_US, step_us=SLIDE_STEP_US, profile="full",
            num_buckets=NUM_BUCKETS, slab_windows=sw)
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        out[name] = round(time.perf_counter() - t0, 2)
        out[name.replace("_sec", "_rows")] = n
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
