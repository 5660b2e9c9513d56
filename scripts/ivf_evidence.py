"""Scale evidence for the persisted IVF index (round-3 VERDICT #2):
query bytes-read must scale with nprobe/n_lists, NOT corpus size.

Builds the index once over the sf embeddings corpus (partitioned-by-list
exactly-once layout), then queries at increasing nprobe and records the
fraction of index bytes each query actually reads plus recall@10 vs the
exact ranking. Writes BENCH_IVF_r{N}.json at the repo root.

Usage: python scripts/ivf_evidence.py [sf_dir] [out.json]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_IVF_r04.json"

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import pyarrow.parquet as pq
    import ray.data as rd

    from fasta_windows_ray.stages.similarity import (brute_force_topk,
                                                     ivf_build, ivf_query)

    n_lists = 16
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n_vecs = pq.ParquetFile(f"{sf_dir}/embeddings.parquet") \
        .metadata.num_rows

    idx_dir = tempfile.mkdtemp(prefix="fw_ray_ivf_evidence_")
    t0 = time.perf_counter()
    ivf_build(ds, idx_dir, n_centroids=n_lists, seed=3)
    build_sec = time.perf_counter() - t0

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    mask = np.isin(qt["vec_id"].to_numpy(), [0])
    Q = np.stack(qt.filter(mask)["embedding"]
                 .to_numpy(zero_copy_only=False)).astype(np.float64)

    exact = brute_force_topk(ds, Q, [0], k=10)
    want = set(exact.loc[exact["query_id"] == 0, "vec_id"])

    points = []
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        res = ivf_query(idx_dir, Q, [0], k=10, nprobe=nprobe)
        wall = time.perf_counter() - t0
        got = set(res.loc[res["query_id"] == 0, "vec_id"])
        points.append({
            "nprobe": nprobe,
            "probe_fraction": round(nprobe / n_lists, 4),
            "bytes_read": int(res.attrs["bytes_read"]),
            "bytes_total": int(res.attrs["bytes_total"]),
            "bytes_fraction": round(res.attrs["bytes_read"]
                                    / res.attrs["bytes_total"], 4),
            "recall_at_10": round(len(got & want) / 10, 3),
            "query_sec": round(wall, 3),
        })
        print(points[-1])

    out = {
        "metric": "IVF persisted-index query bytes-read vs nprobe "
                  "(bytes must track nprobe/n_lists, not corpus size)",
        "sf": sf_dir, "n_vectors": int(n_vecs), "n_lists": n_lists,
        "build_sec": round(build_sec, 3),
        "index_bytes": points[0]["bytes_total"],
        "points": points,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
