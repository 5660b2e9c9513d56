"""Throughput evidence for the round-4 incremental-ingest operators
(BENCH_INGEST_r04.json): exact dedup_ingest and minhash_ingest over
replicated sf0.1 documents.

Workload: batch 1 = documents replicated over shards 0..R-1 with
shard-salted texts (all unique); batch 2 = 50% re-ingest (shards
R/2..R-1 again = pure store dups) + 50% fresh shards. Reports docs/s
per phase and the dup accounting, plus the store-read evidence from
the reports themselves.

Usage: python scripts/bench_ingest.py [replicate] > BENCH_INGEST_r04.json
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shard_docs(shards):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def load(sh):
        ds = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                             columns=["doc_id", "text"])

        def tag(t: pa.Table, sh=sh) -> pa.Table:
            did = pc.binary_join_element_wise(
                pa.array([f"s{sh}-"] * len(t)),
                pc.cast(t["doc_id"], pa.string()), "")
            txt = pc.binary_join_element_wise(
                pc.cast(t["text"], pa.string()),
                pa.array([f" shard-{sh}"] * len(t)), "")
            return pa.table({"doc_id": did, "text": txt})
        return ds.map_batches(tag, batch_format="pyarrow")

    out = load(shards[0])
    for sh in shards[1:]:
        out = out.union(load(sh))
    # the union of R single-file reads yields R*64 ~80-row blocks; a
    # real ingest batch arrives in sane block sizes — normalize so the
    # measurement is the operator, not per-tiny-block task overhead
    return out.repartition(4 * len(shards))


def main():
    import ray

    from fasta_windows_ray.stages.ingest_dedup import (dedup_ingest,
                                                       minhash_ingest)

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    out = {"sf": SF, "replicate": R,
           "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32"))}

    # ---- exact ingest --------------------------------------------------
    store = "/tmp/bench_ingest_store"
    shutil.rmtree(store, ignore_errors=True)
    b1 = shard_docs(list(range(R))).materialize()
    n1 = b1.count()
    t0 = time.perf_counter()
    r1 = dedup_ingest(b1, store, n_buckets=64)
    t1 = time.perf_counter() - t0
    # 50% dups vs store, 50% fresh
    b2 = shard_docs(list(range(R // 2, R + R // 2))).materialize()
    n2 = b2.count()
    t0 = time.perf_counter()
    r2 = dedup_ingest(b2, store, n_buckets=64)
    t2 = time.perf_counter() - t0
    out["exact"] = {
        "batch1_docs": n1, "batch1_sec": round(t1, 3),
        "batch1_docs_per_sec": round(n1 / t1),
        "batch2_docs": n2, "batch2_sec": round(t2, 3),
        "batch2_docs_per_sec": round(n2 / t2),
        "batch2_dup_vs_store": r2["n_dup_vs_store"],
        "batch2_new": r2["n_new"],
        "store_rows_read_b2": r2["store_rows_read"],
        "store_rows_total_b2": r2["store_rows_total"]}

    # ---- minhash ingest (heavier: signature pass) ----------------------
    # NOTE: shard-salted copies are near-dups of each other by
    # construction (the salt is a tiny edit), so the near-dup workload
    # uses the raw distinct docs for batch 1 and lightly-edited
    # versions for batch 2 (all should be caught as near-dups).
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    store2 = "/tmp/bench_minhash_store"
    shutil.rmtree(store2, ignore_errors=True)
    m1 = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.string()),
                            "text": pc.cast(t["text"], pa.string())}),
        batch_format="pyarrow").materialize()
    nm = m1.count()
    t0 = time.perf_counter()
    _, mr1 = minhash_ingest(m1, store2, n_buckets=64)
    tm1 = time.perf_counter() - t0

    def edit(t: pa.Table) -> pa.Table:
        did = pc.binary_join_element_wise(
            pa.array(["v2-"] * len(t)), t["doc_id"], "")
        txt = pc.binary_join_element_wise(
            pa.array(["revised edition "] * len(t)), t["text"], "")
        return pa.table({"doc_id": did, "text": txt})

    m2 = m1.map_batches(edit, batch_format="pyarrow").materialize()
    nm2 = m2.count()
    t0 = time.perf_counter()
    _, mr2 = minhash_ingest(m2, store2, n_buckets=64)
    tm2 = time.perf_counter() - t0
    out["minhash"] = {
        "batch1_docs": nm, "batch1_sec": round(tm1, 3),
        "batch1_docs_per_sec": round(nm / tm1),
        "batch1_new": mr1["n_new"],
        "batch2_docs": nm2, "batch2_sec": round(tm2, 3),
        "batch2_docs_per_sec": round(nm2 / tm2),
        "batch2_new": mr2["n_new"],
        "batch2_dropped": mr2["n_dropped"],
        "batch2_candidates": mr2["n_candidates"]}

    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(store2, ignore_errors=True)
    json.dump(out, sys.stdout, indent=1)
    print()
    ray.shutdown()


if __name__ == "__main__":
    main()
