"""Scale evidence for the late-round-4 operator additions: batch
temporal join, streaming temporal replay, pivot, and the rank-family
window functions, at replicated input (events x N with shard-shifted
user ids).

For each op: wall time, input rows, rows/s, output rows, min of 2
passes. Writes BENCH_OPS_r04.json at the repo root.

Usage:
    python scripts/bench_r4_ops.py [replicate] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

US = 1_000_000
T0 = 1_704_067_200 * US                  # 2024-01-01 epoch-µs
T_MID = T0 + 15 * 86_400 * US
T_LATE = T0 + 25 * 86_400 * US


def main() -> dict:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data import DataContext

    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_OPS_r04.json"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    path = f"{sf}/events.parquet"
    base = pq.read_table(path, columns=["event_id", "user_id", "ts",
                                        "event_type"])
    n_users = int(pa.compute.max(base["user_id"]).as_py()) + 1
    n_in = len(base) * replicate

    def load(batch):
        for j in batch["id"].tolist():
            t = pq.read_table(path, columns=["event_id", "user_id",
                                             "ts", "event_type"])
            uid = pa.compute.add(t["user_id"],
                                 pa.scalar(int(j) * n_users, pa.int64()))
            yield t.set_column(t.column_names.index("user_id"),
                               "user_id", uid)

    def events():
        return rd.range(replicate,
                        override_num_blocks=replicate).map_batches(
            load, batch_format="numpy")

    # dim history over every replicated user: v1 at T0 for all, an
    # update at T_MID for every 2nd, a deletion at T_LATE for every 4th
    U = n_users * replicate
    uids = np.arange(U, dtype=np.int64)
    hist = [pd.DataFrame({
        "user_id": uids, "tier": uids % 7 * 1.0,
        "valid_from": np.int64(T0),
        "valid_to": np.where(uids % 2 == 0, np.int64(T_MID),
                             np.where(uids % 4 == 1, np.int64(T_LATE),
                                      -1))})]
    upd = uids[uids % 2 == 0]
    hist.append(pd.DataFrame({
        "user_id": upd, "tier": upd % 7 + 100.0,
        "valid_from": np.int64(T_MID),
        "valid_to": np.where(upd % 4 == 0, np.int64(T_LATE), -1)}))
    h = pd.concat(hist, ignore_index=True)
    h["valid_to"] = h["valid_to"].where(h["valid_to"] >= 0).astype("Int64")
    hist_df = h
    cdc_rows = [h.rename(columns={"valid_from": "ts"})
                 .assign(_change="insert")[["user_id", "ts", "_change",
                                            "tier"]]]
    closed = h[h["valid_to"].notna()]
    cdc_rows.append(closed.rename(columns={"valid_to": "ts"})
                    .assign(_change="delete")[["user_id", "ts",
                                               "_change", "tier"]])
    cdc_df = pd.concat(cdc_rows, ignore_index=True)
    cdc_df["ts"] = cdc_df["ts"].astype("int64")

    def timed(fn, passes=2):
        best = None
        out_rows = 0
        for _ in range(passes):
            t0 = time.time()
            out_rows = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, out_rows

    ops = {}

    def record(name, sec, rows_out, rows_in=n_in):
        ops[name] = {"sec": round(sec, 3), "rows_in": rows_in,
                     "rows_out": int(rows_out),
                     "rows_per_sec": round(rows_in / sec, 1)}
        print(name, ops[name], file=sys.stderr)

    from fasta_windows_ray.stages.temporal import temporal_join

    def run_tj():
        hd = pd.DataFrame(hist_df)
        hd["valid_to"] = hd["valid_to"].astype("float64")
        out = temporal_join(events(), rd.from_pandas(hd),
                            key="user_id", value_cols=["tier"],
                            num_buckets=2 * ncpu)
        return out.count()

    sec, rows = timed(run_tj)
    record("temporal_join_batch", sec, rows)

    from fasta_windows_ray.state.temporal import (TemporalConfig,
                                                  stateful_temporal_run)

    def run_stj():
        cfg = TemporalConfig(value_cols=("tier",), key_col="user_id",
                             uid_col="event_id")
        out = stateful_temporal_run(
            events(), rd.from_pandas(cdc_df), cfg,
            num_buckets=2 * ncpu,
            value_types={"tier": pa.float64()})
        return out.count()

    sec, rows = timed(run_stj)
    record("temporal_join_streaming_replay", sec, rows,
           rows_in=n_in + len(cdc_df))

    from fasta_windows_ray.stages.reshape import pivot

    def run_pivot():
        out = pivot(events(), ["user_id"], "event_type", "event_id",
                    agg="count",
                    values=["view", "click", "purchase", "error"])
        return out.count()

    sec, rows = timed(run_pivot)
    record("pivot_count_by_type", sec, rows)

    from fasta_windows_ray.stages.window_funcs import window_functions

    def run_wf():
        out = window_functions(
            events(), ["user_id"], ["ts", "event_id"],
            [("rank", "rk"), ("dense_rank", "drk"), ("ntile", 10, "t"),
             ("percent_rank", "pr"), ("cume_dist", "cd"),
             ("row_number", "rn")], num_buckets=2 * ncpu)
        return out.count()

    sec, rows = timed(run_wf)
    record("window_rank_family", sec, rows)

    from fasta_windows_ray.stages.setops import set_op

    def _keys(ds):
        return ds.map_batches(
            lambda t: t.select(["user_id", "event_type"]),
            batch_format="pyarrow", zero_copy_batch=True)

    def run_except():
        left = _keys(events())
        right = _keys(events()).filter(
            lambda r: r["event_type"] == "purchase")
        return set_op(left, right, "except_all",
                      num_buckets=2 * ncpu).count()

    sec, rows = timed(run_except)
    record("setops_except_all", sec, rows, rows_in=2 * n_in)

    from fasta_windows_ray.stages.grouping_sets import cube, grouping_sets

    def run_cube():
        def add_day(t: pa.Table) -> pa.Table:
            day = pa.compute.floor_temporal(t["ts"], unit="day")
            return t.append_column("day", day)
        ds = events().map_batches(add_day, batch_format="pyarrow",
                                  zero_copy_batch=True)
        out = grouping_sets(ds, cube(["event_type", "day"]),
                            {"n": ("count", None),
                             "hi": ("max", "event_id")},
                            num_buckets=2 * ncpu)
        return out.count()

    sec, rows = timed(run_cube)
    record("grouping_sets_cube", sec, rows)

    from fasta_windows_ray.stages.features import bin_numeric, standardize

    def run_features():
        # stats pass + broadcast + vectorized transform, per event_type
        out = standardize(events(), ["user_id"], by="event_type")
        out = bin_numeric(out, "user_id", n_bins=16, method="width")
        return out.count()

    sec, rows = timed(run_features)
    record("features_standardize_bin", sec, rows)

    from fasta_windows_ray.stages.fuzzy import fuzzy_join

    def run_fuzzy():
        docs = rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        right = docs.map_batches(
            lambda t: t.set_column(
                t.column_names.index("doc_id"), "doc_id",
                pa.compute.add(t["doc_id"], pa.scalar(10_000_000,
                                                      pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True)
        out = fuzzy_join(docs, right, threshold=0.8, shingle_k=5,
                         num_buckets=2 * ncpu)
        return out.count()

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    sec, rows = timed(run_fuzzy)
    record("fuzzy_join_docs_selfpair", sec, rows, rows_in=2 * n_docs)

    result = {
        "metric": "late-round-4 operators at replicated scale",
        "replicate": replicate, "num_cpus": ncpu, "sf": sf,
        "n_events": n_in, "n_dim_rows": len(hist_df),
        "ops": ops,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    ray.shutdown()
    return result


if __name__ == "__main__":
    main()
