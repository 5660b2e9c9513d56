"""Distributed analytics operators a large-scale curation pipeline leans
on beyond the windowed-stats core: grouped top-k (heavy hitters per
group), exact distributed quantiles, and windowed exact distinct counts.

Ray-Data shapes (all three follow the same partial-aggregate discipline
that keeps the reference's one-pass spirit — fasta_windows folds each
window's statistics in a single pass, src/fasta_windows.rs:86-141 — while
bounding what crosses the shuffle):

- grouped_topk: per-batch combiner (pandas groupby-sum inside
  map_batches) so the all-to-all exchange only carries pre-aggregated
  (group, key) partials, then a multi-key ``Dataset.groupby().sum()``
  and a per-group ``map_groups`` top-k. The shuffle volume is bounded by
  the number of DISTINCT (group, key) pairs, not input rows.
- exact_quantiles: per-batch value histogram (np.unique) → groupby-sum
  over distinct values → tiny driver-side cumulative walk. Exactness
  relies on the column having bounded distinct cardinality (lengths,
  counts, scores in fixed grids); the distinct-value table IS the small
  result, so collecting it is not a driver-side materialization of data.
- windowed_distinct: exact COUNT(DISTINCT user) per tumbling window via
  two pre-aggregated exchanges: (window, user) partials first (dedups
  and partial-sums inside the batch), then per-window rollup. Never
  ships raw rows twice, never holds a global user set anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_topk(ds, group_col: str, key_col: str, k: int,
                 weight_col: str | None = None):
    """Top-k heavy hitters per group: the ``k`` keys with the most rows
    in each group (ties broken by ascending key, so output is fully
    deterministic). If ``weight_col`` is given its per-(group, key) sum
    is carried along as ``sum_weight`` (informational; ranking is by the
    exact integer count so results are reproducible bit-for-bit).

    Returns columns: group_col, key_col, n_rows, [sum_weight], rank.
    """
    cols = [group_col, key_col] + ([weight_col] if weight_col else [])

    def combine(t: pa.Table) -> pd.DataFrame:
        df = t.select(cols).to_pandas()
        gb = df.groupby([group_col, key_col], sort=False)
        agg = {"n_rows": (key_col, "size")}
        if weight_col:
            agg["sum_weight"] = (weight_col, "sum")
        return gb.agg(**agg).reset_index()

    partial = ds.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)
    gb = partial.groupby([group_col, key_col])
    total = gb.sum(["n_rows", "sum_weight"] if weight_col else ["n_rows"])
    ren = {"sum(n_rows)": "n_rows", "sum(sum_weight)": "sum_weight"}

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={c: ren[c] for c in df.columns if c in ren})
        df = df.sort_values(["n_rows", key_col], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return total.groupby(group_col).map_groups(topk, batch_format="pandas")


def exact_quantiles(ds, col: str, qs: list[float]):
    """Exact quantiles of a bounded-cardinality column, distributed.

    Semantics match DuckDB's ``quantile_disc`` (inverted CDF: the
    smallest value whose cumulative count reaches ``ceil(q*n)``,
    verified empirically for q in (0,1]; q=0 is the minimum).

    Per-batch ``np.unique`` histograms → ``groupby(value).sum`` → the
    merged (value, count) table is collected (it is the bounded-size
    result of the aggregation, not the input) and walked cumulatively.
    Returns a pandas frame (q, value).
    """

    def hist(t: pa.Table) -> pd.DataFrame:
        v, c = np.unique(t[col].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pd.DataFrame({col: v, "cnt": c.astype(np.int64)})

    merged = (ds.map_batches(hist, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby(col).sum("cnt").to_pandas())
    merged = merged.sort_values(col).reset_index(drop=True)
    counts = merged["sum(cnt)"].to_numpy()
    values = merged[col].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        target = 1 if q <= 0 else int(np.ceil(q * n))
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append((float(q), values[min(idx, len(values) - 1)]))
    return pd.DataFrame(out, columns=["q", "value"])


def windowed_distinct(ds, ts_col: str, user_col: str, size_us: int,
                      value_col: str | None = None):
    """Tumbling-window rollup over an event stream with EXACT distinct
    users: per window emit n_events, n_users (exact count-distinct) and
    optionally sum_value.

    Stage 1 dedups/partial-sums (window, user) inside each batch, so the
    first exchange carries at most one row per (window, user) per batch;
    after the global (window, user) sum each pair exists once, so the
    second exchange's COUNT of pairs per window IS the exact distinct.

    ``window_start`` is emitted as int64 epoch-microseconds.
    """
    cols = [ts_col, user_col] + ([value_col] if value_col else [])

    def assign(t: pa.Table) -> pd.DataFrame:
        df = t.select(cols).to_pandas()
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        df["window_start"] = (ts // size_us) * size_us
        agg = {"n_events": (user_col, "size")}
        if value_col:
            agg["sum_value"] = (value_col, "sum")
        return (df.groupby(["window_start", user_col], sort=False)
                  .agg(**agg).reset_index())

    partial = ds.map_batches(assign, batch_format="pyarrow",
                             zero_copy_batch=True)
    per_pair = partial.groupby(["window_start", user_col]).sum(
        ["n_events", "sum_value"] if value_col else ["n_events"])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        out = {"window_start": [np.int64(df["window_start"].iloc[0])],
               "n_events": [np.int64(df["sum(n_events)"].sum())],
               "n_users": [np.int64(len(df))]}
        if value_col:
            out["sum_value"] = [float(df["sum(sum_value)"].sum())]
        return pd.DataFrame(out)

    return per_pair.groupby("window_start").map_groups(
        roll, batch_format="pandas")
