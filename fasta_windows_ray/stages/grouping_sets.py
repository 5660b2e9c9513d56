"""Multi-level aggregation — SQL GROUP BY GROUPING SETS / ROLLUP /
CUBE over a Dataset, one pass, no per-set re-scan.

Semantics match SQL: each grouping set aggregates the WHOLE input by
its own key subset; rolled-up key columns surface as nulls, and a
``gset`` bitmask column (= DuckDB's ``GROUPING(k1, ..., kn)``, bit i
set when key i is aggregated away, k1 = most significant) separates a
rolled-up null from a genuine null data key.  Supported aggregates:
``count`` (non-null of a column, or ``*``), ``sum``, ``min``, ``max``,
``mean`` — mean rides an exact (sum, count) pair, so results are
bit-stable against a SQL twin after ``round(x, 6)``.

Ray-Data shape (the engine's combiner discipline): the per-batch
combiner replicates each batch once per grouping set and folds it to
per-(set, key-values) PARTIALS — the exchange then carries
|sets| × distinct-keys-per-batch rows, never input rows; a single
hash-bucket shuffle (``pd.util.hash_pandas_object`` over gset + keys)
and a vectorized per-bucket fold finish the job.  ROLLUP(d+1 sets) /
CUBE(2^d sets) therefore cost d×/2^d× COMBINER compute but only one
exchange of pre-aggregated rows — the standard lattice trade; callers
with 100-TB inputs and high-cardinality keys should prefer ROLLUP
over CUBE exactly as they would in SQL.

PARTITIONING ASSUMPTION: per-bucket state is bounded by distinct
(gset, keys) groups / num_buckets; the all-rolled-up set () is ONE
global group but its partials are one row per input block — a
driver-free scalar fold, not a hot key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_AGGS = ("count", "sum", "min", "max", "mean")


def rollup(keys: list[str]) -> list[list[str]]:
    """ROLLUP(a, b, c) -> [[a,b,c], [a,b], [a], []]."""
    return [keys[:i] for i in range(len(keys), -1, -1)]


def cube(keys: list[str]) -> list[list[str]]:
    """CUBE(a, b) -> every subset, SQL enumeration order-insensitive."""
    out = []
    for m in range(1 << len(keys)):
        out.append([k for i, k in enumerate(keys) if m >> i & 1])
    return out


def grouping_sets(ds, sets: list[list[str]],
                  aggs: dict[str, tuple[str, str | None]],
                  num_buckets: int = 64):
    """Aggregate ``ds`` once per grouping set.

    ``sets``: list of key-column subsets (``[]`` = grand total); the
    ALL-KEYS universe (union, first-seen order) defines the ``gset``
    bitmask bit order, matching ``GROUPING(k1, ..., kn)`` in SQL with
    k1 the first key encountered.
    ``aggs``: ``{out_col: (fn, col)}`` with fn in count/sum/min/max/
    mean; ``col=None`` only for count (COUNT(*)).

    Returns a Dataset with columns [gset] + all keys + out columns;
    keys absent from a row's grouping set are null.
    """
    keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in keys:
                keys.append(k)
    for s in sets:
        if len(set(s)) != len(s):
            raise ValueError(f"duplicate key in grouping set {s!r}")
    if len({tuple(s) for s in map(sorted, sets)}) != len(sets):
        raise ValueError("duplicate grouping sets")
    for out, (fn, col) in aggs.items():
        if fn not in _AGGS:
            raise ValueError(f"unknown aggregate {fn!r} for {out!r}")
        if col is None and fn != "count":
            raise ValueError(f"{out!r}: only count supports col=None")

    masks = [sum((k not in s) << (len(keys) - 1 - i)
                 for i, k in enumerate(keys)) for s in sets]

    # partial column plan: each out needs sum/count/min/max partials
    def partial_cols(df: pd.DataFrame, g) -> pd.DataFrame:
        parts = {}
        for out, (fn, col) in aggs.items():
            if fn == "count":
                parts[f"_c_{out}"] = (g.size() if col is None
                                      else g[col].count())
            elif fn in ("sum", "mean"):
                parts[f"_s_{out}"] = g[col].sum()
                # sum needs the non-null count too: SQL SUM over an
                # all-null group is NULL, pandas' skipna sum is 0
                parts[f"_c_{out}"] = g[col].count()
            elif fn == "min":
                parts[f"_m_{out}"] = g[col].min()
            else:
                parts[f"_M_{out}"] = g[col].max()
        return pd.DataFrame(parts)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for s, m in zip(sets, masks):
            if s:
                g = df.groupby(s, dropna=False, sort=False)
                p = partial_cols(df, g).reset_index()
            else:
                g = df.groupby(np.zeros(len(df), np.int8), sort=False)
                p = partial_cols(df, g).reset_index(drop=True)
            for k in keys:
                if k not in s:
                    p[k] = None
            p["_gset"] = np.int64(m)
            frames.append(p)
        out = pd.concat(frames, ignore_index=True)
        h = pd.util.hash_pandas_object(out[["_gset"] + keys],
                                       index=False).to_numpy()
        out["_b"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return out

    plan = {}
    for out, (fn, col) in aggs.items():
        if fn == "count":
            plan[f"_c_{out}"] = "sum"
        elif fn in ("sum", "mean"):
            plan[f"_s_{out}"] = "sum"
            plan[f"_c_{out}"] = "sum"
        elif fn == "min":
            plan[f"_m_{out}"] = "min"
        else:
            plan[f"_M_{out}"] = "max"

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["gset"] + keys + list(aggs)
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        g = (df.groupby(["_gset"] + keys, dropna=False, sort=False,
                        as_index=False).agg(plan)
             .rename(columns={"_gset": "gset"}))
        for out, (fn, col) in aggs.items():
            if fn == "count":
                g[out] = g[f"_c_{out}"].astype(np.int64)
            elif fn == "sum":
                g[out] = np.where(g[f"_c_{out}"] > 0,
                                  g[f"_s_{out}"], np.nan)
            elif fn == "mean":
                g[out] = g[f"_s_{out}"] / g[f"_c_{out}"]
            elif fn == "min":
                g[out] = g[f"_m_{out}"]
            else:
                g[out] = g[f"_M_{out}"]
        return g[cols]

    return (ds.map_batches(combine, batch_format="pandas")
            .groupby("_b").map_groups(fold, batch_format="pandas"))
