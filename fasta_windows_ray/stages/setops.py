"""Relational set operations — INTERSECT / EXCEPT (ALL and DISTINCT)
and UNION DISTINCT — over two Datasets with identical schemas.

SQL bag semantics (multiplicities; ``l``/``r`` = copies of a row on
each side): INTERSECT ALL emits ``min(l, r)`` copies, EXCEPT ALL
``max(l - r, 0)``, the DISTINCT forms 0/1 copies, UNION DISTINCT one
copy of every row seen on either side.  NULL keys compare EQUAL — the
set-operation rule (same as GROUP BY), not the join rule — via pandas
``dropna=False`` grouping.

Ray-Data shape (the engine's combiner-then-shuffle discipline):

1. per-batch COMBINER on each side: group the batch by all columns
   (vectorized pandas groupby) down to (row-values, side, count) —
   the shuffle then moves per-batch-DISTINCT rows, not input rows;
2. ONE exchange on a row-content hash bucket
   (``pd.util.hash_pandas_object`` over all columns — the same
   vectorized row hash the HLL sketch and catalog use; buckets, not
   per-row groups, so groups stay bounded at distinct_rows/num_buckets);
3. per-bucket: sum counts per (row, side), apply the multiplicity
   formula, ``np.repeat`` the surviving rows.

PARTITIONING ASSUMPTION (100 TB): group size is distinct-row-bounded
per bucket; duplicates of one row value always co-locate (content
hash), so a pathological single hot row costs one task O(1) state —
counts, never buffered copies; the repeat only fans out on emit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_OPS = ("intersect_all", "except_all", "intersect", "except", "union")


def _side_counts(side: int, columns: list[str]):
    """Per-batch combiner: batch -> distinct (columns, _side, _cnt)."""
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df[columns].copy()
            # same column ORDER as the non-empty branch (cols, _cnt,
            # _side) — a 0-row block with permuted fields breaks the
            # exchange's schema unification
            out["_cnt"] = np.array([], np.int64)
            out["_side"] = np.array([], np.int8)
            return out
        g = (df[columns].groupby(columns, dropna=False, sort=False,
                                 as_index=False)
             .size().rename(columns={"size": "_cnt"}))
        g["_side"] = np.int8(side)
        g["_cnt"] = g["_cnt"].astype(np.int64)
        return g
    return combine


def _bucket(columns: list[str], num_buckets: int):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        # hash a CANONICALIZED view: numerics as float64, so a block
        # whose ints were null-upcast to float still co-buckets its
        # rows with int-typed blocks (5 and 5.0 are one SQL value but
        # two hash_pandas_object bit patterns)
        canon = df[columns].copy()
        for c in columns:
            if pd.api.types.is_numeric_dtype(canon[c]):
                canon[c] = canon[c].astype(np.float64)
        h = pd.util.hash_pandas_object(canon, index=False).to_numpy()
        df = df.copy()
        df["_b"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return df
    return add


def set_op(left, right, op: str, num_buckets: int = 64):
    """``left <op> right`` with SQL semantics; ``op`` one of
    ``intersect_all | except_all | intersect | except | union``
    (the last three are DISTINCT forms).  Schemas must carry the same
    column names (any order); output columns follow ``left``.
    """
    if op not in _OPS:
        raise ValueError(f"unknown set op {op!r}; expected one of {_OPS}")
    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    rcols = set(rsch.names)
    if set(lcols) != rcols:
        raise ValueError(
            f"schema mismatch: left has {sorted(lcols)}, right has "
            f"{sorted(rcols)} — set operations need identical columns")
    lt = dict(zip(lsch.names, [str(t) for t in lsch.types]))
    rt = dict(zip(rsch.names, [str(t) for t in rsch.types]))
    diff = {c for c in lcols if lt[c] != rt[c]}
    if diff:
        raise ValueError(
            f"dtype mismatch on {sorted(diff)} "
            f"({ {c: (lt[c], rt[c]) for c in sorted(diff)} }) — cast "
            "the sides to one type; int-vs-float rows would otherwise "
            "silently fail to pair")

    both = (left.map_batches(_side_counts(0, lcols), batch_format="pandas")
            .union(right.map_batches(_side_counts(1, lcols),
                                     batch_format="pandas"))
            .map_batches(_bucket(lcols, num_buckets),
                         batch_format="pandas"))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df[lcols]
        df = df.copy()
        df["_l"] = np.where(df["_side"].to_numpy() == 0,
                            df["_cnt"].to_numpy(), 0)
        df["_r"] = df["_cnt"].to_numpy() - df["_l"].to_numpy()
        g = (df.groupby(lcols, dropna=False, sort=False,
                        as_index=False)[["_l", "_r"]].sum())
        l, r = g["_l"].to_numpy(), g["_r"].to_numpy()
        if op == "intersect_all":
            k = np.minimum(l, r)
        elif op == "except_all":
            k = np.maximum(l - r, 0)
        elif op == "intersect":
            k = ((l > 0) & (r > 0)).astype(np.int64)
        elif op == "except":
            k = ((l > 0) & (r == 0)).astype(np.int64)
        else:                                          # union distinct
            k = np.ones(len(g), np.int64)
        idx = np.repeat(np.arange(len(g)), k)
        return g.iloc[idx][lcols].reset_index(drop=True)

    return both.groupby("_b").map_groups(emit, batch_format="pandas")


def intersect_all(left, right, **kw):
    return set_op(left, right, "intersect_all", **kw)


def except_all(left, right, **kw):
    return set_op(left, right, "except_all", **kw)


def intersect_distinct(left, right, **kw):
    return set_op(left, right, "intersect", **kw)


def except_distinct(left, right, **kw):
    return set_op(left, right, "except", **kw)


def union_distinct(left, right, **kw):
    return set_op(left, right, "union", **kw)
