"""Co-group: the general keyed two-table UDF primitive (Spark's
``cogroup`` analogue) — for each key, the user function sees ALL left
rows and ALL right rows of that key at once.  Every binary keyed
operator (joins, per-key set difference, custom reconciliation,
interleaved merge) is a specialization; the engine's join family
hand-rolls this shape per operator (stages/joins.py union-tag +
per-bucket merge) — ``cogroup`` exposes it for user logic.

Shape (one exchange):
1. tag each side (``_cg_side`` 0/1) and pad to ONE unified schema
   (missing columns -> typed nulls) so the sort-based groupby never
   mixes block schemas;
2. union, bucket by ``stable_bucket_of(key) % num_buckets`` — the
   SAME hash every engine stage uses, so co-partitioned inputs stay
   co-partitioned;
3. ``groupby(bucket).map_groups``: within a task, split by side once,
   group both sides by key (vectorized pandas), call ``fn(key,
   left_df, right_df)`` per key present on EITHER side.

Per-task state is bounded by the bucket's rows (pick ``num_buckets``
~= 2x cluster CPUs like the join family); ``fn`` is called once per
key — keep per-key work vectorized and key cardinality per bucket is
the loop bound, exactly the contract of Spark/Flink cogroup.

Null keys: both sides' null keys co-group under the null key (handed
to ``fn`` as ``None``) — stricter SQL join semantics belong to the
join operators, not the primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pad_to(df: pd.DataFrame, all_cols: dict) -> pd.DataFrame:
    out = {}
    n = len(df)
    for c, dt in all_cols.items():
        if c in df.columns:
            v = df[c].to_numpy()
            # EVERY 'i'-hinted column goes float64: one side may pad
            # with NaN, and even a shared int column arrives float64
            # from any batch containing a null — a uniform dtype is
            # the only way the union never mixes block schemas
            if dt == "i":
                v = v.astype(np.float64)
            out[c] = v
        elif dt == "i":
            out[c] = np.full(n, np.nan)          # null-pad; ints float
        else:
            out[c] = np.full(n, None, dtype=object)
    return pd.DataFrame(out)


def cogroup(left, right, on: str, fn, num_buckets: int = 64,
            left_cols: dict | None = None,
            right_cols: dict | None = None):
    """Apply ``fn(key, left_pdf, right_pdf) -> pandas.DataFrame`` per
    key across two datasets.  ``left_cols``/``right_cols`` are optional
    static ``{name: "i"|"s"}`` schema hints ("i" numeric, "s" string)
    — REQUIRED when either side can be empty (an all-empty Ray dataset
    loses its column names; also skips the Dataset.schema() probe the
    engine avoids) OR when the two sides carry different column sets
    (the hints drive the union's schema unification; without them both
    sides must share one column set).  ``fn`` results are concatenated
    per bucket; an empty result drops the key."""
    from .window_stats import stable_bucket_of

    if (left_cols is None) != (right_cols is None):
        raise ValueError("pass BOTH left_cols and right_cols or "
                         "neither — one-sided hints cannot unify the "
                         "union schema")

    def tagger(side: int):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["_cg_side"] = np.int64(side)
            keys = df[on]
            if pd.api.types.is_numeric_dtype(keys):
                # canonical float64: a batch with a null upcasts int64
                # keys to float64, and str(7) != str(7.0) would split
                # merge-equal keys across buckets (joins.py _canon has
                # the same rule for the same reason)
                keys = keys.astype(np.float64)
            else:
                # null keys bucket under the "" sentinel (same task as
                # genuine "" keys — bucketing only; fn still sees None)
                keys = keys.fillna("")
            b = stable_bucket_of(keys.to_numpy(), num_buckets)
            out["_cg_b"] = b
            return out
        return tag

    tl = left.map_batches(tagger(0), batch_format="pandas")
    tr = right.map_batches(tagger(1), batch_format="pandas")

    # unify schemas: pad each side with the other's exclusive columns
    if left_cols is not None and right_cols is not None:
        all_cols = {**left_cols, **right_cols}

        def pad(df: pd.DataFrame) -> pd.DataFrame:
            keep = df[["_cg_side", "_cg_b"]]
            body = _pad_to(df, all_cols)
            body["_cg_side"] = keep["_cg_side"].to_numpy()
            body["_cg_b"] = keep["_cg_b"].to_numpy()
            return body

        tl = tl.map_batches(pad, batch_format="pandas")
        tr = tr.map_batches(pad, batch_format="pandas")
    both = tl.union(tr)

    lcols = set(left_cols) if left_cols else None
    rcols = set(right_cols) if right_cols else None

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        isr = df["_cg_side"].to_numpy() == 1
        l = df[~isr].drop(columns=["_cg_side", "_cg_b"])
        r = df[isr].drop(columns=["_cg_side", "_cg_b"])
        if lcols is not None:
            l = l[[c for c in l.columns if c in lcols]]
        if rcols is not None:
            r = r[[c for c in r.columns if c in rcols]]
        from .features import _gkey
        lg = {_gkey(k): g
              for k, g in l.groupby(on, sort=False, dropna=False)}
        rg = {_gkey(k): g
              for k, g in r.groupby(on, sort=False, dropna=False)}
        keys = set(lg) | set(rg)
        le = l.iloc[0:0]
        re = r.iloc[0:0]
        outs = []
        for k in sorted(keys, key=lambda x: (x is None, str(x))):
            res = fn(k, lg.get(k, le), rg.get(k, re))
            if res is not None and len(res):
                outs.append(res)
        if not outs:
            return pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    return both.groupby("_cg_b").map_groups(run_bucket,
                                            batch_format="pandas")
