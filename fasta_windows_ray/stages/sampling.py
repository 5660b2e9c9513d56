"""Deterministic hash-based sampling — the reproducible alternative to
``Dataset.random_sample`` for corpus curation: membership depends only
on the row's key, so a resumed / re-sharded / re-ordered run selects the
IDENTICAL sample (and a DuckDB oracle can reproduce it bit-for-bit).

Shape: pure shuffle-free ``map_batches`` filter; the md5-slot hash is
the engine-wide convention (stages/window_stats.py stable_bucket_of —
60-bit md5 prefix, exactly reproducible in signed-BIGINT SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .window_stats import stable_bucket_of

SLOTS = 1000  # permille resolution


def hash_sample(ds, key_col: str, permille: int,
                strata_col: str | None = None,
                strata_permille: dict | None = None):
    """Keep a row iff md5-slot(key) % 1000 < rate.

    ``permille`` is the default rate; with ``strata_col`` +
    ``strata_permille`` the rate varies per stratum (stratified
    sampling, e.g. downsample dominant languages harder). Rates are
    exact at the population level in expectation and exactly
    reproducible row-for-row across runs and partitionings.
    """
    strata_permille = strata_permille or {}

    def keep(t: pa.Table) -> pa.Table:
        slot = stable_bucket_of(t[key_col].to_numpy(zero_copy_only=False),
                                SLOTS)
        if strata_col is None:
            mask = slot < permille
        else:
            # null stratum -> "" -> default rate (np.unique would raise
            # comparing None to str otherwise)
            sc = t[strata_col]
            if isinstance(sc, pa.ChunkedArray):
                sc = sc.combine_chunks()
            strata = sc.fill_null("").to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(strata.astype(object), return_inverse=True)
            per_u = np.asarray([strata_permille.get(s, permille)
                                for s in uniq], dtype=np.int64)
            mask = slot < per_u[inv]
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def hash_topk_sample(ds, key_col: str, k: int,
                     strata_col: str | None = None):
    """EXACT-k deterministic sample (per stratum): keep the k rows with
    the smallest (md5-slot, key) — the reproducible analogue of
    reservoir sampling (same k rows regardless of partitioning, runs,
    or data order; adding unrelated rows can only displace by hash
    order, never reshuffle the survivors randomly).

    Combiner shape (same argument as grouped_topk): a global top-k by
    hash is contained in the union of per-batch top-k candidates, so
    each batch emits ≤ k rows per stratum and a tiny driver merge
    finishes — no shuffle at all. Returns a pandas frame of the
    sampled rows (driver-small by construction: ≤ k × strata rows).
    """
    import pandas as pd

    strata = [strata_col] if strata_col else []

    def cand(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        if strata_col:
            # null stratum folds to "" (engine-wide convention, same as
            # hash_sample) — pandas groupby would silently DROP NaN
            # strata otherwise
            df[strata_col] = df[strata_col].fillna("")
        df["_slot"] = stable_bucket_of(
            t[key_col].to_numpy(zero_copy_only=False), SLOTS)
        df = df.sort_values(["_slot", key_col], kind="stable")
        return (df.groupby(strata_col, sort=False).head(k)
                if strata_col else df.head(k))

    c = ds.map_batches(cand, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    if c.empty:          # all-empty dataset loses columns through Ray
        return c
    c = c.sort_values(["_slot", key_col], kind="stable")
    out = (c.groupby(strata_col, sort=False).head(k)
           if strata_col else c.head(k))
    return (out.drop(columns=["_slot"])
               .sort_values(strata + [key_col])
               .reset_index(drop=True))
