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


def mixture_permilles(counts: dict, alpha: float,
                      target_permille: int) -> dict:
    """Per-stratum keep rates for temperature-based data mixing:
    sample share of stratum s ∝ n_s^alpha (alpha < 1 upsamples the tail
    relative to its natural share — the multilingual "temperature"
    re-weighting of Conneau & Lample / the LLM data-mixing recipe), at
    an overall target rate of ``target_permille``/1000.

    permille_s = floor(target · N · n_s^(alpha-1) / Σ_u n_u^alpha + ε),
    capped at 1000. The ε = 1e-9 nudge makes the floor insensitive to
    summation-order ulp drift, so a SQL twin computing the same formula
    reproduces the rates exactly. Deterministic: pure function of the
    integer counts."""
    N = sum(counts.values())
    Z = sum(n ** alpha for _, n in sorted(counts.items()))
    return {s: min(1000, int(target_permille * N * n ** (alpha - 1.0) / Z
                             + 1e-9))
            for s, n in counts.items()}


def mixture_sample(ds, key_col: str, source_col: str,
                   alpha: float = 0.5, target_permille: int = 250):
    """Deterministic temperature-mixture sample: one bounded
    ``groupby(source).count()`` (rows = #strata, never corpus-sized)
    derives per-stratum permilles, then the shuffle-free
    :func:`hash_sample` membership filter applies them — membership
    stays a pure function of (key, stratum counts), so re-runs and
    re-partitionings select identical rows. Returns (dataset, permilles).
    """
    # null stratum folds to "" (matches hash_sample's lookup convention)
    counts = {}
    for r in ds.groupby(source_col).count().take_all():
        s = r[source_col] if r[source_col] is not None else ""
        counts[s] = counts.get(s, 0) + r["count()"]
    pm = mixture_permilles(counts, alpha, target_permille)
    return hash_sample(ds, key_col, 0, strata_col=source_col,
                       strata_permille=pm), pm


def epoch_shuffle(ds, key_col: str, epoch: int = 0, seed: int = 0,
                  keep_key: bool = False):
    """Deterministic GLOBAL shuffle for training epochs: rows are
    ordered by a seeded 60-bit md5 of their key, so the permutation is
    a pure function of (key, seed, epoch) — every epoch is a fresh
    uniform order, yet a resumed / re-sharded / re-run job reproduces
    the IDENTICAL sequence (unlike ``Dataset.random_shuffle``, whose
    order depends on partitioning and scheduling).

    Implementation: one ``map_batches`` appends the hash key, then
    ``Dataset.sort`` range-partitions on it (Ray's sample-based sort —
    the one all-to-all any global shuffle must pay; no driver
    materialization).  Rows with DUPLICATE keys hash equal and their
    relative order is unspecified — pass a unique key (doc_id).
    ``keep_key=True`` retains the ``_shuffle_key`` column so a
    consumer can checkpoint its position and resume mid-epoch.
    """
    import hashlib

    tag = f"{seed}:{epoch}"

    def add_key(t: pa.Table) -> pa.Table:
        vals = t[key_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.asarray(vals, dtype=object),
                              return_inverse=True)
        h = np.asarray(
            [int(hashlib.md5(f"{tag}|{u}".encode()).hexdigest()[:15], 16)
             for u in uniq], dtype=np.int64)
        return t.append_column("_shuffle_key",
                               pa.array(h[inv], pa.int64()))

    out = ds.map_batches(add_key, batch_format="pyarrow",
                         zero_copy_batch=True).sort("_shuffle_key")
    if not keep_key:
        out = out.map_batches(
            lambda t: t.drop_columns(["_shuffle_key"]),
            batch_format="pyarrow", zero_copy_batch=True)
    return out


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


def train_val_test_split(ds, key_col: str,
                         weights: dict | None = None,
                         split_col: str = "split"):
    """Deterministic dataset split: adds ``split_col`` from the md5
    slot of ``key_col`` — the same 1000-slot partition every sampler
    here uses, so the assignment is a pure function of the key
    (reproducible across runs, epochs, partitionings and engines; the
    md5 fold has an exact SQL twin). Weights are permille integers
    (default 980/10/10) and must sum to 1000; slot ranges are assigned
    in dict order, so a key's split NEVER changes when later splits'
    weights are rebalanced among themselves.

    Splitting by key (not row) keeps grouped records together: split
    on conv_id and every turn of a conversation lands in the same
    split — the leakage-safe default for transcript data.
    """
    weights = weights or {"train": 980, "val": 10, "test": 10}
    if sum(weights.values()) != SLOTS:
        raise ValueError(f"weights must sum to {SLOTS} permille, got "
                         f"{sum(weights.values())}")
    names = list(weights)
    bounds = np.cumsum([weights[n] for n in names])

    def assign(t: pa.Table) -> pa.Table:
        slot = stable_bucket_of(t[key_col].to_numpy(zero_copy_only=False),
                                SLOTS)
        idx = np.searchsorted(bounds, slot, side="right")
        lab = np.asarray(names, dtype=object)[idx]
        return t.append_column(split_col, pa.array(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def weighted_sample_k(ds, key_col: str, weight_col: str, k: int,
                      strata_col: str | None = None):
    """Deterministic weighted sampling WITHOUT replacement (per
    stratum): keep the k rows minimizing ``-ln(u) / w`` where ``u`` is
    the key's md5-uniform in (0, 1) — the Efraimidis–Spirakis A-ES
    exponential-key scheme, so inclusion probability follows the
    ``weight_col`` (quality scores, token counts) while membership
    stays a pure function of the key: re-runs, re-shards and row
    re-orderings select the IDENTICAL sample, and a DuckDB twin
    reproduces it bit-for-bit via the engine's md5 fold.

    Rows with null or non-positive weight are never sampled (weight 0
    = excluded, matching the A-ES limit). Combiner shape as
    ``hash_topk_sample``: each batch emits ≤ k candidates per stratum
    (a global top-k is contained in the union of per-batch top-k's),
    tiny driver merge, zero shuffles. Returns a pandas frame
    (driver-small: ≤ k × strata rows) sorted by (strata, key).
    """
    import pandas as pd

    strata = [strata_col] if strata_col else []

    def cand(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        if strata_col:
            df[strata_col] = df[strata_col].fillna("")
        w = df[weight_col].to_numpy(dtype=np.float64, na_value=0.0)
        h = stable_bucket_of(t[key_col].to_numpy(zero_copy_only=False),
                             1 << 60)
        u = (h.astype(np.float64) + 0.5) / float(1 << 60)
        with np.errstate(divide="ignore"):
            df["_aes"] = np.where(w > 0, -np.log(u) / np.maximum(w, 1e-300),
                                  np.inf)
        df = df[np.isfinite(df["_aes"])]
        df = df.sort_values(["_aes", key_col], kind="stable")
        return (df.groupby(strata_col, sort=False).head(k)
                if strata_col else df.head(k))

    c = ds.map_batches(cand, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    if c.empty:
        return c.drop(columns=["_aes"], errors="ignore")
    c = c.sort_values(["_aes", key_col], kind="stable")
    out = (c.groupby(strata_col, sort=False).head(k)
           if strata_col else c.head(k))
    return (out.drop(columns=["_aes"])
               .sort_values(strata + [key_col])
               .reset_index(drop=True))


def kfold_assign(ds, key_col: str, k: int = 5,
                 fold_col: str = "fold", salt: str = "kfold"):
    """Deterministic k-fold assignment: adds int64 ``fold_col`` =
    md5(salt + key) % k.  A pure function of the key — reproducible
    across runs/partitionings, grouped records stay together (fold on
    conv_id keeps whole conversations in one fold: the leakage-safe
    default), zero shuffles, and exactly SQL-twinnable via the md5
    fold.  ``salt`` decorrelates the fold id from the sampler/split
    slots (same md5 family, different key string).

    Keys are canonicalized via ``to_pylist()`` + Python ``str`` before
    salting: ``.to_numpy()`` on a null-bearing int64 block upcasts to
    float64, so the SAME key would render ``kfold:7`` in a null-free
    block but ``kfold:7.0`` in a null-bearing one — splitting one key
    across folds depending on which block it lands in. ``to_pylist``
    preserves the Arrow type (int64 stays int under nulls), so the
    rendering is a pure function of the value, AND Python ``str``
    matches DuckDB's ``CAST(x AS VARCHAR)`` for int/float/timestamp/
    date keys (verified: 7 -> '7', 7.0 -> '7.0', 1e30 -> '1e+30',
    '2024-01-02 03:04:05[.123456]') — an Arrow ``pc.cast`` would
    render integral floats as '7' and timestamps with forced
    microseconds, breaking the SQL twin. Null keys use a fixed
    ``chr(0)`` sentinel (one fold, deterministic; SQL twin: ``CASE
    WHEN k IS NULL THEN chr(0) ELSE CAST(k AS VARCHAR) END``)."""
    if k < 2:
        raise ValueError("need k >= 2 folds")

    def assign(t: pa.Table) -> pa.Table:
        ks = t[key_col].to_pylist()
        salted = np.asarray(
            [f"{salt}:\x00" if v is None else f"{salt}:{v}"
             for v in ks], dtype=object)
        fold = stable_bucket_of(salted, k)
        return t.append_column(fold_col, pa.array(fold, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
