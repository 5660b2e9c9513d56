"""Feature engineering: distributed numeric stats and the transforms a
training-data pipeline derives from them — imputation, z-score
standardization, min-max scaling, discretization (binning).

Scale shape shared by every op here:

1. one streaming STATS pass — per-batch partials (count/sum/sumsq/
   min/max, or value counts for mode, or t-digest centroids for
   median/quantile bins), folded through a tiny ``groupby().sum()``
   whose exchange is bounded by groups x columns (mode: by distinct
   values), never by rows;
2. the resulting lookup (groups x cols rows) broadcast ONCE via
   ``ray.put``;
3. one vectorized TRANSFORM pass — ``map_batches`` + numpy against the
   broadcast lookup, zero shuffles.

The input dataset is traversed twice (stats + transform) but never
materialized; both passes stream.  Callers that already hold stats
(e.g. standardizing a validation split with the TRAIN split's stats —
the leakage-correct direction) pass them in and skip pass 1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _gkey(k):
    """Normalize a group key for dict lookup: NaN/None -> None (NaN
    never equals itself, so a raw NaN key could never be found)."""
    if k is None:
        return None
    try:
        if k != k:
            return None
    except (TypeError, ValueError):
        pass
    return k


def numeric_stats(ds, cols: list[str],
                  by: str | None = None) -> pd.DataFrame:
    """Exact count/mean/std(pop)/min/max per column (per group with
    ``by=``) in ONE streaming pass.  Nulls are excluded per column
    (SQL aggregate semantics).  Output rows = groups x cols — driver
    state bounded by group cardinality, not input size."""
    gcols = [by] if by else []

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(gcols + cols).to_pandas()
        rows = []
        grouped = (df.groupby(by, sort=False, dropna=False)
                   if by else [("", df)])
        for key, sub in grouped:
            for c in cols:
                v = sub[c].to_numpy(dtype=np.float64, na_value=np.nan)
                m = ~np.isnan(v)
                vv = v[m]
                rows.append({
                    "_g": _gkey(key) if by else "",
                    "col": c,
                    "n": int(m.sum()),
                    "s": float(vv.sum()) if len(vv) else 0.0,
                    "s2": float((vv * vv).sum()) if len(vv) else 0.0,
                    "lo": float(vv.min()) if len(vv) else np.inf,
                    "hi": float(vv.max()) if len(vv) else -np.inf,
                })
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=(gcols + ["col", "n", "mean", "std",
                                              "min", "max"]))
    agg = (parts.groupby(["_g", "col"], sort=False, dropna=False)
                .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
                     lo=("lo", "min"), hi=("hi", "max"))
                .reset_index())
    n = agg["n"].to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(n > 0, agg["s"] / n, np.nan)
        var = np.where(n > 0, agg["s2"] / n - mean * mean, np.nan)
    out = pd.DataFrame({
        "col": agg["col"],
        "n": agg["n"].astype(np.int64),
        "mean": mean,
        # population std; clamp the tiny negative fp residue of s2/n-m^2
        "std": np.sqrt(np.maximum(var, 0.0)),
        "min": np.where(n > 0, agg["lo"], np.nan),
        "max": np.where(n > 0, agg["hi"], np.nan),
    })
    if by:
        out.insert(0, by, agg["_g"])
    return out.sort_values((gcols + ["col"])).reset_index(drop=True)


def _broadcast_lookup(stats: pd.DataFrame, by: str | None,
                      value_col: str) -> dict:
    """{(group, col) -> value} (group "" when ungrouped)."""
    g = stats[by] if by else [""] * len(stats)
    # _gkey on the build side too: pandas groupby renders a None group
    # key as NaN in the stats frame, while the transform side looks up
    # _gkey(key) -> None — without normalizing here, null-group rows
    # silently miss the lookup and pass through untransformed.
    return {(_gkey(gg), c): float(v) if v == v else np.nan
            for gg, c, v in zip(g, stats["col"], stats[value_col])}


def _apply_per_group(df: pd.DataFrame, cols, by, fn):
    """Run ``fn(values, group_key, col) -> values`` over each column,
    vectorized per group segment (sorting not required: boolean masks
    per group — group cardinality within one batch is small)."""
    if by is None:
        for c in cols:
            df[c] = fn(df[c].to_numpy(dtype=np.float64,
                                      na_value=np.nan), "", c)
        return df
    codes, uniques = pd.factorize(df[by], use_na_sentinel=False)
    for c in cols:
        v = df[c].to_numpy(dtype=np.float64, na_value=np.nan)
        out = np.empty_like(v)
        for gi, key in enumerate(uniques):
            m = codes == gi
            out[m] = fn(v[m], _gkey(key), c)
        df[c] = out
    return df


def standardize(ds, cols: list[str], by: str | None = None,
                stats: pd.DataFrame | None = None):
    """z-score: (x - mean) / std_pop, per group with ``by=``.
    Zero-variance columns map to 0.0 (not inf); nulls stay null.
    Pass ``stats=`` (a ``numeric_stats`` frame, e.g. from the TRAIN
    split) to reuse moments instead of recomputing — the
    leakage-correct way to scale a validation split."""
    import ray
    st = stats if stats is not None else numeric_stats(ds, cols, by)
    mean = _broadcast_lookup(st, by, "mean")
    std = _broadcast_lookup(st, by, "std")
    ref = ray.put((mean, std))

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        mu, sd = ray.get(ref)

        def z(v, g, c):
            if (g, c) not in mu:         # group unseen in the stats
                return v                 # frame: leave values as-is
            m, s = mu[(g, c)], sd.get((g, c), np.nan)
            if not s or s != s:          # zero/NaN std -> centered 0
                return np.where(np.isnan(v), np.nan, 0.0)
            return (v - m) / s

        return _apply_per_group(df, cols, by, z)

    return ds.map_batches(fx, batch_format="pandas")


def minmax_scale(ds, cols: list[str], by: str | None = None,
                 stats: pd.DataFrame | None = None):
    """(x - min) / (max - min) per group; constant columns map to 0.0;
    nulls stay null."""
    import ray
    st = stats if stats is not None else numeric_stats(ds, cols, by)
    lo = _broadcast_lookup(st, by, "min")
    hi = _broadcast_lookup(st, by, "max")
    ref = ray.put((lo, hi))

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        los, his = ray.get(ref)

        def mm(v, g, c):
            if (g, c) not in los:        # unseen group: values as-is
                return v
            a, b = los[(g, c)], his.get((g, c), np.nan)
            if a != a or b != b or b == a:
                return np.where(np.isnan(v), np.nan, 0.0)
            return (v - a) / (b - a)

        return _apply_per_group(df, cols, by, mm)

    return ds.map_batches(fx, batch_format="pandas")


def _tdigest_lookup(ds, cols: list[str], qs: list[float],
                    by: str | None, delta: int = 200) -> dict:
    """{(group, col, q) -> value} from ONE streaming pass over ALL
    columns (vs one full dataset scan per column): per-batch
    per-(group, col) t-digest centroids (nulls/NaN excluded — the
    compressor has no null concept), a bounded collect of centroid
    rows (groups x cols x ~delta/2), per-(group, col) canonical merge
    + quantile query on the driver.  At the 100-TB design scale the
    scan is the dominant cost, so multi-column stats must never
    multiply it by the column count."""
    from .sketches import (_merge_digests, tdigest_compress,
                           tdigest_quantile)
    gcols = [by] if by else []

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(gcols + cols).to_pandas()
        frames = []
        grouped = (df.groupby(by, sort=False, dropna=False)
                   if by else [("", df)])
        for key, sub in grouped:
            for c in cols:
                v = sub[c].to_numpy(dtype=np.float64, na_value=np.nan)
                v = v[~np.isnan(v)]
                if not len(v):
                    continue
                m, w = tdigest_compress(v, np.ones(len(v)), delta)
                frames.append(pd.DataFrame({
                    "_g": _gkey(key) if by else "",
                    "col": c, "_mean": m, "_weight": w}))
        if not frames:
            return pd.DataFrame({"_g": pd.Series(dtype=object),
                                 "col": pd.Series(dtype=object),
                                 "_mean": pd.Series(dtype=np.float64),
                                 "_weight": pd.Series(dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out: dict = {}
    if parts.empty:
        return out
    for (g, c), grp in parts.groupby(["_g", "col"], sort=False,
                                     dropna=False):
        m, w = _merge_digests(grp, delta)
        for q, v in zip(qs, tdigest_quantile(m, w, list(qs))):
            out[(_gkey(g), c, float(q))] = float(v)
    return out


def impute(ds, cols: list[str], strategy: str = "mean",
           by: str | None = None, fill_value=None):
    """Fill nulls per column: ``mean`` (exact), ``median``
    (t-digest-approximate — one centroid-bounded pass, documented
    error O(q(1-q)/delta)), ``mode`` (exact most-frequent,
    ties -> smallest value, SQL twin-able; the stats exchange is
    bounded by DISTINCT VALUES per group x col — meant for
    categorical-cardinality columns), or ``constant`` (``fill_value``).
    Groups unseen in the stats pass (possible only with a caller-
    supplied stats frame) keep their nulls."""
    import ray
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("strategy='constant' needs fill_value")
        fills = None
    elif strategy == "mean":
        st = numeric_stats(ds, cols, by)
        fills = _broadcast_lookup(st, by, "mean")
    elif strategy == "median":
        # ONE scan for all columns (each tdigest_quantiles call would
        # re-traverse the dataset per column)
        fills = {(g, c): v for (g, c, q), v in
                 _tdigest_lookup(ds, cols, [0.5], by).items()}
    elif strategy == "mode":
        fills = _mode_lookup(ds, cols, by)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    ref = ray.put(fills)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        fl = ray.get(ref)
        if strategy == "constant":
            for c in cols:
                df[c] = df[c].fillna(fill_value)
            return df
        if strategy == "mode":
            # mode serves CATEGORICAL columns too: string fills use a
            # plain pandas fillna (no float64 round-trip)
            if by is None:
                for c in cols:
                    f = fl.get(("", c))
                    if f is not None:
                        df[c] = df[c].fillna(f)
                return df
            for c in cols:
                fmap = {g: v for (g, cc), v in fl.items() if cc == c}
                fills_vec = df[by].map(fmap)          # vectorized dict map
                if None in fmap:                      # null group keys
                    fills_vec = fills_vec.where(df[by].notna(),
                                                fmap[None])
                df[c] = df[c].fillna(fills_vec)
            return df

        def fill(v, g, c):
            f = fl.get((g, c))
            if f is None or f != f:
                return v
            return np.where(np.isnan(v), f, v)

        return _apply_per_group(df, cols, by, fill)

    return ds.map_batches(fx, batch_format="pandas")


def _mode_lookup(ds, cols: list[str], by: str | None) -> dict:
    """Exact per-(group, col) mode via a distinct-values-bounded
    exchange: per-batch value counts -> groupby sum -> top-1
    (ties -> smallest value, deterministic).  Values keep their native
    type (numeric OR string) — the partial carries split val_num /
    val_str columns so mixed-type column sets never compare across
    types in one sort."""
    gcols = [by] if by else []

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(gcols + cols).to_pandas()
        rows = []
        grouped = (df.groupby(by, sort=False, dropna=False)
                   if by else [("", df)])
        for key, sub in grouped:
            for c in cols:
                col = sub[c].dropna()
                numeric = pd.api.types.is_numeric_dtype(col)
                for val, cnt in col.value_counts().items():
                    rows.append({
                        "_g": _gkey(key) if by else "", "col": c,
                        "val_num": float(val) if numeric else np.nan,
                        "val_str": None if numeric else str(val),
                        "cnt": int(cnt)})
        return pd.DataFrame(rows, columns=["_g", "col", "val_num",
                                           "val_str", "cnt"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {}
    agg = (parts.groupby(["_g", "col", "val_num", "val_str"],
                         sort=False, dropna=False)["cnt"]
                .sum().reset_index())
    # top-1 per (group, col): max count, then smallest value (numeric
    # and string orderings never mix — exactly one side is set per col)
    agg = agg.sort_values(["_g", "col", "cnt", "val_num", "val_str"],
                          ascending=[True, True, False, True, True],
                          kind="stable")
    top = agg.drop_duplicates(["_g", "col"], keep="first")
    # _gkey: the groupby surfaces the None group key as NaN; normalize
    # so the transform side's _gkey(key) -> None lookup finds it.
    return {(_gkey(g), c): (s if isinstance(s, str) else float(v))
            for g, c, v, s in zip(top["_g"], top["col"],
                                  top["val_num"], top["val_str"])}


def bin_numeric(ds, col: str, n_bins: int = 10, method: str = "width",
                out_col: str | None = None,
                edges: np.ndarray | None = None):
    """Discretize ``col`` into ``n_bins`` (new int64 column
    ``out_col``, default ``{col}_bin``; nulls -> -1).

    ``method="width"``: equal-width over the global [min, max] —
    matches DuckDB semantics as ``least(greatest(width_bucket(x, lo,
    hi, n), 1), n) - 1`` (clamped so x == hi lands in the last bin).
    ``method="quantile"``: equal-frequency with t-digest boundary
    estimates (one centroid-bounded pass; interior edges approximate,
    bin POPULATIONS near-equal).  ``edges=`` (len n_bins+1, ascending)
    skips the stats pass entirely."""
    import ray
    name = out_col or f"{col}_bin"
    if edges is None:
        if method == "width":
            st = numeric_stats(ds, [col])
            if not len(st) or st["min"][0] != st["min"][0]:
                raise ValueError(
                    f"bin_numeric: no non-null values in {col!r}")
            lo, hi = float(st["min"][0]), float(st["max"][0])
            edges = np.linspace(lo, hi, n_bins + 1)
        elif method == "quantile":
            from .sketches import tdigest_quantiles
            qs = np.linspace(0.0, 1.0, n_bins + 1).tolist()
            # nulls must never reach the digest (NaN centroids shift
            # every edge) — the same _nonnull rule as impute(median)
            q = tdigest_quantiles(_nonnull(ds, col, None), col, qs)
            edges = np.asarray(sorted(q["value"]), dtype=np.float64)
        else:
            raise ValueError(f"unknown method {method!r}")
    edges = np.asarray(edges, dtype=np.float64)
    if len(edges) != n_bins + 1:
        raise ValueError("edges must have n_bins + 1 entries")
    ref = ray.put(edges)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        e = ray.get(ref)
        v = df[col].to_numpy(dtype=np.float64, na_value=np.nan)
        b = np.searchsorted(e[1:-1], v, side="right").astype(np.int64)
        b = np.clip(b, 0, n_bins - 1)
        df[name] = np.where(np.isnan(v), np.int64(-1), b)
        df[name] = df[name].astype(np.int64)
        return df

    return ds.map_batches(fx, batch_format="pandas")


def _nonnull(ds, col: str, by: str | None):
    """Project to (by?, col) and drop null/NaN rows of ``col`` — the
    t-digest compressor has no null concept, so imputation stats must
    never see the very holes they are meant to fill."""
    import pyarrow.compute as pc
    keep = ([by] if by else []) + [col]

    def f(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        m = pc.is_valid(t[col])
        if pa.types.is_floating(t[col].type):
            m = pc.and_(m, pc.invert(pc.is_nan(t[col])))
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def winsorize(ds, cols: list[str], lower: float = 0.01,
              upper: float = 0.99, by: str | None = None):
    """Clip each column to its [lower, upper] quantiles (per group with
    ``by=``) — the standard outlier treatment before scaling.  Bounds
    come from the t-digest pass (centroid-bounded exchange, documented
    O(q(1-q)/delta) rank error — tight at the tails where winsorizing
    lives); the clip itself is a broadcast + np.clip, zero shuffles.
    Nulls stay null; groups unseen in the stats pass keep their values."""
    import ray
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    lk = _tdigest_lookup(ds, cols, [lower, upper], by)
    bounds: dict = {}
    for (g, c, q), v in lk.items():
        lo_hi = bounds.setdefault((g, c), [np.nan, np.nan])
        lo_hi[0 if q == lower else 1] = v
    ref = ray.put(bounds)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)

        def clip(v, g, c):
            lo_hi = b.get((g, c))
            if lo_hi is None or lo_hi[0] != lo_hi[0]:
                return v
            return np.clip(v, lo_hi[0], lo_hi[1])

        return _apply_per_group(df, cols, by, clip)

    return ds.map_batches(fx, batch_format="pandas")


def target_encode(ds, cat_col: str, target_col: str,
                  smoothing: float = 10.0,
                  out_col: str | None = None,
                  stats: pd.DataFrame | None = None):
    """Smoothed target (mean) encoding of a categorical column:
    ``(n*cat_mean + smoothing*global_mean) / (n + smoothing)`` — the
    Bayesian-shrunk per-category mean that high-cardinality categoricals
    need (raw per-category means overfit rare categories).

    One ``numeric_stats(by=cat_col)`` pass (exchange bounded by
    category count), encoding map broadcast once, vectorized dict-map
    transform.  Pass ``stats=`` (the TRAIN split's ``numeric_stats``
    frame) to encode a validation split without leaking its targets —
    categories unseen in the stats get the global mean.  Null
    categories encode via the null-group row (dropna=False stats)."""
    import ray
    name = out_col or f"{cat_col}_te"
    st = stats if stats is not None else \
        numeric_stats(ds, [target_col], by=cat_col)
    if not len(st):
        raise ValueError("target_encode on an empty dataset")
    n = st["n"].to_numpy(np.float64)
    means = st["mean"].to_numpy(np.float64)
    seen = n > 0                 # an all-null-target category has n=0,
    # mean=NaN; masking it keeps one bad category from poisoning the
    # global mean (NaN*0 is NaN in IEEE) and encodes it as the global
    if not seen.any():
        raise ValueError("target_encode: no non-null target values")
    g_mean = float((means[seen] * n[seen]).sum() / n[seen].sum())
    enc = np.where(seen,
                   (n * np.where(seen, means, 0.0) + smoothing * g_mean)
                   / (n + smoothing),
                   g_mean)
    emap = {_gkey(k): float(v) for k, v in zip(st[cat_col], enc)}
    ref = ray.put((emap, g_mean))

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        m, g = ray.get(ref)
        vals = df[cat_col].map(m)                 # vectorized dict map
        if None in m:                             # null-category rows
            vals = vals.where(df[cat_col].notna(), m[None])
        df[name] = vals.fillna(g).astype(np.float64)  # unseen -> global
        return df

    return ds.map_batches(fx, batch_format="pandas")


def robust_scale(ds, cols: list[str], by: str | None = None,
                 delta: int = 200):
    """(x - median) / IQR — the outlier-insensitive scaler.  Medians
    and quartiles come from the t-digest pass (centroid-bounded
    exchange); zero-IQR columns map to 0.0; nulls stay null."""
    import ray
    lk = _tdigest_lookup(ds, cols, [0.25, 0.5, 0.75], by, delta=delta)
    params: dict = {}
    for (g, c, q), v in lk.items():
        trio = params.setdefault((g, c), [np.nan, np.nan, np.nan])
        trio[{0.25: 0, 0.5: 1, 0.75: 2}[q]] = v
    ref = ray.put(params)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(ref)

        def rs(v, g, c):
            trio = p.get((g, c))
            if trio is None or trio[1] != trio[1]:
                return v
            iqr = trio[2] - trio[0]
            if not iqr or iqr != iqr:
                return np.where(np.isnan(v), np.nan, 0.0)
            return (v - trio[1]) / iqr

        return _apply_per_group(df, cols, by, rs)

    return ds.map_batches(fx, batch_format="pandas")


def feature_hash(ds, cols: list[str], n_features: int = 256,
                 out_prefix: str = "fh_"):
    """Hashing-trick categorical encoding: each named column gains an
    int64 companion ``{out_prefix}{col}`` = md5(col + ':' + value) %
    n_features — fixed-width, vocabulary-free (no stats pass at all,
    unseen values Just Work), deterministic across runs/shards, and
    SQL-twinnable via the engine's md5 fold.  Column name is part of
    the hash input so identical values in different columns land in
    different (independent) buckets.  Nulls -> -1.

    Values are canonicalized via ``to_pylist()`` + Python ``str``
    before hashing: a pandas batch upcasts null-bearing int64 to
    float64, so the SAME value would hash as '7' or '7.0' depending on
    block co-residents, breaking cross-run/shard determinism.
    ``to_pylist`` preserves the Arrow type, so the rendering is a pure
    function of the value — and Python ``str`` matches DuckDB's
    ``CAST(x AS VARCHAR)`` for int/float/timestamp/date values (an
    Arrow cast renders integral float64 7.0 as '7', diverging from the
    SQL twin's '7.0')."""
    from .window_stats import stable_bucket_of

    def fx(t: pa.Table) -> pa.Table:
        for c in cols:
            ks = t[c].to_pylist()
            salted = np.asarray(
                ["" if v is None else f"{c}:{v}" for v in ks],
                dtype=object)
            h = stable_bucket_of(salted, n_features)
            isna = np.asarray([v is None for v in ks], dtype=bool)
            vals = np.where(isna, np.int64(-1), h).astype(np.int64)
            name = f"{out_prefix}{c}"
            if name in t.column_names:
                t = t.drop_columns([name])
            t = t.append_column(name, pa.array(vals, pa.int64()))
        return t

    return ds.map_batches(fx, batch_format="pyarrow",
                          zero_copy_batch=True)
