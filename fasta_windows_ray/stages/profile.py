"""One-pass dataset profiling: the "data card" every large-corpus
pipeline wants before (and after) a transform — per-column counts,
null rates, min/max/mean/std, approximate quantiles, approximate
distinct counts, string length stats and top values, computed in a
SINGLE streaming pass with NO shuffle.

Scale shape: each batch emits one small partial row per profiled
column (fixed-size sketch blobs: 2^p-byte HLL register vector,
~delta/2 t-digest centroids, top-``capacity`` value counter with a
Misra-Gries truncation bound).  Partials are merged by an associative
fold inside ``map_batches`` (so driver state is O(columns), not
O(blocks)) and a final driver merge produces one row per column.  The
corpus itself is never exchanged — profiling 100 TB costs exactly one
column-pruned read plus kilobytes of sketch traffic.

Exactness contract: ``count / null_count / min / max / mean / std /
len stats`` are exact (associative reductions); ``n_distinct_approx``
is HLL (rel. err ~1.04/sqrt(2^p)); ``p50/p95/p99`` are merging
t-digest (rank error O(q(1-q)/delta)); ``top_values`` carries an
explicit undercount bound ``top_values_err_bound`` = sum of per-batch
truncation deltas (0 = provably exact counts), per the mergeable-
summaries result (Agarwal et al., PODS'12) shared with
``stages/heavy_hitters.py``.

Embedding columns (``list<float>`` / ``fixed_size_list``) profile
their per-row L2 NORM through the numeric fields (min/max/mean/std/
quantiles — the drift/QA signal an embedding column wants) and the
vector dim through the length fields.

Reuses the sketch kernels of ``stages/sketches.py`` (HLL partial /
estimator, t-digest compress / quantile).
"""

from __future__ import annotations

import json
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import (hll_estimate, hll_partial, tdigest_compress,
                       tdigest_quantile)

_QS = [0.5, 0.95, 0.99]


def _classify(typ: pa.DataType) -> str:
    if pa.types.is_boolean(typ) or pa.types.is_integer(typ) \
            or pa.types.is_floating(typ):
        return "numeric"
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ):
        return "timestamp"
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return "string"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return "binary"
    if (pa.types.is_list(typ) or pa.types.is_large_list(typ)
            or pa.types.is_fixed_size_list(typ)) \
            and (pa.types.is_floating(typ.value_type)
                 or pa.types.is_integer(typ.value_type)):
        return "embedding"   # numeric stats apply to the row L2 NORM
    return "other"


def _empty_blob() -> bytes:
    return np.zeros(0, np.float64).tobytes()


def _col_partial(name: str, arr: pa.ChunkedArray, p: int, delta: int,
                 capacity: int) -> dict:
    kind = _classify(arr.type)
    row = {
        "column": name, "kind": kind,
        "n": len(arr), "nulls": arr.null_count,
        "vmin": np.nan, "vmax": np.nan, "vsum": 0.0, "vsum2": 0.0,
        "len_min": -1, "len_max": -1, "len_sum": 0,
        "hll": b"", "td_means": _empty_blob(), "td_weights": _empty_blob(),
        "topk": b"", "delta": 0,
    }
    valid = arr.drop_null()
    if len(valid) == 0:
        return row

    # distinct sketch over the raw values (any hashable kind)
    if kind in ("numeric", "timestamp", "string", "binary"):
        regs = np.zeros(1 << p, np.int8)
        idx, rho = hll_partial(valid.to_pandas(), p)
        np.maximum.at(regs, idx, rho.astype(np.int8))
        row["hll"] = regs.tobytes()

    if kind == "embedding":
        # numeric stats of the per-row L2 norm (the drift/QA signal an
        # embedding column wants); len stats carry the vector dim.
        # list_value_length + list_flatten + cumsum segments: exact,
        # empty-row-safe, slice-alignment-safe
        wdt = pc.list_value_length(valid).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(valid).to_numpy(
            zero_copy_only=False), np.float64)
        offs = np.concatenate([[0], np.cumsum(wdt)])
        csq = np.concatenate([[0.0], np.cumsum(flat * flat)])
        v = np.sqrt(csq[offs[1:]] - csq[offs[:-1]])
        d = wdt
        if len(v):
            row["vmin"] = float(v.min())
            row["vmax"] = float(v.max())
            row["vsum"] = float(v.sum())
            row["vsum2"] = float((v * v).sum())
            m, w = tdigest_compress(v, np.ones(len(v)), delta)
            row["td_means"] = m.tobytes()
            row["td_weights"] = w.tobytes()
            row["len_min"] = int(d.min())
            row["len_max"] = int(d.max())
            row["len_sum"] = int(d.sum())
        return row
    if kind in ("numeric", "timestamp"):
        if kind == "timestamp":
            vals = valid.cast(pa.timestamp("us")).cast(pa.int64())
        elif pa.types.is_boolean(arr.type):
            vals = valid.cast(pa.int8())
        else:
            vals = valid
        v = np.asarray(vals.to_numpy(zero_copy_only=False), np.float64)
        row["vmin"] = float(v.min())
        row["vmax"] = float(v.max())
        row["vsum"] = float(v.sum())
        row["vsum2"] = float((v * v).sum())
        m, w = tdigest_compress(v, np.ones(len(v)), delta)
        row["td_means"] = m.tobytes()
        row["td_weights"] = w.tobytes()
    elif kind in ("string", "binary"):
        lens = pc.binary_length(valid).to_numpy(zero_copy_only=False)
        if len(lens):
            row["len_min"] = int(lens.min())
            row["len_max"] = int(lens.max())
            row["len_sum"] = int(lens.sum())
        if kind == "string":
            vc = pc.value_counts(valid.combine_chunks())
            counts = vc.field("counts").to_numpy(zero_copy_only=False)
            values = vc.field("values").to_pylist()
            order = np.argsort(-counts, kind="stable")
            kept = order[:capacity]
            row["topk"] = pickle.dumps(
                {values[i]: int(counts[i]) for i in kept})
            if len(order) > capacity:
                row["delta"] = int(counts[order[capacity]])
    return row


def _merge_rows(rows: pd.DataFrame, p: int, delta: int,
                capacity: int) -> dict:
    """Associative merge of partial rows for ONE column."""
    out = {"column": rows["column"].iloc[0], "kind": rows["kind"].iloc[0],
           "n": int(rows["n"].sum()), "nulls": int(rows["nulls"].sum()),
           "vsum": float(rows["vsum"].sum()),
           "vsum2": float(rows["vsum2"].sum()),
           "len_sum": int(rows["len_sum"].sum()),
           "delta": int(rows["delta"].sum())}
    out["vmin"] = float(rows["vmin"].min())   # nan-propagating min over
    out["vmax"] = float(rows["vmax"].max())   # pandas skips NaN — correct
    lm = rows["len_min"][rows["len_min"] >= 0]
    out["len_min"] = int(lm.min()) if len(lm) else -1
    out["len_max"] = int(rows["len_max"].max())

    regs = np.zeros(1 << p, np.int8)
    for blob in rows["hll"]:
        if blob:
            np.maximum(regs, np.frombuffer(blob, np.int8), out=regs)
    out["hll"] = regs.tobytes()

    means = np.concatenate([np.frombuffer(b, np.float64)
                            for b in rows["td_means"]])
    weights = np.concatenate([np.frombuffer(b, np.float64)
                              for b in rows["td_weights"]])
    # canonical re-sort (partition invariance), then one compress
    order = np.lexsort((weights, means))
    m, w = tdigest_compress(means[order], weights[order], delta)
    out["td_means"] = m.tobytes()
    out["td_weights"] = w.tobytes()

    counter: dict = {}
    for blob in rows["topk"]:
        if blob:
            for k, c in pickle.loads(blob).items():
                counter[k] = counter.get(k, 0) + c
    if len(counter) > capacity:
        # truncate and grow the bound, exactly as a batch partial does
        items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        out["delta"] += items[capacity][1]
        counter = dict(items[:capacity])
    out["topk"] = pickle.dumps(counter)
    return out


def dataset_profile(ds, columns: list[str] | None = None, p: int = 12,
                    delta: int = 200, capacity: int = 4096,
                    top_k: int = 10) -> pd.DataFrame:
    """Profile ``columns`` (default: all) in one streaming pass.

    Returns one row per column: ``column, kind, count, null_count,
    n_distinct_approx, min, max, mean, std, p50, p95, p99, min_len,
    max_len, avg_len, top_values (JSON [[value, count], ...]),
    top_values_err_bound``.
    """
    schema = ds.schema()
    names = list(columns or schema.names)
    if columns is not None:
        ds = ds.select_columns(names)

    def partial(t: pa.Table) -> pa.Table:
        rows = [_col_partial(nm, t.column(nm), p, delta, capacity)
                for nm in names]
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        merged = [_merge_rows(sub, p, delta, capacity)
                  for _, sub in df.groupby("column", sort=False)]
        return pd.DataFrame(merged)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    # associative tree fold: ~4096 partial rows (~hundreds of blocks'
    # worth) merge per task; the driver sees O(columns) rows per fold
    folded = parts.map_batches(fold, batch_format="pandas",
                               batch_size=4096).to_pandas()
    if folded.empty:
        # Ray's Schema yields numpy dtypes for pandas-backed blocks
        def _pa_type(t):
            if isinstance(t, pa.DataType):
                return t
            try:
                return pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                return pa.string()
        types = dict(zip(schema.names, schema.types))
        folded = pd.DataFrame([_col_partial(nm, pa.chunked_array(
            [pa.array([], type=_pa_type(types[nm]))]), p, delta,
            capacity) for nm in names])

    out_rows = []
    for nm in names:
        sub = folded[folded["column"] == nm]
        r = _merge_rows(sub, p, delta, capacity)
        n_valid = r["n"] - r["nulls"]
        numericish = r["kind"] in ("numeric", "timestamp", "embedding")
        mean = r["vsum"] / n_valid if numericish and n_valid else np.nan
        var = (r["vsum2"] / n_valid - mean * mean
               if numericish and n_valid else np.nan)
        m = np.frombuffer(r["td_means"], np.float64)
        w = np.frombuffer(r["td_weights"], np.float64)
        q50, q95, q99 = tdigest_quantile(m, w, _QS)
        regs = np.frombuffer(r["hll"], np.int8) if r["hll"] \
            else np.zeros(1 << p, np.int8)
        distinct = hll_estimate(regs.astype(np.int64)) if n_valid else 0.0
        counter = pickle.loads(r["topk"]) if r["topk"] else {}
        top = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        # len stats: byte length for string/binary, vector dim for
        # embedding columns
        stringish = r["kind"] in ("string", "binary", "embedding")
        out_rows.append({
            "column": nm, "kind": r["kind"], "count": r["n"],
            "null_count": r["nulls"],
            "n_distinct_approx": round(distinct, 1),
            "min": r["vmin"], "max": r["vmax"], "mean": mean,
            "std": float(np.sqrt(max(var, 0.0))) if var == var else np.nan,
            "p50": q50, "p95": q95, "p99": q99,
            "min_len": r["len_min"] if stringish and r["len_min"] >= 0
            else np.nan,
            "max_len": r["len_max"] if stringish and r["len_max"] >= 0
            else np.nan,
            "avg_len": r["len_sum"] / n_valid if stringish and n_valid
            else np.nan,
            "top_values": json.dumps([[k, c] for k, c in top],
                                     ensure_ascii=False),
            "top_values_err_bound": r["delta"],
        })
    return pd.DataFrame(out_rows)


def skew_report(ds, key: str, num_buckets: int = 256, topn: int = 20):
    """Partitioning-skew diagnostic for a prospective shuffle key: how
    unevenly would a ``num_buckets``-way hash exchange on ``key`` load
    its tasks, and which keys are hot?

    One pass: per-batch ``value_counts`` partials (distinct keys per
    batch, never rows), one hash exchange of those partials, per-bucket
    exact key totals -> (bucket load, local top-``topn``); the driver
    folds ``num_buckets`` summary rows.  Returns a dict:

    - ``top_keys``: frame of the ``topn`` heaviest keys + global share;
    - ``bucket_loads``: max / mean / p99 rows per bucket,
      ``imbalance`` = max/mean (1.0 = perfectly even);
    - ``salt_factor``: ceil(heaviest key / mean bucket load) — the
      per-key split factor that levels the hottest key onto average
      tasks, i.e. the number to hand ``stages/salted``.

    The engine's own exchanges use the same ``stable_bucket_of``, so
    the report measures exactly what a groupby on this key would do.
    """
    import math

    from .window_stats import stable_bucket_of

    def pre(t: pa.Table) -> pd.DataFrame:
        vc = t[key].value_counts()
        f = vc.flatten()
        return pd.DataFrame({
            "v": f[0].to_pandas().astype(str),
            "c": f[1].to_pandas().astype(np.int64)})

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = stable_bucket_of(df["v"].to_numpy(object),
                                    num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", sort=False)["c"].sum()
        top = g.nlargest(topn)
        return pd.DataFrame({
            "bucket": df["_b"].iloc[0],
            "load": int(g.sum()),
            "n_keys": int(len(g)),
            "top_v": [",".join(top.index)],
            "top_c": [",".join(str(int(x)) for x in top.to_numpy())]})

    parts = (ds.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True)
               .map_batches(bucket, batch_format="pandas")
               .groupby("_b")
               .map_groups(per_bucket, batch_format="pandas")
               .to_pandas())
    if parts.empty:
        return {"top_keys": pd.DataFrame({"key": [], "count": [],
                                          "share": []}),
                "bucket_loads": {"max": 0, "mean": 0.0, "p99": 0.0,
                                 "imbalance": 1.0,
                                 "num_buckets": num_buckets},
                "salt_factor": 1, "n_rows": 0, "n_keys": 0}
    total = int(parts["load"].sum())
    cand = []
    for tv, tc in zip(parts["top_v"], parts["top_c"]):
        if tv:
            cand += list(zip(tv.split(","),
                             (int(x) for x in tc.split(","))))
    top = (pd.DataFrame(cand, columns=["key", "count"])
           .nlargest(topn, "count").reset_index(drop=True))
    top["share"] = top["count"] / max(total, 1)
    loads = np.zeros(num_buckets, dtype=np.int64)
    loads[parts["bucket"].to_numpy()] = parts["load"].to_numpy()
    mean = total / num_buckets
    report = {
        "top_keys": top,
        "bucket_loads": {
            "max": int(loads.max()), "mean": round(mean, 1),
            "p99": float(np.percentile(loads, 99)),
            "imbalance": round(float(loads.max()) / max(mean, 1e-9), 2),
            "num_buckets": num_buckets},
        "salt_factor": max(1, math.ceil(
            int(top["count"].iloc[0]) / max(mean, 1e-9))) if len(top)
        else 1,
        "n_rows": total,
        "n_keys": int(parts["n_keys"].sum()),
    }
    return report
