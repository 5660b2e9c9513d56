"""Distribution-drift detection between two corpus snapshots (training
epochs, catalog versions, time windows) — the monitoring step a 100-TB
pipeline runs before trusting new data: per-column Population Stability
Index + binned-KS statistic for numeric columns, PSI over category
frequencies for string columns.

Ray-Data shape — everything reduces to BOUNDED histograms, so nothing
corpus-sized crosses the wire or lands on the driver:

- numeric columns: bin edges come from the REFERENCE's t-digest deciles
  (``sketches.tdigest_quantiles`` — rank-space, skew-proof, one pass),
  then BOTH datasets take one shuffle-free ``map_batches`` pass of
  per-batch ``np.histogram`` partials with those frozen edges folded by
  a bounded sum. PSI over the two normalized histograms (epsilon-
  smoothed), plus ``ks_binned`` = max |CDF_ref − CDF_cur| (the
  Kolmogorov–Smirnov statistic on the binned CDF — a lower bound of
  exact KS, exact when data is discrete at bin resolution).
- categorical columns: per-batch value_counts partials →
  ``groupby(value).sum`` (bounded by distinct cardinality), top-``max_
  categories`` kept, the tail folded into ``__other__`` on BOTH sides
  with the same category set (frozen from the reference, like the
  edges), PSI over the aligned frequency vectors.

PSI reading (standard industry thresholds, e.g. Siddiqi, "Credit Risk
Scorecards", 2006): < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major
shift. Deterministic given the inputs (the t-digest is rank-space
deterministic and partition-invariant; pytest-gated in test_sketches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketches import tdigest_quantiles

_EPS = 1e-6
OTHER = "__other__"


def psi(p: np.ndarray, q: np.ndarray, eps: float = _EPS) -> float:
    """Population Stability Index between two aligned count vectors:
    sum((p̂−q̂)·ln(p̂/q̂)) over epsilon-smoothed normalized frequencies.
    Symmetric, 0 iff identical, unbounded as bins empty out."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return float("nan")
    ph = np.maximum(p / p.sum(), eps)
    qh = np.maximum(q / q.sum(), eps)
    ph, qh = ph / ph.sum(), qh / qh.sum()
    return float(((ph - qh) * np.log(ph / qh)).sum())


def _hist_counts(ds, col: str, edges: np.ndarray) -> np.ndarray:
    """Distributed fixed-edge histogram: per-batch np.histogram partials
    (len(edges)+1 bins including the two outer overflow bins) folded by
    one bounded sum. Nulls are dropped (reported via n_null upstream)."""
    k = len(edges)

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        # digitize against the frozen edges: bin 0 = (-inf, e0), k = [e_k-1, inf)
        idx = np.searchsorted(edges, v, side="right")
        cnt = np.bincount(idx, minlength=k + 1).astype(np.int64)
        return pa.table({"bin": pa.array(np.arange(k + 1, dtype=np.int64)),
                         "n": pa.array(cnt)})

    pdf = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("bin").sum("n").to_pandas())
    out = np.zeros(k + 1, np.int64)
    if len(pdf):
        out[pdf["bin"].to_numpy()] = pdf["sum(n)"].to_numpy()
    return out


def _cat_counts(ds, col: str) -> pd.Series:
    """Distributed category frequency table (null → "" per the engine
    convention); bounded by distinct cardinality."""

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[col].to_pandas()).fillna("").astype(str)
        vc = s.value_counts()
        return pa.table({"value": pa.array(vc.index.to_numpy(object)),
                         "n": pa.array(vc.to_numpy(np.int64))})

    pdf = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("value").sum("n").to_pandas())
    if pdf.empty:
        return pd.Series(dtype=np.int64)
    return pd.Series(pdf["sum(n)"].to_numpy(),
                     index=pdf["value"].to_numpy()).sort_index()


def numeric_drift(ds_ref, ds_cur, col: str, bins: int = 10) -> dict:
    """PSI + binned-KS for one numeric column. Edges = the reference's
    ``bins``-quantile t-digest grid (deduplicated when the column is
    nearly constant), frozen and applied to both sides."""
    qs = [i / bins for i in range(1, bins)]
    edges = np.unique(tdigest_quantiles(ds_ref, col, qs)["value"]
                      .to_numpy(np.float64))
    edges = edges[~np.isnan(edges)]
    if len(edges) == 0:            # all-null reference
        return {"column": col, "psi": float("nan"),
                "ks_binned": float("nan"), "n_bins": 0}
    h_ref = _hist_counts(ds_ref, col, edges)
    h_cur = _hist_counts(ds_cur, col, edges)
    c_ref = np.cumsum(h_ref) / max(h_ref.sum(), 1)
    c_cur = np.cumsum(h_cur) / max(h_cur.sum(), 1)
    return {"column": col,
            "psi": psi(h_ref, h_cur),
            "ks_binned": float(np.abs(c_ref - c_cur).max()),
            "n_bins": len(edges) + 1}


def categorical_drift(ds_ref, ds_cur, col: str,
                      max_categories: int = 64) -> dict:
    """PSI over category frequencies. The category set is FROZEN from
    the reference's ``max_categories`` most frequent values (ties by
    value); everything else — including categories new in the current
    snapshot — folds into ``__other__`` on both sides, so brand-new
    values register as mass moving into the other-bucket."""
    ref = _cat_counts(ds_ref, col)
    cur = _cat_counts(ds_cur, col)
    if ref.empty or cur.empty:
        return {"column": col, "psi": float("nan"), "n_categories": 0,
                "new_categories": int(cur.size if ref.empty else 0)}
    keep = (ref.sort_values(ascending=False, kind="stable")
               .head(max_categories).index)
    def fold(s: pd.Series) -> np.ndarray:
        kept = s.reindex(keep, fill_value=0).to_numpy(np.int64)
        other = int(s.sum() - kept.sum())
        return np.concatenate([kept, [other]])
    return {"column": col,
            "psi": psi(fold(ref), fold(cur)),
            "n_categories": int(len(keep)) + 1,
            "new_categories": int((~cur.index.isin(ref.index)).sum())}


def drift_report(ds_ref, ds_cur, numeric_cols: list[str] = (),
                 categorical_cols: list[str] = (), bins: int = 10,
                 max_categories: int = 64) -> pd.DataFrame:
    """Per-column drift table between two snapshots: (column, kind, psi,
    ks_binned, detail). Driver state is O(columns × bins) — independent
    of either corpus size."""
    rows = []
    for c in numeric_cols:
        d = numeric_drift(ds_ref, ds_cur, c, bins)
        rows.append({"column": c, "kind": "numeric", "psi": d["psi"],
                     "ks_binned": d["ks_binned"],
                     "detail": f"bins={d['n_bins']}"})
    for c in categorical_cols:
        d = categorical_drift(ds_ref, ds_cur, c, max_categories)
        rows.append({"column": c, "kind": "categorical", "psi": d["psi"],
                     "ks_binned": float("nan"),
                     "detail": f"cats={d['n_categories']},"
                               f"new={d['new_categories']}"})
    return pd.DataFrame(rows, columns=["column", "kind", "psi",
                                       "ks_binned", "detail"])
