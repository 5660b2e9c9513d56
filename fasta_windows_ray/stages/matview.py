"""Incrementally-maintained materialized aggregates over catalog
tables: the "hourly rollup over a 100 TB fact table" shape.

``refresh_materialized_agg`` keeps a per-group (count, sums) rollup
VIEW in sync with a source catalog table.  The first refresh scans the
source once; every later refresh reads ONLY the row-level CDC delta
between the last-synced and the current snapshot
(``catalog_changes`` — manifest-driven, I/O O(changed files)), folds
it with the prior view rows, and commits the result as a new view
version.  Appends cost O(new rows) source I/O; deletes/merges cost
O(touched files); a version with no file changes is a metadata no-op;
a pure compaction's delta cancels to empty (cost: reading the
rewritten files to prove it), leaving the view rows unchanged.

Only algebraic aggregates that are delta-maintainable under deletes
are offered: ``n_rows`` (signed count) and ``sum_<col>`` (signed sum);
means are derived downstream as sum/count.  min/max are deliberately
absent — a delete can invalidate them without a rescan.

The view itself is a catalog table (same atomic versioned commits +
time travel), with the sync spec in ``view_meta.json`` beside it; a
refresh with a different spec than the committed one is refused.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_META = "view_meta.json"


def _load_view_meta(view_dir: str) -> dict | None:
    p = os.path.join(view_dir, _META)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def read_materialized_agg(view_dir: str, version: int | None = None):
    """The view's committed rollup as a Ray Dataset (snapshot-pinnable
    like any catalog table)."""
    from ..sources.catalog import catalog_read
    return catalog_read(view_dir, version=version)


def refresh_materialized_agg(source_dir: str, view_dir: str,
                             group_cols: list[str],
                             sum_cols: list[str] | None = None,
                             window: dict | None = None) -> dict:
    """Sync the rollup view to the source's latest snapshot.

    Sums accumulate in float64 (signed partials must absorb null-
    upcast blocks without schema flapping): exact to the last integer
    below 2^53 per group — int64 sums beyond that need a pre-split of
    the column (the same bound pack_documents documents for its
    offsets).

    ``window={"ts_col": "ts", "size_us": N[, "offset_us": 0]}`` makes
    the view a WINDOWED rollup: a derived ``window_start`` (int64
    epoch-µs tumbling bucket of the ts column) joins the group key —
    the incremental windowed-aggregate-over-a-growing-table shape
    (appends touch only the windows they land in; counts/sums stay
    delta-maintainable under deletes exactly as before). The window
    spec is committed with the view and later refreshes must match.

    Returns a report: ``{synced_from, synced_to, rows_net_delta,
    full_scan, view_version, noop}``.
    """
    from ..sources.catalog import (_atomic_json, _latest_version,
                                   _load_manifest, catalog_changes,
                                   catalog_write)
    sum_cols = list(sum_cols or [])
    if window is not None:
        window = {"ts_col": window["ts_col"],
                  "size_us": int(window["size_us"]),
                  "offset_us": int(window.get("offset_us", 0))}
    spec = {"source": os.path.abspath(source_dir),
            "group_cols": list(group_cols), "sum_cols": sum_cols,
            "window": window}
    meta = _load_view_meta(view_dir)
    if meta is not None and {k: meta.get(k) for k in spec} != spec:
        raise ValueError(f"view spec mismatch: committed "
                         f"{ {k: meta.get(k) for k in spec} } vs "
                         f"requested {spec}")
    last = meta["source_version"] if meta else 0
    src_v = _latest_version(source_dir)
    if src_v == 0:
        raise FileNotFoundError(f"no committed version in {source_dir}")
    src_manifest = _load_manifest(source_dir, src_v)
    report = {"synced_from": last, "synced_to": src_v,
              "full_scan": not last,
              "rows_net_delta": src_manifest["total_rows"]
              - (_load_manifest(source_dir, last)["total_rows"]
                 if last else 0)}
    if src_v == last:
        report.update(noop=True, view_version=meta["view_version"])
        return report
    if last:
        old_paths = {f["path"]
                     for f in _load_manifest(source_dir, last)["files"]}
        if old_paths == {f["path"] for f in src_manifest["files"]}:
            # versions differ but the file set does not (e.g. a
            # metadata-only commit): bump the sync point, no I/O
            _atomic_json(os.path.join(view_dir, _META),
                         {**spec, "source_version": src_v,
                          "view_version": meta["view_version"]})
            report.update(noop=True, view_version=meta["view_version"])
            return report

    val_cols = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
    eff_group = list(group_cols) + (["window_start"] if window else [])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if df.empty:
            out = df.head(0)[group_cols].copy()
            if window:
                out["window_start"] = pd.Series(dtype=np.int64)
            out["n_rows"] = pd.Series(dtype=np.int64)
            for c in sum_cols:
                out[f"sum_{c}"] = pd.Series(dtype=np.float64)
            return pa.Table.from_pandas(out, preserve_index=False)
        sign = (np.where(df["_change"].to_numpy() == "delete", -1, 1)
                if "_change" in df.columns else np.ones(len(df), np.int64))
        out = df[group_cols].copy()
        if window:
            ts = df[window["ts_col"]].astype("datetime64[us]") \
                .astype("int64").to_numpy()
            off, size = window["offset_us"], window["size_us"]
            out["window_start"] = (ts - off) // size * size + off
        out["n_rows"] = sign.astype(np.int64)
        for c in sum_cols:
            out[f"sum_{c}"] = df[c].to_numpy().astype(np.float64) * sign
        g = (out.groupby(eff_group, dropna=False, sort=False)
                .sum().reset_index())
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    # first sync reads the pinned snapshot directly (plain pruned scan
    # — routing it through the CDC path would pay a needless whole-
    # table multiset exchange); later syncs read only the change feed
    from ..sources.catalog import catalog_read
    read_cols = list(group_cols) + sum_cols \
        + ([window["ts_col"]] if window else [])
    src = (catalog_read(source_dir, version=src_v, columns=read_cols)
           if not last else catalog_changes(source_dir, last, src_v))
    delta = src.map_batches(partial, batch_format="pyarrow")
    have_prior = meta is not None and \
        _load_manifest(view_dir, meta["view_version"])["total_rows"] > 0
    if have_prior:
        prior = read_materialized_agg(
            view_dir, meta["view_version"]).map_batches(
            lambda t: t.select(eff_group + val_cols),
            batch_format="pyarrow", zero_copy_batch=True)
        combined = delta.union(prior)
    else:
        combined = delta

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.iloc[:1][eff_group].copy()
        for c in val_cols:
            g[c] = df[c].sum()
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return g[g["n_rows"] != 0].reset_index(drop=True)

    result = combined.groupby(eff_group).map_groups(
        fold, batch_format="pandas")
    m = catalog_write(result, view_dir, mode="overwrite")
    _atomic_json(os.path.join(view_dir, _META),
                 {**spec, "source_version": src_v,
                  "view_version": m["version"]})
    report.update(noop=False, view_version=m["version"])
    return report
