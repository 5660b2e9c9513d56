"""Data-contract validation: declarative expectations evaluated in one
streaming pass (the Great-Expectations shape, engine-native).

Rules are (name, column, check, params...) tuples evaluated as
vectorized Arrow kernels per batch; each batch contributes one partial
row per rule (n_checked, n_failed, up to ``sample`` offender row ids),
folded by a bounded ``groupby(rule)`` — the exchange carries
rules x blocks rows, never data.  ``validate`` returns a report frame;
``enforce`` filters the dataset to rows passing EVERY rule (the
quarantine split: offenders optionally routed to a second dataset).

Checks:
  ("not_null", col)
  ("unique", col)                     — global duplicate count (one
                                        hash exchange on the column)
  ("in_range", col, lo, hi)           — lo <= v <= hi, nulls fail
  ("in_set", col, values)             — membership, nulls fail
  ("matches", col, regex)             — RE2 full-match on strings
  ("str_len", col, lo, hi)            — byte length bounds
  ("custom", col, fn)                 — fn(pa.ChunkedArray) -> bool mask

SQL twins exist for every built-in check (pytest oracle: one COUNT
FILTER query per rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rule_mask(t: pa.Table, rule: tuple):
    """Boolean Array: True where the row PASSES the rule."""
    kind, col = rule[0], rule[1]
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if kind == "not_null":
        return pc.is_valid(arr)
    if kind == "in_range":
        lo, hi = rule[2], rule[3]
        ok = pc.and_(pc.greater_equal(arr, pa.scalar(lo)),
                     pc.less_equal(arr, pa.scalar(hi)))
        return pc.fill_null(ok, False)
    if kind == "in_set":
        ok = pc.is_in(arr, value_set=pa.array(list(rule[2])))
        return pc.fill_null(ok, False)
    if kind == "matches":
        ok = pc.match_substring_regex(arr, f"^(?:{rule[2]})$")
        return pc.fill_null(ok, False)
    if kind == "str_len":
        lo, hi = rule[2], rule[3]
        ln = pc.binary_length(arr)
        ok = pc.and_(pc.greater_equal(ln, pa.scalar(lo)),
                     pc.less_equal(ln, pa.scalar(hi)))
        return pc.fill_null(ok, False)
    if kind == "custom":
        out = rule[2](arr)
        if not isinstance(out, (pa.Array, pa.ChunkedArray)):
            out = pa.array(np.asarray(out, dtype=bool))
        return pc.fill_null(out, False)
    raise ValueError(f"unknown check {kind!r}")


def _named(rules) -> list[tuple[str, tuple]]:
    out = []
    seen: dict[str, int] = {}
    for r in rules:
        name = f"{r[0]}({r[1]})"
        if len(r) > 2 and r[0] != "custom":
            name += f":{','.join(str(x) for x in r[2:])}"
        elif r[0] == "custom" and len(r) > 2:
            name += f":{getattr(r[2], '__name__', 'fn')}"
        # two rules must never share a report row (the fold groups by
        # name — a collision merged their counts into one phantom rule)
        k = seen.get(name, 0)
        seen[name] = k + 1
        if k:
            name += f"#{k + 1}"
        out.append((name, tuple(r)))
    return out


def validate(ds, rules, id_col: str | None = None, sample: int = 5):
    """One streaming pass -> a report frame: one row per rule with
    ``n_checked`` / ``n_failed`` / ``fail_rate`` / ``ok`` and up to
    ``sample`` offending ``id_col`` values.  ``unique`` rules run as a
    separate bounded duplicate count (one hash exchange on the column,
    carrying distinct values only via a per-batch pre-count).
    """
    named = _named(rules)
    scan_rules = [(n, r) for n, r in named if r[0] != "unique"]
    uniq_rules = [(n, r) for n, r in named if r[0] == "unique"]

    rows = []
    if scan_rules:
        def partial(t: pa.Table) -> pd.DataFrame:
            out = []
            for name, rule in scan_rules:
                ok = _rule_mask(t, rule)
                n = len(t)
                n_fail = n - pc.sum(pc.cast(ok, pa.int64())).as_py() \
                    if n else 0
                ids = ""
                if n_fail and id_col is not None:
                    bad = t.filter(pc.invert(ok))[id_col][:sample]
                    ids = ",".join(str(v) for v in bad.to_pylist())
                out.append({"rule": name, "n_checked": n,
                            "n_failed": int(n_fail), "ids": ids})
            return pd.DataFrame(out)

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            ids = ",".join(x for x in df["ids"] if x)[:512]
            return pd.DataFrame([{
                "rule": df["rule"].iloc[0],
                "n_checked": int(df["n_checked"].sum()),
                "n_failed": int(df["n_failed"].sum()),
                "sample_ids": ",".join(ids.split(",")[:sample])}])

        rows.append(parts.groupby("rule").map_groups(
            fold, batch_format="pandas").to_pandas())

    for name, rule in uniq_rules:
        col = rule[1]

        def pre(t: pa.Table, col=col) -> pd.DataFrame:
            vc = t[col].value_counts()
            f = vc.flatten()
            return pd.DataFrame({
                "v": f[0].to_pandas().astype(str),
                "c": f[1].to_pandas().astype(np.int64)})

        def dup_count(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("v", dropna=False)["c"].sum()
            dups = g[g > 1]
            return pd.DataFrame([{
                "dup_rows": int((dups - 1).sum()),
                "dup_values": int(len(dups)),
                "sample": ",".join(str(v) for v in dups.index[:5])}])

        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            from .window_stats import stable_bucket_of
            df = df.copy()
            df["_b"] = stable_bucket_of(df["v"].to_numpy(object), 64)
            return df

        agg = (ds.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .map_batches(bucket, batch_format="pandas")
                 .groupby("_b")
                 .map_groups(lambda d: dup_count(d.drop(columns="_b")),
                             batch_format="pandas").to_pandas())
        n_total = int(agg["dup_rows"].sum()) if len(agg) else 0
        samp = ",".join(x for x in agg.get("sample", []) if x)
        rows.append(pd.DataFrame([{
            "rule": name, "n_checked": -1, "n_failed": n_total,
            "sample_ids": ",".join(samp.split(",")[:sample])}]))

    if not rows:                      # empty rule list: typed empty report
        return pd.DataFrame({"rule": pd.Series(dtype=object),
                             "n_checked": pd.Series(dtype=np.int64),
                             "n_failed": pd.Series(dtype=np.int64),
                             "sample_ids": pd.Series(dtype=object),
                             "fail_rate": pd.Series(dtype=np.float64),
                             "ok": pd.Series(dtype=bool)})
    rep = pd.concat(rows, ignore_index=True)
    rep["fail_rate"] = np.where(
        rep["n_checked"] > 0, rep["n_failed"] / rep["n_checked"].clip(1),
        (rep["n_failed"] > 0).astype(np.float64))
    rep["ok"] = rep["n_failed"] == 0
    return rep.sort_values("rule").reset_index(drop=True)


def enforce(ds, rules):
    """Keep only rows passing EVERY (row-local) rule — the quarantine
    filter. ``unique`` rules are report-only (row-local semantics
    cannot decide which duplicate to keep; use exact_dedup)."""
    scan = [r for r in rules if r[0] != "unique"]

    def keep(t: pa.Table) -> pa.Table:
        if not len(t) or not scan:
            return t
        m = _rule_mask(t, tuple(scan[0]))
        for r in scan[1:]:
            m = pc.and_(m, _rule_mask(t, tuple(r)))
        return t.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
