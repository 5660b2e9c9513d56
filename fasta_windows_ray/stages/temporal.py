"""Event-time temporal (versioned-dimension) join over catalog tables.

The Flink "temporal table join" / Delta SCD-2 enrichment shape: each
stream event is joined to the dimension row that was CURRENT at the
event's event-time, not the latest one.  Two pieces:

- ``scd2_history(table_dir, ...)`` derives a slowly-changing-dimension
  type-2 frame — one row per (dimension row, validity interval)
  ``[valid_from, valid_to)`` — purely from the catalog's committed
  snapshots: ``catalog_changes`` (manifest-driven CDC, I/O O(changed
  files) per version step) yields each version's insert/delete
  multiset; the version's event-time comes from the manifest's
  ``commit_ts`` (stamped by ``catalog_write(..., commit_ts=...)``) or
  a caller-supplied ``version_ts`` map.  Interval assembly is one hash
  exchange on the dimension key, then vectorized FIFO pairing of each
  row-content's inserts with its later deletes (cumcount + merge) —
  a re-inserted row gets a second, disjoint interval.

- ``temporal_join(events, history, ...)`` probes events against the
  history per key-hash bucket: one ``pd.merge_asof`` on
  ``valid_from`` (backward, by key), then rows whose matched interval
  already CLOSED at the event's ts (``valid_to <= ts``) get their
  dimension columns nulled — i.e. the key was deleted, SQL LEFT-JOIN
  semantics.  An update commit (delete + insert at the same
  ``commit_ts``) hands over atomically: the asof picks the newer
  ``valid_from`` at ties.

Scale: the history is proportional to the dimension's CHANGE volume,
not the fact stream; events are never materialized — one bucket
exchange co-partitions both sides and each task holds one bucket.
The primary-key contract (at most one live row per key at any
version — maintain the table via ``catalog_merge`` /
``catalog_delete_keys``) is asserted per bucket at probe time.

SQL twin (the pytest oracle)::

    SELECT e.*, h.<value_cols>
    FROM events e
    LEFT JOIN history h
      ON e.<key> = h.<key>
     AND e.ts >= h.valid_from
     AND (h.valid_to IS NULL OR e.ts < h.valid_to)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import _as_dataset, _restore_ints, _union_tagged
from .window_stats import fast_numeric_bucket_of, stable_bucket_of

_NO_TS = object()


def _key_bucket(ds, key: str, num_buckets: int, out_col: str = "bucket"):
    """``add_bucket`` generalized to an arbitrary key column.  Strings
    use the engine's ``stable_bucket_of`` (md5, DuckDB-reproducible);
    numeric keys use a vectorized splitmix64 — bucketing is a pure
    partitioning choice (values never depend on it), and the md5 path
    pays a Python call per UNIQUE value, which at 64k int keys per
    batch dominated the probe."""
    def _bucket(t: pa.Table) -> pa.Table:
        col = t[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            v = col.cast(pa.float64()).fill_null(0.0) \
                .to_numpy(zero_copy_only=False)
            b = fast_numeric_bucket_of(v, num_buckets)
        else:
            vals = col.fill_null("").to_numpy(zero_copy_only=False)
            b = stable_bucket_of(vals, num_buckets)
        return t.append_column(out_col, pa.array(b, pa.int64()))

    return ds.map_batches(_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)


def effective_history(dim, key_col: str,
                      effective_col: str = "effective_from",
                      num_buckets: int = 32):
    """BUSINESS-time (bitemporal) validity intervals: the dimension's
    rows carry an explicit ``effective_col`` (when the fact became true
    in the world), independent of when it was COMMITTED.  Per key, the
    sorted effective dates partition the business-time axis —
    ``valid_to`` = the key's next effective date (exclusive), null for
    the last.  Unlike ``scd2_history`` (system-time: validity derived
    from commit order, append-only past), a retroactive correction —
    a row with an OLD effective date committed at a LATER version —
    rewrites past intervals, which is exactly the bitemporal use case:
    pin system time by reading the dim at a catalog version, derive
    business-time intervals from that snapshot, probe with
    ``temporal_join`` on the events' business timestamps.

    One key-bucket exchange; per-bucket vectorized sort + shift.
    Two rows of one key sharing an effective date violate the
    primary-key-per-effective-date contract and raise.
    """
    dim = _as_dataset(dim)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_kb"])
        eff = df[effective_col]
        eff_us = (eff.astype("datetime64[us]").astype("int64")
                  if str(eff.dtype).startswith("datetime")
                  else eff.astype("int64"))
        df = df.assign(valid_from=eff_us).drop(columns=[effective_col])
        df = df.sort_values([key_col, "valid_from"],
                            kind="stable").reset_index(drop=True)
        same = df[key_col].to_numpy()[1:] == df[key_col].to_numpy()[:-1]
        vf = df["valid_from"].to_numpy()
        if np.any(same & (vf[1:] == vf[:-1])):
            raise ValueError(
                f"effective_history: duplicate {effective_col} for a "
                f"{key_col} — not primary-keyed per effective date")
        nxt = np.append(vf[1:], -1).astype("float64")
        nxt[:-1][~same] = np.nan
        nxt[-1] = np.nan
        df["valid_to"] = nxt
        return df

    return (_key_bucket(dim, key_col, num_buckets, out_col="_kb")
            .groupby("_kb")
            .map_groups(assemble, batch_format="pandas"))


def effective_repair(events, dim_dir: str, key: str,
                     value_cols: list[str], from_version: int,
                     to_version: int | None = None,
                     effective_col: str = "effective_from",
                     ts_col: str = "ts", num_buckets: int = 32):
    """Bitemporal repair: after retroactive corrections land
    (``from_version`` -> ``to_version``), re-enrich ALL events of the
    CDC-delta keys against the new business-time history.  Unlike
    ``temporal_repair`` there is no ts cutoff — a correction with an
    old effective date changes the past — but the key filter still
    bounds the slice by the dimension's change volume.
    Returns ``(repaired, report)``.
    """
    import ray
    import pyarrow.compute as pc

    from ..sources.catalog import (_latest_version, catalog_changes,
                                   catalog_read)

    to_v = to_version if to_version is not None \
        else _latest_version(dim_dir)
    if to_v <= from_version:
        raise ValueError(f"to_version {to_v} <= from_version "
                         f"{from_version}: nothing to repair")
    delta = catalog_changes(dim_dir, from_version, to_v,
                            num_buckets=num_buckets)
    key_list = sorted(delta.unique(key))
    report = {"affected_keys": len(key_list),
              "from_version": from_version, "to_version": to_v}
    hist = effective_history(
        catalog_read(dim_dir, version=to_v),
        key, effective_col=effective_col, num_buckets=num_buckets)
    kref = ray.put(pa.array(key_list))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[key], value_set=ray.get(kref)))

    sub = events.map_batches(keep, batch_format="pyarrow",
                             zero_copy_batch=True)
    hsub = hist.map_batches(keep, batch_format="pyarrow")
    repaired = temporal_join(sub, hsub, key=key, value_cols=value_cols,
                             ts_col=ts_col, num_buckets=num_buckets)
    return repaired, report


def scd2_history(table_dir: str, key_col: str,
                 version_ts: dict[int, int] | None = None,
                 to_version: int | None = None,
                 num_buckets: int = 32):
    """SCD-2 validity intervals for every row the table ever held.

    Returns a Dataset with the table's columns plus int64 epoch-µs
    ``valid_from`` / ``valid_to`` (``valid_to`` null = still live in
    ``to_version``).  Version event-times come from each manifest's
    ``commit_ts`` unless ``version_ts`` overrides ({version: µs};
    every version 1..to_version must be covered by one or the other).
    """
    import ray.data as rd

    from ..sources.catalog import _latest_version, _load_manifest

    to_v = to_version if to_version is not None \
        else _latest_version(table_dir)
    if to_v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")

    from ..sources.catalog import catalog_changes

    feeds = []
    for v in range(1, to_v + 1):
        ts = (version_ts or {}).get(
            v, _load_manifest(table_dir, v).get("commit_ts", _NO_TS))
        if ts is _NO_TS:
            raise ValueError(
                f"version {v} has no commit_ts in its manifest and no "
                "version_ts entry — temporal joins need an event-time "
                "per version")
        delta = catalog_changes(table_dir, v - 1, v,
                                num_buckets=num_buckets)
        vts = int(ts)

        def stamp(t: pa.Table, vts=vts) -> pa.Table:
            return t.append_column(
                "_vts", pa.array(np.full(len(t), vts), pa.int64()))

        feeds.append(delta.map_batches(stamp, batch_format="pyarrow",
                                       zero_copy_batch=True))

    changes = feeds[0]
    for f in feeds[1:]:
        changes = changes.union(f)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        content = [c for c in df.columns
                   if c not in ("_change", "_vts", "_kb")]
        ins = df[df["_change"] == "insert"].sort_values(
            "_vts", kind="stable").copy()
        dels = df[df["_change"] == "delete"].sort_values(
            "_vts", kind="stable").copy()
        # FIFO multiset pairing: the j-th insert of a given row content
        # closes at the j-th delete of the same content (if any)
        ins["_j"] = ins.groupby(content, dropna=False, sort=False).cumcount()
        dels["_j"] = dels.groupby(content, dropna=False,
                                  sort=False).cumcount()
        out = ins.merge(
            dels[content + ["_j", "_vts"]].rename(
                columns={"_vts": "valid_to"}),
            on=content + ["_j"], how="left")
        out = out.rename(columns={"_vts": "valid_from"})
        return out[content + ["valid_from", "valid_to"]]

    return (_key_bucket(changes, key_col, num_buckets, out_col="_kb")
            .groupby("_kb")
            .map_groups(assemble, batch_format="pandas"))


def temporal_repair(events, dim_dir: str, key: str,
                    value_cols: list[str], from_version: int,
                    to_version: int | None = None, ts_col: str = "ts",
                    num_buckets: int = 32,
                    version_ts: dict[int, int] | None = None):
    """Incrementally refresh a temporal enrichment after the dimension
    advanced from ``from_version`` to ``to_version``.

    Because version event-times are monotonic, advancing the dimension
    can only change the enrichment of events whose

    - key appears in the dim's CDC delta between the two versions, AND
    - ts >= the earliest new version's event-time (older events keep
      probing the same closed intervals).

    So the repair slice is (changed keys x open tail) — I/O and compute
    proportional to the dimension's CHANGE volume, never the fact
    corpus.  Returns ``(repaired, report)``: ``repaired`` is the
    re-enriched Dataset for exactly that slice (same columns as
    ``temporal_join``; upsert it into the enriched store keyed on the
    event id), ``report`` carries the affected key count and the ts
    cutoff.  The affected key set is collected and broadcast — bounded
    by the delta; for a delta comparable to the dimension itself,
    re-enrich in full instead.

    Gate (pytest): untouched-slice rows of the ``from_version``
    enrichment + ``repaired`` == the full ``to_version`` enrichment.
    """
    import ray
    import pyarrow.compute as pc

    from ..sources.catalog import (_latest_version, _load_manifest,
                                   catalog_changes)

    to_v = to_version if to_version is not None \
        else _latest_version(dim_dir)
    if to_v <= from_version:
        raise ValueError(f"to_version {to_v} <= from_version "
                         f"{from_version}: nothing to repair")
    cutoffs = []
    for v in range(from_version + 1, to_v + 1):
        ts = (version_ts or {}).get(
            v, _load_manifest(dim_dir, v).get("commit_ts", _NO_TS))
        if ts is _NO_TS:
            raise ValueError(
                f"version {v} has no commit_ts and no version_ts entry")
        cutoffs.append(int(ts))
    cutoff = min(cutoffs)

    delta = catalog_changes(dim_dir, from_version, to_v,
                            num_buckets=num_buckets)
    key_list = sorted(delta.unique(key))           # bounded by the delta
    report = {"affected_keys": len(key_list), "ts_cutoff_us": cutoff,
              "from_version": from_version, "to_version": to_v}
    hist = scd2_history(dim_dir, key, version_ts=version_ts,
                        to_version=to_v, num_buckets=num_buckets)

    kref = ray.put(pa.array(key_list))

    def slice_events(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        m = pc.and_(pc.greater_equal(ts, pa.scalar(cutoff, pa.int64())),
                    pc.is_in(t[key], value_set=ray.get(kref)))
        return t.filter(m)

    def slice_hist(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[key], value_set=ray.get(kref)))

    sub = events.map_batches(slice_events, batch_format="pyarrow",
                             zero_copy_batch=True)
    hsub = hist.map_batches(slice_hist, batch_format="pyarrow")
    repaired = temporal_join(sub, hsub, key=key, value_cols=value_cols,
                             ts_col=ts_col, num_buckets=num_buckets)
    return repaired, report


def temporal_join(events, history, key: str, value_cols: list[str],
                  ts_col: str = "ts", num_buckets: int = 32,
                  schemas=None):
    """Enrich each event with the dimension row valid at its event-time.

    ``history`` is an SCD-2 Dataset/frame (``scd2_history`` output or
    any frame with ``valid_from``/``valid_to`` int64-µs columns); its
    intervals must be non-overlapping per ``key`` (primary-key
    dimension — asserted per bucket).  Output: events' columns +
    ``value_cols`` (null where no version was valid).  LEFT-join
    semantics; null event keys never match.
    """
    right = _as_dataset(history)
    hist_cols = [key, "valid_from", "valid_to"] + list(value_cols)
    if schemas is not None:
        sch_l, sch_r = dict(schemas[0]), dict(schemas[1])
    else:
        ev = _as_dataset(events)
        s_l, s_r = ev.schema(), right.schema()
        if s_l is None or s_r is None:
            raise ValueError(
                "temporal_join: cannot infer a side's schema (empty "
                "dataset) — pass schemas=(events_schema, hist_schema)")
        sch_l = {f.name: f.type for f in s_l.base_schema}
        sch_r = {f.name: f.type for f in s_r.base_schema}
        events = ev
    clash = set(sch_l) & (set(value_cols)
                          | {"valid_from", "valid_to", "_ts_us"})
    if clash:
        # merge_asof would keep the EVENT's column unsuffixed and the
        # nulling step would clobber it with stale event data — refuse
        # loudly instead of silently corrupting the enrichment
        raise ValueError(
            f"temporal_join: event columns {sorted(clash)} collide "
            "with value_cols/interval columns — rename or project "
            "them off the event side first")
    int_names = ({n for n, t in sch_l.items()
                  if isinstance(t, pa.DataType) and pa.types.is_integer(t)}
                 | {n for n, t in sch_r.items() if n in value_cols
                    and isinstance(t, pa.DataType)
                    and pa.types.is_integer(t)})
    ev_cols = list(sch_l)
    bkt = {"bucket": pa.int64()}
    both = _union_tagged(
        _key_bucket(_as_dataset(events), key, num_buckets),
        _key_bucket(right.map_batches(
            lambda t: t.select(hist_cols), batch_format="pyarrow"),
            key, num_buckets),
        schemas=({**sch_l, **bkt},
                 {**{c: sch_r[c] for c in hist_cols}, **bkt}))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[df["_side"] == "L", ev_cols].copy()
        r = df.loc[df["_side"] == "R", hist_cols].copy()
        if len(l) == 0:
            out = l
            for c in value_cols:
                out[c] = np.nan
            return _restore_ints(out, int_names)
        # SQL LEFT JOIN: null-key events never MATCH but are KEPT,
        # null-padded (they all hash to one bucket via the "" fill)
        null_l = l[l[key].isna()]
        l = l[l[key].notna()]
        if len(null_l):
            null_l = null_l.copy()
            for c in value_cols:
                null_l[c] = np.nan
        ts = l[ts_col]
        ts_us = (ts.astype("datetime64[us]").astype("int64")
                 if str(ts.dtype).startswith("datetime")
                 else ts.astype("int64"))
        l["_ts_us"] = ts_us

        def with_nulls(out: pd.DataFrame) -> pd.DataFrame:
            if len(null_l):
                out = pd.concat([out, null_l], ignore_index=True)
            return out

        if len(r) == 0 or len(l) == 0:
            out = l.drop(columns=["_ts_us"])
            for c in value_cols:
                out[c] = np.nan
            return _restore_ints(with_nulls(out), int_names)
        # the union null-pad upcasts the history's int64 bounds to
        # float64 on the event rows; real R rows always carry them
        r["valid_from"] = r["valid_from"].astype("int64")
        # primary-key contract: per key, intervals must not overlap —
        # sorted by valid_from, each interval must close (or be last)
        # before the next opens
        r = r.sort_values([key, "valid_from"], kind="stable")
        same_key = r[key].to_numpy()[1:] == r[key].to_numpy()[:-1]
        vt = r["valid_to"].to_numpy(dtype="float64", na_value=np.inf)
        nxt_vf = r["valid_from"].to_numpy()[1:]
        if np.any(same_key & (nxt_vf < vt[:-1])):
            raise ValueError(
                f"temporal_join: overlapping validity intervals for a "
                f"{key!r} — dimension is not primary-keyed")
        l = l.sort_values("_ts_us", kind="stable")
        r2 = r.sort_values("valid_from", kind="stable")
        out = pd.merge_asof(l, r2, left_on="_ts_us", right_on="valid_from",
                            by=key, direction="backward",
                            suffixes=("", "_h"))
        closed = out["valid_to"].notna() & \
            (out["valid_to"] <= out["_ts_us"])
        for c in value_cols:
            out.loc[closed, c] = np.nan if c in int_names or \
                pd.api.types.is_numeric_dtype(out[c]) else None
        out = out.drop(columns=["_ts_us", "valid_from", "valid_to"])
        return _restore_ints(with_nulls(out), int_names)

    return both.groupby("bucket").map_groups(probe, batch_format="pandas")


_SCD2_META = "scd2_meta.json"


def _scd2_meta(view_dir: str) -> dict | None:
    import json
    import os
    p = os.path.join(view_dir, _SCD2_META)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def refresh_scd2_view(dim_dir: str, view_dir: str, key_col: str,
                      version_ts: dict[int, int] | None = None) -> dict:
    """Incrementally-maintained SCD-2 history VIEW of a catalog
    dimension (the matview pattern applied to ``scd2_history``): the
    history is itself a catalog table, and each refresh applies only
    the CDC of versions committed since the last sync — at 10^4
    versions a from-scratch derivation unions 10^4 change feeds, while
    a refresh costs O(changed files + changed keys).

    Per new version: inserts open intervals (rows keyed by a synthetic
    ``_iid = key\\x1f{valid_from}``); deletes close them — the open
    interval of each deleted row content is fetched with
    ``catalog_lookup(key_col=...)`` (per-file Bloom + min/max pruned —
    the view is written with ``bloom_cols=[key_col]`` and merge
    rewrites re-derive the parent's Blooms) and rewritten with
    ``valid_to`` via ONE ``catalog_merge`` on ``_iid`` per version.
    The view keeps full time travel (every refresh is an atomic
    commit).

    Returns a report {versions_applied, opened, closed}.  The sync
    spec pins (dim_dir, key_col); a mismatch is refused.
    ``read_scd2_view`` scans it back without the internal ``_iid``.
    """
    import os

    import ray.data as rd

    from ..sources.catalog import (_atomic_json, _latest_version,
                                   _load_manifest, catalog_changes,
                                   catalog_lookup, catalog_merge,
                                   catalog_write)

    meta = _scd2_meta(view_dir)
    if meta is not None and (meta["dim_dir"] != dim_dir
                             or meta["key_col"] != key_col):
        raise ValueError(
            f"view {view_dir} is synced to {meta['dim_dir']!r} on "
            f"{meta['key_col']!r}; refusing a different spec")
    last = meta["last_synced"] if meta else 0
    to_v = _latest_version(dim_dir)
    report = {"versions_applied": 0, "opened": 0, "closed": 0}
    if to_v <= last:
        return report

    def vts_of(v: int) -> int:
        ts = (version_ts or {}).get(
            v, _load_manifest(dim_dir, v).get("commit_ts", _NO_TS))
        if ts is _NO_TS:
            raise ValueError(f"version {v} has no commit_ts and no "
                             "version_ts entry")
        return int(ts)

    def iid(keys: pd.Series, vf: pd.Series) -> pd.Series:
        return keys.astype(str) + "\x1f" + vf.astype("int64").astype(str)

    for v in range(last + 1, to_v + 1):
        vts = vts_of(v)
        delta = (catalog_changes(dim_dir, v - 1, v).to_pandas())
        # the delta is bounded by the version's changed files — the
        # same driver-size contract as matview's signed-delta fold
        if len(delta) == 0:
            report["versions_applied"] += 1
            continue
        content = [c for c in delta.columns if c != "_change"]
        ins = delta[delta["_change"] == "insert"][content].copy()
        dels = delta[delta["_change"] == "delete"][content].copy()
        rows = []
        if len(ins):
            ins["valid_from"] = np.int64(vts)
            ins["valid_to"] = np.nan
            ins["_iid"] = iid(ins[key_col], ins["valid_from"])
            rows.append(ins)
            report["opened"] += len(ins)
        if len(dels):
            found = catalog_lookup(
                view_dir, sorted(set(dels[key_col])), key_col=key_col)
            if hasattr(found, "to_pandas"):
                found = found.to_pandas()
            open_rows = found[found["valid_to"].isna()]
            closed = open_rows.merge(dels, on=content, how="inner")
            if len(closed) != len(dels):
                # crash-replay tolerance: a refresh killed between this
                # version's catalog_merge commit and its meta write
                # re-applies the version — deletes already closed AT
                # THIS version's event-time count as applied
                done = found[found["valid_to"] == float(vts)]                     .merge(dels, on=content, how="inner")
                if len(closed) + len(done) != len(dels):
                    raise ValueError(
                        f"scd2 view out of sync at version {v}: "
                        f"{len(dels)} deletes matched {len(closed)} "
                        f"open + {len(done)} already-closed intervals")
            closed["valid_to"] = float(vts)
            rows.append(closed[content + ["valid_from", "valid_to",
                                          "_iid"]])
            report["closed"] += len(closed)
        if rows:
            up = pd.concat(rows, ignore_index=True)
            # explicit Arrow conversion: an all-NaN pandas column would
            # otherwise reach the write task null-TYPED (Ray's pandas
            # block codec), corrupting the view's unified schema
            up["valid_to"] = up["valid_to"].astype("float64")
            tbl = pa.Table.from_pandas(up, preserve_index=False)
            # bootstrap = the view has no committed version yet (NOT
            # the loop counter: a dimension whose first versions carry
            # empty deltas bootstraps at its first non-empty one)
            if _latest_version(view_dir) == 0:
                catalog_write(rd.from_arrow(tbl), view_dir,
                              mode="overwrite", bloom_cols=[key_col])
            else:
                catalog_merge(rd.from_arrow(tbl), view_dir, on="_iid")
        report["versions_applied"] += 1
        # per-version sync point: a crash resumes at exactly the next
        # version (the one-version replay window between the merge
        # commit and this write is covered by the idempotence above)
        os.makedirs(view_dir, exist_ok=True)
        _atomic_json(os.path.join(view_dir, _SCD2_META),
                     {"dim_dir": dim_dir, "key_col": key_col,
                      "last_synced": v})
    return report


def read_scd2_view(view_dir: str, version: int | None = None):
    """The maintained history as a Dataset (internal ``_iid`` dropped);
    snapshot-pinnable like any catalog table."""
    from ..sources.catalog import catalog_read

    ds = catalog_read(view_dir, version=version)

    def drop(t: pa.Table) -> pa.Table:
        cols = [c for c in t.column_names if c not in ("_iid", "_bucket")]
        return t.select(cols)

    return ds.map_batches(drop, batch_format="pyarrow",
                          zero_copy_batch=True)
