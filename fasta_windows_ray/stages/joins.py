"""Join family beyond the window-stats join-back: as-of, range, and
broadcast semi/anti joins (SURVEY.md §2.7 "Semi/anti/as-of variants fall
out of the same co-partitioning").

All three co-partition on conv_id with the engine's single hash-bucket
shuffle; within a bucket the probe is vectorized pandas
(merge_asof / searchsorted interval lookup / isin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .window_stats import add_bucket


def _union_tagged(left, right, tag_col: str = "_side", schemas=None):
    """``schemas``: optional (dict_l, dict_r) of name -> pa.DataType.
    When provided, the ``Dataset.schema()`` probes are skipped — each
    probe executes a limit-1 plan, and rapid sequences of those can
    trip a Ray-core refcount race (reference_count.cc:581, see README
    Known limitations); callers that know their schemas statically
    should pass them."""
    if schemas is not None:
        cols_l, cols_r = dict(schemas[0]), dict(schemas[1])
    else:
        cols_l = {f.name: f.type for f in left.schema().base_schema}
        cols_r = {f.name: f.type for f in right.schema().base_schema}
    all_cols = list(dict.fromkeys(list(cols_l) + list(cols_r) + [tag_col]))
    types = {**cols_r, **cols_l, tag_col: pa.string()}

    def align(side):
        def _f(t: pa.Table) -> pa.Table:
            t = t.append_column(tag_col, pa.array([side] * len(t)))
            for cname in all_cols:
                if cname not in t.column_names:
                    t = t.append_column(cname, pa.nulls(len(t), types[cname]))
            return t.select(all_cols)
        return _f

    return left.map_batches(align("L"), batch_format="pyarrow").union(
        right.map_batches(align("R"), batch_format="pyarrow"))


def _as_dataset(right):
    """Accept either a Dataset (scale path — right side never lands on the
    driver) or a small pandas frame (convenience/tests). Blocks are
    normalized to Arrow so downstream schema introspection is uniform
    (map_groups upstreams produce pandas blocks)."""
    if isinstance(right, pd.DataFrame):
        right = ray.data.from_pandas(right)
    return right.map_batches(lambda t: t, batch_format="pyarrow")


def _int_cols(ds) -> set:
    """Integer-typed column names, tolerant of both Arrow- and
    pandas-backed block schemas."""
    sch = ds.schema()
    out = set()
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            if pa.types.is_integer(typ):
                out.add(name)
        else:
            try:
                if np.issubdtype(np.dtype(typ), np.integer):
                    out.add(name)
            except TypeError:
                pass
    return out


def _restore_ints(df: pd.DataFrame, int_names: set) -> pd.DataFrame:
    """The union-tag pads each side's exclusive columns with nulls, which
    makes pandas upcast int64 -> float64 inside map_groups; cast back once
    the nulls are gone (leave genuinely-null columns as float)."""
    for c in df.columns:
        if c in int_names and df[c].dtype != np.int64 and not df[c].isna().any():
            df[c] = df[c].astype(np.int64)
    return df


def _schema_hints(schemas):
    """Shared handling of static (left, right) schema hints: returns
    (int_names for _restore_ints, bucket-augmented schema tuple for
    _union_tagged) — one definition of which types count as integer and
    of the appended bucket column. ``schemas=None`` -> (None, None)."""
    if schemas is None:
        return None, None
    int_names = {n for s in schemas for n, t in s.items()
                 if isinstance(t, pa.DataType) and pa.types.is_integer(t)}
    bkt = {"bucket": pa.int64()}
    return int_names, ({**schemas[0], **bkt}, {**schemas[1], **bkt})


def asof_join(turns_ds, events, value_cols: list[str],
              on: str = "ts", by: str = "conv_id", num_buckets: int = 32,
              schemas=None):
    """For each turn, attach the most recent (backward) event row of the
    same conversation: pd.merge_asof per conv_id hash bucket.

    ``events`` is the right side — a Dataset (e.g. emitted window or
    session stats with an ``on``-comparable timestamp column; stays
    distributed end-to-end) or a small pandas frame.
    """
    right = _as_dataset(events)
    int_names, sch = _schema_hints(schemas)
    if int_names is None:
        int_names = _int_cols(turns_ds) | _int_cols(right)
    both = _union_tagged(add_bucket(turns_ds, num_buckets),
                         add_bucket(right, num_buckets), schemas=sch)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "L"].drop(columns=["_side"])
        r = df[df["_side"] == "R"][[by, on] + value_cols]
        l = l.sort_values(on, kind="stable")
        r = r.sort_values(on, kind="stable")
        l = l.dropna(axis=1, how="all")
        out = pd.merge_asof(l, r, on=on, by=by, direction="backward",
                            suffixes=("", "_r"))
        return _restore_ints(out, int_names)

    return both.groupby("bucket").map_groups(probe, batch_format="pandas")


def range_join(turns_ds, intervals,
               lo_col: str = "session_start", hi_col: str = "session_end",
               value_cols: list[str] | None = None,
               by: str = "conv_id", num_buckets: int = 32, schemas=None):
    """Attach the interval containing each turn's ts (inclusive bounds):
    per-conversation searchsorted against the sorted interval starts.
    Intervals must be non-overlapping per key (true for sessions).
    ``intervals`` may be a Dataset (stays distributed) or a pandas frame."""
    value_cols = value_cols or []
    right = _as_dataset(intervals)
    int_names, sch = _schema_hints(schemas)
    if int_names is None:
        int_names = _int_cols(turns_ds) | _int_cols(right)
    both = _union_tagged(add_bucket(turns_ds, num_buckets),
                         add_bucket(right, num_buckets), schemas=sch)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "L"].drop(columns=["_side"]).dropna(
            axis=1, how="all")
        r = df[df["_side"] == "R"]
        outs = []
        r_by = {k: g.sort_values(lo_col) for k, g in r.groupby(by)}
        for k, g in l.groupby(by):
            ri = r_by.get(k)
            if ri is None or len(ri) == 0:
                g = g.copy()
                for c in [lo_col, hi_col] + value_cols:
                    g[c] = pd.NaT if c in (lo_col, hi_col) else np.nan
                outs.append(g)
                continue
            ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            los = ri[lo_col].astype("datetime64[us]").astype("int64").to_numpy()
            his = ri[hi_col].astype("datetime64[us]").astype("int64").to_numpy()
            idx = np.searchsorted(los, ts, side="right") - 1
            ok = (idx >= 0) & (ts <= his[np.clip(idx, 0, len(his) - 1)])
            g = g.copy()
            take = np.clip(idx, 0, len(ri) - 1)
            for c in [lo_col, hi_col] + value_cols:
                vals = ri[c].to_numpy()[take]
                g[c] = np.where(ok, vals, None)
            outs.append(g)
        out = pd.concat(outs, ignore_index=True) if outs else l
        return _restore_ints(out, int_names)

    return both.groupby("bucket").map_groups(probe, batch_format="pandas")


def semi_join(ds, keys, col: str = "conv_id", anti: bool = False):
    """Broadcast semi (or anti) join: keep rows whose ``col`` is (not) in
    the broadcast key set — no shuffle (ray_guide semi/anti pattern).
    Membership is the vectorized Arrow ``is_in`` kernel against a
    broadcast value set (no per-row Python)."""
    import pyarrow.compute as pc
    ref = ray.put(pa.array(sorted(set(keys))))

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = pc.is_in(t[col], value_set=self.keys)
            if anti:
                m = pc.invert(m)
            return t.filter(m)

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))


def hash_join(left, right, on: str | list[str], num_buckets: int = 64,
              how: str = "inner", right_suffix: str = "_r",
              left_schema=None, right_schema=None):
    """Big-big shuffle equi-join: both sides hash-bucketed on ``on``
    and merged per bucket — the join shape for two LARGE tables, where
    neither side fits a broadcast (``semi_join``) and there is no
    interval/order structure for ``asof_join``/``range_join``.

    ``on`` may be one column or a composite-key list: buckets then
    hash the \\x1f-joined canonical tuple (numerics via float64 so
    int-vs-float merge equality and bucket placement agree), and a row
    with a null in ANY key column never matches (SQL AND semantics).

    Built on the engine's own co-partition machinery (union-tag +
    md5-bucket + per-group pandas merge) rather than Ray Data's native
    ``Dataset.join``: the native hash join races on schema inference
    when empty upstream partitions emit schema-less blocks (observed
    nondeterministic ArrowInvalid "no match for key field on right
    side" at small inputs). One all-to-all; ``num_buckets`` must scale
    with input size, many keys per bucket keep groups bounded.
    ``how``: "inner", "left", "right", or "full".

    Null-key semantics = SQL (round-3 ADVICE): rows whose ``on`` value
    is null never match. A side whose unmatched rows are dropped by the
    join kind also drops its null-key rows at the scan; sides kept
    outer emit their null-key rows null-padded (for "full", the
    per-bucket merge splits null keys out first — pandas would match
    NaN == NaN).

    Caveat (Ray behavior, not fixable in-operator): a join with ZERO
    total matches yields an all-empty Dataset whose ``to_pandas()``
    loses column names — callers needing a typed empty frame should
    guard like q_cep_sequence does with a schema helper."""
    from .window_stats import (fast_numeric_bucket_of,
                                stable_bucket_of)

    on_cols = [on] if isinstance(on, str) else list(on)
    left = _as_dataset(left)
    right = _as_dataset(right)

    def drop_null_keys(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t[on_cols[0]])
        for c in on_cols[1:]:
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"how={how!r} (inner | left | right | full)")
    # null keys never MATCH; sides whose unmatched rows are not kept
    # can drop them at the scan (inner: both; left: right side only;
    # right: left side only; full: keep both — the merge splits them)
    if how in ("inner", "left"):
        right = right.map_batches(drop_null_keys, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if how in ("inner", "right"):
        left = left.map_batches(drop_null_keys, batch_format="pyarrow",
                                zero_copy_batch=True)

    def resolve(side_ds, hint, name):
        # probe ONLY the side whose hint is missing (each probe is a
        # limit-1 execution — the refcount-race hazard the hints avoid)
        if hint is not None:
            return dict(hint)
        s = side_ds.schema()
        if s is None:
            raise ValueError(
                f"hash_join: cannot infer the {name} side's schema "
                "(empty dataset) — pass left_schema/right_schema or "
                "materialize a typed empty block upstream")
        return {f.name: f.type for f in s.base_schema}

    sch_l = resolve(left, left_schema, "left")
    sch_r = resolve(right, right_schema, "right")
    int_names, sch_bkt = _schema_hints((sch_l, sch_r))
    # shared non-key int columns surface suffixed; _restore_ints must
    # know the suffixed names too or they stay null-pad float64
    # (round-3 ADVICE)
    int_names = set(int_names) | {
        f"{n}{right_suffix}" for n, t in sch_r.items()
        if n not in on_cols and n in sch_l and isinstance(t, pa.DataType)
        and pa.types.is_integer(t)}
    left_cols = list(sch_l)
    right_cols = list(sch_r)

    def _canon(t: pa.Table, c: str) -> np.ndarray:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # a representation CONSISTENT WITH MERGE EQUALITY: numerics
        # cast to float64 (pandas merge upcasts int-vs-float to float
        # equality; str(2) != str(2.0) would split merge-equal keys
        # across buckets), nulls filled (np.unique over None raises;
        # collisions are safe — the per-group merge decides)
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            return col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        return col.fill_null("").to_numpy(zero_copy_only=False)

    def bucketer(t: pa.Table) -> pa.Table:
        vals = _canon(t, on_cols[0])
        if len(on_cols) > 1:      # composite: \x1f-joined canonical tuple
            parts = [np.asarray(vals, dtype=str)]
            for c in on_cols[1:]:
                parts.append(np.asarray(_canon(t, c), dtype=str))
            vals = parts[0]
            for p in parts[1:]:
                vals = np.char.add(np.char.add(vals, "\x1f"), p)
        elif vals.dtype == np.float64:
            # hot numeric single-key path: vectorized splitmix64
            # (bucketing-invariant to values; md5 kept for strings)
            b = fast_numeric_bucket_of(vals, num_buckets)
            return t.append_column("bucket", pa.array(b, pa.int64()))
        b = stable_bucket_of(vals, num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    both = _union_tagged(
        left.map_batches(bucketer, batch_format="pyarrow",
                         zero_copy_batch=True),
        right.map_batches(bucketer, batch_format="pyarrow",
                          zero_copy_batch=True),
        schemas=sch_bkt)

    def merge(df: pd.DataFrame) -> pa.Table:
        l = df.loc[df["_side"] == "L", left_cols]
        r = df.loc[df["_side"] == "R", right_cols]
        pd_how = "outer" if how == "full" else how
        if how == "full":
            # pandas merge matches NaN == NaN; SQL null keys never do.
            # Split the null-key rows out and null-pad them unmatched.
            l_nn_mask = l[on_cols].notna().all(axis=1)
            r_nn_mask = r[on_cols].notna().all(axis=1)
            out = l[l_nn_mask].merge(r[r_nn_mask], on=on_cols,
                                     how="outer",
                                     suffixes=("", right_suffix))
            pads = []
            if (~l_nn_mask).any():
                pads.append(l[~l_nn_mask].merge(
                    r.head(0), on=on_cols, how="left",
                    suffixes=("", right_suffix)))
            if (~r_nn_mask).any():
                pads.append(l.head(0).merge(
                    r[~r_nn_mask], on=on_cols, how="right",
                    suffixes=("", right_suffix)))
            if pads:
                out = pd.concat([out, *pads], ignore_index=True)
        else:
            out = l.merge(r, on=on_cols, how=pd_how,
                          suffixes=("", right_suffix))
        # Arrow out so a zero-match group stays a TYPED empty block
        # (all-empty pandas blocks lose column names through to_pandas)
        return pa.Table.from_pandas(_restore_ints(out, int_names),
                                    preserve_index=False)

    return both.groupby("bucket").map_groups(merge, batch_format="pandas")


def interval_join(left, right, on: str, ts_col: str = "ts",
                  lower_us: int = 0, upper_us: int = 3_600_000_000,
                  num_buckets: int = 32, slab_us: int | None = None,
                  right_suffix: str = "_r", schemas=None):
    """Stream-stream INTERVAL join: emit (l, r) for every pair with
    equal ``on`` key and ``lower_us <= r.ts - l.ts <= upper_us`` — the
    structured-streaming two-stream correlation (Flink interval join /
    Spark stream-stream join with event-time constraint), expressed as
    a batch-replay Dataset pipeline.

    Partitioning is (key-bucket x time-slab), NOT key-only like
    asof/range_join: right rows land in the slab of their own ts;
    left rows are replicated into every slab their match window
    ``[ts+lower, ts+upper]`` overlaps (<= 2 copies when
    ``slab_us >= upper_us - lower_us``, the enforced default).  This is
    the batch image of the streaming engine's watermark bound — state
    per task is one slab's rows, so a single hot key (or the whole
    corpus on one key) still splits across time, and each (l, r) pair
    is discovered exactly once, in r's slab.

    Within a task the probe is fully vectorized: keys factorized to
    codes, composite ``code * span + (ts - base)`` sorted once, then a
    two-sided ``np.searchsorted`` per left row and a repeat/offset
    pair-expansion — no per-row Python, no per-key loop.

    ``slab_us`` trades per-task state against group granularity: the
    default (1 h, floored at the window width) suits short-history /
    near-realtime replays; a month-long batch replay at a 1 h slab
    makes hundreds of micro-groups per bucket whose per-group overhead
    dominates — size it like ``window_stats``' ``slab_windows``, so
    that slabs x num_buckets is a small multiple of the cluster's
    cores (e.g. span/8).

    Output: left's columns + right's non-key columns suffixed with
    ``right_suffix``.  Null keys never match (SQL semantics).
    """
    from .window_stats import (fast_numeric_bucket_of,
                                stable_bucket_of)

    if lower_us > upper_us:
        raise ValueError("interval_join: lower_us > upper_us")
    W = int(slab_us) if slab_us is not None else \
        max(upper_us - lower_us, 3_600_000_000)
    W = max(W, upper_us - lower_us, 1)

    left = _as_dataset(left)
    right = _as_dataset(right)

    def drop_null_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[on]))

    if schemas is not None:
        sch_l, sch_r = dict(schemas[0]), dict(schemas[1])
    else:
        sch_l = {f.name: f.type for f in left.schema().base_schema}
        sch_r = {f.name: f.type for f in right.schema().base_schema}
    r_renames = {c: f"{c}{right_suffix}" for c in sch_r if c != on}
    out_cols = list(sch_l) + [r_renames[c] for c in sch_r if c != on]
    int_names = ({n for n, t in sch_l.items()
                  if isinstance(t, pa.DataType) and pa.types.is_integer(t)}
                 | {r_renames[n] for n, t in sch_r.items() if n != on
                    and isinstance(t, pa.DataType)
                    and pa.types.is_integer(t)})
    ts_r = f"{ts_col}{right_suffix}"

    def bucket_of(t: pa.Table) -> np.ndarray:
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            vals = col.cast(pa.float64()).fill_null(0.0) \
                .to_numpy(zero_copy_only=False)
            return fast_numeric_bucket_of(vals, num_buckets)
        vals = col.fill_null("").to_numpy(zero_copy_only=False)
        return stable_bucket_of(vals, num_buckets)

    def _ts_us(col) -> np.ndarray:
        col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64()).to_numpy()

    def prep_left(t: pa.Table) -> pa.Table:
        t = drop_null_keys(t)
        ts = _ts_us(t[ts_col])
        b = bucket_of(t)
        s1 = (ts + lower_us) // W
        s2 = (ts + upper_us) // W
        gk1 = s1 * num_buckets + b
        t1 = t.append_column("_gk", pa.array(gk1, pa.int64()))
        extra = np.flatnonzero(s2 != s1)
        if len(extra):
            gk2 = s2[extra] * num_buckets + b[extra]
            t2 = t.take(extra).append_column(
                "_gk", pa.array(gk2, pa.int64()))
            t1 = pa.concat_tables([t1, t2])
        return t1

    def prep_right(t: pa.Table) -> pa.Table:
        t = drop_null_keys(t)
        for old, new in r_renames.items():
            t = t.rename_columns([new if c == old else c
                                  for c in t.column_names])
        ts = _ts_us(t[ts_r])
        gk = (ts // W) * num_buckets + bucket_of(t)
        return t.append_column("_gk", pa.array(gk, pa.int64()))

    sch_union = ({**sch_l, "_gk": pa.int64()},
                 {**{r_renames.get(c, c): t for c, t in sch_r.items()},
                  "_gk": pa.int64()})
    both = _union_tagged(
        left.map_batches(prep_left, batch_format="pyarrow",
                         zero_copy_batch=True),
        right.map_batches(prep_right, batch_format="pyarrow",
                          zero_copy_batch=True),
        schemas=sch_union)

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    out_types = {**{c: _pa_type(t) for c, t in sch_l.items()},
                 **{r_renames[c]: _pa_type(t) for c, t in sch_r.items()
                    if c != on}}
    empty_tbl = pa.table({c: pa.array([], type=out_types[c])
                          for c in out_cols})

    def probe(df: pd.DataFrame) -> pa.Table:
        l = df.loc[df["_side"] == "L", list(sch_l)]
        rc = [on] + [r_renames[c] for c in sch_r if c != on]
        r = df.loc[df["_side"] == "R", rc]
        if len(l) == 0 or len(r) == 0:
            return empty_tbl
        codes, _ = pd.factorize(pd.concat([l[on], r[on]],
                                          ignore_index=True))
        cl, cr = codes[:len(l)], codes[len(l):]
        tl = l[ts_col].astype("datetime64[us]").astype("int64").to_numpy() \
            if str(l[ts_col].dtype).startswith("datetime") \
            else l[ts_col].astype("int64").to_numpy()
        tr = r[ts_r].astype("datetime64[us]").astype("int64").to_numpy() \
            if str(r[ts_r].dtype).startswith("datetime") \
            else r[ts_r].astype("int64").to_numpy()
        base = min(tl.min() + lower_us, tr.min())
        span = int(max(tl.max() + upper_us, tr.max()) - base) + 2
        comp_r = cr.astype(np.int64) * span + (tr - base)
        order = np.argsort(comp_r, kind="stable")
        comp_r = comp_r[order]
        lo = cl.astype(np.int64) * span + \
            np.clip(tl + lower_us - base, 0, span - 1)
        hi = cl.astype(np.int64) * span + \
            np.clip(tl + upper_us - base, 0, span - 1)
        starts = np.searchsorted(comp_r, lo, side="left")
        ends = np.searchsorted(comp_r, hi, side="right")
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return empty_tbl
        l_idx = np.repeat(np.arange(len(l)), counts)
        offs = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts)
        r_idx = order[np.repeat(starts, counts) + offs]
        out = pd.concat(
            [l.iloc[l_idx].reset_index(drop=True),
             r.iloc[r_idx].drop(columns=[on]).reset_index(drop=True)],
            axis=1)[out_cols]
        return pa.Table.from_pandas(_restore_ints(out, int_names),
                                    preserve_index=False)

    return both.groupby("_gk").map_groups(probe, batch_format="pandas")


def cross_join(left, right, right_suffix: str = "_r",
               max_right_rows: int = 65536,
               max_out_per_chunk: int = 1 << 20):
    """Broadcast cross join (SQL CROSS JOIN): every left row × every
    right row. The right side must be SMALL — it is materialized once,
    ``ray.put`` into the object store, and read per actor (never
    re-shipped per batch); ``max_right_rows`` guards against a
    quadratic blow-up by refusing a big right side up front.

    Output size management: each task slices its left batch so one
    emitted chunk is ≤ ``max_out_per_chunk`` rows (a generator UDF —
    the streaming executor backpressures on chunks, not on the full
    batch × right product). Column-name collisions on the right get
    ``right_suffix``. No shuffle at any point.
    """
    import pandas as pd
    right_df = right.to_pandas() if hasattr(right, "to_pandas") else right
    right_df = pd.DataFrame(right_df)
    if len(right_df) > max_right_rows:
        raise ValueError(
            f"cross_join right side has {len(right_df)} rows > "
            f"max_right_rows={max_right_rows}; a big-big cross join is "
            "a deliberate refusal (quadratic output) — pre-filter or "
            "sample the right side")
    ref = ray.put(right_df)

    class Cross:
        def __init__(self):
            r = ray.get(ref).copy()
            self.n_right = len(r)
            self.right = r

        def __call__(self, df: pd.DataFrame):
            if len(df) == 0 or self.n_right == 0:
                yield df.head(0)
                return
            r = self.right.rename(columns={
                c: c + right_suffix if c in df.columns else c
                for c in self.right.columns})
            step = max(1, max_out_per_chunk // max(self.n_right, 1))
            for i in range(0, len(df), step):
                yield df.iloc[i:i + step].merge(r, how="cross")

    return left.map_batches(Cross, batch_format="pandas",
                            concurrency=(1, 8))
