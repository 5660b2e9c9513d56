"""CEP sequence-pattern matching — the classic complex-event-processing
operator (MATCH_RECOGNIZE / "A followed by B followed by C within T")
over a keyed event stream.

Semantics: strict contiguity per key — the pattern matches at position i
of the key's (ts, id)-ordered event sequence iff the next ``m`` events'
types equal the pattern and the span from first to last matched event is
≤ ``within_us``. Strict contiguity keeps the operator a pure vectorized
shift-compare (no backtracking automaton) AND makes it exactly
expressible as a ``lead()`` window-function oracle; skip-till-next-match
variants can be composed by pre-filtering the stream to the pattern's
alphabet (``pc.is_in``) before matching.

Ray-Data shape: one hash-bucket shuffle on the key (the engine-wide
md5-slot convention, many keys per bucket so groups stay bounded), then
a per-bucket sort + segment-vectorized scan in ``map_groups`` — the same
partitioning discipline as the windowed-stats core, reused because the
reference's windows and CEP patterns share the "ordered replay per key"
execution shape (SURVEY §2.6 St1/O1).

PARTITIONING ASSUMPTION (100 TB): a key's whole event sequence must
land in one group (matches may straddle any time split), so groups are
keyed by bucket only and a group's size is n/num_buckets — callers must
scale ``num_buckets`` with input size (it is a free parameter; per-key
sequences are never split, and per-key length is bounded by real
conversation/user activity, not corpus size). A time-slab refinement à
la ``add_bucket_slab`` would need (pattern_len-1)-event overlap stitching
at slab boundaries; not implemented because bucket scaling suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .window_stats import stable_bucket_of


def adjacent_delays(ds, key_col: str, type_col: str, ts_col: str,
                    id_col: str, from_type: str, to_type: str,
                    num_buckets: int = 64):
    """Turn-taking latency: for every ADJACENT (from_type → to_type)
    pair in each key's (ts, id)-ordered sequence, the time delta —
    aggregated per key to (n_pairs, mean_delay_us, max_delay_us).

    The transcript-payload use case is user→assistant response latency
    per conversation. Same partitioning/scan shape as match_sequence
    (one md5-bucket shuffle, vectorized shift-compare), plus a per-key
    segment aggregation of the matched deltas. Delay sums are exact
    int64, so the mean is reproducible bit-for-bit by a lead() SQL
    oracle (both sides divide the same exact sum).
    """

    def bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_of(t[key_col].to_numpy(zero_copy_only=False),
                             num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col],
                            kind="stable").reset_index(drop=True)
        empty = empty_delays(key_col, df[key_col].dtype)
        if len(df) < 2:
            return empty
        types = df[type_col].to_numpy()
        keys = df[key_col].to_numpy()
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        ok = ((types[:-1] == from_type) & (types[1:] == to_type)
              & (keys[:-1] == keys[1:]))
        idx = np.flatnonzero(ok)
        if not len(idx):
            return empty
        delays = ts[idx + 1] - ts[idx]
        pk = keys[idx]
        uniq, inv = np.unique(pk.astype(object), return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # int64 accumulation (bincount weights= would go through float64
        # and lose exactness past 2^53 us, breaking oracle bit-equality)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, delays)
        mx = np.zeros(len(uniq), np.int64)
        np.maximum.at(mx, inv, delays)
        return pd.DataFrame({
            key_col: uniq, "n_pairs": n,
            "mean_delay_us": np.round(tot / n, 6),
            "max_delay_us": mx})

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bucket")
              .map_groups(scan, batch_format="pandas"))


def empty_delays(key_col: str, key_dtype="object") -> pd.DataFrame:
    """Typed zero-row adjacent_delays result — single schema definition
    (mirrors empty_matches; reused by callers guarding the all-empty
    ``to_pandas()`` case)."""
    return pd.DataFrame({
        key_col: pd.Series(dtype=key_dtype),
        "n_pairs": pd.Series(dtype=np.int64),
        "mean_delay_us": pd.Series(dtype=np.float64),
        "max_delay_us": pd.Series(dtype=np.int64)})


def empty_matches(key_col: str, key_dtype="int64") -> pd.DataFrame:
    """Typed zero-row result frame — the single definition of the
    operator's output schema (reused by callers guarding the all-empty
    ``to_pandas()`` case, which loses column names)."""
    return pd.DataFrame({
        key_col: pd.Series(dtype=key_dtype),
        "start_event_id": pd.Series(dtype=np.int64),
        "end_event_id": pd.Series(dtype=np.int64),
        "start_ts": pd.Series(dtype="datetime64[us]")})


def match_sequence(ds, key_col: str, type_col: str, ts_col: str,
                   id_col: str, pattern: list[str], within_us: int,
                   num_buckets: int = 64):
    """Emit one row per pattern occurrence: (key, start id/ts, end id).

    ``pattern`` is the ordered list of required ``type_col`` values.
    Events are ordered by (ts, id) within each key; ties are therefore
    deterministic. Returns columns: key_col, start_event_id,
    end_event_id, start_ts.
    """
    if len(pattern) < 1:
        raise ValueError("pattern must have at least one element")

    def bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_of(t[key_col].to_numpy(zero_copy_only=False),
                             num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        return scan_matches(df, key_col, type_col, ts_col, id_col,
                            pattern, within_us)

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bucket")
              .map_groups(scan, batch_format="pandas"))


def scan_matches(df: pd.DataFrame, key_col: str, type_col: str,
                 ts_col: str, id_col: str, pattern: list[str],
                 within_us: int) -> pd.DataFrame:
    """The pure per-group scan body of :func:`match_sequence` (module
    scope so the hypothesis property test drives the REAL kernel)."""
    m = len(pattern)
    df = df.sort_values([key_col, ts_col, id_col],
                        kind="stable").reset_index(drop=True)
    n = len(df)
    empty = empty_matches(key_col, df[key_col].dtype)
    if n < m:
        return empty
    types = df[type_col].to_numpy()
    keys = df[key_col].to_numpy()
    ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
    ids = df[id_col].to_numpy()
    lim = n - m + 1
    ok = types[:lim] == pattern[0]
    for j in range(1, m):
        ok &= types[j:lim + j] == pattern[j]
    # whole match inside one key's segment: first and last key equal
    # (the frame is key-sorted, so equality implies containment)
    ok &= keys[:lim] == keys[m - 1:]
    ok &= ts[m - 1:] - ts[:lim] <= within_us
    idx = np.flatnonzero(ok)
    if not len(idx):
        return empty
    return pd.DataFrame({
        key_col: keys[idx],
        "start_event_id": ids[idx].astype(np.int64),
        "end_event_id": ids[idx + m - 1].astype(np.int64),
        "start_ts": ts[idx].astype("datetime64[us]")})


def detect_anomalies(ds, key_col: str, order_col: str, value_col: str,
                     trailing: int = 8, k_sigma: float = 3.0,
                     num_buckets: int = 64):
    """Rolling z-score anomaly detection per key — "alert when a
    conversation's metric departs from its own trailing baseline" (the
    streaming-monitoring composition of the window-function machinery).

    Per key, ordered by ``order_col``: baseline = mean/stddev_samp of
    the PREVIOUS ``trailing`` values (the current row is excluded — an
    outlier must not dilute its own baseline); z = (x − mean) / std;
    rows with |z| > k_sigma flag ``is_anomaly``. The first row of a key
    and any frame with fewer than 2 prior values (std undefined) never
    flag. Same bucket-shuffle + segment-vectorized shape as
    match_sequence; one exchange, no per-row Python.

    Returns the input rows + (baseline_mean, baseline_std, zscore,
    is_anomaly)."""
    ds = ds.map_batches(
        lambda t: t.append_column("bucket", pa.array(stable_bucket_of(
            t[key_col].to_numpy(zero_copy_only=False), num_buckets),
            pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values([key_col, order_col], kind="stable")
                .reset_index(drop=True).drop(columns=["bucket"]))
        n = len(df)
        if n == 0:
            for c in ("baseline_mean", "baseline_std", "zscore"):
                df[c] = pd.Series(dtype=np.float64)
            df["is_anomaly"] = pd.Series(dtype=bool)
            return df
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        seg_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        ar = np.arange(n)
        v = df[value_col].to_numpy().astype(np.float64)
        cs = np.concatenate(([0.0], np.cumsum(v)))
        cs2 = np.concatenate(([0.0], np.cumsum(v * v)))
        # frame = [lower, ar): previous `trailing` rows, current excluded
        lower = np.maximum(ar - trailing, seg_start)
        length = (ar - lower).astype(np.float64)
        sx = cs[ar] - cs[lower]
        sx2 = cs2[ar] - cs2[lower]
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = sx / length
            var = np.maximum(sx2 - sx * sx / length, 0.0) \
                / np.maximum(length - 1, 1)
            std = np.sqrt(var)
            z = (v - mean) / std
        ok = (length >= 2) & (std > 0)
        df["baseline_mean"] = np.where(length >= 1, mean, np.nan)
        df["baseline_std"] = np.where(length >= 2, std, np.nan)
        df["zscore"] = np.where(ok, z, np.nan)
        df["is_anomaly"] = ok & (np.abs(np.where(ok, z, 0.0)) > k_sigma)
        return df

    return ds.groupby("bucket").map_groups(scan, batch_format="pandas")
