"""SQL window functions over ordered per-key partitions — lag / lead /
row_number / running sum / rolling mean, the ``fn() OVER (PARTITION BY k
ORDER BY o ROWS ...)`` family.

Ray-Data shape: the engine-wide md5-bucket shuffle on the partition key
(many keys per bucket so groups stay bounded), then a per-bucket stable
sort + fully segment-vectorized pass in ``map_groups`` — no per-row
Python, no per-key loop. Every frame here is a ROWS frame ending at
CURRENT ROW (or a fixed offset), so each output row needs at most
``max(offset, frame_width)`` neighbours: positions, segment starts and
clamped frame bounds are all computed with ``np.arange`` / ``np.repeat``
/ cumsum arithmetic over the whole bucket at once.

PARTITIONING ASSUMPTION (100 TB): a key's whole ordered sequence lands
in one group, so group size is n/num_buckets — callers scale
``num_buckets`` with input size, and per-key length is bounded by real
per-entity activity (conversation turns, user events), not corpus size.
Because ROWS-frame lookback is bounded by ``max(lag k, lead k, rolling
w)``, an unbounded-key refinement is mechanical: split each key into
time slabs carrying ``maxlook`` overlap rows from the neighbouring slab
and drop the overlap's outputs after the scan (the interval_join /
window_stats slab discipline); not implemented because bucket scaling
suffices for keyed transcript/event data.

Null semantics: lag/lead beyond the partition edge yield null (NaN /
NaT / None — pandas ``take``-with-mask promotes int64 to float64,
matching a ``CAST(... AS DOUBLE)`` SQL oracle). cumsum / rolling_mean
use a bucket-wide cumulative sum, so a null in the value column poisons
every subsequent running/rolling output in its bucket — pre-fill or
filter nulls upstream when the value column is nullable (SQL skips
nulls in SUM/AVG; this operator deliberately does not pay a per-frame
null scan for data that is non-null by contract). Null partition keys
group together (one partition), matching SQL window-partition
semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .window_stats import stable_bucket_of

_UNARY = {"row_number", "rank", "dense_rank", "percent_rank",
          "cume_dist"}           # no value column (ties from order_by)
_KIND_COL_OUT = {"cumsum", "ntile", "first_value", "last_value"}


def _segments(df: pd.DataFrame, partition_by: list[str]):
    """(pos_in_segment, seg_start_index) for a frame already stably
    sorted by partition_by + order_by. Null keys compare equal to each
    other (pandas object '==' on None is False, so compare via a
    factorized code array which assigns nulls one code)."""
    n = len(df)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for c in partition_by:
        codes, _ = pd.factorize(df[c], use_na_sentinel=False)
        new[1:] |= codes[1:] != codes[:-1]
    starts = np.flatnonzero(new)                     # segment start rows
    seg_id = np.cumsum(new) - 1                      # 0-based segment id
    pos = np.arange(n) - starts[seg_id]              # 0-based within seg
    ends = np.append(starts[1:], n)                  # exclusive, per seg
    return pos, starts[seg_id], ends[seg_id]


def _shift_take(vals: pd.Series, idx: np.ndarray,
                valid: np.ndarray) -> pd.Series:
    """Positional take with out-of-frame rows nulled — pandas handles
    the dtype promotion (int64→float64 + NaN, datetime64→NaT)."""
    out = vals.take(np.clip(idx, 0, len(vals) - 1)).reset_index(drop=True)
    return out.where(pd.Series(valid))


def window_functions(ds, partition_by: list[str], order_by: list[str],
                     specs: list[tuple], num_buckets: int = 64):
    """Append window-function columns to every input row.

    ``specs`` entries (out = new column name):
      ``("rank", out)``                  — 1-based with gaps; ties =
        equal ``order_by`` keys (RANK() OVER)
      ``("dense_rank", out)``            — 1-based, no gaps
      ``("ntile", b, out)``              — NTILE(b): first len%b tiles
        take the extra row
      ``("percent_rank", out)``          — (rank-1)/(len-1), 0.0 at len 1
      ``("cume_dist", out)``             — rows with key <= current / len
      ``("first_value", col, out)``      — over the FULL partition frame
      ``("last_value", col, out)``       — (UNBOUNDED..UNBOUNDED)
      ``("row_number", out)``            — 1-based, ties impossible when
                                           order_by is a unique key
      ``("lag",  col, k, out)``          — value k rows back in-partition
      ``("lead", col, k, out)``          — value k rows ahead
      ``("cumsum", col, out)``           — SUM(col) ROWS UNBOUNDED
                                           PRECEDING .. CURRENT ROW
      ``("rolling_mean", col, w, out)``  — AVG(col) ROWS w-1 PRECEDING
                                           .. CURRENT ROW (shorter at
                                           the partition head, like SQL)
      ``("range_sum",  col, r_us, out)`` — SUM(col) RANGE r_us µs
        PRECEDING..CURRENT over the FIRST order_by column (event-time
        trailing window, e.g. 7-day spend); ties at one ts share the
        frame (SQL RANGE semantics)
      ``("range_mean", col, r_us, out)`` — AVG over the same frame
      ``("range_count", col, r_us, out)`` — COUNT(col) over the same
        frame (non-null rows)
      ``("rolling_std", col, w, out)``   — STDDEV_SAMP over the same
                                           frame (NaN at frame length 1)

    Returns a Ray Dataset of the input columns + one column per spec;
    all input rows are preserved (the ``bucket`` shuffle column is
    dropped). Integer cumsum stays exact int64; rolling_mean divides an
    exact sum (int64 when the input is integral) by the actual frame
    length, so a ``round(x, 6)`` comparison against the SQL twin is
    bit-stable.
    """
    for s in specs:
        want = 2 if s[0] in _UNARY else \
            (3 if s[0] in _KIND_COL_OUT else 4)
        if len(s) != want:
            raise ValueError(f"bad spec {s!r}: expected {want} fields")

    key0 = partition_by[0]

    def bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_of(t[key0].to_numpy(zero_copy_only=False),
                             num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(partition_by + order_by, kind="stable")
                .reset_index(drop=True))
        df = df.drop(columns=["bucket"])
        n = len(df)
        if n == 0:
            for s in specs:
                df[s[-1]] = pd.Series(dtype=np.float64)
            return df
        pos, seg_start, seg_end = _segments(df, partition_by)
        ar = np.arange(n)
        order_new = None     # order-key change marks, lazily computed

        def _order_new() -> np.ndarray:
            nonlocal order_new
            if order_new is None:
                chg = np.zeros(n, dtype=bool)
                chg[0] = True
                for c in order_by:
                    codes, _ = pd.factorize(df[c], use_na_sentinel=False)
                    chg[1:] |= codes[1:] != codes[:-1]
                chg |= pos == 0              # every segment start is new
                order_new = chg
            return order_new

        for s in specs:
            kind, out = s[0], s[-1]
            if kind == "row_number":
                df[out] = (pos + 1).astype(np.int64)
                continue
            if kind == "rank":
                # 1-based with gaps: ties (equal order_by keys) share
                # the rank of the tie group's first row
                last_new = np.maximum.accumulate(
                    np.where(_order_new(), ar, -1))
                df[out] = (last_new - seg_start + 1).astype(np.int64)
                continue
            if kind == "percent_rank":
                # (rank - 1) / (len - 1); 0.0 for length-1 partitions
                last_new = np.maximum.accumulate(
                    np.where(_order_new(), ar, -1))
                rk = (last_new - seg_start).astype(np.float64)
                seg_len = (seg_end - seg_start).astype(np.float64)
                df[out] = np.round(
                    np.where(seg_len > 1, rk / np.maximum(seg_len - 1, 1),
                             0.0), 6)
                continue
            if kind == "cume_dist":
                # (# rows with order key <= current) / len = the tie
                # group's end (exclusive) rebased to the segment
                chg = _order_new()
                grp_start = np.maximum.accumulate(np.where(chg, ar, -1))
                # first change STRICTLY after i, capped at seg_end
                nxt_at_or_after = np.minimum.accumulate(
                    np.where(chg, ar, n)[::-1])[::-1]
                nxt_strict = np.append(nxt_at_or_after[1:], n)
                grp_end = np.minimum(nxt_strict[grp_start], seg_end)
                seg_len = (seg_end - seg_start).astype(np.float64)
                df[out] = np.round((grp_end - seg_start) / seg_len, 6)
                continue
            if kind == "dense_rank":
                cs_new = np.cumsum(_order_new())
                df[out] = (cs_new - cs_new[seg_start] + 1).astype(np.int64)
                continue
            if kind == "ntile":
                # SQL NTILE(b): the first (len % b) tiles get one extra
                # row; tiles never differ in size by more than 1
                b = int(s[1])
                seg_len = seg_end - seg_start
                q, r = seg_len // b, seg_len % b
                fat = (q + 1) * r                # rows in the fat tiles
                in_fat = pos < fat
                safe_q = np.maximum(q, 1)        # len < b: q=0, all fat
                df[out] = np.where(
                    in_fat, pos // np.maximum(q + 1, 1),
                    r + (pos - fat) // safe_q).astype(np.int64) + 1
                continue
            col = s[1]
            vals = df[col]
            if kind == "first_value":
                # over the FULL partition frame (ROWS BETWEEN UNBOUNDED
                # PRECEDING AND UNBOUNDED FOLLOWING)
                df[out] = vals.take(seg_start).reset_index(drop=True)
            elif kind == "last_value":
                df[out] = vals.take(seg_end - 1).reset_index(drop=True)
            elif kind == "lag":
                k = int(s[2])
                df[out] = _shift_take(vals, ar - k, pos >= k)
            elif kind == "lead":
                k = int(s[2])
                df[out] = _shift_take(vals, ar + k, ar + k < seg_end)
            elif kind == "cumsum":
                v = vals.to_numpy()
                if np.issubdtype(v.dtype, np.integer):
                    cs = np.cumsum(v, dtype=np.int64)
                else:
                    cs = np.cumsum(v.astype(np.float64))
                base = np.where(seg_start > 0, cs[seg_start - 1], 0)
                df[out] = cs - base
            elif kind == "rolling_mean":
                w = int(s[2])
                v = vals.to_numpy()
                integral = np.issubdtype(v.dtype, np.integer)
                cs = np.cumsum(v, dtype=np.int64 if integral
                               else np.float64)
                lower = np.maximum(ar - w + 1, seg_start)
                below = np.where(lower > 0, cs[lower - 1], 0)
                length = ar - lower + 1
                df[out] = np.round((cs - below) / length, 6)
            elif kind in ("range_sum", "range_mean", "range_count"):
                r_us = int(s[2])
                tcol = df[order_by[0]]
                ts = (tcol.astype("datetime64[us]").astype("int64")
                      if str(tcol.dtype).startswith("datetime")
                      else tcol.astype("int64")).to_numpy()
                # frame per row = rows of the SAME segment with
                # ts in [row.ts - r_us, row.ts]; segments are
                # contiguous and ts-sorted, so one composite
                # searchsorted finds every lower bound at once.
                # DENSE segment rank x PER-SEGMENT-rebased ts keeps the
                # composite small (a raw row-index x global-span product
                # overflows int64 near ~3e5 rows x 1-year-us spans)
                seg_start = seg_start.astype(np.int64)
                dense = np.zeros(len(ts), dtype=np.int64)
                if len(ts) > 1:
                    dense[1:] = np.cumsum(seg_start[1:] != seg_start[:-1])
                rel = ts - ts[seg_start]             # >= 0, per segment
                block = int(rel.max()) + r_us + 2 if len(rel) else 2
                nseg = int(dense[-1]) + 1 if len(dense) else 0
                if nseg and block < (1 << 62) // max(nseg, 1):
                    comp = dense * block + rel
                    lower = np.searchsorted(
                        comp, dense * block + np.maximum(rel - r_us, 0),
                        side="left")
                    upper = np.searchsorted(comp, comp,
                                            side="right") - 1
                else:
                    # pathological span x segment-count: per-segment
                    # searchsorted (bounded by segments per bucket)
                    lower = np.empty(len(ts), dtype=np.int64)
                    upper = np.empty(len(ts), dtype=np.int64)
                    starts = np.flatnonzero(np.concatenate(
                        [[True], seg_start[1:] != seg_start[:-1]]))
                    ends = np.concatenate([starts[1:], [len(ts)]])
                    for a, b in zip(starts, ends):
                        seg_ts = ts[a:b]
                        lower[a:b] = a + np.searchsorted(
                            seg_ts, seg_ts - r_us, side="left")
                        upper[a:b] = a + np.searchsorted(
                            seg_ts, seg_ts, side="right") - 1
                # RANGE includes ALL ties at the current ts: the frame's
                # upper bound is the last row with this (segment, ts)
                notna = vals.notna().to_numpy()
                v = vals.fillna(0).to_numpy().astype(np.float64)
                cs = np.concatenate([[0.0], np.cumsum(v)])
                cn = np.concatenate([[0], np.cumsum(notna)])
                sx = cs[upper + 1] - cs[lower]
                cnt = cn[upper + 1] - cn[lower]
                if kind == "range_sum":
                    df[out] = np.where(cnt > 0, sx, np.nan)
                elif kind == "range_count":
                    df[out] = cnt.astype(np.int64)
                else:
                    df[out] = np.round(
                        np.where(cnt > 0, sx / np.maximum(cnt, 1),
                                 np.nan), 6)
            elif kind == "rolling_std":
                # STDDEV_SAMP over ROWS w-1 PRECEDING..CURRENT (null at
                # frame length 1, like SQL), via cumsums of x and x^2
                w = int(s[2])
                v = vals.to_numpy().astype(np.float64)
                cs = np.cumsum(v)
                cs2 = np.cumsum(v * v)
                lower = np.maximum(ar - w + 1, seg_start)
                below = np.where(lower > 0, cs[lower - 1], 0.0)
                below2 = np.where(lower > 0, cs2[lower - 1], 0.0)
                length = (ar - lower + 1).astype(np.float64)
                sx, sx2 = cs - below, cs2 - below2
                var = np.maximum(sx2 - sx * sx / length, 0.0) \
                    / np.maximum(length - 1, 1)
                std = np.sqrt(var)
                df[out] = np.round(np.where(length > 1, std, np.nan), 6)
            else:
                raise ValueError(f"unknown window function {kind!r}")
        return df

    return (ds.map_batches(bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bucket")
              .map_groups(scan, batch_format="pandas"))
