"""Stateful stream-stream interval join — the "stateful join" component
of the structured-streaming engine (north rule), the streaming twin of
the batch joins in ``stages/joins.py``.

Semantics (Flink interval join / Spark stream-stream join with
watermark-bounded state): rows from a LEFT and a RIGHT stream, both
keyed by ``conv_id`` with event-time ``ts``, join when

    lower_us  <=  right.ts - left.ts  <=  upper_us

The transcript-payload use case: left = user turns, right = assistant
turns, ``[0, upper]`` → every (request, response-within-horizon) pair —
the interval generalization of ``cep.adjacent_delays`` (which keeps only
ADJACENT pairs).

State/bounds (the part a batch join doesn't need):

- Both sides are buffered per conv_id; every buffered entry carries an
  explicit purge deadline derived from the watermark algebra. A future
  row survives lateness only if ``ts >= watermark``, so a LEFT entry is
  dead once ``left.ts + upper_us < watermark`` (no future right can
  land in its band) and a RIGHT entry once
  ``right.ts - lower_us < watermark``. Purging is driven by one global
  heap — state is bounded by rows inside the join horizon
  (|upper - lower| + lateness), NEVER by stream length (pytest-gated
  flat-buffer soak).
- ``how="left"``: a purged-unmatched LEFT entry emits exactly once with
  the sentinel right (right_uid = -1, delay_us = -1) — int64-stable
  columns so the DuckDB twin is a COALESCE left join.
- Late rows (ts < watermark) drop before any state insert; exact
  (uid, ts) dedup per side with the engine's amortized watermark prune.
- ``snapshot``/``restore`` round-trip the whole state (same contract as
  StreamEngine; kill-and-resume == fresh gated in tests).

Execution: ``stateful_join_run`` replays the merged tagged log through
one ``StreamJoiner`` per conv-hash bucket inside ``map_groups`` — the
identical single-shuffle shape as ``runner.stateful_window_run``; the
joiner itself is also pluggable into raw partition actors.
"""

from __future__ import annotations

import heapq
import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa


@dataclass(frozen=True)
class JoinConfig:
    lower_us: int                     # band: lower <= right.ts - left.ts
    upper_us: int                     # ... <= upper (inclusive both ends)
    lateness_us: int = 0
    how: str = "inner"                # inner | left
    carry: tuple = ()                 # extra columns kept from BOTH sides

    def __post_init__(self):
        if self.lower_us > self.upper_us:
            raise ValueError("lower_us > upper_us")
        if self.how not in ("inner", "left"):
            raise ValueError(f"how={self.how!r} (inner | left)")


@dataclass
class JoinMetrics:
    rows_left: int = 0
    rows_right: int = 0
    matches: int = 0
    late_dropped: int = 0
    dup_dropped: int = 0
    purged_left: int = 0
    purged_right: int = 0
    unmatched_left: int = 0
    buf_peak: int = 0

    def as_dict(self) -> dict:
        return dict(self.__dict__)


class StreamJoiner:
    """One partition's interval-join state machine over a MERGED log:
    rows carry ``side`` (0 = left, 1 = right) plus conv_id/turn_uid/ts
    and any ``cfg.carry`` columns. ``process_rows``/``flush`` RETURN
    emitted rows; no emitted history is kept."""

    def __init__(self, cfg: JoinConfig, partition_id: int = 0):
        self.cfg = cfg
        self.partition_id = partition_id
        self.watermark = -(1 << 62)
        self.max_ts = -(1 << 62)
        self._eid = 0
        # bufs[side][conv] = {eid: [ts, uid, carry_tuple, matched]}
        self.bufs: list[dict] = [{}, {}]
        # (deadline, side, conv, eid) — one global purge heap
        self.purge_heap: list[tuple] = []
        # exact dedup per side per conv: {(uid, ts), ...}
        self.seen: list[dict] = [{}, {}]
        self._seen_prune_at: list[dict] = [{}, {}]
        self.metrics = JoinMetrics()

    # -- dedup bound (same algebra as StreamEngine._prune_seen) ------------

    def _prune_seen(self, side: int, conv: str, s: set) -> set:
        kept = {e for e in s if e[1] >= self.watermark}
        self.seen[side][conv] = kept
        self._seen_prune_at[side][conv] = max(1024, 2 * len(kept))
        return kept

    # -- ingest -------------------------------------------------------------

    def process_rows(self, rows: pd.DataFrame) -> list[dict]:
        cfg = self.cfg
        conv_a = rows["conv_id"].to_numpy()
        side_a = rows["side"].to_numpy()
        ts_a = rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid_a = rows["turn_uid"].to_numpy()
        carry_a = [rows[c].to_numpy() for c in cfg.carry]
        out: list[dict] = []
        for i in range(len(rows)):
            ts = int(ts_a[i])
            side = int(side_a[i])
            if side == 0:
                self.metrics.rows_left += 1
            else:
                self.metrics.rows_right += 1
            if ts < self.watermark:
                self.metrics.late_dropped += 1
                continue
            conv = str(conv_a[i])
            uid = int(uid_a[i])
            seen = self.seen[side].setdefault(conv, set())
            key = (uid, ts)
            if key in seen:
                self.metrics.dup_dropped += 1
                continue
            seen.add(key)
            if len(seen) >= self._seen_prune_at[side].get(conv, 1024):
                seen = self._prune_seen(side, conv, seen)
            carry = tuple("" if v is None or v != v else str(v)
                          for v in (a[i] for a in carry_a))

            # probe the OTHER side's buffer for band partners
            other = self.bufs[1 - side].get(conv)
            if other:
                if side == 0:       # new left: right.ts in [ts+lo, ts+hi]
                    lo, hi = ts + cfg.lower_us, ts + cfg.upper_us
                else:               # new right: left.ts in [ts-hi, ts-lo]
                    lo, hi = ts - cfg.upper_us, ts - cfg.lower_us
                hits = [e for e in other.values() if lo <= e[0] <= hi]
                hits.sort(key=lambda e: (e[0], e[1]))
                for e in hits:
                    self.metrics.matches += 1
                    e[3] = True
                    if side == 0:
                        out.append(self._pair(conv, ts, uid, carry,
                                              e[0], e[1], e[2]))
                    else:
                        out.append(self._pair(conv, e[0], e[1], e[2],
                                              ts, uid, carry))

            # buffer the new row with its purge deadline
            ent = [ts, uid, carry, side == 1]   # right rows never re-emit
            eid = self._eid
            self._eid += 1
            self.bufs[side].setdefault(conv, {})[eid] = ent
            deadline = (ts + cfg.upper_us) if side == 0 \
                else (ts - cfg.lower_us)
            heapq.heappush(self.purge_heap, (deadline, side, conv, eid))
            n_buf = len(self.purge_heap)
            if n_buf > self.metrics.buf_peak:
                self.metrics.buf_peak = n_buf

            if ts > self.max_ts:
                self.max_ts = ts
                self.watermark = ts - cfg.lateness_us
                self._purge(out)
        return out

    def _pair(self, conv, lts, luid, lcarry, rts, ruid, rcarry) -> dict:
        row = {"conv_id": conv, "left_uid": luid, "left_ts": lts,
               "right_uid": ruid, "right_ts": rts, "delay_us": rts - lts}
        for j, c in enumerate(self.cfg.carry):
            row[f"left_{c}"] = lcarry[j]
            row[f"right_{c}"] = rcarry[j]
        return row

    def _unmatched(self, conv, ent) -> dict:
        ts, uid, carry, _ = ent
        row = {"conv_id": conv, "left_uid": uid, "left_ts": ts,
               "right_uid": -1, "right_ts": ts, "delay_us": -1}
        for j, c in enumerate(self.cfg.carry):
            row[f"left_{c}"] = carry[j]
            row[f"right_{c}"] = ""
        return row

    def _purge(self, out: list[dict]):
        h = self.purge_heap
        while h and h[0][0] < self.watermark:
            _, side, conv, eid = heapq.heappop(h)
            bucket = self.bufs[side].get(conv)
            ent = None if bucket is None else bucket.pop(eid, None)
            if ent is None:
                continue
            if side == 0:
                self.metrics.purged_left += 1
                if self.cfg.how == "left" and not ent[3]:
                    self.metrics.unmatched_left += 1
                    out.append(self._unmatched(conv, ent))
            else:
                self.metrics.purged_right += 1
            if not bucket:
                del self.bufs[side][conv]

    def flush(self) -> list[dict]:
        """End of log: advance the watermark past everything and drain."""
        out: list[dict] = []
        self.watermark = 1 << 62
        self._purge(out)
        return out

    def buffered(self) -> int:
        return sum(len(b) for side in self.bufs for b in side.values())

    # -- checkpoint ---------------------------------------------------------

    def snapshot(self) -> bytes:
        return pickle.dumps({
            "cfg": self.cfg, "partition_id": self.partition_id,
            "watermark": self.watermark, "max_ts": self.max_ts,
            "eid": self._eid, "bufs": self.bufs,
            "purge_heap": self.purge_heap, "seen": self.seen,
            "seen_prune_at": self._seen_prune_at, "metrics": self.metrics,
        })

    @classmethod
    def restore(cls, blob: bytes) -> "StreamJoiner":
        d = pickle.loads(blob)
        j = cls(d["cfg"], d["partition_id"])
        j.watermark, j.max_ts = d["watermark"], d["max_ts"]
        j._eid = d["eid"]
        j.bufs, j.purge_heap = d["bufs"], d["purge_heap"]
        j.seen, j._seen_prune_at = d["seen"], d["seen_prune_at"]
        j.metrics = d["metrics"]
        return j


def joined_to_frame(rows: list[dict], carry: tuple = ()) -> pd.DataFrame:
    """Stable typed frame for emitted join rows (ts columns back to
    datetime64[us]; int64 uids/delay survive the empty case)."""
    cols = {"conv_id": "object", "left_uid": np.int64,
            "left_ts": "datetime64[us]", "right_uid": np.int64,
            "right_ts": "datetime64[us]", "delay_us": np.int64}
    for c in carry:
        cols[f"left_{c}"] = "object"
        cols[f"right_{c}"] = "object"
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    df = pd.DataFrame(rows)
    for c in ("left_ts", "right_ts"):
        df[c] = df[c].astype("int64").astype("datetime64[us]")
    for c in ("left_uid", "right_uid", "delay_us"):
        df[c] = df[c].astype(np.int64)
    return df[list(cols)]


def _join_actor_cls():
    """JoinPartitionActor is defined lazily so importing this module
    never touches ray.remote (driver-contract: no Ray at import)."""
    import ray

    from ..sinks import ExactlyOnceSink

    @ray.remote
    class JoinPartitionActor:
        """One partition's StreamJoiner + exactly-once sink — the join
        twin of runner.PartitionActor (same checkpoint protocol:
        (rows, snapshot, offset) commit atomically; resume restores the
        last committed state and skips the consumed prefix)."""

        def __init__(self, out_dir: str, cfg: JoinConfig, pid: int,
                     resume: bool):
            self.sink = ExactlyOnceSink(out_dir, pid)
            self.cfg = cfg
            self.seq, self.consumed, snap = (self.sink.resume_point()
                                             if resume else (0, 0, None))
            self.joiner = (StreamJoiner.restore(snap) if snap
                           else StreamJoiner(cfg, pid))
            self.pending: list[dict] = []

        def consumed_rows(self) -> int:
            return self.consumed

        def process(self, df: pd.DataFrame, n_input_rows: int) -> int:
            self.pending.extend(self.joiner.process_rows(df))
            self.consumed += n_input_rows
            return len(self.pending)

        def checkpoint(self) -> int:
            rows = joined_to_frame(self.pending, self.cfg.carry)
            self.sink.commit_interval(self.seq, rows,
                                      self.joiner.snapshot(),
                                      self.consumed,
                                      self.joiner.metrics.as_dict())
            self.pending = []
            self.seq += 1
            return self.seq

        def finish(self) -> dict:
            self.pending.extend(self.joiner.flush())
            self.checkpoint()
            self.sink.mark_done()
            return self.joiner.metrics.as_dict()

    return JoinPartitionActor


class StreamingJoinJob:
    """Streaming interval join over a replayable merged log (rows carry
    ``side``); P partition actors route by conv_id hash — the
    checkpointed/exactly-once execution of StreamJoiner (the Dataset
    path above is the batch-replay execution of the same machine)."""

    def __init__(self, out_dir: str, cfg: JoinConfig,
                 num_partitions: int = 4, resume: bool = False):
        import ray
        actor_cls = _join_actor_cls()
        self.out_dir = out_dir
        self.cfg = cfg
        self.P = num_partitions
        self.actors = [actor_cls.remote(out_dir, cfg, p, resume)
                       for p in range(self.P)]
        self.start_offsets = ray.get(
            [a.consumed_rows.remote() for a in self.actors])

    def run(self, log: pd.DataFrame, batch_rows: int = 4096,
            checkpoint_every: int = 4,
            crash_after_batches: int | None = None):
        import zlib

        import ray
        conv = log["conv_id"].astype(str).to_numpy()
        part = np.asarray([zlib.crc32(c.encode()) % self.P for c in conv])
        n = len(log)
        consumed = [0] * self.P
        batches_fed = 0
        for lo in range(0, n, batch_rows):
            hi = min(lo + batch_rows, n)
            chunk = log.iloc[lo:hi]
            cpart = part[lo:hi]
            futs = []
            for p in range(self.P):
                sub = chunk[cpart == p]
                consumed[p] += hi - lo
                if consumed[p] <= self.start_offsets[p]:
                    continue
                futs.append(self.actors[p].process.remote(sub, hi - lo))
            ray.get(futs)
            batches_fed += 1
            if crash_after_batches is not None and \
                    batches_fed >= crash_after_batches:
                return None
            if batches_fed % checkpoint_every == 0:
                import ray as _r
                _r.get([a.checkpoint.remote() for a in self.actors])
        import ray as _r
        return _r.get([a.finish.remote() for a in self.actors])

    def output(self) -> pd.DataFrame:
        from ..sinks import read_output
        return read_output(self.out_dir)


def stateful_join_run(ds_left, ds_right, cfg: JoinConfig,
                      num_buckets: int = 64):
    """Dataset path: tag sides, union, ONE conv-hash bucket shuffle, then
    per-bucket (ts, side, uid)-ordered replay through a StreamJoiner —
    identical partitioning shape to ``runner.stateful_window_run``.
    Per-task state is bounded by the join horizon, not bucket size."""
    from ..stages.window_stats import stable_bucket_of

    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            keep = ["conv_id", "turn_uid", "ts", *cfg.carry]
            t = t.select([c for c in keep if c in t.column_names])
            for c in keep:
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(len(t), pa.string()))
            b = stable_bucket_of(t["conv_id"].to_numpy(zero_copy_only=False),
                                 num_buckets)
            t = t.append_column("side", pa.array([side] * len(t), pa.int8()))
            return t.append_column("bucket", pa.array(b, pa.int64()))
        return _t

    both = ds_left.map_batches(tag(0), batch_format="pyarrow",
                               zero_copy_batch=True) \
        .union(ds_right.map_batches(tag(1), batch_format="pyarrow",
                                    zero_copy_batch=True))

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "side", "turn_uid"],
                            kind="stable").reset_index(drop=True)
        j = StreamJoiner(cfg)
        rows = j.process_rows(df)
        rows.extend(j.flush())
        return joined_to_frame(rows, cfg.carry)

    return both.groupby("bucket").map_groups(replay, batch_format="pandas")
