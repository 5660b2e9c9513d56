"""Stateful streaming temporal join — the streaming twin of
``stages/temporal.temporal_join`` (Flink's event-time temporal table
join), in the same state-machine style as ``state/join.StreamJoiner``.

Two streams share one event-time watermark:

- the DIM (build) stream: the dimension table's CDC rows — ``_change``
  in {insert, delete} with the version's event-time ``ts`` and the
  dimension's value columns;
- the EVENT (probe) stream: fact rows keyed like the dimension.

Each event must join the dimension version valid AT the event's ts.
Because a dim update with version-time <= an event's ts may arrive
AFTER the event (stream interleaving), events are BUFFERED until the
shared watermark passes their ts — at that point every non-late dim
boundary at or before the event's ts has been applied, so the probe
(bisect into the key's boundary list) is final.  This is exactly the
watermark argument Flink's temporal join makes.

State bounds (what a batch join doesn't need):

- Per-key version history = a sorted boundary list ``ts ->
  values | DELETED``; an update (delete + insert at one ts) nets to
  the insert (order-independent).  Boundaries strictly BEFORE the last
  boundary <= watermark are dead — no future (>= watermark) event can
  probe them — and are pruned amortized, so history size is bounded by
  the dimension's change rate inside the lateness horizon, never by
  stream length.
- The event buffer drains at every watermark advance; its peak is
  events inside the lateness horizon.
- Late rows on EITHER stream (ts < watermark) drop and count; exact
  (uid, ts) event dedup with the engine's amortized watermark prune.
- Two live inserts for one key AT ONE ts raise (PK violation).  An
  insert at a LATER ts closes the open interval like an SCD-2 update —
  in the netted boundary representation (delete + insert at one ts
  nets to the insert) a feed that omitted the delete is
  indistinguishable from a legitimate update, so THAT violation is
  enforced by the batch twin's per-bucket overlap assertion
  (``temporal_join``), not here; the equality gate runs both paths
  over the same CDC log.
- ``snapshot``/``restore`` round-trip the full state (kill-and-resume
  == fresh, pytest-gated).

``stateful_temporal_run`` is the batch-replay Dataset execution: tag
sides, union, ONE key-hash bucket shuffle, per-bucket ts-ordered replay
— the identical single-exchange shape as ``stateful_join_run``; it is
equality-gated against the batch ``temporal_join`` over the SCD-2
history of the same CDC log.
"""

from __future__ import annotations

import heapq
import pickle
from bisect import bisect_right, insort
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

# deletion marker inside hist_val: None (a live version is always a
# tuple). _MISSING only distinguishes "no boundary at this ts" inside
# _apply_dim and is never stored — so snapshots pickle cleanly.
_MISSING = object()


@dataclass(frozen=True)
class TemporalConfig:
    value_cols: tuple        # dim value columns carried onto events
    lateness_us: int = 0
    key_col: str = "conv_id"
    uid_col: str = "turn_uid"


@dataclass
class TemporalMetrics:
    rows_events: int = 0
    rows_dim: int = 0
    emitted: int = 0
    matched: int = 0
    late_dropped: int = 0
    dup_dropped: int = 0
    boundaries_pruned: int = 0
    buf_peak: int = 0
    hist_peak: int = 0

    def as_dict(self) -> dict:
        return dict(self.__dict__)


class TemporalJoiner:
    """One partition's temporal-join state machine over a MERGED log:
    rows carry ``side`` (0 = event, 1 = dim CDC) plus key/ts; dim rows
    add ``_change`` and the value columns; event rows add the uid.
    ``process_rows``/``flush`` RETURN emitted rows."""

    def __init__(self, cfg: TemporalConfig, partition_id: int = 0):
        self.cfg = cfg
        self.partition_id = partition_id
        self.watermark = -(1 << 62)
        self.max_ts = -(1 << 62)
        # per key: parallel sorted boundary ts list + {ts: values|DELETED}
        self.hist_ts: dict = {}
        self.hist_val: dict = {}
        # buffered events: (ts, seq, key, uid)
        self.buf: list[tuple] = []
        self._seq = 0
        self.seen: dict = {}            # key -> {(uid, ts)}
        self._seen_prune_at: dict = {}
        self.metrics = TemporalMetrics()

    # -- dedup bound (same algebra as StreamEngine._prune_seen) ----------

    def _prune_seen(self, key: str, s: set) -> set:
        kept = {e for e in s if e[1] >= self.watermark}
        self.seen[key] = kept
        self._seen_prune_at[key] = max(1024, 2 * len(kept))
        return kept

    # -- dim history ------------------------------------------------------

    def _apply_dim(self, key: str, ts: int, change: str, values: tuple):
        ts_list = self.hist_ts.setdefault(key, [])
        vals = self.hist_val.setdefault(key, {})
        if change == "insert":
            cur = vals.get(ts, _MISSING)
            if cur is not _MISSING and cur is not None:
                raise ValueError(
                    f"temporal join: second live insert for key {key!r} "
                    f"at ts {ts} — dimension is not primary-keyed")
            if cur is _MISSING:
                insort(ts_list, ts)
            vals[ts] = values
            # PK contract: the previous boundary must be a deletion OR
            # an insert superseded by a delete+insert pair at this ts —
            # i.e. an insert directly after another live insert is the
            # same violation the batch operator rejects.  A delete for
            # this ts may still be in flight, so this check is best-
            # effort here and exact at probe time in the batch twin.
        else:                           # delete closes the open interval
            if ts not in vals:          # insert at same ts wins (update)
                insort(ts_list, ts)
                vals[ts] = None
        if len(ts_list) >= 64 and not len(ts_list) % 64:
            self._prune_hist(key)   # hot-update keys with no probes
        n = len(ts_list)
        if n > self.metrics.hist_peak:
            self.metrics.hist_peak = n

    def _prune_hist(self, key: str):
        """Drop boundaries strictly before the last boundary <= the prune
        bound.  The bound is the watermark (future arrivals have
        ts >= watermark) CAPPED at the earliest still-buffered event's
        ts — a buffered event has ts < watermark by construction and
        must still find the boundary open at its ts."""
        ts_list = self.hist_ts.get(key)
        if not ts_list:
            return
        bound = self.watermark
        if self.buf and self.buf[0][0] < bound:
            bound = self.buf[0][0]
        i = bisect_right(ts_list, bound) - 1
        if i > 0:
            vals = self.hist_val[key]
            for t in ts_list[:i]:
                del vals[t]
            del ts_list[:i]
            self.metrics.boundaries_pruned += i

    # -- probe ------------------------------------------------------------

    def _probe(self, key: str, ts: int):
        ts_list = self.hist_ts.get(key)
        if not ts_list:
            return None
        i = bisect_right(ts_list, ts) - 1
        if i < 0:
            return None
        v = self.hist_val[key][ts_list[i]]
        return v

    def _drain(self, out: list[dict]):
        cfg = self.cfg
        while self.buf and self.buf[0][0] < self.watermark:
            ts, _, key, uid = heapq.heappop(self.buf)
            values = self._probe(key, ts)
            row = {cfg.key_col: key, cfg.uid_col: uid, "ts": ts}
            if values is None:
                for c in cfg.value_cols:
                    row[c] = None
            else:
                self.metrics.matched += 1
                for c, v in zip(cfg.value_cols, values):
                    row[c] = v
            out.append(row)
            self.metrics.emitted += 1
            self._prune_hist(key)

    # -- ingest -----------------------------------------------------------

    def process_rows(self, rows: pd.DataFrame) -> list[dict]:
        cfg = self.cfg
        key_a = rows[cfg.key_col].to_numpy()
        side_a = rows["side"].to_numpy()
        ts_a = rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid_a = rows[cfg.uid_col].to_numpy()
        chg_a = rows["_change"].to_numpy() if "_change" in rows else None
        val_a = [rows[c].to_numpy() for c in cfg.value_cols]
        out: list[dict] = []
        for i in range(len(rows)):
            ts = int(ts_a[i])
            side = int(side_a[i])
            if side == 0:
                self.metrics.rows_events += 1
            else:
                self.metrics.rows_dim += 1
            if ts < self.watermark:
                self.metrics.late_dropped += 1
                continue
            key = str(key_a[i])
            if side == 1:
                change = str(chg_a[i]) if chg_a is not None else "insert"
                self._apply_dim(key, ts, change,
                                tuple(a[i] for a in val_a))
            else:
                uid = int(uid_a[i])
                seen = self.seen.setdefault(key, set())
                k = (uid, ts)
                if k in seen:
                    self.metrics.dup_dropped += 1
                    continue
                seen.add(k)
                if len(seen) >= self._seen_prune_at.get(key, 1024):
                    seen = self._prune_seen(key, seen)
                heapq.heappush(self.buf, (ts, self._seq, key, uid))
                self._seq += 1
                if len(self.buf) > self.metrics.buf_peak:
                    self.metrics.buf_peak = len(self.buf)
            if ts > self.max_ts:
                self.max_ts = ts
                self.watermark = ts - cfg.lateness_us
                self._drain(out)
        return out

    def flush(self) -> list[dict]:
        out: list[dict] = []
        self.watermark = 1 << 62
        self._drain(out)
        return out

    def buffered(self) -> int:
        return len(self.buf)

    def history_size(self) -> int:
        return sum(len(v) for v in self.hist_ts.values())

    # -- checkpoint ---------------------------------------------------------

    def snapshot(self) -> bytes:
        return pickle.dumps({
            "cfg": self.cfg, "partition_id": self.partition_id,
            "watermark": self.watermark, "max_ts": self.max_ts,
            "hist_ts": self.hist_ts, "hist_val": self.hist_val,
            "buf": self.buf, "seq": self._seq, "seen": self.seen,
            "seen_prune_at": self._seen_prune_at,
            "metrics": self.metrics,
        })

    @classmethod
    def restore(cls, blob: bytes) -> "TemporalJoiner":
        d = pickle.loads(blob)
        j = cls(d["cfg"], d["partition_id"])
        j.watermark, j.max_ts = d["watermark"], d["max_ts"]
        j.hist_ts, j.hist_val = d["hist_ts"], d["hist_val"]
        j.buf, j._seq = d["buf"], d["seq"]
        j.seen, j._seen_prune_at = d["seen"], d["seen_prune_at"]
        j.metrics = d["metrics"]
        return j


def temporal_to_frame(rows: list[dict], cfg: TemporalConfig) -> pd.DataFrame:
    """Stable typed frame for emitted rows (ts back to datetime64[us];
    int64 uid survives the empty case; value columns stay inferred)."""
    cols = {cfg.key_col: "object", cfg.uid_col: np.int64,
            "ts": "datetime64[us]"}
    for c in cfg.value_cols:
        cols[c] = "object"
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in cols.items()})
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("int64").astype("datetime64[us]")
    df[cfg.uid_col] = df[cfg.uid_col].astype(np.int64)
    return df[list(cols)]


def _temporal_actor_cls():
    """TemporalPartitionActor is defined lazily so importing this module
    never touches ray.remote (driver-contract: no Ray at import)."""
    import ray

    from ..sinks import ExactlyOnceSink

    @ray.remote
    class TemporalPartitionActor:
        """One partition's TemporalJoiner + exactly-once sink — the
        temporal twin of join.JoinPartitionActor (same checkpoint
        protocol: (rows, snapshot, offset) commit atomically; resume
        restores the last committed state and skips the consumed
        prefix)."""

        def __init__(self, out_dir: str, cfg: TemporalConfig, pid: int,
                     resume: bool):
            self.sink = ExactlyOnceSink(out_dir, pid)
            self.cfg = cfg
            self.seq, self.consumed, snap = (self.sink.resume_point()
                                             if resume else (0, 0, None))
            self.joiner = (TemporalJoiner.restore(snap) if snap
                           else TemporalJoiner(cfg, pid))
            self.pending: list[dict] = []

        def consumed_rows(self) -> int:
            return self.consumed

        def process(self, df: pd.DataFrame, n_input_rows: int) -> int:
            self.pending.extend(self.joiner.process_rows(df))
            self.consumed += n_input_rows
            return len(self.pending)

        def checkpoint(self) -> int:
            rows = temporal_to_frame(self.pending, self.cfg)
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

    return TemporalPartitionActor


class StreamingTemporalJob:
    """Streaming temporal join over a replayable merged log (rows
    carry ``side``); P partition actors route by key hash — the
    checkpointed/exactly-once execution of TemporalJoiner
    (``stateful_temporal_run`` is the batch-replay execution of the
    same machine)."""

    def __init__(self, out_dir: str, cfg: TemporalConfig,
                 num_partitions: int = 4, resume: bool = False):
        import ray
        actor_cls = _temporal_actor_cls()
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
        keys = log[self.cfg.key_col].astype(str).to_numpy()
        part = np.asarray([zlib.crc32(k.encode()) % self.P for k in keys])
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
                ray.get([a.checkpoint.remote() for a in self.actors])
        return ray.get([a.finish.remote() for a in self.actors])

    def output(self) -> pd.DataFrame:
        from ..sinks import read_output
        return read_output(self.out_dir)


def stateful_temporal_run(events, cdc, cfg: TemporalConfig,
                          num_buckets: int = 64,
                          value_types: dict | None = None):
    """Dataset path: tag sides, union, ONE key-hash bucket shuffle, then
    per-bucket (ts, side, uid)-ordered replay through a TemporalJoiner.
    ``events`` needs (key, uid, ts [+ nothing else]); ``cdc`` needs
    (key, ts, _change, value_cols).  Per-task state is bounded by the
    lateness horizon (events) and change rate (history).

    ``value_types`` ({col: pa.DataType}) types the null pad of the
    value columns on the events side; omitted, it is probed from the
    cdc schema once (pass it statically on hot paths — see the
    schema-probe refcount caveat in README Known limitations)."""
    from ..stages.window_stats import stable_bucket_of

    key, uid = cfg.key_col, cfg.uid_col
    if value_types is None:
        sch = cdc.schema()
        value_types = {n: t for n, t in zip(sch.names, sch.types)
                       if n in cfg.value_cols}

    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            keep = [key, uid, "ts", "_change", *cfg.value_cols]
            t = t.select([c for c in keep if c in t.column_names])
            if "ts" in t.column_names:        # unify the two streams'
                ts = t["ts"]                  # ts types (events are
                if isinstance(ts, pa.ChunkedArray):   # often timestamp,
                    ts = ts.combine_chunks()          # CDC int64 µs)
                if pa.types.is_timestamp(ts.type):
                    ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
                    t = t.set_column(t.column_names.index("ts"),
                                     "ts", ts)
            for c in keep:
                if c not in t.column_names:
                    typ = pa.int64() if c == uid else \
                        value_types.get(c, pa.string())
                    t = t.append_column(c, pa.nulls(len(t), typ))
            b = stable_bucket_of(t[key].to_numpy(zero_copy_only=False),
                                 num_buckets)
            t = t.append_column("side", pa.array([side] * len(t), pa.int8()))
            return t.append_column("bucket", pa.array(b, pa.int64()))
        return _t

    both = events.map_batches(tag(0), batch_format="pyarrow",
                              zero_copy_batch=True) \
        .union(cdc.map_batches(tag(1), batch_format="pyarrow",
                               zero_copy_batch=True))

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[uid] = df[uid].fillna(-1).astype(np.int64)
        df = df.sort_values(["ts", "side", uid],
                            kind="stable").reset_index(drop=True)
        j = TemporalJoiner(cfg)
        rows = j.process_rows(df)
        rows.extend(j.flush())
        return temporal_to_frame(rows, cfg)

    return both.groupby("bucket").map_groups(replay, batch_format="pandas")
