"""Execution wrappers for the stateful StreamEngine.

Two paths, same state machine, pytest-gated to agree with each other and
with the stateless groupby path:

1. ``stateful_window_run`` — Dataset-native: the single conv_id
   hash-bucket shuffle, then each bucket's rows are replayed in event-log
   order through a StreamEngine inside ``map_groups``. Fully distributed;
   this is the batch-over-log shape that scales to 100 TB (a bucket is
   1/num_buckets of the input; skew-bounded because buckets hold many
   conversations).

2. ``StreamingJob`` — raw Ray actors (the one place the Dataset API
   genuinely can't express the semantics: long-lived shared mutable
   state + mid-stream checkpoints). P partition actors each own a
   StreamEngine and an ExactlyOnceSink; the driver routes replayable
   input splits; checkpoints commit (rows, snapshot, offset) atomically;
   ``resume=True`` restores from the last committed checkpoint and skips
   the consumed prefix — kill-and-resume equals fresh-run (pytest gate).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import ray

from ..sinks import ExactlyOnceSink, read_output
from ..stages.window_stats import add_bucket, add_bucket_slab
from .engine import StreamEngine, WindowConfig, emitted_to_frame


def _extra_cols(cfg: WindowConfig) -> tuple:
    """Output columns beyond the stats schema: custom aggregates, plus
    the per-window ``revision`` counter in updates mode."""
    extra = tuple(cfg.custom_aggs)
    if cfg.emit == "updates":
        extra += ("revision",)
    return extra


def latest_revision(df: pd.DataFrame,
                    keys: tuple = ("conv_id", "window_start")) -> pd.DataFrame:
    """Resolve an updates-mode output stream to its final state: keep the
    highest ``revision`` per window key (the upsert a keyed sink applies).
    Deterministic regardless of row order; no-op columns-wise (the
    revision column is retained so callers can audit update depth)."""
    if "revision" not in df.columns or not len(df):
        return df
    df = df.sort_values([*keys, "revision"], kind="stable")
    return df.drop_duplicates(subset=list(keys), keep="last") \
             .reset_index(drop=True)


def stateful_window_run(ds, cfg: WindowConfig, num_buckets: int = 64,
                        slab_windows: int | None = 4096,
                        diag: bool = False):
    """Dataset path: (bucket × time-slab) shuffle → per-group stream
    replay. The slab component bounds per-task group size for tumbling/
    sliding (see add_bucket_slab); session windows have no fixed span, so
    they group by bucket only (the hot-key scale path for sessions is the
    salted interval stitch in stages/salted.py).

    ``diag=True`` appends per-group instrumentation columns
    (``_diag_rows`` = group input rows, ``_diag_maxrss_kb`` = the worker
    process's peak RSS so far) — the stress-artifact surface
    (scripts/stress_stateful.py)."""
    slabbed = cfg.kind in ("tumbling", "sliding") and bool(slab_windows)
    if slabbed:
        ds, slab_l = add_bucket_slab(
            ds, num_buckets, cfg.size_us,
            cfg.step_us if cfg.kind == "sliding" else None,
            cfg.offset_us, slab_windows)
        group_key = "_gk"
    else:
        ds = add_bucket(ds, num_buckets)
        group_key = "bucket"

    def replay_bucket(df: pd.DataFrame) -> pd.DataFrame:
        order = ["ts"] + [c for c in ("turn_uid", "turn_idx")
                          if c in df.columns]
        df = df.sort_values(order, kind="stable").reset_index(drop=True)
        eng = StreamEngine(cfg)
        rows = eng.process_rows(df)
        rows.extend(eng.flush())
        out = emitted_to_frame(rows, cfg.kind, _extra_cols(cfg))
        if slabbed and len(out):
            # sliding duplicates boundary rows into the previous slab;
            # the engine emits every covering window, so keep only the
            # windows whose start lives in this group's slab
            slab = np.int64(df["_slab"].iloc[0])
            ws = out["window_start"].astype("datetime64[us]") \
                .astype("int64").to_numpy()
            out = out[(ws - cfg.offset_us) // slab_l == slab]
        if diag:
            import resource
            out = out.copy()
            out["_diag_rows"] = len(df)
            out["_diag_maxrss_kb"] = \
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        return out

    return ds.groupby(group_key).map_groups(replay_bucket,
                                            batch_format="pandas")


def stateful_metrics(ds, cfg: WindowConfig, num_buckets: int = 64):
    """Per-partition engine metrics (rows_in, late_dropped, dup_dropped,
    windows/sessions emitted) — the north rule's per-partition metrics
    surface, computed by the same bucket replay."""
    ds = add_bucket(ds, num_buckets)

    def replay_metrics(df: pd.DataFrame) -> pd.DataFrame:
        order = ["ts"] + [c for c in ("turn_uid", "turn_idx")
                          if c in df.columns]
        df = df.sort_values(order, kind="stable").reset_index(drop=True)
        eng = StreamEngine(cfg, int(df["bucket"].iloc[0]) if len(df) else 0)
        eng.process_rows(df)
        eng.flush()
        m = eng.metrics.as_dict()
        m["partition"] = eng.partition_id
        return pd.DataFrame([m])

    return ds.groupby("bucket").map_groups(replay_metrics,
                                           batch_format="pandas")


@ray.remote
class PartitionActor:
    """Owns one partition's StreamEngine + sink. Raw actor by design —
    documented Dataset-API escape hatch (SURVEY.md §4)."""

    def __init__(self, out_dir: str, cfg: WindowConfig, pid: int,
                 resume: bool):
        self.sink = ExactlyOnceSink(out_dir, pid)
        self.cfg = cfg
        self.pid = pid
        self.seq, self.consumed, snap = (self.sink.resume_point()
                                         if resume else (0, 0, None))
        self.engine = (StreamEngine.restore(snap) if snap
                       else StreamEngine(cfg, pid))
        self.pending: list[dict] = []
        self.batch_no = 0

    def consumed_rows(self) -> int:
        return self.consumed

    def process(self, df: pd.DataFrame, n_input_rows: int) -> int:
        self.pending.extend(self.engine.process_rows(df))
        self.consumed += n_input_rows
        self.batch_no += 1
        return len(self.pending)

    def checkpoint(self) -> int:
        rows = emitted_to_frame(self.pending, self.cfg.kind,
                                _extra_cols(self.cfg))
        self.sink.commit_interval(self.seq, rows, self.engine.snapshot(),
                                  self.consumed,
                                  self.engine.metrics.as_dict())
        self.pending = []
        self.seq += 1
        return self.seq

    def finish(self) -> dict:
        self.pending.extend(self.engine.flush())
        self.checkpoint()
        self.sink.mark_done()
        return self.engine.metrics.as_dict()


class StreamingJob:
    """Streaming emulation over a replayable, ordered input log."""

    def __init__(self, out_dir: str, cfg: WindowConfig,
                 num_partitions: int = 4, resume: bool = False):
        self.out_dir = out_dir
        self.cfg = cfg
        self.P = num_partitions
        self.actors = [PartitionActor.remote(out_dir, cfg, p, resume)
                       for p in range(self.P)]
        self.start_offsets = ray.get(
            [a.consumed_rows.remote() for a in self.actors])

    def run(self, table: pd.DataFrame, batch_rows: int = 4096,
            checkpoint_every: int = 4, crash_after_batches: int | None = None):
        """Feed the log in order; route rows to partition actors by
        conv_id hash; checkpoint every N batches per partition.

        ``crash_after_batches`` aborts mid-run WITHOUT flushing — used by
        the kill-and-resume test.
        """
        conv = table["conv_id"].astype(str).to_numpy()
        part = np.asarray([zlib.crc32(c.encode()) % self.P for c in conv])
        n = len(table)
        consumed = [0] * self.P
        batches_fed = 0
        for lo in range(0, n, batch_rows):
            hi = min(lo + batch_rows, n)
            chunk = table.iloc[lo:hi]
            cpart = part[lo:hi]
            futs = []
            for p in range(self.P):
                sub = chunk[cpart == p]
                consumed[p] += hi - lo
                # resume skip: this partition already consumed the prefix
                if consumed[p] <= self.start_offsets[p]:
                    continue
                futs.append(self.actors[p].process.remote(sub, hi - lo))
            ray.get(futs)
            batches_fed += 1
            if crash_after_batches is not None and \
                    batches_fed >= crash_after_batches:
                return None          # simulate a crash: no flush, no commit
            if batches_fed % checkpoint_every == 0:
                ray.get([a.checkpoint.remote() for a in self.actors])
        metrics = ray.get([a.finish.remote() for a in self.actors])
        return metrics

    def output(self) -> pd.DataFrame:
        return read_output(self.out_dir)
