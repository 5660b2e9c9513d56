"""Exactly-once, resumable Parquet sink.

Layout (per output root):

    part-{pid:05d}-ck{seq:06d}.parquet     emitted rows of checkpoint seq
    state-{pid:05d}-ck{seq:06d}.pkl        engine snapshot AFTER that batch range
    manifest-{pid:05d}.json                committed checkpoint lineage

Commit protocol per checkpoint interval: (1) write the interval's parquet
to a temp name and atomically rename; (2) write the state snapshot temp +
rename; (3) rewrite the manifest (temp + rename) recording the interval.
The manifest is the commit point: intervals not in the manifest are
ignored by readers and overwritten by a resumed run, and the engine is
deterministic for the same input prefix, so a rerun regenerates
bit-identical files — observational exactly-once (SURVEY.md §2.7).

The reference has no counterpart (truncating file writes, main.rs:97-110).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class ExactlyOnceSink:
    def __init__(self, root: str, partition_id: int):
        self.root = root
        self.pid = partition_id
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, f"manifest-{self.pid:05d}.json")

    # -- commit -------------------------------------------------------------

    def _atomic_write(self, path: str, writer):
        tmp = path + ".tmp"
        writer(tmp)
        os.replace(tmp, path)

    def commit_interval(self, seq: int, rows: pd.DataFrame | pa.Table,
                        snapshot: bytes, rows_consumed: int,
                        metrics: dict | None = None):
        part = os.path.join(self.root, f"part-{self.pid:05d}-ck{seq:06d}.parquet")
        state = os.path.join(self.root, f"state-{self.pid:05d}-ck{seq:06d}.pkl")
        if isinstance(rows, pd.DataFrame):
            rows = pa.Table.from_pandas(rows, preserve_index=False)
        self._atomic_write(part, lambda p: pq.write_table(rows, p))
        self._atomic_write(state, lambda p: open(p, "wb").write(snapshot))
        m = self.load_manifest()
        m["intervals"] = [iv for iv in m["intervals"] if iv["seq"] < seq]
        m["intervals"].append({"seq": seq, "rows_consumed": rows_consumed,
                               "n_rows": rows.num_rows,
                               "metrics": metrics or {}})
        self._atomic_write(self.manifest_path,
                           lambda p: open(p, "w").write(json.dumps(m)))

    def mark_done(self):
        m = self.load_manifest()
        m["done"] = True
        self._atomic_write(self.manifest_path,
                           lambda p: open(p, "w").write(json.dumps(m)))

    # -- read / resume ------------------------------------------------------

    def load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"partition": self.pid, "intervals": [], "done": False}

    def resume_point(self) -> tuple[int, int, bytes | None]:
        """(next_seq, rows_consumed, snapshot) from the last committed
        interval; (0, 0, None) for a fresh partition."""
        m = self.load_manifest()
        if not m["intervals"]:
            return 0, 0, None
        last = max(m["intervals"], key=lambda iv: iv["seq"])
        state = os.path.join(self.root,
                             f"state-{self.pid:05d}-ck{last['seq']:06d}.pkl")
        with open(state, "rb") as f:
            snap = f.read()
        return last["seq"] + 1, last["rows_consumed"], snap

    def committed_tables(self) -> list[pa.Table]:
        m = self.load_manifest()
        out = []
        for iv in sorted(m["intervals"], key=lambda iv: iv["seq"]):
            p = os.path.join(self.root,
                             f"part-{self.pid:05d}-ck{iv['seq']:06d}.parquet")
            out.append(pq.read_table(p))
        return out


def read_output(root: str) -> pd.DataFrame:
    """All committed rows across partitions (uncommitted files ignored)."""
    frames = []
    for name in sorted(os.listdir(root)):
        if name.startswith("manifest-"):
            pid = int(name.split("-")[1].split(".")[0])
            sink = ExactlyOnceSink(root, pid)
            frames.extend(t.to_pandas() for t in sink.committed_tables())
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)
