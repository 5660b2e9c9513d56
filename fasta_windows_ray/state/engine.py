"""Stateful streaming window engine — the north-star core.

Per-key (conv_id) state store with:

- a **ring buffer** of pending turns (held until the watermark passes
  their window's end),
- **rolling histograms** per open window: the entering turn is *added*
  to the window's role/char/k-gram histograms on arrival, and windows are
  finalised from the accumulated histograms — the same incremental trick
  fasta_windows' count-histogram stats enable (SURVEY.md §1.1: entropy is
  a pure function of the histogram, so add/evict gives bit-identical
  results to full recompute; pytest gate F19),
- a **watermark-ordered min-heap** of open windows, emitted when
  ``watermark >= window_end`` (watermark = max event ts seen in the
  partition − allowed lateness; derived from data, never wall clock),
- **late-row** handling: rows with ts < watermark are dropped and counted
  (metrics), matching the north_rule's same-input+watermark determinism,
- **checkpoint/resume**: ``snapshot()``/``restore()`` round-trip the whole
  state (buffers + watermark + emitted high-water marks + metrics).

CTW (order-dependent, kmeru8.rs:170-319) is computed at emission from the
window's ordered role sequence kept in the ring buffer — it is the one
stat that cannot be rolled, exactly as SURVEY.md §2.3 A11 records.

Rolling-update note: for sliding windows this engine incorporates each
arriving turn incrementally into EVERY window covering it (c = size/step
histogram adds per turn) rather than maintaining one histogram and
evicting on advance. Under bounded out-of-orderness this is the same
incremental trick — no window is ever recomputed from raw turns — while
staying correct for late-but-in-bounds arrivals that an already-advanced
single accumulator could not accept. ``_WindowAcc.evict`` is the exact
inverse of ``add`` (pytest F19 + hypothesis roundtrip), so the classic
evict-on-advance variant is available to state stores that want O(1)
histograms per key.

Partitioning contract: one ``StreamEngine`` instance owns a hash
partition of conv_ids; rows must arrive partition-ordered by event-log
order (bounded disorder allowed up to ``lateness_us``).
"""

from __future__ import annotations

import heapq
import math
import pickle
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .. import kernels as K
from ..stages.window_stats import STATS_COLUMNS
from ..windows import tumbling_start

ROLE_IDX = {"user": 0, "assistant": 1, "system": 2, "tool": 3, "other": 4}

# ASCII-only case fold — length-preserving, matching the vectorized
# path's _ascii_upper and the documented engine-wide folding definition
# (str.upper() can change length, e.g. 'ß' -> 'SS', and would desync
# n_chars from the char-offset corpus)
_ASCII_UP = str.maketrans("abcdefghijklmnopqrstuvwxyz",
                          "ABCDEFGHIJKLMNOPQRSTUVWXYZ")


@dataclass
class WindowConfig:
    kind: str = "tumbling"              # tumbling | sliding | session
    size_us: int = 6 * 3600 * 1_000_000
    step_us: int | None = None          # sliding only; size % step == 0
    gap_us: int = 30 * 60 * 1_000_000   # session only
    offset_us: int = 0
    lateness_us: int = 0                # allowed out-of-orderness
    bigram: str = '"k'
    ctw_depth: int = 6
    profile: str = "full"
    custom_aggs: tuple = ()             # functions.registry names
    ctw_text: bool = False              # char-class CTW over window text

    def starts_for(self, ts: int) -> list[int]:
        if self.kind == "tumbling":
            return [int(tumbling_start(np.asarray([ts]), self.size_us,
                                       self.offset_us)[0])]
        if self.kind == "sliding":
            step = self.step_us
            top = (ts - self.offset_us) // step * step + self.offset_us
            return [s for s in range(top, top - self.size_us, -step)
                    if s >= self.offset_us]
        raise ValueError(self.kind)


class _BoundedKgrams:
    """K-gram histogram with BOUNDED memory (north_rule's count-min
    k-gram sketch): exact dict while distinct <= cap — bit-identical
    stats, the path every oracle-gated window takes — then spills to a
    count-min sketch (depth x width int64, linear: supports evict) plus
    a Misra-Gries heavy-hitter table. Diversity on a spilled histogram
    is approximate (heavy hitters + one aggregated tail term, a lower
    bound) and documented as such; a window only spills past ``cap``
    distinct k-grams (degenerate at normal window sizes).
    """

    __slots__ = ("exact", "cms", "hh", "total", "cap", "depth", "width")

    def __init__(self, cap: int = 65_536, depth: int = 4,
                 width: int = 1 << 15):
        self.exact: dict | None = {}
        self.cms = None                 # np.ndarray (depth, width) int64
        self.hh: dict | None = None     # Misra-Gries heavy hitters
        self.total = 0
        self.cap = cap
        self.depth = depth
        self.width = width

    def _rows(self, g) -> list[int]:
        import zlib
        b = g.encode()
        return [zlib.crc32(b, 0x9E3779B9 * (d + 1) & 0xFFFFFFFF)
                % self.width for d in range(self.depth)]

    def _spill(self):
        cms = np.zeros((self.depth, self.width), dtype=np.int64)
        for g, c in self.exact.items():
            for d, r in enumerate(self._rows(g)):
                cms[d, r] += c
        # seed heavy hitters with the current top cap//16 keys
        top = sorted(self.exact.items(), key=lambda kv: -kv[1])[:self.cap // 16]
        self.cms = cms
        self.hh = dict(top)
        self.exact = None

    def add(self, g, c: int = 1):
        self.total += c
        if self.exact is not None:
            self.exact[g] = self.exact.get(g, 0) + c
            if len(self.exact) > self.cap:
                self._spill()
            return
        for d, r in enumerate(self._rows(g)):
            self.cms[d, r] += c
        hh = self.hh
        if g in hh:
            hh[g] += c
        elif len(hh) < self.cap // 16:
            hh[g] = c
        else:                           # Misra-Gries decrement step
            dead = [k for k in hh if hh[k] <= c]
            for k in dead:
                del hh[k]
            if dead:
                hh[g] = c

    def evict(self, g, c: int = 1):
        self.total -= c
        if self.exact is not None:
            self.exact[g] -= c
            if self.exact[g] == 0:
                del self.exact[g]
            return
        for d, r in enumerate(self._rows(g)):
            self.cms[d, r] -= c         # CMS is linear: exact decrement
        if g in self.hh:
            self.hh[g] -= c
            if self.hh[g] <= 0:
                del self.hh[g]

    def entropy(self) -> float:
        if self.exact is not None:
            return (K.entropy_from_counts(
                [self.exact[g] for g in sorted(self.exact)])
                if self.exact else 0.0)
        # approximate: heavy hitters exact-ish, tail mass as one symbol
        n = self.total
        if n <= 0:
            return 0.0
        hh_counts = [c for c in self.hh.values() if c > 0]
        rest = n - sum(hh_counts)
        counts = hh_counts + ([rest] if rest > 0 else [])
        return K.entropy_from_counts(sorted(counts))


class _WindowAcc:
    """Rolling accumulation for one open (conv_id, window_start)."""

    __slots__ = ("role_counts", "masked", "char_counts", "kgram", "big_cnt",
                 "n_chars", "turns", "texts", "custom", "_nt", "_max_ts")

    def __init__(self):
        self.role_counts = [0] * 5
        self.masked = 0
        self.char_counts: dict[int, int] = {}
        self.kgram = {2: _BoundedKgrams(), 3: _BoundedKgrams(),
                      4: _BoundedKgrams()}
        self.big_cnt = 0
        self.n_chars = 0
        # (ts, turn_uid, role) kept ONLY when an order-dependent stat
        # (CTW) needs the sequence; otherwise just count + max ts so a
        # huge window's accumulator stays flat (round-1 VERDICT #9)
        self.turns: list[tuple] | None = []
        self.texts: dict = {}           # (ts, turn_uid) -> text (ctw_text only)
        self.custom: dict | None = None # custom-aggregate states (lazy)
        self._nt = 0
        self._max_ts = None

    @staticmethod
    def _need_seq(cfg: WindowConfig) -> bool:
        return (cfg.ctw_depth >= 0 and cfg.profile in ("full", "fast")) \
            or cfg.ctw_text

    def add(self, ts: int, turn_uid, role: str, text: str, tool: str,
            cfg: WindowConfig):
        self.role_counts[ROLE_IDX.get(role, 4)] += 1
        if tool:
            self.masked += 1
        self._nt += 1
        if self._max_ts is None or ts > self._max_ts:
            self._max_ts = ts
        if self._need_seq(cfg):
            self.turns.append((ts, turn_uid, role))
        else:
            self.turns = None           # flat heap: no per-turn sequence
        if cfg.ctw_text:
            self.texts[(ts, turn_uid)] = text
        if cfg.custom_aggs:
            from ..functions import registry
            if self.custom is None:
                self.custom = {n: registry.get(n).init()
                               for n in cfg.custom_aggs}
            row = {"ts": ts, "turn_uid": turn_uid, "role": role,
                   "text": text, "tool": tool}
            for n in cfg.custom_aggs:
                registry.get(n).add(self.custom[n], row)
        if cfg.profile == "counts":
            return
        up = text.translate(_ASCII_UP)
        self.n_chars += len(up)
        # char histogram keyed by CODEPOINT (not UTF-8 byte): keeps the
        # denominator (chars) and the classes consistent on multibyte
        # text, matching the vectorized path and the SQL oracle's
        # substr-per-character semantics (round-1 ADVICE). Pure-ASCII
        # strings iterate the encoded bytes (same values, faster).
        for b in (up.encode() if up.isascii() else map(ord, up)):
            self.char_counts[b] = self.char_counts.get(b, 0) + 1
        for k in (2, 3, 4):
            bk = self.kgram[k]
            d = bk.exact
            n = len(up) - k + 1
            if d is not None:
                # inline dict ops while exact (the hot path — a method
                # call per k-gram occurrence costs ~40% engine slowdown)
                get = d.get
                for i in range(n):
                    g = up[i:i + k]
                    d[g] = get(g, 0) + 1
                if n > 0:
                    bk.total += n
                if len(d) > bk.cap:
                    bk._spill()
            else:
                for i in range(n):
                    bk.add(up[i:i + k])
        self.big_cnt += text.count(cfg.bigram)

    def evict(self, ts: int, turn_uid, role: str, text: str, tool: str,
              cfg: WindowConfig):
        """Inverse of add — used by the rolling sliding-window path and by
        exact-dedup replays. Histograms are integer, so add+evict is
        bit-identical to never having added (F19/F22 gates)."""
        self.role_counts[ROLE_IDX.get(role, 4)] -= 1
        if tool:
            self.masked -= 1
        self._nt -= 1
        if self.turns is not None:
            self.turns.remove((ts, turn_uid, role))
        if cfg.ctw_text:
            self.texts.pop((ts, turn_uid), None)
        if cfg.custom_aggs and self.custom is not None:
            from ..functions import registry
            row = {"ts": ts, "turn_uid": turn_uid, "role": role,
                   "text": text, "tool": tool}
            for n in cfg.custom_aggs:
                registry.get(n).evict(self.custom[n], row)
        if cfg.profile == "counts":
            return
        up = text.translate(_ASCII_UP)
        self.n_chars -= len(up)
        for b in (up.encode() if up.isascii() else map(ord, up)):
            self.char_counts[b] -= 1
            if self.char_counts[b] == 0:
                del self.char_counts[b]
        for k in (2, 3, 4):
            bk = self.kgram[k]
            d = bk.exact
            n = len(up) - k + 1
            if d is not None:
                for i in range(n):
                    g = up[i:i + k]
                    d[g] -= 1
                    if d[g] == 0:
                        del d[g]
                if n > 0:
                    bk.total -= n
            else:
                for i in range(n):
                    bk.evict(up[i:i + k])
        self.big_cnt -= text.count(cfg.bigram)

    def finalize(self, conv_id: str, start_us: int, end_us: int,
                 cfg: WindowConfig) -> dict:
        rc = self.role_counts
        n_turns = sum(rc)
        a, c, g, t = rc[0], rc[1], rc[2], rc[3]

        def ratio(num, den):
            return num / den if den else (math.nan if num == 0
                                          else math.copysign(math.inf, num))

        turns = sorted(self.turns) if self.turns is not None else []
        last = (turns[-1][0] if turns
                else (self._max_ts if self._max_ts is not None else start_us))
        row = {
            "conv_id": conv_id,
            "window_start": np.datetime64(start_us, "us"),
            "window_end": np.datetime64(end_us, "us"),
            "last_ts": np.datetime64(last, "us"),
            "n_turns": n_turns,
            "n_user": a, "n_assistant": c, "n_system": g, "n_tool": t,
            "n_other": rc[4],
            "sys_asst_share": ratio(g + c, g + c + a + t),
            "sys_asst_skew": ratio(g - c, g + c),
            "user_tool_skew": ratio(a - t, a + t),
            "masked_share": ratio(self.masked, n_turns),
            "role_entropy": K.entropy_from_counts(rc),
            "n_chars": self.n_chars,
        }
        denom = self.n_chars if self.n_chars else 1
        # ascending-bin iteration matches the vectorized batch path
        row["char_entropy"] = K.entropy_from_counts(
            [self.char_counts[b] for b in sorted(self.char_counts)],
            denom=self.n_chars) if self.char_counts else 0.0
        for k, name in ((2, "bigram_diversity"), (3, "trigram_diversity"),
                        (4, "quadgram_diversity")):
            row[name] = self.kgram[k].entropy()
        row["bigram_rate"] = self.big_cnt / denom
        row["ctw_roles_bpb"] = (K.ctw_roles([r for _, _, r in turns],
                                            cfg.ctw_depth)
                                if cfg.profile in ("full", "fast") else 0.0)
        row["ctw_text_bpb"] = (K.ctw_text_classes(
            [self.texts[(t0, t1)] for t0, t1, _ in turns], cfg.ctw_depth)
            if cfg.ctw_text else 0.0)
        if cfg.custom_aggs:
            from ..functions import registry
            for n in cfg.custom_aggs:
                row[n] = (registry.get(n).emit(self.custom[n])
                          if self.custom is not None
                          else registry.get(n).emit(registry.get(n).init()))
        return row


@dataclass
class Metrics:
    rows_in: int = 0
    late_dropped: int = 0
    dup_dropped: int = 0
    windows_emitted: int = 0
    sessions_emitted: int = 0

    def as_dict(self) -> dict:
        return dict(self.__dict__)


class StreamEngine:
    """State machine for one partition (a hash range of conv_ids)."""

    def __init__(self, cfg: WindowConfig, partition_id: int = 0):
        self.cfg = cfg
        self.partition_id = partition_id
        self.watermark = -(1 << 62)
        self.max_ts = -(1 << 62)
        # open tumbling/sliding windows: (conv_id, start) -> _WindowAcc
        self.open: dict[tuple, _WindowAcc] = {}
        self.heap: list[tuple] = []      # (window_end, conv_id, start)
        self.heaped: set[tuple] = set()
        # session state: conv_id -> (first_ts, last_ts, n_turns)
        self.sessions: dict[str, list] = {}
        self.seen_uids: dict[str, set] = {}   # exact dedup of (conv, turn_uid)
        self.metrics = Metrics()
        self.emitted: list[dict] = []
        self._drains = 0      # throttles the O(#convs) GC scans in _drain

    # -- ingest -------------------------------------------------------------

    def process_rows(self, rows: pd.DataFrame) -> list[dict]:
        """Feed a batch of rows (any column order; requires conv_id, ts;
        turn_uid/role/text/tool optional). Returns rows emitted by the
        watermark advancing past window ends."""
        cfg = self.cfg
        cols = rows.columns
        get = {c: rows[c].to_numpy() for c in
               ("conv_id", "role", "text", "tool") if c in cols}
        ts_arr = rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        if "turn_uid" in cols:
            uid_arr = rows["turn_uid"].to_numpy()
        elif "turn_idx" in cols:
            uid_arr = rows["turn_idx"].to_numpy()
        else:
            uid_arr = np.arange(len(rows))
        out: list[dict] = []
        for i in range(len(rows)):
            ts = int(ts_arr[i])
            self.metrics.rows_in += 1
            if ts < self.watermark:
                self.metrics.late_dropped += 1
                continue
            conv = str(get["conv_id"][i])
            uid = uid_arr[i]
            seen = self.seen_uids.setdefault(conv, set())
            key_uid = (int(uid), ts)
            if key_uid in seen:
                self.metrics.dup_dropped += 1
                continue
            seen.add(key_uid)
            role = str(get["role"][i]) if "role" in get else "user"
            text = str(get["text"][i]) if "text" in get else ""
            tool = str(get["tool"][i]) if "tool" in get else ""

            if cfg.kind == "session":
                self._ingest_session(conv, ts, int(uid), role, text, tool,
                                     out)
            else:
                for s in cfg.starts_for(ts):
                    key = (conv, s)
                    acc = self.open.get(key)
                    if acc is None:
                        acc = self.open[key] = _WindowAcc()
                        hk = (s + cfg.size_us, conv, s)
                        heapq.heappush(self.heap, hk)
                        self.heaped.add(hk)
                    acc.add(ts, int(uid), role, text, tool, cfg)

            if ts > self.max_ts:
                self.max_ts = ts
                self.watermark = ts - cfg.lateness_us
                self._drain(out)
        self.emitted.extend(out)
        return out

    def _ingest_session(self, conv: str, ts: int, uid: int, role: str,
                        text: str, tool: str, out: list[dict]):
        st = self.sessions.get(conv)
        if st is not None and ts - st[1] > self.cfg.gap_us:
            out.append(self._session_row(conv, st))
            st = None
        if st is None:
            st = self.sessions[conv] = [ts, ts, _WindowAcc()]
        st[0] = min(st[0], ts)
        st[1] = max(st[1], ts)
        st[2].add(ts, uid, role, text, tool, self.cfg)

    def _session_row(self, conv: str, st: list) -> dict:
        """Full stats over the session's turns; session bounds are the
        observed first/last ts (gap-based windows have no fixed size)."""
        self.metrics.sessions_emitted += 1
        row = st[2].finalize(conv, st[0], st[1], self.cfg)
        row["session_start"] = row.pop("window_start")
        row["session_end"] = row.pop("window_end")
        del row["last_ts"]
        return row

    def _drain(self, out: list[dict]):
        cfg = self.cfg
        while self.heap and self.heap[0][0] <= self.watermark:
            end, conv, s = heapq.heappop(self.heap)
            key = (conv, s)
            self.heaped.discard((end, conv, s))
            acc = self.open.pop(key, None)
            if acc is None:
                continue
            out.append(acc.finalize(conv, s, end, cfg))
            self.metrics.windows_emitted += 1
        # GC scans iterate every conv key, and _drain runs per watermark
        # advance (≈ per row) — unthrottled this was O(rows × convs),
        # 35% of engine wall (round-2 profile). Throttle: correctness is
        # unaffected (pruning is an optimization; delayed session close
        # still happens before flush, and emission only requires the
        # watermark to have passed the gap).
        self._drains += 1
        if (self._drains & 255) == 0:
            # bound dedup state: uids older than the watermark can never
            # be replayed within lateness — prune lazily when sets grow
            for conv, seen in self.seen_uids.items():
                if len(seen) > 100_000:
                    self.seen_uids[conv] = {(u, ts) for (u, ts) in seen
                                            if ts >= self.watermark}
        # session GC: close sessions whose gap has definitively elapsed
        if cfg.kind == "session" and (self._drains & 63) == 0:
            stale = [c for c, st in self.sessions.items()
                     if self.watermark - st[1] > cfg.gap_us]
            for c in stale:
                out.append(self._session_row(c, self.sessions.pop(c)))

    # -- end of stream ------------------------------------------------------

    def flush(self) -> list[dict]:
        """Close every remaining window/session (input exhausted)."""
        out: list[dict] = []
        cfg = self.cfg
        while self.heap:
            end, conv, s = heapq.heappop(self.heap)
            acc = self.open.pop((conv, s), None)
            if acc is None:
                continue
            out.append(acc.finalize(conv, s, end, cfg))
            self.metrics.windows_emitted += 1
        for conv in sorted(self.sessions):
            out.append(self._session_row(conv, self.sessions.pop(conv)))
        self.emitted.extend(out)
        return out

    # -- checkpoint ---------------------------------------------------------

    def snapshot(self) -> bytes:
        return pickle.dumps({
            "cfg": self.cfg, "partition_id": self.partition_id,
            "watermark": self.watermark, "max_ts": self.max_ts,
            "open": self.open, "heap": self.heap, "heaped": self.heaped,
            "sessions": self.sessions, "seen_uids": self.seen_uids,
            "metrics": self.metrics,
        })

    @classmethod
    def restore(cls, blob: bytes) -> "StreamEngine":
        d = pickle.loads(blob)
        eng = cls(d["cfg"], d["partition_id"])
        eng.watermark, eng.max_ts = d["watermark"], d["max_ts"]
        eng.open, eng.heap, eng.heaped = d["open"], d["heap"], d["heaped"]
        eng.sessions, eng.seen_uids = d["sessions"], d["seen_uids"]
        eng.metrics = d["metrics"]
        return eng


def emitted_to_frame(rows: list[dict], kind: str,
                     extra_cols: tuple = ()) -> pd.DataFrame:
    if kind == "session":
        base = ["conv_id", "session_start", "session_end", "n_turns"]
        if rows and len(rows[0]) > len(base):
            cols = base + [c for c in STATS_COLUMNS
                           if c in rows[0] and c not in base] + list(extra_cols)
        else:
            cols = base
    else:
        cols = STATS_COLUMNS + list(extra_cols)
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    df = pd.DataFrame(rows)[cols]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df
