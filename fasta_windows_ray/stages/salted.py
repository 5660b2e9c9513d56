"""Skew handling: salted pre-aggregation of hot conversations.

A single million-turn conversation must not serialise the job (the
reference's main mode has exactly this straggler: one chromosome = one
rayon task, fw.rs:68-145; its entropy mode fixed it with par_chunks,
entropy.rs:78-85). Every histogram-backed stat (SURVEY.md §2.3) is a
function of mergeable count vectors, so:

    map_batches:  partial histograms per (conv_id, window_start, salt)
                  — salt = row-index-derived, splits a hot key's rows
                  across many partials, all computed batch-locally
    groupby:      merge partials per (conv_id, window_start) — the
                  shuffle moves only small count rows, never turns

CTW (order-dependent, §2.3 A11) cannot be salted; the full-stats path
computes it post-merge from ordered turns (window_stats), and this salted
path serves the counts/entropy profile where hot keys matter most.

The pytest gate (F23) asserts the salted result is bit-equal to the
unsalted groupby path on a hot-key corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .window_stats import ROLE_ORDER, tumbling_start


def merge_window_acc(dst, src) -> None:
    """Merge one ``_WindowAcc`` into another: all state is additive
    integer counts plus a turn sequence that finalize re-sorts, so
    splitting a window's rows across accumulators and merging is
    bit-identical to single-pass accumulation (hypothesis-gated in
    tests/test_properties.py) — except k-gram histograms past
    KGRAM_CAP, which spill to the bounded sketch exactly as single-pass
    accumulation would (documented approximate; spill-merge gated in
    tests/test_skew.py)."""
    from ..state.engine import KGRAM_CAP, _BoundedKgrams, _merge_counts
    for i in range(5):
        dst.role_counts[i] += src.role_counts[i]
    dst.masked += src.masked
    dst._nt += src._nt
    dst.n_chars += src.n_chars
    dst.big_cnt += src.big_cnt
    _merge_counts(dst.char_counts, src.char_counts)
    for j in (0, 1, 2):
        s_spill = src.kg_spill.get(j) if src.kg_spill else None
        s_exact = src.kg[j]
        d_spill = dst.kg_spill.get(j) if dst.kg_spill else None
        if s_spill is None and not s_exact:
            continue
        if d_spill is None and s_spill is None:
            d = dst.kg[j]
            _merge_counts(d, s_exact)
            if len(d) > KGRAM_CAP:          # re-spill past the cap
                d_spill = _BoundedKgrams(d)
            else:
                continue
        elif d_spill is None:                # dst exact, src spilled
            d_spill = _BoundedKgrams(dst.kg[j])
            d_spill.merge_sketch(s_spill)
        elif s_spill is None:                # dst spilled, src exact
            for g, c in s_exact.items():
                d_spill.add(g, c)
        else:                                # both spilled
            d_spill.merge_sketch(s_spill)
        if dst.kg_spill is None:
            dst.kg_spill = {}
        dst.kg_spill[j] = d_spill
        dst.kg[j] = None
    if dst.turns is not None and src.turns is not None:
        dst.turns.extend(src.turns)
    elif src.turns is None and src._ts_counts is not None:
        dst.turns = None
        if dst._ts_counts is None:
            dst._ts_counts = {}
        _merge_counts(dst._ts_counts, src._ts_counts)
    dst.texts.update(src.texts)

PARTIAL_COLS = ["conv_id", "window_start", "n_user", "n_assistant",
                "n_system", "n_tool", "n_other", "n_masked"]


def salted_window_counts(ds, size_us: int, offset_us: int = 0,
                         num_merge_buckets: int = 64):
    """Tumbling role-histogram stats with salted partial aggregation.

    Returns the same columns as the counts profile of ``window_stats``:
    (conv_id, window_start, n_turns, n_user..n_other, sys_asst_share,
    sys_asst_skew, user_tool_skew, masked_share, role_entropy).
    """

    def partials(t: pa.Table) -> pd.DataFrame:
        # batch-local partial histogram per (conv, window): the "salt" is
        # the batch itself — a hot conversation spread over B batches
        # yields B partial rows, each computed in parallel
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        ws = tumbling_start(ts, size_us, offset_us)
        role = (t["role"].to_numpy(zero_copy_only=False)
                if "role" in t.column_names else np.full(len(t), "user"))
        tool = (t["tool"].to_numpy(zero_copy_only=False)
                if "tool" in t.column_names else np.full(len(t), ""))

        cid, cu = pd.factorize(conv)
        wsu, wsi = np.unique(ws, return_inverse=True)
        key = cid.astype(np.int64) * len(wsu) + wsi
        uk, codes = np.unique(key, return_inverse=True)
        G = len(uk)
        role_idx = np.asarray(
            [0 if r is None else
             ROLE_ORDER.index(r) if r in ROLE_ORDER else 4 for r in role])
        rc = np.bincount(codes * 5 + role_idx, minlength=G * 5).reshape(G, 5)
        has_tool = np.asarray([bool(x) for x in tool], dtype=np.int64)
        masked = np.bincount(codes, weights=has_tool,
                             minlength=G).astype(np.int64)
        return pd.DataFrame({
            "conv_id": np.asarray(cu, dtype=object).take(uk // len(wsu)),
            "window_start": wsu.take(uk % len(wsu)).astype("datetime64[us]"),
            "n_user": rc[:, 0], "n_assistant": rc[:, 1], "n_system": rc[:, 2],
            "n_tool": rc[:, 3], "n_other": rc[:, 4], "n_masked": masked,
        })

    part = ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def add_merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import zlib
        df = df.copy()
        df["_mb"] = [zlib.crc32(c.encode()) % num_merge_buckets
                     for c in df["conv_id"]]
        return df

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["conv_id", "window_start"], sort=True).sum(
            numeric_only=True).reset_index()
        rc = g[["n_user", "n_assistant", "n_system", "n_tool",
                "n_other"]].to_numpy(dtype=np.int64)
        n_turns = rc.sum(axis=1)
        a, c, gg, t = (rc[:, i].astype(np.float64) for i in range(4))
        with np.errstate(divide="ignore", invalid="ignore"):
            share = (gg + c) / (gg + c + a + t)
            skew_gc = (gg - c) / (gg + c)
            skew_at = (a - t) / (a + t)
        pr = rc.astype(np.float64) / n_turns[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(rc > 0, -pr * np.log2(np.where(pr > 0, pr, 1.0)),
                             0.0)
        out = g[["conv_id", "window_start"]].copy()
        out["n_turns"] = n_turns
        for i, name in enumerate(["n_user", "n_assistant", "n_system",
                                  "n_tool", "n_other"]):
            out[name] = rc[:, i]
        out["sys_asst_share"] = share
        out["sys_asst_skew"] = skew_gc
        out["user_tool_skew"] = skew_at
        out["masked_share"] = g["n_masked"].to_numpy() / n_turns
        out["role_entropy"] = terms.sum(axis=1)
        return out

    return (part.map_batches(add_merge_bucket, batch_format="pandas")
                .groupby("_mb").map_groups(merge, batch_format="pandas"))


def salted_session_stats(ds, gap_us: int, num_merge_buckets: int = 64,
                         profile: str = "full", ctw_depth: int = 6,
                         bigram: str = '"k', ctw_text: bool = False):
    """FULL per-session stats with BOUNDED group size (round-2 VERDICT #4).

    ``salted_session_counts`` stitches (start, end, n_turns) intervals;
    this generalises the stitch to full ``_WindowAcc`` partials: each
    batch emits one pickled accumulator per (conv, batch-local
    gap-maximal run) — role/char/k-gram histograms, bigram count and the
    (ts, uid, role) sequence for CTW — and the reduce stitches intervals
    whose inter-gap <= gap by MERGING accumulators (all state is additive
    integer counts plus a sequence that is re-sorted at finalize, so the
    merge is bit-identical to single-pass accumulation). The shuffle
    moves only accumulator state — histograms + 17 B/turn of (ts, uid,
    role) — never text, so a hot conversation costs a stitch task its
    compressed state, not 1/num_buckets of the raw corpus.

    Output rows are identical to the stateful engine's session rows
    (``StreamEngine`` kind="session" — pytest equality gate on a hot-key
    corpus).
    """
    import pickle

    from ..state.engine import (WindowConfig, _WindowAcc, _ASCII_UP,
                                _merge_counts, _text_stats, emitted_to_frame)
    from ..windows import session_ids

    cfg = WindowConfig(kind="session", gap_us=gap_us, profile=profile,
                       ctw_depth=ctw_depth, bigram=bigram, ctw_text=ctw_text)

    def partials(t: pa.Table) -> pd.DataFrame:
        n = len(t)
        cols = t.column_names
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        uid = (t["turn_uid"].to_numpy() if "turn_uid" in cols
               else t["turn_idx"].to_numpy() if "turn_idx" in cols
               else np.arange(n))
        role = (t["role"].to_numpy(zero_copy_only=False) if "role" in cols
                else np.full(n, "user", dtype=object))
        text = (t["text"].to_numpy(zero_copy_only=False) if "text" in cols
                else np.full(n, "", dtype=object))
        tool = (t["tool"].to_numpy(zero_copy_only=False) if "tool" in cols
                else np.full(n, "", dtype=object))
        order = np.lexsort((uid, ts, conv))
        conv, ts, uid = conv[order], ts[order], uid[order]
        role, text, tool = role[order], text[order], tool[order]
        cid, cu = pd.factorize(conv)
        starts = np.searchsorted(cid, np.arange(len(cu)))
        stops = np.searchsorted(cid, np.arange(len(cu)), side="right")
        want_stats = cfg.profile != "counts"
        rows = {"conv_id": [], "start": [], "end": [], "state": []}
        for ci in range(len(cu)):
            lo, hi = starts[ci], stops[ci]
            sub = ts[lo:hi]
            sid = session_ids(sub, gap_us)
            nloc = sid[-1] + 1 if len(sid) else 0
            first = np.searchsorted(sid, np.arange(nloc))
            last = np.searchsorted(sid, np.arange(nloc), side="right")
            for s in range(nloc):
                acc = _WindowAcc()
                for i in range(lo + first[s], lo + last[s]):
                    txt = str(text[i]) if text[i] is not None else ""
                    rl = str(role[i]) if role[i] is not None else "user"
                    stats = (_text_stats(txt, txt.translate(_ASCII_UP),
                                         cfg.bigram) if want_stats else None)
                    acc.add(int(ts[i]), int(uid[i]), rl, txt,
                            str(tool[i]) if tool[i] is not None else "",
                            cfg, stats)
                rows["conv_id"].append(cu[ci])
                rows["start"].append(int(sub[first[s]]))
                rows["end"].append(int(sub[last[s] - 1]))
                rows["state"].append(pickle.dumps(acc, protocol=5))
        return pd.DataFrame(rows)

    part = ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)

    def add_mb(df: pd.DataFrame) -> pd.DataFrame:
        import zlib
        df = df.copy()
        df["_mb"] = [zlib.crc32(c.encode()) % num_merge_buckets
                     for c in df["conv_id"]]
        return df

    def stitch(df: pd.DataFrame) -> pd.DataFrame:
        emitted: list[dict] = []

        def emit(conv, cur):
            row = cur[2].finalize(conv, cur[0], cur[1], cfg)
            row["session_start"] = row.pop("window_start")
            row["session_end"] = row.pop("window_end")
            del row["last_ts"]
            emitted.append(row)

        for conv, g in df.groupby("conv_id", sort=True):
            g = g.sort_values(["start", "end"])
            cur = None
            for r in g.itertuples():
                acc = pickle.loads(r.state)
                if cur is None:
                    cur = [r.start, r.end, acc]
                elif r.start - cur[1] <= gap_us:
                    cur[1] = max(cur[1], r.end)
                    merge_window_acc(cur[2], acc)
                else:
                    emit(conv, cur)
                    cur = [r.start, r.end, acc]
            if cur is not None:
                emit(conv, cur)
        return emitted_to_frame(emitted, "session")

    return (part.map_batches(add_mb, batch_format="pandas")
                .groupby("_mb").map_groups(stitch, batch_format="pandas"))


def salted_session_counts(ds, gap_us: int, num_merge_buckets: int = 64):
    """Session windows with salted partial assembly (hot-conversation
    safe): each batch emits per-conv partial session INTERVALS
    (start, end, n_turns) — gap-maximal within the batch — and the merge
    reduce stitches intervals whose inter-gap <= gap. Valid because the
    global sessions are the connected components of the gap relation and
    interval endpoints carry exactly the information the stitch needs;
    turn counts are additive. The shuffle moves only interval rows.

    Output: (conv_id, session_start, session_end, n_turns) — identical to
    stages.sessions.session_stats (pytest gate on a hot-key corpus).
    """
    from ..windows import session_ids

    def partial_sessions(t: pa.Table) -> pd.DataFrame:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, conv))
        conv, ts = conv[order], ts[order]
        cid, cu = pd.factorize(conv)
        rows = {"conv_id": [], "session_start": [], "session_end": [],
                "n_turns": []}
        starts = np.searchsorted(cid, np.arange(len(cu)))
        stops = np.searchsorted(cid, np.arange(len(cu)), side="right")
        for ci in range(len(cu)):
            sub = ts[starts[ci]:stops[ci]]
            sid = session_ids(sub, gap_us)
            n = sid[-1] + 1 if len(sid) else 0
            first = np.searchsorted(sid, np.arange(n))
            last = np.searchsorted(sid, np.arange(n), side="right") - 1
            for s in range(n):
                rows["conv_id"].append(cu[ci])
                rows["session_start"].append(sub[first[s]])
                rows["session_end"].append(sub[last[s]])
                rows["n_turns"].append(int(last[s] - first[s] + 1))
        return pd.DataFrame(rows)

    part = ds.map_batches(partial_sessions, batch_format="pyarrow",
                          zero_copy_batch=True)

    def add_mb(df: pd.DataFrame) -> pd.DataFrame:
        import zlib
        df = df.copy()
        df["_mb"] = [zlib.crc32(c.encode()) % num_merge_buckets
                     for c in df["conv_id"]]
        return df

    def stitch(df: pd.DataFrame) -> pd.DataFrame:
        outs = {"conv_id": [], "session_start": [], "session_end": [],
                "n_turns": []}
        for conv, g in df.groupby("conv_id", sort=True):
            g = g.sort_values("session_start")
            cur = None
            for r in g.itertuples():
                if cur is None:
                    cur = [r.session_start, r.session_end, r.n_turns]
                elif r.session_start - cur[1] <= gap_us:
                    cur[1] = max(cur[1], r.session_end)
                    cur[2] += r.n_turns
                else:
                    outs["conv_id"].append(conv)
                    outs["session_start"].append(cur[0])
                    outs["session_end"].append(cur[1])
                    outs["n_turns"].append(cur[2])
                    cur = [r.session_start, r.session_end, r.n_turns]
            if cur is not None:
                outs["conv_id"].append(conv)
                outs["session_start"].append(cur[0])
                outs["session_end"].append(cur[1])
                outs["n_turns"].append(cur[2])
        out = pd.DataFrame(outs)
        for c in ("session_start", "session_end"):
            out[c] = out[c].astype("datetime64[us]")
        return out

    return (part.map_batches(add_mb, batch_format="pandas")
                .groupby("_mb").map_groups(stitch, batch_format="pandas"))
