"""Corpus-level heavy hitters: EXACT top-k frequent terms at bounded
memory, via a mergeable frequency summary + exact recount + an
exactness certificate.

Why not ``groupby(term).count() -> sort -> limit k``?  At 10^12 turns
the term exchange carries one row per DISTINCT term per batch and the
sort is an all-to-all over the full vocabulary (word-level vocab is
~10^8, n-gram vocab unbounded).  The two-pass shape here caps every
exchange and the driver state at ``capacity``-ish rows regardless of
vocabulary size:

Pass 1 (summary): each batch counts exactly (Arrow ``value_counts``),
keeps its top-``capacity`` terms, and records the (capacity+1)-th
count as its truncation bound delta_b — any dropped term occurred at
most delta_b times in that batch.  Partials merge by
``groupby(term).sum`` (counter addition — the Misra-Gries/SpaceSaving
mergeability result, Agarwal et al., "Mergeable Summaries", PODS'12);
the global bound D = sum(delta_b) bounds the undercount of ANY term:
summary_count(t) >= true_count(t) - D, and a term absent from the
merged summary has true_count <= D.

Pass 2 (recount): the top ``n_candidates`` summary terms are broadcast
(``ray.put``) and recounted EXACTLY with a filtered per-batch count +
one tiny groupby — candidates are a pure small-side lookup, the corpus
is never shuffled.

Certificate: let boundary = the largest summary count among terms NOT
selected as candidates.  Any non-candidate's true count is
<= boundary + D, so if the k-th exact candidate count > boundary + D
the result is PROVABLY the exact top-k (the gate the oracle-paired
query asserts).  On skewed (Zipfian) data the certificate holds with
tiny capacities; a flat distribution needs capacity ~ vocabulary and
the operator reports certified=False instead of silently lying.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def words_of(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Split a string column into lowercased word tokens, KEEPING empty
    tokens — exact parity with SQL ``string_split(lower(text), ' ')``
    (consecutive spaces yield '' both sides)."""
    flat = pc.list_flatten(pc.split_pattern(pc.utf8_lower(col), " "))
    return flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat


@dataclass
class HeavyHittersResult:
    top: pd.DataFrame          # (term, n, rank) — exact counts
    certified: bool            # True => provably the exact global top-k
    bound: int                 # D + boundary: max possible non-candidate count
    kth_count: int             # exact count of the k-th reported term


def heavy_hitters(ds, col: str, k: int = 20, capacity: int = 4096,
                  n_candidates: int | None = None,
                  tokenize: str | None = None) -> HeavyHittersResult:
    """Exact top-k most frequent terms of ``col`` (or of its word
    tokens with ``tokenize='words'``), certified via the merged-summary
    bound.  Ties rank deterministically by (count desc, term asc).
    """
    n_cand = n_candidates or max(4 * k, 64)

    def summarize(t: pa.Table) -> pa.Table:
        terms = words_of(t[col]) if tokenize == "words" else \
            t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) \
            else t[col]
        vc = pc.value_counts(terms)
        v = vc.field("values")
        c = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(c) > capacity:
            part = np.argpartition(c, -capacity)[-capacity:]
            delta = int(np.partition(c, -capacity - 1)[-capacity - 1])
            v, c = v.take(pa.array(part)), c[part]
        else:
            delta = 0
        out = pa.table({"term": pc.cast(v, pa.string()),
                        "n": pa.array(c.astype(np.int64)),
                        "is_delta": pa.array(np.zeros(len(c), np.int8))})
        bound_row = pa.table({"term": pa.array(["", ], pa.string()),
                              "n": pa.array([delta], pa.int64()),
                              "is_delta": pa.array([1], pa.int8())})
        return pa.concat_tables([out, bound_row])

    merged = (ds.map_batches(summarize, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby(["is_delta", "term"]).sum("n"))

    # per-block partial top-(n_cand+1) before the driver collect: after
    # the global sum each term lives in exactly one block, so every
    # global top-(n_cand+1) term survives a per-block top-(n_cand+1)
    # cut, and dropped terms are provably below the global boundary —
    # driver state is O(blocks x n_cand), not the vocabulary union.
    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "is_delta" not in df.columns:
            return pd.DataFrame({"is_delta": pd.Series(dtype=np.int8),
                                 "term": pd.Series(dtype=object),
                                 "sum(n)": pd.Series(dtype=np.int64)})
        deltas = df[df["is_delta"] == 1]
        top = (df[df["is_delta"] == 0]
               .sort_values(["sum(n)", "term"], ascending=[False, True],
                            kind="stable").head(n_cand + 1))
        return pd.concat([deltas, top], ignore_index=True)

    summary = merged.map_batches(block_top,
                                 batch_format="pandas").to_pandas()
    if summary.empty:  # all-empty input loses column names through Ray
        return HeavyHittersResult(
            pd.DataFrame({"term": pd.Series(dtype=object),
                          "n": pd.Series(dtype=np.int64),
                          "rank": pd.Series(dtype=np.int64)}),
            True, 0, 0)
    d_total = int(summary.loc[summary["is_delta"] == 1, "sum(n)"].sum())
    terms = (summary[summary["is_delta"] == 0]
             .rename(columns={"sum(n)": "mg"})
             .sort_values(["mg", "term"], ascending=[False, True],
                          kind="stable").reset_index(drop=True))
    cand = terms.head(n_cand)
    boundary = int(terms["mg"].iloc[n_cand]) if len(terms) > n_cand else 0

    if cand.empty:
        return HeavyHittersResult(
            pd.DataFrame({"term": pd.Series(dtype=object),
                          "n": pd.Series(dtype=np.int64),
                          "rank": pd.Series(dtype=np.int64)}),
            True, 0, 0)

    import ray
    cand_ref = ray.put(pa.array(cand["term"].tolist(), pa.string()))

    def recount(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        terms_ = words_of(t[col]) if tokenize == "words" else \
            t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) \
            else t[col]
        kept = pc.filter(terms_, pc.is_in(terms_, value_set=cands))
        vc = pc.value_counts(kept)
        return pa.table({
            "term": pc.cast(vc.field("values"), pa.string()),
            "n": pc.cast(vc.field("counts"), pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby("term").sum("n").to_pandas()
               .rename(columns={"sum(n)": "n"}))
    exact = exact.sort_values(["n", "term"], ascending=[False, True],
                              kind="stable").head(k).reset_index(drop=True)
    exact["n"] = exact["n"].astype(np.int64)
    exact["rank"] = np.arange(1, len(exact) + 1, dtype=np.int64)
    kth = int(exact["n"].iloc[-1]) if len(exact) else 0
    # trivially exact when no batch ever truncated AND every summary
    # term was recounted (the summary IS the full exact count table);
    # otherwise the k-th exact count must clear the adversarial bound
    certified = (d_total == 0 and len(terms) <= n_cand) or \
        kth > boundary + d_total
    return HeavyHittersResult(exact, bool(certified),
                              boundary + d_total, kth)


def windowed_heavy_hitters(ds, ts_col: str, text_col: str, size_us: int,
                           k: int = 10, capacity: int = 1024,
                           tokenize: str | None = "words") -> pd.DataFrame:
    """Top-k terms PER TUMBLING WINDOW ("trending terms"), with the
    same bounded-memory summary + per-window exactness certificate as
    ``heavy_hitters``.

    Same two-pass shape as the corpus operator, per window: (1) batch
    summaries — exact (window, term) counts truncated to each window's
    top-``capacity`` with a recorded per-(batch, window) delta — merge
    by counter addition under one window-grouped exchange, selecting
    each window's candidates + bound; (2) candidates are broadcast and
    RECOUNTED exactly (merged summary counts can undercount a term that
    was truncated in some batch — the recount makes the reported n and
    the intra-top-k order exact, not just the membership).  A window is
    ``certified`` iff its exact kth count > boundary + sum(deltas);
    too-flat windows report ``certified=False`` rather than lying.
    Driver state: windows x ~4k candidate terms (windows are bounded by
    the time span).  Output: (window_start, term, n, rank, certified).
    """
    from ..windows import tumbling_start

    def summarize(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        win = tumbling_start(ts, size_us)
        if tokenize == "words":
            toks = pc.split_pattern(pc.utf8_lower(t[text_col]), " ")
            counts = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False)
            terms = pc.list_flatten(toks)
            win = np.repeat(win, counts)
        else:
            terms = t[text_col]
        df = pd.DataFrame({"w": win,
                           "term": terms.to_pandas().astype(str)})
        g = (df.groupby(["w", "term"], sort=False)
               .size().rename("n").reset_index())
        frames = []
        for w, sub in g.groupby("w", sort=False):
            sub = sub.sort_values(["n", "term"],
                                  ascending=[False, True], kind="stable")
            delta = int(sub["n"].iloc[capacity]) \
                if len(sub) > capacity else 0
            top = sub.head(capacity)[["w", "term", "n"]].copy()
            top["is_delta"] = np.int8(0)
            frames.append(top)
            frames.append(pd.DataFrame({"w": [w], "term": [""],
                                        "n": [delta],
                                        "is_delta": [np.int8(1)]}))
        out = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"w": pd.Series(dtype=np.int64),
                          "term": pd.Series(dtype=object),
                          "n": pd.Series(dtype=np.int64),
                          "is_delta": pd.Series(dtype=np.int8)})
        return pa.Table.from_pandas(out, preserve_index=False)

    n_cand = max(4 * k, 64)
    empty = pd.DataFrame({"window_start": pd.Series(dtype=np.int64),
                          "term": pd.Series(dtype=object),
                          "n": pd.Series(dtype=np.int64),
                          "rank": pd.Series(dtype=np.int64),
                          "certified": pd.Series(dtype=bool)})

    def select_candidates(df: pd.DataFrame) -> pd.DataFrame:
        w = int(df["w"].iloc[0])
        d_total = int(df.loc[df["is_delta"] == 1, "n"].sum())
        terms = (df[df["is_delta"] == 0]
                 .groupby("term", as_index=False)["n"].sum()
                 .sort_values(["n", "term"], ascending=[False, True],
                              kind="stable").reset_index(drop=True))
        cand = terms.head(n_cand)
        boundary = int(terms["n"].iloc[n_cand]) \
            if len(terms) > n_cand else 0
        all_kept = len(terms) <= n_cand
        return pd.DataFrame({
            "w": np.full(len(cand), w, np.int64),
            "term": cand["term"].to_numpy(),
            "bound": np.full(len(cand), boundary + d_total, np.int64),
            "trivial": np.full(len(cand),
                               d_total == 0 and all_kept, bool)})

    cands = (ds.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby("w").map_groups(select_candidates,
                                        batch_format="pandas")
               .to_pandas())
    if cands.empty:
        return empty
    import ray
    bounds = {int(w): (int(sub["bound"].iloc[0]),
                       bool(sub["trivial"].iloc[0]))
              for w, sub in cands.groupby("w", sort=False)}
    wref = ray.put(cands[["w", "term"]])

    def recount(t: pa.Table) -> pa.Table:
        cand_pairs = ray.get(wref)
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        win = tumbling_start(ts, size_us)
        if tokenize == "words":
            toks = pc.split_pattern(pc.utf8_lower(t[text_col]), " ")
            counts = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False)
            terms = pc.list_flatten(toks).to_pandas().astype(str)
            win = np.repeat(win, counts)
        else:
            terms = t[text_col].to_pandas().astype(str)
        df = pd.DataFrame({"w": win, "term": terms})
        # vectorized candidate filter: inner merge against the
        # broadcast (w, term) pair table
        g = (df.merge(cand_pairs, on=["w", "term"])
               .groupby(["w", "term"], sort=False)
               .size().rename("n").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        w = int(df["w"].iloc[0])
        exact = (df.groupby("term", as_index=False)["n"].sum()
                   .sort_values(["n", "term"], ascending=[False, True],
                                kind="stable").reset_index(drop=True))
        top = exact.head(k)
        bound, trivial = bounds[w]
        kth = int(top["n"].iloc[-1]) if len(top) else 0
        certified = trivial or kth > bound
        return pd.DataFrame({
            "window_start": np.full(len(top), w, np.int64),
            "term": top["term"].to_numpy(),
            "n": top["n"].to_numpy(np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "certified": np.full(len(top), certified, bool)})

    out = (ds.map_batches(recount, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("w").map_groups(finish, batch_format="pandas")
             .to_pandas())
    if out.empty:
        return empty
    return (out.sort_values(["window_start", "rank"])
               .reset_index(drop=True))
