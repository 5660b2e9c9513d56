"""Conversation-level statistics + filtering — the transcript-corpus
curation unit is the CONVERSATION (keep/drop whole dialogues before
training), the way document pipelines filter documents.

One partial-aggregate exchange (the engine's standard discipline): each
batch emits per-conv partial rows (counts, char sums, ts min/max —
everything here is sum/min/max-mergeable), one ``groupby(conv_id)``
rollup, then a vectorized finalize map derives the per-conv features:

- n_turns, per-role counts + shares, tool_rate,
- duration_s (last ts − first ts), turns_per_hour,
- n_chars, chars_per_turn, avg user/assistant balance
  (|n_user − n_assistant| / n_turns — alternation proxy),
- starts_with_user (min turn_idx row role == user, carried as an
  argmin-mergeable (turn_idx, is_user) pair).

``filter_conversations`` applies threshold predicates to the stats and
SEMI-JOINS the survivors back onto the turns via the broadcast-id
filter (small side = conv ids), so the corpus is never shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

ROLE_ORDER = ("user", "assistant", "system", "tool", "other")


def conv_stats(ds):
    """Per-conversation stats Dataset → pandas frame (bounded by the
    number of conversations, which IS the result)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["role"] = df["role"].fillna("user").astype(str)
        df["text"] = df["text"].fillna("").astype(str)
        ts = df["ts"].astype("datetime64[us]").astype("int64")
        role = df["role"].where(df["role"].isin(ROLE_ORDER), "other")
        agg = pd.DataFrame({
            "conv_id": df["conv_id"].astype(str),
            "n_turns": 1,
            "n_chars": df["text"].str.len().astype(np.int64),
            "n_tool_calls": (df["tool"].fillna("") != "").astype(np.int64)
            if "tool" in df.columns else 0,
            "ts_min": ts, "ts_max": ts,
            "idx_min": df["turn_idx"].astype(np.int64)
            if "turn_idx" in df.columns else np.arange(len(df)),
        })
        for r in ROLE_ORDER:
            agg[f"n_{r}"] = (role == r).astype(np.int64)
        # argmin-mergeable first-role pair: (idx of first turn, is_user)
        agg["first_is_user"] = (role == "user").astype(np.int64)
        g = agg.groupby("conv_id", sort=False)
        out = g.agg(n_turns=("n_turns", "sum"),
                    n_chars=("n_chars", "sum"),
                    n_tool_calls=("n_tool_calls", "sum"),
                    ts_min=("ts_min", "min"), ts_max=("ts_max", "max"),
                    idx_min=("idx_min", "min"),
                    **{f"n_{r}": (f"n_{r}", "sum") for r in ROLE_ORDER})
        # first_is_user must ride the row of the min idx, not a sum
        first = agg.loc[agg.groupby("conv_id", sort=False)["idx_min"]
                        .idxmin(), ["conv_id", "first_is_user"]]
        out = out.reset_index().merge(first, on="conv_id")
        # min-mergeable encoding: idx dominates, flag rides the low bit
        out["_first_key"] = out["idx_min"] * 2 + (1 - out["first_is_user"])
        return pa.Table.from_pandas(out.drop(columns=["first_is_user"]),
                                    preserve_index=False)

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("conv_id")
                .aggregate(*_aggs()).to_pandas())
    if merged.empty:
        cols = (["conv_id", "n_turns", "n_chars", "n_tool_calls",
                 "duration_s", "turns_per_hour", "chars_per_turn",
                 "tool_rate", "role_balance", "starts_with_user"]
                + [f"n_{r}" for r in ROLE_ORDER])
        return pd.DataFrame(columns=cols)
    ren = {f"sum({c})": c for c in
           ["n_turns", "n_chars", "n_tool_calls"]
           + [f"n_{r}" for r in ROLE_ORDER]}
    ren.update({"min(ts_min)": "ts_min", "max(ts_max)": "ts_max",
                "min(idx_min)": "idx_min", "min(_first_key)": "_first_key"})
    merged = merged.rename(columns=ren)
    dur = (merged["ts_max"] - merged["ts_min"]) / 1e6
    nt = merged["n_turns"].astype(np.float64)
    merged["duration_s"] = dur
    merged["turns_per_hour"] = np.where(dur > 0, nt / (dur / 3600), np.inf)
    merged["chars_per_turn"] = merged["n_chars"] / nt
    merged["tool_rate"] = merged["n_tool_calls"] / nt
    merged["role_balance"] = \
        np.abs(merged["n_user"] - merged["n_assistant"]) / nt
    # _first_key = idx_min * 2 + (1 - first_is_user): min over partials
    # recovers the GLOBAL first turn's flag
    merged["starts_with_user"] = (merged["_first_key"] % 2 == 0)
    keep = (["conv_id", "n_turns", "n_chars", "n_tool_calls",
             "duration_s", "turns_per_hour", "chars_per_turn",
             "tool_rate", "role_balance", "starts_with_user"]
            + [f"n_{r}" for r in ROLE_ORDER])
    return merged[keep].sort_values("conv_id").reset_index(drop=True)


def _aggs():
    from ray.data.aggregate import Max, Min, Sum
    aggs = [Sum(c) for c in (["n_turns", "n_chars", "n_tool_calls"]
                             + [f"n_{r}" for r in ROLE_ORDER])]
    aggs += [Min("ts_min"), Max("ts_max"), Min("idx_min"),
             Min("_first_key")]
    return aggs


def filter_conversations(ds, min_turns: int = 2, max_turns: int = 10 ** 9,
                         min_chars_per_turn: float = 0.0,
                         max_tool_rate: float = 1.0,
                         require_user_start: bool = False):
    """Keep whole conversations passing the thresholds; returns
    (filtered turns Dataset, stats frame with a ``kept`` column).

    The keep-set is bounded by the conversation count; it broadcasts as
    a plain set inside one shuffle-free filter pass (the semi-join shape
    used everywhere in this engine for small keep-sides)."""
    import ray

    stats = conv_stats(ds)
    kept = ((stats["n_turns"] >= min_turns)
            & (stats["n_turns"] <= max_turns)
            & (stats["chars_per_turn"] >= min_chars_per_turn)
            & (stats["tool_rate"] <= max_tool_rate))
    if require_user_start:
        kept &= stats["starts_with_user"]
    stats = stats.assign(kept=kept)
    keep_ref = ray.put(set(stats.loc[kept, "conv_id"]))

    def keep_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = ray.get(keep_ref)
        mask = pc.is_in(t["conv_id"].cast(pa.string()),
                        value_set=pa.array(sorted(ids), pa.string()))
        return t.filter(mask)

    return ds.map_batches(keep_rows, batch_format="pyarrow",
                          zero_copy_batch=True), stats


def conv_documents(ds, num_buckets: int = 64, sep: str = "\n"):
    """One document per conversation: turns concatenated in (ts,
    turn_uid) order — the projection that lets every document-level
    operator (dedup, quality, fingerprinting) run at conversation
    granularity. One bucket shuffle; groups bounded by n/num_buckets.

    Emits (doc_id int64, conv_id, text): the document pipelines key on
    int64 ids, so doc_id is a 64-bit md5 fold of conv_id — stable
    across runs/partitionings; collision odds are ~n²/2⁶⁵ (negligible
    below ~10⁹ conversations; shard by conv prefix beyond that)."""
    import hashlib

    from .window_stats import add_bucket
    ds = add_bucket(ds, num_buckets)

    def concat(df: pd.DataFrame) -> pd.DataFrame:
        order = ["conv_id", "ts"] + [c for c in ("turn_uid", "turn_idx")
                                     if c in df.columns]
        df = df.sort_values(order, kind="stable")
        g = (df.groupby("conv_id", sort=False)["text"]
               .agg(lambda s: sep.join(s.fillna("").astype(str))))
        convs = g.index.astype(str).to_numpy(object)
        ids = np.fromiter(
            (int.from_bytes(hashlib.md5(c.encode()).digest()[:8],
                            "big") >> 1 for c in convs),
            np.int64, len(convs))
        return pd.DataFrame({"doc_id": ids, "conv_id": convs,
                             "text": g.to_numpy()})

    return ds.groupby("bucket").map_groups(concat, batch_format="pandas")


def conv_near_dups(ds, threshold: float = 0.7, num_perm: int = 128,
                   bands: int = 16, shingle_k: int = 7,
                   num_buckets: int = 64):
    """Near-duplicate CONVERSATIONS (template spam, replayed dialogues):
    concatenate each conversation's turns, then run the engine's MinHash
    → LSH-bucket → exact-Jaccard-verify pipeline at conversation
    granularity; same bounded shapes as the document pipeline
    (band-rows-only exchange, capped hot buckets, candidates-only
    verification). Returns a pandas frame (conv_a, conv_b, jaccard) —
    bounded by the verified pair count."""
    import ray
    import pyarrow.compute as pc

    from .dedup import (lsh_candidate_pairs, minhash_band_rows,
                        verify_jaccard_distributed)
    docs = conv_documents(ds, num_buckets=num_buckets)
    dd = docs.map_batches(lambda t: t.select(["doc_id", "text"]),
                          batch_format="pyarrow", zero_copy_batch=True)
    bands_ds = minhash_band_rows(dd, num_perm=num_perm, bands=bands,
                                 shingle_k=shingle_k)
    cand = lsh_candidate_pairs(bands_ds, dedup=False,
                               num_buckets=num_buckets)
    pairs = verify_jaccard_distributed(cand, dd, shingle_k=shingle_k,
                                       threshold=threshold,
                                       num_buckets=num_buckets).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"conv_a": pd.Series(dtype=object),
                             "conv_b": pd.Series(dtype=object),
                             "jaccard": pd.Series(dtype=float)})
    # map the (bounded) pair ids back to conv_id strings: broadcast-id
    # filtered scan of the conv documents, never a corpus shuffle
    ids = np.unique(np.concatenate([pairs["doc_a"].to_numpy(),
                                    pairs["doc_b"].to_numpy()]))
    iref = ray.put(ids)

    def pick(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["doc_id"],
                        value_set=pa.array(ray.get(iref), pa.int64()))
        return t.filter(mask).select(["doc_id", "conv_id"])

    mapping = docs.map_batches(pick, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    m = dict(zip(mapping["doc_id"], mapping["conv_id"]))
    return pd.DataFrame({
        "conv_a": [m[i] for i in pairs["doc_a"]],
        "conv_b": [m[i] for i in pairs["doc_b"]],
        "jaccard": pairs["jaccard"].to_numpy()})
