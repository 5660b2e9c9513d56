"""Substring-level duplicate detection over the ``documents`` table:
exact duplicated L-grams, winnowing fingerprints (the scale path), and
duplicate-span stripping.

This is the "dedup below document granularity" family from the training-
data-curation literature (Lee et al., "Deduplicating Training Data Makes
Language Models Better" — exact substring dedup; Schleimer/Wilkerson/
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting" — the
sampled-fingerprint scale variant). Document-level dedup (exact /
MinHash, ``stages/dedup.py``) misses boilerplate repeated INSIDE
otherwise-distinct documents; these operators find and remove it.

Ray-Data shapes (no full-corpus driver materialization anywhere):

- ``duplicate_grams`` (EXACT, oracle-able): one rolling-hash pass over
  the concatenated codepoint buffer of each batch (no per-doc Python
  loop) → per-doc-unique (gram_hash, doc_id) rows → ONE bounded-bucket
  shuffle → distinct-doc counts per hash → candidate hashes with
  count ≥ 2. A 64-bit hash collision can only ADD a candidate (the same
  gram always hashes the same, so no true duplicate is lost); pass 2
  extracts the actual gram strings at candidate positions only and
  re-groups BY THE STRING, so the final output is exact regardless of
  collisions. Only duplicated grams are ever materialized as strings —
  the pass-1 exchange moves fixed-width (hash, id) rows.
- ``winnow_fingerprints`` / ``winnowed_duplicate_candidates``: the
  100-TB path. Winnowing samples ~2/(w+1) of positions yet GUARANTEES
  any shared substring of length ≥ L + w - 1 shares a fingerprint
  (pytest-gated on planted spans), so the exchange shrinks ~8× at
  w = 15 while keeping a detection floor.
- ``strip_duplicate_spans``: removes every character covered by an
  L-gram that occurs in ≥ 2 distinct documents (Lee et al.'s ExactSubstr
  removal, self-inclusive variant: ALL occurrences are stripped, which
  keeps the operator a pure per-doc map after the broadcast — no global
  "keep one occurrence" ordering shuffle). Hit positions are verified
  against the actual duplicated-gram STRING set (broadcast once via
  ``ray.put``), so stripping is exact, not hash-trusting.

Scale assumption (documented, mirrors ``verify_jaccard_distributed``):
the duplicated-gram set — which IS the operator's output — fits the
driver/object store. On corpora where boilerplate dominates, lower L or
raise ``min_docs`` first; the pass-1 exchange itself never materializes
text and is bucket-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_B1 = np.uint64(1099511628211)  # FNV-ish odd multiplier, wraps mod 2^64


def _codepoint_buffer(texts) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts as a uint32 CODEPOINT buffer (+ per-doc lengths).

    Codepoints, not bytes: SQL ``substr`` and Python slicing are both
    character-based, so gram extraction and the oracle agree on any
    input, not just ASCII."""
    enc = [t.encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(e) >> 2 for e in enc), np.int64, len(enc))
    buf = np.frombuffer(b"".join(enc), dtype=np.uint32)
    return buf, lens


def _rolling_gram_hashes(texts, L: int) -> tuple[np.ndarray, np.ndarray]:
    """64-bit rolling hash of every L-codepoint window of every text, in
    ONE vectorized pass over the concatenated buffer (cross-doc windows
    masked out by index arithmetic — same shape as
    ``MinHasher.shingle_segments``). Returns (hashes, nwin_per_doc)."""
    nd = len(texts)
    buf, lens = _codepoint_buffer(texts)
    nwin = np.maximum(lens - L + 1, 0)
    total = int(nwin.sum())
    if total == 0:
        return np.zeros(0, np.uint64), nwin
    n = len(buf)
    h = np.zeros(n - L + 1, np.uint64)
    for j in range(L):  # L vector ops, not a per-row loop
        h = h * _B1 + buf[j: n - L + 1 + j].astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    cum = np.concatenate([[0], np.cumsum(nwin)])
    idx = np.repeat(starts - cum[:-1], nwin) + np.arange(total)
    return h[idx], nwin


def _doc_unique(vals: np.ndarray, doc_of: np.ndarray):
    """Keep one row per (doc, value): lexsort + keep-firsts."""
    order = np.lexsort((vals, doc_of))
    dv, vv = doc_of[order], vals[order]
    keep = np.ones(len(vv), dtype=bool)
    keep[1:] = (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])
    return dv[keep], vv[keep]


def gram_hash_rows(batch: pd.DataFrame, L: int, text_col: str,
                   id_col: str) -> pd.DataFrame:
    """Per-batch stage 1: per-doc-unique (hash, id) rows for every
    L-gram. int64 view of the uint64 hash (Arrow-friendly; the view is a
    bijection so grouping/joining semantics are unchanged)."""
    texts = batch[text_col].tolist()
    h, nwin = _rolling_gram_hashes(texts, L)
    doc_of = np.repeat(np.arange(len(texts)), nwin)
    dv, vv = _doc_unique(h, doc_of)
    ids = batch[id_col].to_numpy()[dv]
    return pd.DataFrame({"_h": vv.view(np.int64), id_col: ids})


def _candidate_hashes(ds, L: int, text_col: str, id_col: str,
                      num_buckets: int, min_docs: int) -> np.ndarray:
    """Pass 1: sorted int64 array of gram hashes seen in ≥ min_docs
    distinct docs (superset of the true duplicated grams; exact up to
    64-bit collisions, which pass 2 removes)."""
    rows = ds.map_batches(
        lambda df: gram_hash_rows(df, L, text_col, id_col)
                     .assign(_hb=lambda d: d["_h"] % num_buckets),
        batch_format="pandas")

    def dup_hashes(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("_h", sort=False)[id_col].nunique()
        return pd.DataFrame({"_h": nd.index[nd >= min_docs].to_numpy()})

    cand = rows.groupby("_hb").map_groups(dup_hashes, batch_format="pandas")
    # the candidate set is output-sized (duplicated grams only) — the
    # documented small-side assumption; see module docstring.
    out = cand.to_pandas()
    arr = (out["_h"].to_numpy(np.int64) if len(out)
           else np.zeros(0, np.int64))
    return np.sort(arr)


def _isin_sorted(q: np.ndarray, sorted_vals: np.ndarray) -> np.ndarray:
    if len(sorted_vals) == 0:
        return np.zeros(len(q), dtype=bool)
    pos = np.searchsorted(sorted_vals, q)
    pos = np.minimum(pos, len(sorted_vals) - 1)
    return sorted_vals[pos] == q


def _hit_positions(texts, L: int, cand_sorted: np.ndarray):
    """Per doc, positions whose L-gram hash is in the candidate set.
    Yields (doc_index, positions ndarray)."""
    h, nwin = _rolling_gram_hashes(texts, L)
    hit = _isin_sorted(h.view(np.int64), cand_sorted)
    cum = np.concatenate([[0], np.cumsum(nwin)])
    for i in range(len(texts)):
        seg = hit[cum[i]:cum[i + 1]]
        if seg.any():
            yield i, np.flatnonzero(seg)


def duplicate_grams(ds, L: int = 40, text_col: str = "text",
                    id_col: str = "doc_id", num_buckets: int = 64,
                    min_docs: int = 2):
    """EXACT duplicated L-grams: every distinct L-codepoint substring
    occurring in ≥ ``min_docs`` distinct documents, with its distinct-doc
    count. Returns a Dataset of (gram, n_docs).

    Two passes (see module docstring): hash-only exchange → candidate
    hashes → string extraction at candidate positions only → exact
    re-group by the gram string. SQL twin: ``substr`` × generate_series
    cross join, GROUP BY gram HAVING count(DISTINCT id) ≥ min_docs.
    """
    import ray

    cand = _candidate_hashes(ds, L, text_col, id_col, num_buckets, min_docs)
    cand_ref = ray.put(cand)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        cand_sorted = ray.get(cand_ref)
        texts = df[text_col].tolist()
        ids = df[id_col].to_numpy()
        out_g, out_i = [], []
        for i, pos in _hit_positions(texts, L, cand_sorted):
            t = texts[i]
            grams = {t[p:p + L] for p in pos}  # candidate hits are rare
            out_g.extend(grams)
            out_i.extend([ids[i]] * len(grams))
        return pd.DataFrame({"gram": pd.Series(out_g, dtype=str),
                             id_col: pd.Series(out_i, dtype=np.int64)})

    pairs = ds.map_batches(extract, batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _text_hash_int64
        df = df.copy()
        df["_gb"] = (_text_hash_int64(df["gram"]) % num_buckets
                     if len(df) else np.zeros(0, np.int64))
        return df

    def count_docs(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("gram", sort=False)[id_col].nunique()
        nd = nd[nd >= min_docs]
        return pd.DataFrame({"gram": nd.index.to_numpy(),
                             "n_docs": nd.to_numpy(np.int64)})

    return (pairs.map_batches(bucket, batch_format="pandas")
                 .groupby("_gb").map_groups(count_docs,
                                            batch_format="pandas"))


def strip_duplicate_spans(ds, L: int = 40, text_col: str = "text",
                          id_col: str = "doc_id", num_buckets: int = 64,
                          dup_grams=None):
    """Remove every character covered by an L-gram occurring in ≥ 2
    distinct documents (Lee et al. ExactSubstr removal, all-occurrences
    variant). Returns (id, text_clean, n_removed).

    Exact: hash hits are verified against the duplicated-gram STRING set
    (computed by :func:`duplicate_grams` unless supplied) broadcast once
    via ``ray.put`` — a hash collision can cost a set lookup, never a
    wrong strip. Coverage union is the diff/cumsum interval trick, not a
    per-position loop."""
    import ray

    if dup_grams is None:
        dup = duplicate_grams(ds, L, text_col, id_col, num_buckets)
        dup_grams = dup.to_pandas()["gram"].tolist()
    gram_set = set(dup_grams)
    # hashes recomputed locally so strip needs no second distributed pass
    if gram_set:
        h, _ = _rolling_gram_hashes(sorted(gram_set), L)
        cand = np.sort(np.unique(h.view(np.int64)))
    else:
        cand = np.zeros(0, np.int64)
    state = ray.put((cand, gram_set))

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        cand_sorted, grams = ray.get(state)
        texts = df[text_col].tolist()
        cleaned = list(texts)
        removed = np.zeros(len(texts), np.int64)
        for i, pos in _hit_positions(texts, L, cand_sorted):
            t = texts[i]
            pos = pos[[t[p:p + L] in grams for p in pos]]
            if len(pos) == 0:
                continue
            delta = np.zeros(len(t) + 1, np.int64)
            np.add.at(delta, pos, 1)
            np.add.at(delta, np.minimum(pos + L, len(t)), -1)
            cover = np.cumsum(delta[:-1]) > 0
            removed[i] = int(cover.sum())
            arr = np.frombuffer(t.encode("utf-32-le"), np.uint32)
            cleaned[i] = arr[~cover].tobytes().decode("utf-32-le")
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "text_clean": cleaned,
                             "n_removed": removed})

    return ds.map_batches(strip, batch_format="pandas")


# ---------------------------------------------------------------------------
# Winnowing (the sampled scale path)
# ---------------------------------------------------------------------------

def winnow_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Selected fingerprint positions for one doc's gram-hash sequence:
    the minimum of every window of ``w`` consecutive hashes, ties broken
    RIGHTMOST (Schleimer et al. §4; with 64-bit hashes ties are
    negligible, so the guarantee below holds in practice and is
    pytest-gated). Vectorized via sliding_window_view + argmin over the
    reversed window."""
    n = len(h)
    if n == 0:
        return np.zeros(0, np.int64)
    if n <= w:
        # one window covering everything
        return np.array([n - 1 - int(np.argmin(h[::-1]))], np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    rel = w - 1 - np.argmin(win[:, ::-1], axis=1)
    return np.unique(np.arange(n - w + 1) + rel)


def winnow_fingerprints(ds, L: int = 25, w: int = 15,
                        text_col: str = "text", id_col: str = "doc_id"):
    """(id, fp, pos) winnowing fingerprints per document. Any two
    documents sharing a substring of ≥ L + w - 1 codepoints share at
    least one fp value (the winnowing guarantee) while only ~2/(w+1) of
    positions are emitted — this is the exchange the 100-TB substring
    pipeline ships instead of every position."""
    def fps(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].tolist()
        ids = df[id_col].to_numpy()
        h, nwin = _rolling_gram_hashes(texts, L)
        cum = np.concatenate([[0], np.cumsum(nwin)])
        out_f, out_p, out_i = [], [], []
        for i in range(len(texts)):  # inner work is vectorized
            seg = h[cum[i]:cum[i + 1]]
            if len(seg) == 0:
                continue
            pos = winnow_positions(seg, w)
            out_f.append(seg[pos].view(np.int64))
            out_p.append(pos)
            out_i.append(np.full(len(pos), ids[i], np.int64))
        if not out_f:
            return pd.DataFrame({"fp": pd.Series(dtype=np.int64),
                                 "pos": pd.Series(dtype=np.int64),
                                 id_col: pd.Series(dtype=np.int64)})
        return pd.DataFrame({"fp": np.concatenate(out_f),
                             "pos": np.concatenate(out_p),
                             id_col: np.concatenate(out_i)})

    return ds.map_batches(fps, batch_format="pandas")


def winnowed_duplicate_candidates(ds, L: int = 25, w: int = 15,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  num_buckets: int = 64,
                                  bucket_cap: int = 200):
    """Candidate (doc_a, doc_b) pairs sharing a winnowing fingerprint —
    the sampled-substring analogue of ``lsh_candidate_pairs``, with the
    same deterministic hot-bucket cap + logged drop. Consumers verify
    candidates exactly (e.g. via ``duplicate_grams`` on the candidate
    subset or span alignment)."""
    rows = winnow_fingerprints(ds, L, w, text_col, id_col)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["fp", id_col]].copy()
        df["_fb"] = df["fp"] % num_buckets
        return df

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        n_trunc = 0
        for fp, g in df.groupby("fp", sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > bucket_cap:
                n_trunc += 1
                rng = np.random.default_rng(int(fp) & 0x7FFFFFFF)
                ids = np.sort(rng.choice(ids, bucket_cap, replace=False))
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if n_trunc:
            import logging
            logging.getLogger(__name__).warning(
                "winnowed_duplicate_candidates: %d hot fingerprints "
                "capped at %d ids", n_trunc, bucket_cap)
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)}
                            ).drop_duplicates()

    from .dedup import dedup_pairs
    cand = (rows.map_batches(bucket, batch_format="pandas")
                .groupby("_fb").map_groups(pairs, batch_format="pandas"))
    return dedup_pairs(cand, num_buckets=num_buckets)
