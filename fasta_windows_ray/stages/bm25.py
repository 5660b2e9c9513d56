"""BM25 lexical retrieval — the classic sparse complement to the dense
ANN stack (Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond", FnTIR 2009): corpus statistics once,
query-time scoring as a broadcast scan.

Ray-Data shapes:

- ``bm25_stats``: ONE bounded exchange builds the model — per-batch
  document-frequency partials (each batch contributes at most one row
  per distinct term; term table capped at ``max_terms`` by DF with the
  truncation REPORTED, the word_counts/BPE discipline) plus the scalar
  (n_docs, total_len) accumulators. The model (term → idf, avgdl) is
  corpus-stats-sized, not corpus-sized.
- ``bm25_topk``: queries broadcast once (ray.put); each batch scores
  its documents against every query fully vectorized (one term-id
  matmul-free pass: per-doc term counts × idf lookups), keeps a
  per-batch partial top-k, and a tiny driver merge finishes — exactly
  the ``brute_force_topk`` shape, so the scan parallelizes and nothing
  corpus-sized leaves the tasks. The scale path for repeated querying
  is the persisted catalog + Bloom/zorder pruning on a term-bucketed
  layout; this operator is the correct one-shot/evaluation baseline.

Tokenization = ``bpe._pretokenize`` (lowercase whitespace split),
shared so lexical and subword operators agree on word boundaries.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from .bpe import _pretokenize


def bm25_stats(ds, text_col: str = "text", max_terms: int = 262_144):
    """Corpus statistics for BM25: returns a dict with ``df`` (pandas
    Series term → document frequency, top ``max_terms`` by DF),
    ``n_docs``, ``avgdl``, ``n_terms_total`` (pre-cap distinct count —
    truncation is reported, never silent)."""

    def partial(t: pa.Table) -> pa.Table:
        df_c: Counter = Counter()
        n_docs, total_len = 0, 0
        for s in t[text_col].to_pylist():
            toks = _pretokenize(s or "")
            n_docs += 1
            total_len += len(toks)
            df_c.update(set(toks))
        rows = {"term": list(df_c.keys()),
                "df": list(df_c.values())}
        # scalar accumulators ride as sentinel terms (tab-prefixed —
        # impossible output of the whitespace pre-tokenizer)
        rows["term"] += ["\t_docs", "\t_len"]
        rows["df"] += [n_docs, total_len]
        return pa.table({"term": pa.array(rows["term"], pa.string()),
                         "df": pa.array(rows["df"], pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("term").sum("df").to_pandas())
    if merged.empty:
        return {"df": pd.Series(dtype=np.int64), "n_docs": 0,
                "avgdl": 0.0, "n_terms_total": 0}
    s = pd.Series(merged["sum(df)"].to_numpy(),
                  index=merged["term"].to_numpy())
    n_docs = int(s.pop("\t_docs"))
    total_len = int(s.pop("\t_len"))
    n_total = len(s)
    s = s.sort_values(ascending=False, kind="stable").head(max_terms)
    return {"df": s, "n_docs": n_docs,
            "avgdl": total_len / max(n_docs, 1),
            "n_terms_total": n_total}


def bm25_score_doc(tokens: list[str], q_terms: dict, idf: dict,
                   avgdl: float, k1: float, b: float) -> float:
    """Reference scalar scorer (shared by the vectorized path's test)."""
    tf = Counter(tokens)
    dl = len(tokens)
    score = 0.0
    for term in q_terms:
        f = tf.get(term, 0)
        if not f:
            continue
        w = idf.get(term)
        if w is None:
            continue
        score += w * f * (k1 + 1) / (f + k1 * (1 - b + b * dl
                                               / max(avgdl, 1e-9)))
    return score


def bm25_topk(ds, queries: dict, stats: dict, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Top-k documents per query by BM25. ``queries``: {query_id:
    query string}. Broadcast scan + per-batch partial top-k + tiny
    driver merge. Returns (query_id, rank, doc_id, score)."""
    import ray

    dfs = stats["df"]
    n_docs, avgdl = stats["n_docs"], max(stats["avgdl"], 1e-9)
    # Robertson-Sparck-Jones idf with the +1 floor (Lucene form):
    # ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive
    idf_all = np.log1p((n_docs - dfs.to_numpy() + 0.5)
                       / (dfs.to_numpy() + 0.5))
    idf = dict(zip(dfs.index, idf_all))
    qt = {qid: [t for t in dict.fromkeys(_pretokenize(q)) if t in idf]
          for qid, q in queries.items()}
    qref = ray.put((qt, {t: idf[t] for ts in qt.values() for t in ts}))

    def score_batch(t: pa.Table) -> pd.DataFrame:
        qt_, idf_ = ray.get(qref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out = []
        toks = [_pretokenize(s or "") for s in t[text_col].to_pylist()]
        tfs = [Counter(tk) for tk in toks]
        dls = np.array([len(tk) for tk in toks], np.float64)
        denom_dl = k1 * (1 - b + b * dls / avgdl)
        for qid, terms in qt_.items():
            scores = np.zeros(len(ids))
            for term in terms:
                f = np.array([tf.get(term, 0) for tf in tfs], np.float64)
                np.add(scores, np.where(
                    f > 0, idf_[term] * f * (k1 + 1) / (f + denom_dl),
                    0.0), out=scores)
            nz = scores > 0
            if not nz.any():
                continue
            kk = min(k, int(nz.sum()))
            cand = np.flatnonzero(nz)
            top = cand[np.argpartition(-scores[cand], kk - 1)[:kk]]
            out.append(pd.DataFrame({"query_id": qid, "doc_id": ids[top],
                                     "score": scores[top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series(dtype=object),
                                 "doc_id": pd.Series(dtype=np.int64),
                                 "score": pd.Series(dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    pdf = ds.map_batches(score_batch, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if pdf.empty:
        return pd.DataFrame({"query_id": [], "rank": [], "doc_id": [],
                             "score": []})
    pdf = pdf.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True], kind="stable")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[["query_id", "rank", "doc_id", "score"]]
