"""BM25 gates: distributed scores equal the scalar reference on every
doc, relevance ordering on a planted corpus, stats partition invariance,
term-cap reporting, empty/missing-term handling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.bm25 import (bm25_score_doc, bm25_stats,
                                           bm25_topk)
from fasta_windows_ray.stages.bpe import _pretokenize

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = [
    "the cat sat on the mat",
    "a dog chased the cat around the yard",
    "dogs and cats living together",
    "quantum computing uses qubits for parallel computation",
    "the quantum cat of schrodinger is both alive and dead",
    "weather today is sunny with a chance of rain",
    "rain rain go away come again another day",
    "cat cat cat cat cat",
]


def ds_of(texts, blocks=3):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(blocks)


def test_stats_exact_and_partition_invariant():
    a = bm25_stats(ds_of(DOCS, 1))
    b = bm25_stats(ds_of(DOCS, 7))
    assert a["n_docs"] == b["n_docs"] == len(DOCS)
    lens = [len(_pretokenize(d)) for d in DOCS]
    assert a["avgdl"] == pytest.approx(sum(lens) / len(DOCS))
    pd.testing.assert_series_equal(a["df"].sort_index(),
                                   b["df"].sort_index())
    assert a["df"]["cat"] == 4        # docs 0, 1, 4, 7
    assert a["df"]["rain"] == 2


def test_scores_match_scalar_reference():
    stats = bm25_stats(ds_of(DOCS))
    queries = {"q1": "quantum cat", "q2": "rain today"}
    out = bm25_topk(ds_of(DOCS), queries, stats, k=len(DOCS))
    dfs = stats["df"]
    idf = dict(zip(dfs.index,
                   np.log1p((stats["n_docs"] - dfs.to_numpy() + 0.5)
                            / (dfs.to_numpy() + 0.5))))
    for qid, q in queries.items():
        terms = {t: 1 for t in _pretokenize(q)}
        for _, r in out[out["query_id"] == qid].iterrows():
            want = bm25_score_doc(_pretokenize(DOCS[int(r["doc_id"])]),
                                  terms, idf, stats["avgdl"], 1.2, 0.75)
            assert r["score"] == pytest.approx(want, rel=1e-12)


def test_relevance_ordering():
    stats = bm25_stats(ds_of(DOCS))
    out = bm25_topk(ds_of(DOCS), {"q": "quantum computing"}, stats, k=3)
    assert int(out.iloc[0]["doc_id"]) == 3          # both terms, on-topic
    out2 = bm25_topk(ds_of(DOCS), {"q": "schrodinger"}, stats, k=3)
    assert list(out2["doc_id"]) == [4]
    # term saturation: doc 7 spams "cat" but k1 caps its advantage so a
    # short doc with the term still ranks nearby; both score > 0
    out3 = bm25_topk(ds_of(DOCS), {"q": "cat"}, stats, k=8)
    assert set(out3["doc_id"]) == {0, 1, 4, 7}


def test_missing_terms_and_empty_query():
    stats = bm25_stats(ds_of(DOCS))
    out = bm25_topk(ds_of(DOCS), {"q": "zzz unseen words"}, stats, k=5)
    assert len(out) == 0
    out2 = bm25_topk(ds_of(DOCS), {"q": ""}, stats, k=5)
    assert len(out2) == 0


def test_term_cap_reported():
    stats = bm25_stats(ds_of(DOCS), max_terms=5)
    assert len(stats["df"]) == 5
    assert stats["n_terms_total"] > 5
