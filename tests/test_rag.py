"""RAG composition pipeline (pipelines/rag.py, round 4): planted-passage
retrieval, IVF recall vs brute force over the same embeddings, rebuild
determinism, pruned payload I/O."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.pipelines.rag import (embed_chunks, hash_embed,
                                             rag_build, rag_query)
from fasta_windows_ray.stages.chunking import chunk_documents

pytestmark = pytest.mark.usefixtures("ray_session")

NEEDLE = ("the seventeenth camel crossed the frozen aqueduct carrying "
          "a lantern of blue glass")


def _corpus(n=80, seed=11):
    rng = np.random.default_rng(seed)
    words = [f"w{i:03d}" for i in range(200)]
    docs = []
    for d in range(n):
        body = " ".join(rng.choice(words, 180))
        if d == 37:
            toks = body.split()
            body = " ".join(toks[:60] + NEEDLE.split() + toks[60:])
        docs.append({"doc_id": f"doc{d:03d}", "text": body})
    return pd.DataFrame(docs)


def _ds(df):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_hash_embed_shapes_and_determinism():
    E = hash_embed(["hello world", "hello world", "different text", "ab", ""])
    assert E.shape == (5, 64)
    np.testing.assert_allclose(np.linalg.norm(E, axis=1), 1.0, rtol=1e-9)
    np.testing.assert_array_equal(E[0], E[1])
    assert not np.array_equal(E[0], E[2])
    # short/empty fallback: unit vector, no NaN
    assert np.isfinite(E).all()
    # batch-invariant
    np.testing.assert_array_equal(E[2], hash_embed(["different text"])[0])


def test_planted_passage_retrieved(ray_session, tmp_path):
    idx = str(tmp_path / "ivf")
    rag_build(_ds(_corpus()), idx, n_centroids=8)
    hits = rag_query(idx, [NEEDLE], k=3, nprobe=4)
    assert len(hits) == 3
    top = hits.iloc[0]
    assert top["doc_id"] == "doc037"
    # the retrieved chunk shares needle vocabulary
    assert "seventeenth" in top["chunk"] or "aqueduct" in top["chunk"]
    assert hits["cos_sim"].iloc[0] > hits["cos_sim"].iloc[-1] - 1e-12


def test_ivf_recall_vs_brute_force(ray_session, tmp_path):
    from fasta_windows_ray.stages.similarity import brute_force_topk
    df = _corpus(n=60, seed=5)
    idx = str(tmp_path / "ivf")
    rag_build(_ds(df), idx, n_centroids=8)
    queries = [NEEDLE, "w000 w001 w002 w003 w004 w005 w006 w007",
               df["text"].iloc[10][:200]]
    Q = hash_embed(queries)
    vecs = embed_chunks(chunk_documents(_ds(df), size=64, stride=48))
    exact = brute_force_topk(vecs, Q, list(range(len(queries))), k=5,
                             exclude_self=False)
    got = rag_query(idx, queries, k=5, nprobe=6)
    vp = vecs.to_pandas()
    emap = dict(zip(vp["vec_id"],
                    vp["doc_id"] + "#" + vp["chunk_id"].astype(str)))
    recalls = []
    for qi in range(len(queries)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        g = got[got["query_id"] == qi]
        gset = set((g["doc_id"] + "#" + g["chunk_id"].astype(str)))
        recalls.append(len({emap[v] for v in e} & gset) / 5)
    assert np.mean(recalls) >= 0.8, recalls


def test_rebuild_reuses_index_and_is_deterministic(ray_session, tmp_path):
    df = _corpus(n=30, seed=3)
    idx = str(tmp_path / "ivf")
    c1 = rag_build(_ds(df), idx, n_centroids=4)
    h1 = rag_query(idx, [NEEDLE], k=2, nprobe=2)
    c2 = rag_build(_ds(df), idx, n_centroids=4)   # .index_done → reuse
    h2 = rag_query(idx, [NEEDLE], k=2, nprobe=2)
    np.testing.assert_array_equal(c1, c2)
    pd.testing.assert_frame_equal(h1, h2)


def test_hybrid_query_rrf(ray_session, tmp_path):
    """Hybrid retrieval: a doc strong on EXACT terms (BM25) and a doc
    strong on shared phrasing (dense) both surface; RRF math checks out
    against the per-list ranks it reports."""
    import numpy as np

    import ray.data as rd

    from fasta_windows_ray.pipelines.rag import hybrid_query, rag_build

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "the solar panel array generates renewable electricity",
            "solar panels on the roof make power from sunlight",
            "cats and dogs are common household pets in the city",
            "the stock market closed higher on tuesday afternoon",
            "recipe for chocolate cake with dark cocoa and butter",
            "electricity generation from renewable solar energy arrays",
        ]})
    ds = rd.from_pandas(docs).repartition(2)
    idx = str(tmp_path / "hyb")
    rag_build(ds, idx, size=32, stride=24, n_centroids=2)
    out = hybrid_query(idx, ds, ["solar panel electricity"], k=4,
                       nprobe=2)
    assert len(out) > 0
    top_docs = set(out["doc_id"].astype(int))
    assert top_docs & {0, 1, 5}          # on-topic docs surface
    assert 4 not in set(out.head(2)["doc_id"].astype(int))
    # RRF score equals the reported component ranks
    for _, r in out.iterrows():
        want = 0.0
        if not pd.isna(r["dense_rank"]):
            want += 1 / (60 + r["dense_rank"])
        if not pd.isna(r["bm25_rank"]):
            want += 1 / (60 + r["bm25_rank"])
        assert r["rrf_score"] == pytest.approx(want)
    # ranks are dense 1..n per query
    assert list(out["rank"]) == list(range(1, len(out) + 1))
