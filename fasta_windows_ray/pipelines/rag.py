"""RAG ingest/retrieve composition — the end-to-end path a retrieval
corpus takes through this engine, built entirely from existing stages:

    documents ──chunk_documents──▶ overlapping chunks
              ──hash_embed───────▶ (vec_id, embedding, payload cols)
              ──ivf_build────────▶ persisted IVF index (partitioned by
                                   list id, exactly-once, resumable)
    query text ──hash_embed──▶ ivf_query (pruned read of nprobe lists)
               ──payload fetch (column-pruned read of the SAME probed
                 partitions)──▶ (query_id, rank, doc_id, chunk_id,
                                 chunk, cos_sim)

The embedder is deterministic char-3-gram FEATURE HASHING (the hashing
trick, Weinberger et al. 2009): each 3-gram's 64-bit rolling hash picks
a signed slot, per-doc accumulation is one ``np.add.at`` over the
concatenated gram stream (no per-row loop), then L2 normalization.
It is a stand-in with real retrieval behavior (shared phrases ⇒ high
cosine) — swapping in a model encoder is the same actor-pool
``map_batches`` shape with ``__init__``-loaded weights.

Scale notes: chunking and embedding are shuffle-free per-batch maps;
the only exchange is inside ``ivf_build``'s partitioned write; query
I/O is bounded by nprobe/n_lists twice (scores, then payloads) and the
payload fetch prunes to exactly the 4 payload columns. ``vec_id`` is
the cross-run-stable digest of ``"{doc_id}#{chunk_id}"``
(``ingest_dedup.stable_digest64``), so an index rebuilt from the same
corpus resolves to identical ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.chunking import chunk_documents
from ..stages.ingest_dedup import stable_digest64
from ..stages.substring import _rolling_gram_hashes


def hash_embed(texts, dim: int = 64) -> np.ndarray:
    """Char-3-gram feature-hashed embeddings, one vectorized pass.

    Slot = hash % dim, sign = bit 33 of the hash (independent of the
    slot bits). Texts shorter than 3 codepoints embed as a length-only
    fallback slot so nothing is the zero vector."""
    n = len(texts)
    out = np.zeros((n, dim), np.float64)
    h, nwin = _rolling_gram_hashes(texts, 3)
    doc_of = np.repeat(np.arange(n), nwin)
    slot = (h % np.uint64(dim)).astype(np.int64)
    sign = np.where((h >> np.uint64(33)) & np.uint64(1), 1.0, -1.0)
    np.add.at(out, (doc_of, slot), sign)
    short = nwin == 0
    if short.any():
        out[short, 0] = 1.0
    norm = np.linalg.norm(out, axis=1)
    return out / np.maximum(norm, 1e-12)[:, None]


def embed_chunks(chunks_ds, dim: int = 64):
    """chunks → (vec_id, embedding) + payload columns, shuffle-free."""
    def fn(t: pa.Table) -> pa.Table:
        chunks = t["chunk"].to_pylist()
        E = hash_embed(chunks, dim)
        keys = [f"{d}#{c}" for d, c in zip(t["doc_id"].to_pylist(),
                                           t["chunk_id"].to_pylist())]
        vid = stable_digest64(keys)
        t = t.append_column("vec_id", pa.array(vid, pa.int64()))
        return t.append_column(
            "embedding", pa.array(list(E), pa.list_(pa.float64())))

    return chunks_ds.map_batches(fn, batch_format="pyarrow")


def rag_build(docs_ds, index_dir: str, size: int = 64, stride: int = 48,
              dim: int = 64, n_centroids: int = 8, seed: int = 3,
              quantize: bool = False) -> np.ndarray:
    """Chunk → embed → persisted IVF index. Returns the centroids.
    Resumable: an already-committed index (``.index_done``) is reused
    as-is (same contract as ``ivf_build``)."""
    from ..stages.similarity import ivf_build
    chunks = chunk_documents(docs_ds, size=size, stride=stride)
    vecs = embed_chunks(chunks, dim=dim)
    return ivf_build(vecs, index_dir, n_centroids=n_centroids, seed=seed,
                     quantize=quantize)


def rag_query(index_dir: str, query_texts: list[str], k: int = 5,
              nprobe: int = 4, dim: int = 64) -> pd.DataFrame:
    """Retrieve top-k chunks per query text with payloads attached.

    Two pruned reads of the probed partitions: ``ivf_query`` scores
    (embedding columns only, int8 if the index is quantized), then the
    payload fetch re-reads with ``columns=[vec_id, doc_id, chunk_id,
    chunk]`` filtered to the hit ids — I/O stays ∝ nprobe/n_lists."""
    import os

    import pyarrow.parquet as pq

    from ..stages.similarity import ivf_query

    Q = hash_embed(list(query_texts), dim)
    hits = ivf_query(index_dir, Q, list(range(len(query_texts))),
                     k=k, nprobe=nprobe)
    if not len(hits):
        return pd.DataFrame({c: [] for c in
                             ("query_id", "rank", "doc_id", "chunk_id",
                              "chunk", "cos_sim")})
    want = set(hits["vec_id"].tolist())
    # payload fetch: the hit set is tiny (q*k rows) — a driver-side
    # column-pruned read of ONLY the probed partitions (recomputed from
    # the persisted centroids, same routing as ivf_query); at fleet
    # scale this becomes a bucketed-catalog point lookup keyed by vec_id
    from ..stages.similarity import ivf_list_files
    C = np.load(os.path.join(index_dir, "centroids.npy"))
    probed = np.unique(np.argsort(-(Q @ C.T), axis=1)[:, :nprobe])
    paths = ivf_list_files(index_dir, probed.tolist())
    frames = []
    for p in paths:
        # id filter pushed into the read: row-group stats prune before
        # any column bytes move
        t = pq.read_table(p, columns=["vec_id", "doc_id", "chunk_id",
                                      "chunk"],
                          filters=[("vec_id", "in", sorted(want))])
        if len(t):
            frames.append(t.to_pandas())
    payload = pd.concat(frames, ignore_index=True)
    out = hits.merge(payload, on="vec_id", how="left")
    return (out[["query_id", "rank", "doc_id", "chunk_id", "chunk",
                 "cos_sim"]]
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def hybrid_query(index_dir: str, docs_ds, query_texts: list[str],
                 bm25_stats_: dict | None = None, k: int = 5,
                 nprobe: int = 4, dim: int = 64, rrf_k: int = 60,
                 candidate_factor: int = 3) -> pd.DataFrame:
    """Hybrid retrieval: dense IVF hits + BM25 lexical hits fused by
    Reciprocal Rank Fusion (Cormack et al., SIGIR 2009: score(d) =
    Σ_lists 1/(rrf_k + rank_d)) — the standard two-tower + lexical
    composition; RRF needs no score calibration between the cosine and
    BM25 scales.

    Each side over-fetches ``candidate_factor × k`` then the fused
    ranking keeps k. Dense side reads nprobe/n_lists of the index;
    lexical side is the broadcast scan over ``docs_ds`` (pass
    ``bm25_stats_`` to reuse precomputed corpus stats). Returns
    (query_id, rank, doc_id, rrf_score, dense_rank, bm25_rank)."""
    from ..stages.bm25 import bm25_stats, bm25_topk

    kk = k * candidate_factor
    dense = rag_query(index_dir, query_texts, k=kk, nprobe=nprobe,
                      dim=dim)
    if bm25_stats_ is None:
        bm25_stats_ = bm25_stats(docs_ds)
    lex = bm25_topk(docs_ds, dict(enumerate(query_texts)), bm25_stats_,
                    k=kk)
    # fuse at DOCUMENT granularity: a doc's dense rank is its best
    # chunk's rank
    if len(dense):
        dense = (dense.sort_values(["query_id", "rank"])
                      .drop_duplicates(["query_id", "doc_id"]))
        dense["dense_rank"] = dense.groupby("query_id").cumcount() + 1
        dense = dense[["query_id", "doc_id", "dense_rank"]]
    else:
        dense = pd.DataFrame({"query_id": [], "doc_id": [],
                              "dense_rank": []})
    lex = lex.rename(columns={"rank": "bm25_rank"})[
        ["query_id", "doc_id", "bm25_rank"]]
    fused = dense.merge(lex, on=["query_id", "doc_id"], how="outer")
    rrf = (1.0 / (rrf_k + fused["dense_rank"])).fillna(0.0) \
        + (1.0 / (rrf_k + fused["bm25_rank"])).fillna(0.0)
    fused["rrf_score"] = rrf
    fused = fused.sort_values(["query_id", "rrf_score", "doc_id"],
                              ascending=[True, False, True], kind="stable")
    fused = fused.groupby("query_id", sort=True).head(k) \
        .reset_index(drop=True)
    fused["rank"] = fused.groupby("query_id").cumcount() + 1
    return fused[["query_id", "rank", "doc_id", "rrf_score",
                  "dense_rank", "bm25_rank"]]
