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
