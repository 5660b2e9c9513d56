"""Document chunking — split every document into fixed-token-count
chunks with overlap (the RAG / pretraining sequence-prep staple): a
one-to-many flat map, one output row per (doc, chunk ordinal).

Token contract = SQL ``string_split(text, ' ')``: tokens are the
single-space-separated fields (consecutive spaces yield empty tokens),
so a chunk of consecutive tokens re-joined with ' ' is an EXACT byte
substring of the original document. That identity is what makes the
whole operator a vectorized byte gather: per Arrow batch the text
column's raw UTF-8 buffer is scanned ONCE for space positions
(``np.flatnonzero(data == 32)`` — a space byte never occurs inside a
multi-byte UTF-8 sequence, so this is UTF-8-safe), chunk boundaries are
arithmetic over those positions, and every chunk's bytes are pulled
with a single fancy-index gather into a new Arrow ``large_string``
buffer. No per-row Python, no per-doc loop, no string re-joining.

Chunk layout: token starts 0, stride, 2·stride, …; each chunk covers
tokens [start, min(start+size, n)); the last start is the smallest one
whose chunk reaches the document end (``n_chunks = 1`` when
``n ≤ size`` else ``ceil((n−size)/stride)+1``) — full coverage, every
adjacent pair overlapping by ``size−stride`` tokens, no degenerate
tail-only chunks.

Scale: embarrassingly parallel (pure ``map_batches``, zero shuffles);
output rows ≈ input tokens × size/stride, so downstream block sizes
grow by that factor — Ray's streaming executor re-blocks, and the
operator never holds more than one batch's chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _chunk_batch(t: pa.Table, text_col: str, id_cols: list[str],
                 size: int, stride: int) -> pa.Table:
    arr = pc.fill_null(t[text_col].combine_chunks(), "")
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    s, e = offs[:-1], offs[1:]

    sp = np.flatnonzero(data == 0x20)                 # all space bytes
    lo = np.searchsorted(sp, s)                       # spaces before doc
    hi = np.searchsorted(sp, e)
    n_tok = (hi - lo) + 1                             # split(' ') fields

    n_chunks = np.where(
        n_tok <= size, 1,
        (n_tok - size + stride - 1) // stride + 1).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        cols = {c: t[c].combine_chunks().take(pa.array([], pa.int64()))
                for c in id_cols}
        cols["chunk_id"] = pa.array([], pa.int64())
        cols["chunk"] = pa.array([], pa.large_string())
        cols["n_tokens"] = pa.array([], pa.int64())
        return pa.table(cols)

    doc = np.repeat(np.arange(len(arr)), n_chunks)
    first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    ordinal = np.arange(total) - first[doc]

    start_tok = ordinal * stride
    end_tok = np.minimum(start_tok + size, n_tok[doc])
    # byte bounds: token k starts after the k-th space of its doc;
    # a chunk ending before the last token stops AT the separating space
    bstart = np.where(start_tok == 0, s[doc],
                      sp[np.minimum(lo[doc] + start_tok - 1,
                                    len(sp) - 1)] + 1)
    bend = np.where(end_tok == n_tok[doc], e[doc],
                    sp[np.minimum(lo[doc] + end_tok - 1, len(sp) - 1)])

    lens = bend - bstart
    out_off = np.empty(total + 1, np.int64)
    out_off[0] = 0
    np.cumsum(lens, out=out_off[1:])
    gather = np.arange(out_off[-1], dtype=np.int64) + np.repeat(
        bstart - out_off[:-1], lens)
    out_data = data[gather]

    chunk = pa.Array.from_buffers(
        pa.large_string(), total,
        [None, pa.py_buffer(out_off.tobytes()),
         pa.py_buffer(out_data.tobytes())])
    take = pa.array(doc, pa.int64())
    cols = {c: t[c].combine_chunks().take(take) for c in id_cols}
    cols["chunk_id"] = pa.array(ordinal, pa.int64())
    cols["chunk"] = chunk
    cols["n_tokens"] = pa.array(end_tok - start_tok, pa.int64())
    return pa.table(cols)


def chunk_documents(ds, text_col: str = "text",
                    id_cols: list[str] | None = None,
                    size: int = 256, stride: int = 192):
    """One row per chunk: id_cols (carried through) + ``chunk_id``
    (0-based per doc) + ``chunk`` (exact substring) + ``n_tokens``.

    ``stride ≤ size`` gives overlapping chunks (overlap = size−stride);
    ``stride == size`` tiles the document. Raises on stride ≤ 0 or
    size ≤ 0."""
    if size <= 0 or stride <= 0:
        raise ValueError(f"size/stride must be positive, got "
                         f"size={size} stride={stride}")
    id_cols = id_cols if id_cols is not None else ["doc_id"]

    def fn(t: pa.Table) -> pa.Table:
        return _chunk_batch(t, text_col, id_cols, size, stride)

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
