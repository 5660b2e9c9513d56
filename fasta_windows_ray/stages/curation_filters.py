"""Corpus-curation filters a large-scale training-data pipeline needs
beyond dedup/quality: repetition statistics (the strongest single signal
for machine-generated / boilerplate text, cf. the Gopher rules from Rae
et al. 2021, "Scaling Language Models" App. A) and eval-set
DECONTAMINATION (flagging training docs that share long n-grams with a
held-out evaluation set, cf. GPT-3 App. C / PaLM App. D).

Ray-Data shapes:
- repetition_stats: pure per-batch map (segment-vectorized factorize +
  bincount over the batch's concatenated token stream) — no shuffle.
- decontaminate: the eval side of the comparison is SMALL by nature
  (benchmarks are thousands of docs, the corpus is billions), so its
  n-gram set is built once, broadcast via ``ray.put``, and each batch
  probes it locally — a broadcast semi-join, never a shuffle of the
  corpus (the 100-TB shape; same pattern as stages/joins.py semi_join).

Word = ``text.split(' ')`` EXACTLY (single-space split, no collapsing),
so the DuckDB oracle's ``string_split(text, ' ')`` reproduces
tokenization bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _token_segments(texts) -> tuple[np.ndarray, np.ndarray]:
    """Factorized token codes for the batch's concatenated token stream,
    plus per-doc offsets: (codes, offs); doc i's tokens are
    codes[offs[i]:offs[i+1]]."""
    toks = [t.split(" ") for t in texts]
    lens = np.fromiter((len(d) for d in toks), np.int64, len(toks))
    offs = np.zeros(len(toks) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = [w for d in toks for w in d]
    codes, _ = pd.factorize(np.asarray(flat, dtype=object))
    return codes.astype(np.int64), offs


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc repetition signals:

    - ``dup_word_frac``  = 1 - distinct_words / total_words
    - ``top_bigram_frac`` = occurrences of the most frequent word bigram
      / total bigrams (0.0 for docs with < 2 words)

    Both are functions of one document only, so the stage is a shuffle-
    free map_batches; the per-batch kernel is segment-vectorized (one
    factorize + np.unique over the batch, no per-doc Python loops).
    """

    def stats(t: pa.Table) -> pd.DataFrame:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        nd = len(texts)
        codes, offs = _token_segments(texts)
        ntok = offs[1:] - offs[:-1]
        doc_of = np.repeat(np.arange(nd), ntok)
        V = int(codes.max()) + 1 if len(codes) else 1

        # distinct words per doc: unique (doc, code) pairs
        uniq_pairs = np.unique(doc_of * V + codes)
        distinct = np.bincount(uniq_pairs // V, minlength=nd)

        # top word-bigram count per doc
        top = np.zeros(nd, dtype=np.int64)
        nbig = np.maximum(ntok - 1, 0)
        if nbig.sum() > 0:
            left_ok = np.ones(len(codes), dtype=bool)
            left_ok[offs[1:][:-1] - 1] = False   # last token of each doc
            left_ok[offs[-1] - 1] = False
            li = np.flatnonzero(left_ok)
            big = codes[li] * V + codes[li + 1]
            dob = doc_of[li]
            pair, cnt = np.unique(dob * (V * V) + big, return_counts=True)
            np.maximum.at(top, pair // (V * V), cnt)

        with np.errstate(divide="ignore", invalid="ignore"):
            dup = np.where(ntok > 0, 1.0 - distinct / ntok, 0.0)
            topf = np.where(nbig > 0, top / np.maximum(nbig, 1), 0.0)
        return pd.DataFrame({id_col: ids,
                             "dup_word_frac": dup,
                             "top_bigram_frac": topf})

    return ds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def compression_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                      level: int = 6):
    """Per-doc DEFLATE compression ratio ``compressed_bytes /
    raw_bytes`` — the classic redundancy quality signal (low = highly
    repetitive boilerplate/template spam, ~1 = high-entropy noise or
    base64-in-text; natural prose sits in between), used alongside the
    Gopher repetition stats.

    Function of one document only → shuffle-free ``map_batches``.  The
    per-doc ``zlib.compress`` is a C kernel whose cost is DEFLATE
    itself, not interpreter overhead (no vectorized alternative
    exists); empty/null docs get NaN.  Emits ``(id, raw_bytes,
    compression_ratio)``.
    """
    import zlib

    def ratios(t: pa.Table) -> pd.DataFrame:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        raw = np.zeros(n, np.int64)
        comp = np.zeros(n, np.int64)
        for i, s in enumerate(texts):
            if s:
                b = s.encode("utf-8")
                raw[i] = len(b)
                comp[i] = len(zlib.compress(b, level))
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(raw > 0, comp / np.maximum(raw, 1), np.nan)
        return pd.DataFrame({id_col: ids, "raw_bytes": raw,
                             "compression_ratio": ratio})

    return ds.map_batches(ratios, batch_format="pyarrow",
                          zero_copy_batch=True)


def _word_ngrams(text: str, n: int) -> set:
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """63-bit hashes of each doc's word n-grams (with duplicates), plus
    per-doc offsets — vectorized via the same polars content hash the
    exact-dedup stage uses (deterministic within a run)."""
    from .dedup import _text_hash_int64
    grams, counts = [], []
    for t in texts:
        w = t.split(" ")
        g = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        grams.extend(g)
        counts.append(len(g))
    offs = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(np.asarray(counts, np.int64), out=offs[1:])
    h = (_text_hash_int64(grams) if grams
         else np.zeros(0, np.int64))
    return h, offs


def decontaminate(ds, eval_ds, n: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  append_to_docs: bool = False):
    """Flag corpus docs sharing ANY word ``n``-gram with the eval set.

    ``eval_ds`` is the held-out benchmark (small side): its n-grams are
    HASHED to a sorted int64 array, broadcast once with ``ray.put``
    (numpy buffers are plasma-backed, so worker reads are zero-copy —
    a Python set would be re-unpickled per task), and each corpus batch
    probes it with one vectorized ``np.isin``. Output:
    (id_col, contaminated: bool) per corpus doc. 63-bit hashes make a
    false collision over even a billion-gram eval set negligible
    (~1e-10 per probe).

    The broadcast side is bounded by the EVAL corpus size (benchmarks,
    not training data) — the canonical broadcast-semi-join regime.
    """
    eval_pdf = eval_ds.to_pandas()          # small by contract
    eh, _ = _gram_hashes(list(eval_pdf[text_col]), n)
    gref = ray.put(np.unique(eh))

    def probe(t: pa.Table) -> pd.DataFrame:
        g = ray.get(gref)                   # zero-copy local-store read
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h, offs = _gram_hashes(texts, n)
        hit = np.zeros(len(texts), bool)
        # reduceat over non-empty docs only (a doc with < n words has a
        # zero-width segment; a trailing one would index past the array)
        nz = np.flatnonzero(offs[1:] > offs[:-1])
        if len(h) and len(nz):
            hit[nz] = np.logical_or.reduceat(np.isin(h, g), offs[:-1][nz])
        if append_to_docs:       # join-back-free composition: the flag
            return t.append_column("contaminated",   # rides the payload
                                   pa.array(hit))
        return pd.DataFrame({id_col: ids, "contaminated": hit})

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


_CTRL_RE = r"[\x00-\x08\x0B-\x1F\x7F]"


def normalize_text(ds, text_col: str = "text", lowercase: bool = False):
    """Canonical text cleanup before dedup/tokenization — the step that
    makes byte-level fingerprints (``ingest_dedup``) agree across
    sources that encode the same content differently:

    1. Unicode NFC (composed forms; ``é`` == ``e``+combining-accent),
    2. control chars stripped (keeping ``\\n`` and ``\\t``),
    3. horizontal whitespace runs collapsed to one space, spaces
       trimmed around newlines, 3+ newlines collapsed to 2,
    4. outer whitespace trimmed; optional ASCII+Unicode lowercase.

    Arrow RE2 kernels throughout, shuffle-free; every rule has an
    exact DuckDB twin (pytest-oracled). NFC caveat: pyarrow 16.1's
    ``utf8_normalize`` emits DECOMPOSED text for every form (verified:
    NFC/NFD/NFKC all return e+combining-accent), so composition uses
    ``unicodedata`` on the non-ASCII rows only — the
    ``string_is_ascii`` mask keeps typical web-scale batches (mostly
    ASCII) fully vectorized.
    """
    import unicodedata

    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ascii_mask = pc.fill_null(pc.string_is_ascii(col), True)
        if pc.all(ascii_mask).as_py():
            s = col
        else:
            vals = col.to_pylist()
            keep = ascii_mask.to_numpy(zero_copy_only=False)
            s = pa.array(
                [v if v is None or k else unicodedata.normalize("NFC", v)
                 for v, k in zip(vals, keep)], pa.string())
        s = pc.replace_substring_regex(s, _CTRL_RE, "")
        s = pc.replace_substring_regex(s, r"[ \t]+", " ")
        s = pc.replace_substring_regex(s, r" ?\n ?", "\n")
        s = pc.replace_substring_regex(s, r"\n{3,}", "\n\n")
        s = pc.replace_substring_regex(s, r"^[\s]+|[\s]+$", "")
        if lowercase:
            s = pc.utf8_lower(s)
        return t.set_column(t.column_names.index(text_col),
                            text_col, s)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
