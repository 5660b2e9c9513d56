"""Byte-Pair-Encoding tokenizer: distributed vocabulary training and
distributed tokenization — the "train a tokenizer on the corpus, then
token-count everything with it" step of an LLM data pipeline.

Ray-Data shape (the key scale observation, from the original subword-BPE
formulation — Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016: merges are learned over the WORD-FREQUENCY
table, not the raw corpus):

- ``word_counts``: per-batch ``Counter`` partials (distinct words only
  leave the task) → one bounded ``groupby(word).sum`` exchange. After the
  global sum each word exists once, so the top-``max_words`` table is
  recovered with per-block partial top-k + a tiny driver fold (the
  grouped_topk discipline) — the driver never holds more than
  ``max_words`` rows, at any corpus size.
- the merge LOOP is a pure function of that bounded table (vocab-sized,
  not corpus-sized) and runs locally: n_merges × O(vocab) with
  incremental pair-count maintenance. Deterministic: ties on pair count
  break lexicographically.
- ``bpe_tokenize``: shuffle-free ``map_batches`` apply; the merge ranks
  broadcast once via closure (tiny), and each worker memoizes
  word → token-tuple in a process-global cache (Zipf reuse makes the
  amortized cost per occurrence ~a dict hit).

Tokens use the end-of-word sentinel ``</w>`` on the final symbol, the
standard formulation. Approximation surface: training reads only the
top-``max_words`` words (logged in the result), exactly the subword-nmt
``min-frequency`` truncation; tokenization is exact for ANY word either
way (unseen words fall back to character symbols + learned merges).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

EOW = "</w>"


# -- shared tokenization primitives ----------------------------------------

def _pretokenize(text: str) -> list[str]:
    """Whitespace word split, lowercased — the pre-tokenizer. Kept
    deliberately simple and shared by train and apply (they MUST agree)."""
    return text.lower().split()


def word_symbols(word: str) -> tuple:
    """A word's initial symbol sequence: chars, last one EOW-marked."""
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def merge_word(sym: tuple, pair: tuple) -> tuple:
    """Replace every (left-to-right, non-overlapping) adjacency of
    ``pair`` in ``sym`` with the concatenated symbol."""
    a, b = pair
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def apply_merges(word: str, ranks: dict) -> tuple:
    """Tokenize one word: repeatedly merge the best-ranked adjacent pair
    (standard greedy BPE apply)."""
    sym = word_symbols(word)
    while len(sym) > 1:
        best, best_rank = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (sym[i], sym[i + 1]), r
        if best is None:
            break
        sym = merge_word(sym, best)
    return sym


# -- training ---------------------------------------------------------------

def word_counts(ds, text_col: str = "text", max_words: int = 65_536):
    """Distributed word-frequency table, capped at the ``max_words`` most
    frequent (ties by ascending word). Returns (pandas frame
    [word, n], total_distinct_before_cap)."""

    def partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for s in t[text_col].to_pylist():
            if s:
                c.update(_pretokenize(s))
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    summed = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).groupby("word").sum("n")

    # post-sum each word is unique -> per-block top-k contains the global
    # top-k; the driver folds only candidate rows (grouped_topk pattern)
    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        n_distinct = pd.DataFrame({"word": ["\x00_distinct"],
                                   "n": [-len(df)]})
        top = df.sort_values(["n", "word"], ascending=[False, True],
                             kind="stable").head(max_words)
        return pd.concat([top, n_distinct], ignore_index=True)

    cand = summed.map_batches(local_top, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame({"word": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)}), 0
    sentinel = cand["word"] == "\x00_distinct"
    n_distinct = int(-cand.loc[sentinel, "n"].sum())
    out = (cand[~sentinel]
           .sort_values(["n", "word"], ascending=[False, True],
                        kind="stable")
           .head(max_words).reset_index(drop=True))
    return out, n_distinct


def train_merges_local(words: pd.DataFrame, n_merges: int) -> list[tuple]:
    """The merge loop over a (word, n) table — pure, deterministic
    (count desc, pair lexicographic asc tie-break). Incremental: only
    words containing the merged pair are re-counted each round."""
    seqs = [word_symbols(w) for w in words["word"]]
    freq = words["n"].to_numpy()
    pair_counts: Counter = Counter()
    pair_words: dict[tuple, set] = {}
    for wi, sym in enumerate(seqs):
        f = int(freq[wi])
        for p in zip(sym, sym[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(wi)
    merges: list[tuple] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, lexicographic tie-break — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        for wi in list(pair_words.get(best, ())):
            sym, f = seqs[wi], int(freq[wi])
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            sym = seqs[wi] = merge_word(sym, best)
            for p in zip(sym, sym[1:]):
                pair_counts[p] += f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def bpe_train(ds, n_merges: int = 200, text_col: str = "text",
              max_words: int = 65_536) -> dict:
    """Distributed-count + local-merge-loop BPE training. Returns
    {"merges": [(a, b), ...], "n_words_used", "n_words_total"} —
    n_words_total > n_words_used means the word table was truncated
    (no silent caps)."""
    words, n_distinct = word_counts(ds, text_col, max_words)
    merges = train_merges_local(words, n_merges)
    return {"merges": merges, "n_words_used": len(words),
            "n_words_total": n_distinct}


# -- application ------------------------------------------------------------

_APPLY_MEMO: dict = {}      # (merges_key, word) -> token tuple, per worker


def bpe_tokenize(ds, merges: list[tuple], text_col: str = "text",
                 id_col: str = "doc_id", emit_tokens: bool = False):
    """Tokenize the corpus with a trained merge list: shuffle-free
    map_batches; per-worker memo keyed by (merge-list fingerprint, word).
    Emits (id, n_bpe_tokens[, tokens]) per row."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    mkey = hash(tuple(sorted(ranks.items(), key=lambda kv: kv[1])))

    def apply(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        counts = np.zeros(len(t), np.int64)
        toks_out = [] if emit_tokens else None
        for i, s in enumerate(t[text_col].to_pylist()):
            total, row_toks = 0, [] if emit_tokens else None
            for w in _pretokenize(s or ""):
                key = (mkey, w)
                toks = _APPLY_MEMO.get(key)
                if toks is None:
                    if len(_APPLY_MEMO) > 1_000_000:   # bound worker heap
                        _APPLY_MEMO.clear()
                    toks = _APPLY_MEMO[key] = apply_merges(w, ranks)
                total += len(toks)
                if emit_tokens:
                    row_toks.extend(toks)
            counts[i] = total
            if emit_tokens:
                toks_out.append(row_toks)
        cols = {id_col: ids, "n_bpe_tokens": pa.array(counts)}
        if emit_tokens:
            cols["tokens"] = pa.array(toks_out,
                                      pa.list_(pa.string()))
        return pa.table(cols)

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)
