"""BPE gates: distributed training equals a naive single-process
reference on the same corpus, partition invariance of the word table,
tokenization reconstructs the text, unseen-word fallback, determinism."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from fasta_windows_ray.stages.bpe import (
    EOW, apply_merges, bpe_tokenize, bpe_train, merge_word,
    train_merges_local, word_counts, word_symbols)


def naive_train(word_freq: dict, n_merges: int) -> list:
    """Obvious O(n_merges x corpus) reference: recount every pair from
    scratch each round."""
    seqs = {w: word_symbols(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in word_freq.items():
            sym = seqs[w]
            for p in zip(sym, sym[1:]):
                pc[p] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in seqs:
            seqs[w] = merge_word(seqs[w], best)
    return merges


CORPUS = ["low low low low low",
          "lower lower widest widest widest",
          "newest newest newest newest newest newest",
          "the lowest and the newest of the low"]


def corpus_ds(texts=None, blocks=4):
    import ray.data as rd
    texts = CORPUS if texts is None else texts
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(blocks)


def local_word_freq(texts):
    c = Counter()
    for t in texts:
        c.update(t.lower().split())
    return dict(c)


def test_incremental_merge_loop_equals_naive():
    wf = local_word_freq(CORPUS)
    words = pd.DataFrame(sorted(wf.items()), columns=["word", "n"])
    fast = train_merges_local(words, 25)
    slow = naive_train(wf, 25)
    assert fast == slow


def test_distributed_train_equals_local(ray_session):
    model = bpe_train(corpus_ds(), n_merges=20)
    assert model["merges"] == naive_train(local_word_freq(CORPUS), 20)
    assert model["n_words_total"] == len(local_word_freq(CORPUS))
    assert model["n_words_used"] == model["n_words_total"]


def test_word_counts_partition_invariant(ray_session):
    a, na = word_counts(corpus_ds(blocks=1))
    b, nb = word_counts(corpus_ds(blocks=7))
    pd.testing.assert_frame_equal(a, b)
    assert na == nb


def test_word_table_cap_is_reported(ray_session):
    words, n_total = word_counts(corpus_ds(), max_words=3)
    assert len(words) == 3 and n_total > 3
    # capped table keeps the most frequent words
    wf = local_word_freq(CORPUS)
    expect = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(map(tuple, words.itertuples(index=False))) == expect


def test_tokenize_counts_and_reconstruction(ray_session):
    model = bpe_train(corpus_ds(), n_merges=30)
    out = bpe_tokenize(corpus_ds(), model["merges"], emit_tokens=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    for _, row in out.iterrows():
        text = CORPUS[int(row["doc_id"])]
        toks = list(row["tokens"])
        assert row["n_bpe_tokens"] == len(toks)
        # joining tokens and stripping EOW reconstructs the lowered text
        joined = "".join(toks).replace(EOW, " ").strip()
        assert joined == " ".join(text.lower().split())
        # per-word segmentation agrees with the scalar apply
        i = 0
        for w in text.lower().split():
            seg = apply_merges(w, ranks)
            assert tuple(toks[i:i + len(seg)]) == seg
            i += len(seg)


def test_unseen_word_falls_back_to_chars():
    ranks = {("l", "o"): 0, ("lo", "w" + EOW): 1}
    assert apply_merges("low", ranks) == ("low" + EOW,)
    # word sharing no merges -> raw symbols
    assert apply_merges("xyz", ranks) == ("x", "y", "z" + EOW)
    assert apply_merges("", ranks) == ()


def test_training_deterministic(ray_session):
    m1 = bpe_train(corpus_ds(blocks=2), n_merges=15)["merges"]
    m2 = bpe_train(corpus_ds(blocks=5), n_merges=15)["merges"]
    assert m1 == m2


def test_merge_word_nonoverlapping():
    assert merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert merge_word(("a", "b", "a", "b"), ("a", "b")) == ("ab", "ab")
    assert merge_word((), ("a", "b")) == ()
