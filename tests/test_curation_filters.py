"""Repetition stats + decontamination: planted-case correctness."""

import numpy as np
import pandas as pd


def test_repetition_stats_planted(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.curation_filters import repetition_stats

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d",              # all distinct; 3 bigrams, top 1/3
            "x x x x",              # 1 distinct of 4; top bigram 3/3
            "one two one two one",  # repeats; "one two" 2 of 4 bigrams
            "solo",                 # single word: no bigrams
        ],
    })
    out = repetition_stats(rd.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_allclose(out["dup_word_frac"],
                               [0.0, 0.75, 0.6, 0.0])
    np.testing.assert_allclose(out["top_bigram_frac"],
                               [1 / 3, 1.0, 0.5, 0.0])


def test_decontaminate_planted(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.curation_filters import decontaminate

    eval_ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # shares the 5-gram "quick brown fox jumps over"
            "a quick brown fox jumps over b",
            # shares only a 4-gram ("brown fox jumps over" broken by zz)
            "quick brown fox jumps zz over the lazy dog nope",
            "completely unrelated text with many words here",
        ],
    }))
    out = decontaminate(corpus, eval_ds, n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, False, False]
