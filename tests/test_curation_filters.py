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


def test_normalize_text_matches_duckdb(ray_session):
    """normalize_text (round 4) == the composed DuckDB twin: NFC,
    control strip, whitespace collapse, newline squeeze, outer trim."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from fasta_windows_ray.stages.curation_filters import normalize_text

    texts = ["  héllo\t\tWORLD \x01ok ", "éclair",   # NFC compose
             "a\n\n\n\nb", "x  \n  y", "\x00zap\x7f", "", "  ",
             "tab\there\nline  end  ", "UPPER Case"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (normalize_text(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(r"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(nfc_normalize(text),
            '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
            '[ \t]+', ' ', 'g'),
            ' ?\n ?', e'\n', 'g'),
            '\n{3,}', e'\n\n', 'g'),
            '^[\s]+|[\s]+$', '', 'g') AS text
        FROM t ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, want)
    assert got.loc[1, "text"] == "éclair"          # composed, 6 chars
    assert len(got.loc[1, "text"]) == 6

    low = normalize_text(ds, lowercase=True).to_pandas()
    assert low.sort_values("doc_id")["text"].iloc[-1] == "upper case"


def test_compression_ratio_signal(ray_session):
    import zlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fasta_windows_ray.stages.curation_filters import compression_ratio
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["spam " * 400,                          # boilerplate
                 " ".join(f"sentence {i} about topic {i * 13 % 57} with "
                          f"detail {i * 31 % 101}." for i in range(60)),
                 "".join(chr(33 + c) for c in
                         np.random.RandomState(0).randint(0, 90, 2000)),
                 ""]})                                   # empty -> NaN
    out = (compression_ratio(rd.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # exact per-doc agreement with direct zlib at the same level
    for i in range(3):
        b = docs.loc[i, "text"].encode()
        assert out.loc[i, "raw_bytes"] == len(b)
        assert out.loc[i, "compression_ratio"] == \
            len(zlib.compress(b, 6)) / len(b)
    # signal ordering: boilerplate << prose << pseudo-random
    r = out["compression_ratio"]
    assert r[0] < 0.05 < r[1] < r[2]
    assert np.isnan(r[3]) and out.loc[3, "raw_bytes"] == 0
