"""Non-ASCII text alignment (round-1 ADVICE high): the vectorized bucket
path, the stateful engine, and a hand-computed char-based definition must
agree on multibyte input — char offsets, not UTF-8 byte offsets.

Definition under test (documented engine-wide):
- n_chars        = number of CHARACTERS (Python len / SQL length)
- case fold      = ASCII-only a-z -> A-Z (length-preserving)
- char_entropy   = Shannon entropy over folded codepoints
- k-gram div     = Shannon entropy over within-turn folded char k-grams
- bigram_rate    = count of the designated 2-char sequence / n_chars
"""

import math

import numpy as np
import pandas as pd

from fasta_windows_ray.stages.window_stats import BucketWindowStats
from fasta_windows_ray.state.engine import StreamEngine, WindowConfig, \
    emitted_to_frame

S = 1_000_000
EPOCH = 1_700_000_000 * S

# multibyte corpus: accented latin, CJK, emoji, plus ascii lowercase that
# must fold — chosen so byte-offsets and char-offsets diverge hard
TEXTS = ["héllo wörld", "日本語テキスト", "naïve café ño",
         "data 🚀 rocket", "ß sharp s", "plain ascii text"]


def _frame():
    n = len(TEXTS)
    return pd.DataFrame({
        "conv_id": ["c"] * n,
        "turn_uid": np.arange(n, dtype=np.int64),
        "role": ["user", "assistant", "system", "tool", "user", "assistant"],
        "text": TEXTS,
        "tool": [""] * n,
        "ts": pd.to_datetime(EPOCH + np.arange(n) * S, unit="us"),
    })


def _expected_char_entropy(texts):
    up = [t.translate(str.maketrans(
        "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
        for t in texts]
    counts = {}
    for t in up:
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
    n = sum(counts.values())
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def test_vectorized_unicode_char_semantics():
    df = _frame()
    out = BucketWindowStats(profile="full", ctw_depth=-1,
                            window_size_us=3600 * S, step_us=3600 * S)(df)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_chars"] == sum(len(t) for t in TEXTS)        # chars, not bytes
    exp = _expected_char_entropy(TEXTS)
    assert abs(row["char_entropy"] - exp) < 1e-12


def test_vectorized_matches_stateful_on_unicode():
    df = _frame()
    vec = BucketWindowStats(profile="full", ctw_depth=-1,
                            window_size_us=3600 * S, step_us=3600 * S)(df)
    cfg = WindowConfig(kind="tumbling", size_us=3600 * S, ctw_depth=-1)
    eng = StreamEngine(cfg)
    rows_eng = eng.process_rows(df)
    rows_eng += eng.flush()
    st = emitted_to_frame(rows_eng, "tumbling")
    assert len(vec) == len(st) == 1
    for col in ("n_chars", "char_entropy", "bigram_diversity",
                "trigram_diversity", "quadgram_diversity", "bigram_rate",
                "role_entropy"):
        a, b = float(vec.iloc[0][col]), float(st.iloc[0][col])
        assert a == b or abs(a - b) < 1e-12, (col, a, b)


def test_ascii_path_unchanged_by_unicode_branch():
    """Pure-ASCII input must still take the byte fast path and produce the
    same numbers as the (general) char-based definition."""
    df = _frame()
    df["text"] = ["hello world", "some ascii", "MORE text", "tool out",
                  "sharp s", "plain ascii text"]
    vec = BucketWindowStats(profile="full", ctw_depth=-1,
                            window_size_us=3600 * S, step_us=3600 * S)(df)
    exp = _expected_char_entropy(df["text"].tolist())
    assert abs(float(vec.iloc[0]["char_entropy"]) - exp) < 1e-12


def test_mixed_ascii_unicode_multiwindow():
    """Two conversations x two windows, one window ascii-only, others
    multibyte — the per-bucket branch decision is corpus-global, so the
    ascii window must still be correct under the utf-32 path."""
    rows = []
    for i, (conv, off, text) in enumerate([
            ("a", 0, "ascii only here"), ("a", 1, "héllo wörld"),
            ("b", 0, "日本語"), ("b", 1, "plain")]):
        rows.append({"conv_id": conv, "turn_uid": i, "role": "user",
                     "text": text, "tool": "",
                     "ts": pd.Timestamp(EPOCH + off * 7200 * S, unit="us")})
    df = pd.DataFrame(rows).sort_values("ts", kind="stable") \
        .reset_index(drop=True)  # engine ingests in event-time order
    vec = BucketWindowStats(profile="full", ctw_depth=-1,
                            window_size_us=3600 * S, step_us=3600 * S)(df)
    vec = vec.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    cfg = WindowConfig(kind="tumbling", size_us=3600 * S, ctw_depth=-1)
    eng = StreamEngine(cfg)
    rows_eng = eng.process_rows(df)
    rows_eng += eng.flush()
    st = emitted_to_frame(rows_eng, "tumbling") \
        .sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    for col in ("n_chars", "char_entropy", "bigram_diversity",
                "trigram_diversity", "quadgram_diversity"):
        np.testing.assert_allclose(vec[col].astype(float),
                                   st[col].astype(float), atol=1e-12)
    # spot-check: the CJK window has 3 chars (not 9 utf-8 bytes)
    b = vec[vec["conv_id"] == "b"].sort_values("window_start")
    assert int(b["n_chars"].iloc[0]) == 3
