"""Substring-level dedup: exact duplicated L-grams vs a brute-force
reference, the winnowing guarantee on planted spans, and span stripping."""

import numpy as np
import pandas as pd
import pytest

from fasta_windows_ray.stages.substring import (
    _rolling_gram_hashes, duplicate_grams, strip_duplicate_spans,
    winnow_fingerprints, winnow_positions, winnowed_duplicate_candidates)


def brute_duplicate_grams(df, L, min_docs=2):
    seen = {}
    for _, row in df.iterrows():
        t = row["text"]
        for i in range(len(t) - L + 1):
            seen.setdefault(t[i:i + L], set()).add(row["doc_id"])
    return {g: len(d) for g, d in seen.items() if len(d) >= min_docs}


def make_docs(seed=11, n=40, planted="THE-QUICK-BROWN-BOILERPLATE-"
                                      "FOOTER-REPEATED-ACROSS-DOCS!"):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)
    texts, ids = [], []
    for i in range(n):
        body = alpha[rng.integers(0, len(alpha), rng.integers(60, 300))]
        t = body.tobytes().decode()
        if i % 4 == 0:  # plant shared boilerplate inside distinct docs
            cut = rng.integers(0, len(t))
            t = t[:cut] + planted + t[cut:]
        texts.append(t)
        ids.append(i)
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_rolling_hashes_match_per_doc():
    docs = make_docs()["text"].tolist()
    L = 12
    h_all, nwin = _rolling_gram_hashes(docs, L)
    cum = np.concatenate([[0], np.cumsum(nwin)])
    for i in (0, 3, 7):
        solo, _ = _rolling_gram_hashes([docs[i]], L)
        np.testing.assert_array_equal(h_all[cum[i]:cum[i + 1]], solo)
    # equal grams hash equal, across docs
    a, _ = _rolling_gram_hashes(["xyzHELLOWORLDxy"], 10)
    b, _ = _rolling_gram_hashes(["qqHELLOWORLDzzz"], 10)
    assert a[3] == b[2]


def test_duplicate_grams_exact(ray_session):
    import ray.data as rd
    df = make_docs()
    L = 20
    want = brute_duplicate_grams(df, L)
    got = duplicate_grams(rd.from_pandas(df), L=L).to_pandas()
    got_map = dict(zip(got["gram"], got["n_docs"]))
    assert got_map == want
    assert len(want) > 0  # the plant actually produced duplicates


def test_duplicate_grams_short_and_empty_docs(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["", "tiny", "0123456789abcdef",
                                "0123456789abcdef"]})
    got = duplicate_grams(rd.from_pandas(df), L=8).to_pandas()
    want = brute_duplicate_grams(df, 8)
    assert dict(zip(got["gram"], got["n_docs"])) == want


def test_strip_duplicate_spans(ray_session):
    import ray.data as rd
    df = make_docs()
    L = 20
    dup = set(brute_duplicate_grams(df, L))
    out = strip_duplicate_spans(rd.from_pandas(df), L=L).to_pandas() \
        .set_index("doc_id").sort_index()
    for _, row in df.iterrows():
        t = row["text"]
        cover = np.zeros(len(t), bool)
        for i in range(len(t) - L + 1):
            if t[i:i + L] in dup:
                cover[i:i + L] = True
        want = "".join(c for c, m in zip(t, cover) if not m)
        assert out.loc[row["doc_id"], "text_clean"] == want
        assert out.loc[row["doc_id"], "n_removed"] == int(cover.sum())
    # no duplicated L-gram survives in the cleaned corpus... the strip is
    # one-shot (removal can create NEW adjacencies), so assert the
    # original duplicated grams are gone instead.
    for t in out["text_clean"]:
        for g in dup:
            assert g not in t


def test_winnow_positions_basic():
    h = np.array([5, 3, 9, 3, 7, 1, 8], np.uint64)
    pos = winnow_positions(h, 3)
    # every window of 3 must contain a selected position
    for s in range(len(h) - 2):
        assert any(s <= p < s + 3 for p in pos)
    # selected values are window minima
    assert set(h[pos]) <= {1, 3}
    assert len(winnow_positions(np.zeros(0, np.uint64), 4)) == 0
    assert list(winnow_positions(np.array([7, 2], np.uint64), 5)) == [1]


def test_winnowing_guarantee_planted_span(ray_session):
    import ray.data as rd
    L, w = 12, 8
    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)

    def rand(n):
        return alpha[rng.integers(0, 26, n)].tobytes().decode()

    shared = rand(L + w - 1)  # exactly the guarantee floor
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [rand(150) + shared + rand(150),
                 shared + rand(200),
                 rand(220), rand(180) + shared],
    })
    fps = winnow_fingerprints(rd.from_pandas(df), L=L, w=w).to_pandas()
    by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    assert by_doc[0] & by_doc[1] and by_doc[0] & by_doc[3]

    pairs = winnowed_duplicate_candidates(
        rd.from_pandas(df), L=L, w=w).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert {(0, 1), (0, 3), (1, 3)} <= got


def test_winnow_density():
    # winnowing samples ~2/(w+1) of positions on random input
    rng = np.random.default_rng(9)
    h = rng.integers(0, 2**63, 20000).astype(np.uint64)
    w = 15
    pos = winnow_positions(h, w)
    density = len(pos) / len(h)
    assert 1.0 / w < density < 3.0 / (w + 1)


def test_duplicate_grams_matches_duckdb(ray_session):
    """The SQL twin used by the oracle gate, checked in-tests too."""
    import duckdb
    import ray.data as rd
    df = make_docs(seed=23)
    L = 20
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(f"""
        SELECT gram, count(DISTINCT doc_id) AS n_docs
        FROM (SELECT d.doc_id, substr(d.text, t.i::INT, {L}) AS gram
              FROM documents d
              JOIN generate_series(1, 4096) AS t(i)
                ON t.i <= length(d.text) - {L - 1})
        GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        ORDER BY gram
    """).df()
    got = duplicate_grams(rd.from_pandas(df), L=L).to_pandas() \
        .sort_values("gram").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.astype({"n_docs": np.int64}), check_dtype=False)


def test_duplicate_grams_unicode(ray_session):
    """Codepoint (not byte) windows: multibyte text matches the
    char-based brute force."""
    import ray.data as rd
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["préfix-日本語の共有部分文字列-suffixé",
                 "autre-日本語の共有部分文字列-fin",
                 "nothing shared héré at all ですか"]})
    L = 9
    got = duplicate_grams(rd.from_pandas(df), L=L).to_pandas()
    want = brute_duplicate_grams(df, L)
    assert dict(zip(got["gram"], got["n_docs"])) == want
    assert len(want) > 0
