"""Heavy hitters (stages/heavy_hitters.py): exactness vs a local pandas
count, certificate soundness (holds on skew, refuses on flat data with
a too-small summary), and tokenizer parity semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.stages.heavy_hitters import (HeavyHittersResult,
                                                    heavy_hitters, words_of)

pytestmark = pytest.mark.usefixtures("ray_session")


def _exact_topk(terms: list[str], k: int) -> pd.DataFrame:
    s = pd.Series(terms).value_counts()
    df = (s.rename_axis("term").reset_index(name="n")
           .sort_values(["n", "term"], ascending=[False, True],
                        kind="stable").head(k).reset_index(drop=True))
    df["n"] = df["n"].astype(np.int64)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df


def _zipf_terms(n=60_000, vocab=5_000, seed=7) -> list[str]:
    rng = np.random.default_rng(seed)
    z = np.minimum(rng.zipf(1.3, n), vocab)
    return [f"t{int(i)}" for i in z]


def test_heavy_hitters_exact_on_skewed_data_small_capacity(ray_session):
    terms = _zipf_terms()
    ds = rd.from_items([{"k": t} for t in terms]).repartition(9)
    res = heavy_hitters(ds, "k", k=10, capacity=256)
    assert isinstance(res, HeavyHittersResult)
    assert res.certified, (res.kth_count, res.bound)
    pd.testing.assert_frame_equal(res.top, _exact_topk(terms, 10))


def test_heavy_hitters_trivial_when_capacity_covers_vocab(ray_session):
    terms = [f"w{i % 40}" for i in range(4_000)]
    ds = rd.from_items([{"k": t} for t in terms]).repartition(5)
    res = heavy_hitters(ds, "k", k=5, capacity=1024)
    assert res.certified and res.bound == 0
    pd.testing.assert_frame_equal(res.top, _exact_topk(terms, 5))


def test_heavy_hitters_refuses_to_certify_flat_distribution(ray_session):
    # 3000 terms, every count identical, capacity far below vocab:
    # the k-th count can never clear boundary + D, and claiming
    # exactness would be a lie — certified must be False
    terms = [f"u{i}" for i in range(3_000)] * 4
    ds = rd.from_items([{"k": t} for t in terms]).repartition(7)
    res = heavy_hitters(ds, "k", k=5, capacity=64)
    assert not res.certified
    assert len(res.top) == 5  # still returns its best-effort top-k


def test_heavy_hitters_word_tokenize(ray_session):
    docs = ["the cat sat on the mat",
            "The dog and the cat",
            "a  double  space"] * 50  # double space -> '' tokens, kept
    ds = rd.from_items([{"text": d} for d in docs]).repartition(3)
    res = heavy_hitters(ds, "text", k=3, capacity=512, tokenize="words")
    flat = [w for d in docs for w in d.lower().split(" ")]
    assert res.certified
    pd.testing.assert_frame_equal(res.top, _exact_topk(flat, 3))


def test_words_of_parity_with_sql_string_split():
    arr = pa.chunked_array([["A b", "x  Y", ""]])
    out = words_of(arr).to_pylist()
    # string_split(lower(s), ' '): 'a b'->[a,b]; 'x  y'->[x,'',y]; ''->['']
    assert out == ["a", "b", "x", "", "y", ""]


def test_heavy_hitters_empty_input(ray_session):
    ds = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    res = heavy_hitters(ds, "k", k=5, capacity=16)
    assert res.certified and len(res.top) == 0


# ---------------------------------------------------------------------------
# Windowed heavy hitters (trending terms per tumbling window)
# ---------------------------------------------------------------------------

HOUR_US = 3600 * 1_000_000


def _trending_events(seed=41, n=30_000, windows=3):
    rng = np.random.default_rng(seed)
    hot = [f"hot{w}" for w in range(windows)]
    rows = []
    for i in range(n):
        w = i % windows
        ts = np.int64(w * HOUR_US + rng.integers(0, HOUR_US))
        term = hot[w] if rng.random() < 0.3 else \
            f"t{int(min(rng.zipf(1.5), 2000))}"
        rows.append({"ts": ts, "term": term})
    return pd.DataFrame(rows)


def _true_window_topk(df, k):
    df = df.copy()
    df["w"] = (df["ts"] // HOUR_US) * HOUR_US
    g = (df.groupby(["w", "term"], as_index=False).size()
           .rename(columns={"size": "n"}))
    out = []
    for w, sub in g.groupby("w"):
        sub = (sub.sort_values(["n", "term"], ascending=[False, True],
                               kind="stable").head(k))
        sub = sub.reset_index(drop=True)
        sub["rank"] = np.arange(1, len(sub) + 1)
        out.append(sub)
    return pd.concat(out, ignore_index=True)


def test_windowed_heavy_hitters_exact_counts_and_ranks(ray_session):
    from fasta_windows_ray.stages.heavy_hitters import windowed_heavy_hitters
    df = _trending_events()
    tbl = pa.table({"ts": pa.array(df["ts"], pa.timestamp("us")),
                    "term": df["term"]})
    ds = rd.from_arrow(tbl).repartition(7)
    out = windowed_heavy_hitters(ds, "ts", "term", HOUR_US, k=5,
                                 capacity=256, tokenize=None)
    assert out["certified"].all()
    want = _true_window_topk(df, 5)
    assert len(out) == len(want)
    got = out[["window_start", "term", "n", "rank"]].reset_index(drop=True)
    want = want.rename(columns={"w": "window_start"})[
        ["window_start", "term", "n", "rank"]]
    pd.testing.assert_frame_equal(
        got.astype({"window_start": np.int64, "n": np.int64,
                    "rank": np.int64}),
        want.astype({"window_start": np.int64, "n": np.int64,
                     "rank": np.int64}))
    # each window's hot term must rank 1
    for w in range(3):
        row = out[(out["window_start"] == w * HOUR_US)
                  & (out["rank"] == 1)]
        assert row["term"].iloc[0] == f"hot{w}"


def test_windowed_heavy_hitters_flat_window_uncertified(ray_session):
    from fasta_windows_ray.stages.heavy_hitters import windowed_heavy_hitters
    # 2000 distinct terms, all count 2, capacity far below vocab
    ts = np.array([i % HOUR_US for i in range(4000)],
                  dtype="datetime64[us]")
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts),
        "term": [f"u{i % 2000}" for i in range(4000)]})).repartition(5)
    out = windowed_heavy_hitters(ds, "ts", "term", HOUR_US, k=3,
                                 capacity=32, tokenize=None)
    assert len(out) == 3
    assert not out["certified"].any()


def test_windowed_heavy_hitters_word_mode(ray_session):
    from fasta_windows_ray.stages.heavy_hitters import windowed_heavy_hitters
    rows = []
    for w, word in ((0, "alpha"), (1, "beta")):
        for i in range(50):
            rows.append({"ts": np.int64(w * HOUR_US + i),
                         "text": f"{word} filler{i % 25} x"})
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(np.array([r["ts"] for r in rows],
                                dtype="datetime64[us]")),
        "text": [r["text"] for r in rows]}))
    out = windowed_heavy_hitters(ds, "ts", "text", HOUR_US, k=2,
                                 capacity=512, tokenize="words")
    assert out["certified"].all()
    top1 = dict(out[out["rank"] == 1][["window_start", "term"]].values)
    # 'x' and the per-window word tie at 50; tie-break term asc
    assert top1[0] == "alpha" and top1[HOUR_US] == "beta"
