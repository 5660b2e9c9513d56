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
