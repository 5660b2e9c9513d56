"""Data-contract validation (stages/validate.py) vs DuckDB
COUNT FILTER oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.validate import enforce, validate

pytestmark = pytest.mark.usefixtures("ray_session")


def _frame(n=2000, seed=8):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.asarray([("en", "de", "fr", "xx")[i]
                            for i in rng.integers(0, 4, n)], object),
        "score": rng.random(n) * 2 - 0.5,          # some out of [0,1]
        "email": np.asarray([f"u{i}@ex.com" if i % 7 else f"bad{i}"
                             for i in range(n)], object),
        "text": np.asarray(["x" * int(i) for i in
                            rng.integers(0, 50, n)], object),
    })
    df.loc[df.index % 31 == 0, "lang"] = None
    df.loc[df.index % 101 == 0, "score"] = np.nan
    return df


def _ds(df, blocks=7):
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


RULES = [
    ("not_null", "lang"),
    ("in_range", "score", 0.0, 1.0),
    ("in_set", "lang", ["en", "de", "fr"]),
    ("matches", "email", r"[a-z0-9]+@[a-z.]+"),
    ("str_len", "text", 1, 40),
]


def test_validate_matches_duckdb_counts():
    df = _frame()
    rep = validate(_ds(df), RULES, id_col="doc_id").set_index("rule")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT
          count(*) FILTER (lang IS NULL) AS nn,
          count(*) FILTER (score IS NULL OR score < 0 OR score > 1)
            AS rng,
          count(*) FILTER (lang IS NULL
                           OR lang NOT IN ('en','de','fr')) AS inset,
          count(*) FILTER (NOT regexp_full_match(email,
                           '[a-z0-9]+@[a-z.]+')) AS rex,
          count(*) FILTER (length(text) < 1 OR length(text) > 40) AS sl
        FROM t
    """).fetchone()
    con.close()
    got = [int(rep.loc[r, "n_failed"]) for r in (
        "not_null(lang)", "in_range(score):0.0,1.0",
        "in_set(lang):['en', 'de', 'fr']",
        "matches(email):[a-z0-9]+@[a-z.]+", "str_len(text):1,40")]
    assert got == list(want)
    assert (rep["n_checked"] == len(df)).all()
    assert not rep["ok"].any()  # every rule has planted offenders
    # offender samples reference real failing ids
    bad = rep.loc["not_null(lang)", "sample_ids"].split(",")
    assert all(df.loc[int(i), "lang"] is None for i in bad if i)


def test_unique_rule_counts_duplicates():
    df = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3, 4],
                       "v": np.arange(7)})
    rep = validate(_ds(df, blocks=3), [("unique", "k")])
    assert int(rep["n_failed"].iloc[0]) == 3        # 1 extra 1, 2 extra 3s
    assert not rep["ok"].iloc[0]
    clean = pd.DataFrame({"k": [1, 2, 3], "v": [0, 1, 2]})
    rep2 = validate(_ds(clean, blocks=2), [("unique", "k")])
    assert rep2["ok"].iloc[0]


def test_enforce_keeps_exactly_passing_rows():
    df = _frame(800)
    kept = enforce(_ds(df), RULES).to_pandas()
    m = (df["lang"].notna()
         & df["score"].between(0, 1)
         & df["lang"].isin(["en", "de", "fr"])
         & df["email"].str.fullmatch(r"[a-z0-9]+@[a-z.]+").fillna(False)
         & df["text"].str.len().between(1, 40))
    want = df[m].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        kept.sort_values("doc_id").reset_index(drop=True), want)


def test_custom_rule():
    df = _frame(300)
    rep = validate(_ds(df), [
        ("custom", "score", lambda a: pd.Series(
            a.to_pandas() >= 0).to_numpy())])
    want = int((~(df["score"] >= 0)).sum())
    assert int(rep["n_failed"].iloc[0]) == want
