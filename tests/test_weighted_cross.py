"""weighted_sample_k (A-ES weighted sampling) and cross_join vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.joins import cross_join
from fasta_windows_ray.stages.sampling import weighted_sample_k

pytestmark = pytest.mark.usefixtures("ray_session")

TWO60 = float(1 << 60)


def _frame(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.asarray(["k%05d" % i for i in range(n)], object),
        "lang": np.asarray([("en", "de", "fr")[i]
                            for i in rng.integers(0, 3, n)], object),
        "w": rng.gamma(2.0, 1.0, n),
    })
    df.loc[rng.integers(0, n, n // 20), "w"] = 0.0     # never sampled
    df.loc[rng.integers(0, n, n // 30), "w"] = np.nan  # never sampled
    return df


def _ds(df, blocks=9):
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


def _duck_sample(df, k, strata=False):
    con = duckdb.connect()
    con.register("t", df)
    part = "PARTITION BY lang " if strata else ""
    want = con.execute(f"""
        WITH h AS (SELECT *, md5(doc_id) AS hx FROM t WHERE w > 0),
        e AS (SELECT doc_id, lang, w,
              -ln((CAST(('0x' || substr(hx, 1, 15)) AS BIGINT) + 0.5)
                  / {TWO60!r}) / w AS aes FROM h)
        SELECT doc_id, lang, w FROM e
        QUALIFY row_number() OVER ({part}ORDER BY aes, doc_id) <= {k}
        ORDER BY {'lang, ' if strata else ''}doc_id
    """).df()
    con.close()
    return want


def test_weighted_sample_matches_duckdb():
    df = _frame()
    got = weighted_sample_k(_ds(df), "doc_id", "w", 100)
    want = _duck_sample(df, 100)
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "w"]].reset_index(drop=True), want)


def test_weighted_sample_stratified_and_deterministic():
    df = _frame()
    got = weighted_sample_k(_ds(df), "doc_id", "w", 40, strata_col="lang")
    want = _duck_sample(df, 40, strata=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "w"]].reset_index(drop=True), want)
    assert (got.groupby("lang").size() == 40).all()
    # partitioning invariance: 1 block == 9 blocks == 30 blocks
    for blocks in (1, 30):
        again = weighted_sample_k(_ds(df, blocks), "doc_id", "w", 40,
                                  strata_col="lang")
        pd.testing.assert_frame_equal(got, again)


def test_weight_semantics():
    df = pd.DataFrame({
        "doc_id": ["huge", "tiny", "zero", "null"],
        "w": [1e9, 1e-9, 0.0, np.nan]})
    got = weighted_sample_k(_ds(df, 1), "doc_id", "w", 2)
    # the huge weight is always included; zero/null never are
    assert "huge" in set(got["doc_id"])
    assert not {"zero", "null"} & set(got["doc_id"])
    # k >= eligible rows -> exactly the eligible rows
    all4 = weighted_sample_k(_ds(df, 1), "doc_id", "w", 10)
    assert set(all4["doc_id"]) == {"huge", "tiny"}


def test_cross_join_matches_duckdb():
    rng = np.random.default_rng(9)
    left = pd.DataFrame({"a": np.arange(500, dtype=np.int64),
                         "v": rng.normal(size=500)})
    right = pd.DataFrame({"b": ["x", "y", "z"],
                          "v": [1.0, 2.0, 3.0]})
    got = (cross_join(_ds(left, 4), right).to_pandas()
           .sort_values(["a", "b"], kind="stable").reset_index(drop=True))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.a, l.v, r.b, r.v AS v_r FROM l CROSS JOIN r
        ORDER BY l.a, r.b
    """).df()
    con.close()
    pd.testing.assert_frame_equal(got[["a", "v", "b", "v_r"]], want)
    assert len(got) == 1500


def test_cross_join_guards_and_chunking():
    left = pd.DataFrame({"a": np.arange(100, dtype=np.int64)})
    big = pd.DataFrame({"b": np.arange(70000, dtype=np.int64)})
    with pytest.raises(ValueError, match="max_right_rows"):
        cross_join(_ds(left, 1), big)
    # chunked emission: output still exact when the per-chunk cap is
    # far below batch x right
    small = pd.DataFrame({"b": np.arange(7, dtype=np.int64)})
    out = cross_join(_ds(left, 2), small,
                     max_out_per_chunk=50).to_pandas()
    assert len(out) == 700
    assert out.groupby("a").size().eq(7).all()
