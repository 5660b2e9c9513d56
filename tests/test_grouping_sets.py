"""GROUPING SETS / ROLLUP / CUBE (stages/grouping_sets.py) vs DuckDB,
incl. the GROUPING() bitmask and genuine-null vs rolled-up-null keys."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.grouping_sets import (cube, grouping_sets,
                                                    rollup)

pytestmark = pytest.mark.usefixtures("ray_session")


def _frame(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "region": np.asarray([("eu", "us", "apac")[i]
                              for i in rng.integers(0, 3, n)], object),
        "role": np.asarray([None if i == 3 else
                            ("user", "assistant", "tool")[i]
                            for i in rng.integers(0, 4, n)], object),
        "n_chars": rng.integers(0, 500, n).astype(np.int64),
    })
    df.loc[rng.integers(0, n, n // 20), "n_chars"] = -1
    return df


def _ds(df, blocks=7):
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


def _norm(df):
    df = df.copy()
    for c in ("region", "role"):
        if c in df.columns:
            df[c] = df[c].where(df[c].notna(), "~null").astype(str)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df[sorted(df.columns)]
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True))


def _duck(df, sets_sql):
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(f"""
        SELECT GROUPING(region, role) AS gset, region, role,
               count(*) AS n, sum(n_chars) AS total,
               round(avg(n_chars), 6) AS avg_chars,
               min(n_chars) AS lo, max(n_chars) AS hi
        FROM t GROUP BY {sets_sql}
    """).df()
    con.close()
    want["gset"] = want["gset"].astype(np.int64)
    want["n"] = want["n"].astype(np.int64)
    want["total"] = want["total"].astype(np.int64)
    want["lo"] = want["lo"].astype(np.int64)
    want["hi"] = want["hi"].astype(np.int64)
    return want


_AGGS = {"n": ("count", None), "total": ("sum", "n_chars"),
         "avg_chars": ("mean", "n_chars"), "lo": ("min", "n_chars"),
         "hi": ("max", "n_chars")}


def _got(df, sets):
    g = grouping_sets(_ds(df), sets, _AGGS).to_pandas()
    g["total"] = g["total"].astype(np.int64)
    g["lo"] = g["lo"].astype(np.int64)
    g["hi"] = g["hi"].astype(np.int64)
    return g


def test_rollup_matches_duckdb():
    df = _frame()
    got = _got(df, rollup(["region", "role"]))
    want = _duck(df, "ROLLUP (region, role)")
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_cube_matches_duckdb():
    df = _frame()
    got = _got(df, cube(["region", "role"]))
    want = _duck(df, "CUBE (region, role)")
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_explicit_sets_and_null_disambiguation():
    df = _frame()
    got = _got(df, [["role"], []])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT GROUPING(role) AS gset, role,
               count(*) AS n, sum(n_chars) AS total,
               round(avg(n_chars), 6) AS avg_chars,
               min(n_chars) AS lo, max(n_chars) AS hi
        FROM t GROUP BY GROUPING SETS ((role), ())
    """).df()
    con.close()
    for c in ("gset", "n", "total", "lo", "hi"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # genuine null role (gset bit = 0) vs rolled-up (bit = 1): both
    # rows exist, disambiguated by the mask, with different counts
    sub = got[got["role"].isna()]
    n_by_gset = sub.set_index("gset")["n"].to_dict()
    assert n_by_gset[1] == len(df)            # grand total
    assert n_by_gset[0] == df["role"].isna().sum()


def test_spec_validation():
    df = _frame(100)
    with pytest.raises(ValueError, match="duplicate grouping sets"):
        grouping_sets(_ds(df), [["role"], ["role"]], _AGGS)
    with pytest.raises(ValueError, match="duplicate key"):
        grouping_sets(_ds(df), [["role", "role"]], _AGGS)
    with pytest.raises(ValueError, match="unknown aggregate"):
        grouping_sets(_ds(df), [["role"]], {"x": ("median", "n_chars")})
    with pytest.raises(ValueError, match="col=None"):
        grouping_sets(_ds(df), [["role"]], {"x": ("sum", None)})


def test_sum_over_all_null_group_is_null(ray_session):
    """SQL SUM over a group whose column is entirely NULL is NULL, not
    0 (regression: the skipna partial sum emitted 0)."""
    import duckdb
    df = pd.DataFrame({"k": ["a", "a", "b", "b"],
                       "v": [1.0, 2.0, np.nan, np.nan]})
    out = (grouping_sets(rd.from_pandas(df), [["k"]],
                         {"s": ("sum", "v")})
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT k, sum(v) AS s FROM df GROUP BY k ORDER BY k").df()
    assert out.loc[out["k"] == "a", "s"].tolist() == [3.0]
    assert out.loc[out["k"] == "b", "s"].isna().all()
    assert want.loc[want["k"] == "b", "s"].isna().all()
