"""Set operations (stages/setops.py) vs DuckDB INTERSECT/EXCEPT
[ALL] / UNION — bag multiplicities, NULL-equality, schema guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.setops import set_op

pytestmark = pytest.mark.usefixtures("ray_session")


def _frames(seed=11, n=4000):
    """Two overlapping frames with planted duplicate rows and NULLs on
    both sides (string + numeric key columns)."""
    rng = np.random.default_rng(seed)

    def one(shift):
        conv = rng.integers(shift, shift + 30, n)
        df = pd.DataFrame({
            "conv_id": np.asarray(
                [None if c % 17 == 0 else "c%02d" % c for c in conv],
                object),
            "role": np.asarray([("user", "assistant", "tool")[i]
                                for i in rng.integers(0, 3, n)], object),
            "score": rng.integers(0, 6, n).astype(np.float64),
        })
        df.loc[rng.integers(0, n, n // 10), "score"] = np.nan
        return df

    return one(0), one(10)


def _ds(df, blocks=7):
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


_SQL = {"intersect_all": "INTERSECT ALL", "except_all": "EXCEPT ALL",
        "intersect": "INTERSECT", "except": "EXCEPT", "union": "UNION"}


def _norm(df):
    df = df.copy()
    df["conv_id"] = (df["conv_id"].where(df["conv_id"].notna(), "~null")
                     .astype(str))              # NaN/None -> one token
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True))


@pytest.mark.parametrize("op", list(_SQL))
def test_set_op_matches_duckdb(op):
    lf, rf = _frames()
    got = set_op(_ds(lf), _ds(rf), op).to_pandas()
    con = duckdb.connect()
    con.register("l", lf)
    con.register("r", rf)
    want = con.execute(
        f"SELECT * FROM l {_SQL[op]} SELECT * FROM r").df()
    con.close()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_bag_multiplicities_exact():
    l = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 2 + ["c"]})
    r = pd.DataFrame({"k": ["a"] * 3 + ["b"] * 4 + ["d"]})
    cnt = lambda ds: ds.to_pandas()["k"].value_counts().to_dict()
    assert cnt(set_op(_ds(l, 2), _ds(r, 2), "intersect_all")) == \
        {"a": 3, "b": 2}                       # min(l, r)
    assert cnt(set_op(_ds(l, 2), _ds(r, 2), "except_all")) == \
        {"a": 2, "c": 1}                       # max(l - r, 0)
    assert cnt(set_op(_ds(l, 2), _ds(r, 2), "except")) == {"c": 1}
    assert cnt(set_op(_ds(l, 2), _ds(r, 2), "union")) == \
        {"a": 1, "b": 1, "c": 1, "d": 1}


def test_null_rows_compare_equal():
    l = pd.DataFrame({"k": [None, None, "x"]})
    r = pd.DataFrame({"k": [None, "y"]})
    got = set_op(_ds(l, 1), _ds(r, 1), "intersect_all").to_pandas()
    assert len(got) == 1 and got["k"].isna().all()


def test_schema_guard_and_empty():
    l = pd.DataFrame({"k": ["a"]})
    with pytest.raises(ValueError, match="identical columns"):
        set_op(_ds(l, 1), _ds(pd.DataFrame({"z": ["a"]}), 1), "union")
    with pytest.raises(ValueError, match="unknown set op"):
        set_op(_ds(l, 1), _ds(l, 1), "minus")
    empty = pd.DataFrame({"k": pd.array([], dtype=object)})
    assert set_op(_ds(l, 1), _ds(empty, 1), "except_all").count() == 1
