"""Pivot / unpivot (stages/reshape.py) vs DuckDB PIVOT/UNPIVOT."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.reshape import (explode, pivot,
                                              unpivot)

pytestmark = pytest.mark.usefixtures("ray_session")


def _frame(n=3000, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "conv_id": np.asarray(["c%02d" % i
                               for i in rng.integers(0, 40, n)], object),
        "role": np.asarray([("user", "assistant", "tool", "system")[i]
                            for i in rng.integers(0, 4, n)], object),
        "n_chars": rng.integers(0, 500, n).astype(np.int64),
    })


def _ds(df, blocks=7):
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


@pytest.mark.parametrize("agg,duck", [
    ("sum", "sum(n_chars)"), ("count", "count(n_chars)"),
    ("min", "min(n_chars)"), ("max", "max(n_chars)")])
def test_pivot_matches_duckdb(agg, duck):
    df = _frame()
    got = (pivot(_ds(df), ["conv_id"], "role", "n_chars", agg=agg)
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(f"""
        PIVOT t ON role USING {duck} GROUP BY conv_id ORDER BY conv_id
    """).df()
    con.close()
    want.columns = ["conv_id"] + [f"role_{c}" for c in want.columns[1:]]
    cols = ["conv_id"] + sorted(c for c in want.columns if c != "conv_id")
    pd.testing.assert_frame_equal(
        got[cols].astype({c: "float64" for c in cols[1:]}),
        want[cols].astype({c: "float64" for c in cols[1:]}))


def test_pivot_pinned_values_and_cap():
    df = _frame(400)
    got = (pivot(_ds(df), ["conv_id"], "role", "n_chars",
                 values=["user", "absent_role"])
           .to_pandas())
    assert list(got.columns) == ["conv_id", "role_user",
                                 "role_absent_role"]
    assert (got["role_absent_role"] == 0).all()   # sum over no rows = 0
    with pytest.raises(ValueError, match="max_values"):
        pivot(_ds(df), ["conv_id"], "role", "n_chars",
              max_values=2).take_all()


def test_unpivot_matches_duckdb():
    df = (pivot(_ds(_frame(1000)), ["conv_id"], "role", "n_chars")
          .to_pandas())
    vcols = [c for c in df.columns if c != "conv_id"]
    got = (unpivot(rd.from_pandas(df), ["conv_id"], vcols)
           .to_pandas()
           .sort_values(["conv_id", "variable"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(f"""
        UNPIVOT t ON {', '.join(vcols)}
        INTO NAME variable VALUE value
        ORDER BY conv_id, variable
    """).df()
    con.close()
    pd.testing.assert_frame_equal(
        got.astype({"value": "float64"}),
        want.astype({"value": "float64"}), check_dtype=False)


def test_pivot_unpivot_roundtrip():
    df = _frame(800, seed=9)
    wide = (pivot(_ds(df), ["conv_id"], "role", "n_chars")
            .to_pandas())
    vcols = [c for c in wide.columns if c != "conv_id"]
    long = (unpivot(rd.from_pandas(wide), ["conv_id"], vcols)
            .to_pandas())
    back = (long.assign(role=long["variable"].str.removeprefix("role_"))
            .groupby(["conv_id", "role"])["value"].sum())
    truth = df.groupby(["conv_id", "role"])["n_chars"].sum()
    merged = truth.to_frame("want").join(back.to_frame("got"), how="left")
    assert np.allclose(merged["want"], merged["got"])


def test_explode_matches_duckdb():
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "toks": [["a", "b"], [], None, ["c"], ["d", "e", "f"], ["g"]]})
    got = (explode(rd.from_pandas(df), "toks", pos_col="pos")
           .to_pandas().sort_values(["doc_id", "pos"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT doc_id, u.tok AS toks,
               u.p - 1 AS pos
        FROM t, LATERAL (SELECT unnest(toks) AS tok,
                                generate_subscripts(toks, 1) AS p) u
        ORDER BY doc_id, pos
    """).df()
    con.close()
    pd.testing.assert_frame_equal(
        got.astype({"pos": "int64"}),
        want.astype({"pos": "int64", "doc_id": "int64"}),
        check_dtype=False)
    # null + empty lists vanish (SQL UNNEST)
    assert set(got["doc_id"]) == {0, 3, 4, 5}
