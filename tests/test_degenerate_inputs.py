"""Degenerate-input hardening for the late-round-4 operators: empty
datasets, single rows, all-null columns — the class of driver-side
crash the round-3 ADVICE flagged (empty Ray datasets lose column names
through to_pandas)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

pytestmark = pytest.mark.usefixtures("ray_session")


def _empty(cols: dict) -> "rd.Dataset":
    return rd.from_pandas(pd.DataFrame(
        {c: pd.Series(dtype=t) for c, t in cols.items()}))


def test_pivot_empty_and_single_row():
    from fasta_windows_ray.stages.reshape import pivot
    empty = _empty({"g": object, "p": object, "v": np.int64})
    out = pivot(empty, ["g"], "p", "v", values=["a", "b"]).to_pandas()
    assert len(out) == 0
    one = rd.from_pandas(pd.DataFrame(
        {"g": ["x"], "p": ["a"], "v": np.int64([7])}))
    out1 = pivot(one, ["g"], "p", "v", values=["a", "b"]).to_pandas()
    assert len(out1) == 1
    assert out1["p_a"].iloc[0] == 7 and out1["p_b"].iloc[0] == 0


def test_unpivot_explode_empty():
    from fasta_windows_ray.stages.reshape import explode, unpivot
    empty = _empty({"id": np.int64, "a": np.float64, "b": np.float64})
    assert unpivot(empty, ["id"], ["a", "b"]).count() == 0
    all_null = rd.from_pandas(pd.DataFrame(
        {"id": np.int64([1, 2]), "toks": pd.Series([None, None])}))
    assert explode(all_null, "toks").count() == 0


def test_window_functions_empty():
    from fasta_windows_ray.stages.window_funcs import window_functions
    empty = _empty({"conv_id": object, "ts": "datetime64[us]",
                    "score": np.int64})
    out = window_functions(empty, ["conv_id"], ["ts"],
                           [("rank", "rk"), ("range_sum", "score",
                                             1000, "rs")]).to_pandas()
    assert len(out) == 0


def test_validate_empty_dataset():
    from fasta_windows_ray.stages.validate import enforce, validate
    empty = _empty({"k": np.float64, "t": object})
    rep = validate(empty, [("not_null", "k"), ("unique", "k")])
    assert bool(rep["ok"].all())
    assert enforce(empty, [("not_null", "k")]).count() == 0


def test_temporal_join_empty_sides():
    import pyarrow as pa
    from fasta_windows_ray.stages.temporal import temporal_join
    ev = _empty({"item_id": np.int64, "ts": np.int64,
                 "event_id": np.int64})
    hist = pd.DataFrame({"item_id": np.int64([1]),
                         "price": [2.0],
                         "valid_from": np.int64([0]),
                         "valid_to": pd.Series([None], dtype="float64")})
    ev_sch = {"item_id": pa.int64(), "ts": pa.int64(),
              "event_id": pa.int64()}
    h_sch = {"item_id": pa.int64(), "price": pa.float64(),
             "valid_from": pa.int64(), "valid_to": pa.float64()}
    out = temporal_join(ev, rd.from_pandas(hist), key="item_id",
                        value_cols=["price"], num_buckets=2,
                        schemas=(ev_sch, h_sch))
    assert out.count() == 0
    # schema probe on an empty side without hints raises the hint error
    with pytest.raises(Exception, match="schemas"):
        temporal_join(ev, rd.from_pandas(hist), key="item_id",
                      value_cols=["price"], num_buckets=2).count()
    # events but EMPTY history -> all rows survive null-padded
    ev2 = rd.from_pandas(pd.DataFrame(
        {"item_id": np.int64([1, 2]), "ts": np.int64([5, 6]),
         "event_id": np.int64([0, 1])}))
    h0 = _empty({"item_id": np.int64, "price": np.float64,
                 "valid_from": np.int64, "valid_to": np.float64})
    out2 = temporal_join(ev2, h0, key="item_id",
                         value_cols=["price"], num_buckets=2,
                         schemas=(ev_sch, h_sch)).to_pandas()
    assert len(out2) == 2 and out2["price"].isna().all()


def test_hash_join_full_empty_sides():
    from fasta_windows_ray.stages.joins import hash_join
    l = rd.from_pandas(pd.DataFrame({"k": np.int64([1, 2]),
                                     "lv": np.int64([10, 20])}))
    r0 = _empty({"k": np.int64, "rv": np.float64})
    out = hash_join(l, r0, on="k", how="full", num_buckets=2,
                    left_schema={"k": "int64", "lv": "int64"},
                    right_schema={"k": "int64", "rv": "float64"})
    df = out.to_pandas()
    assert len(df) == 2 and df["rv"].isna().all()


def test_skew_report_single_key():
    from fasta_windows_ray.stages.profile import skew_report
    one = rd.from_pandas(pd.DataFrame({"k": ["only"] * 100}))
    rep = skew_report(one, "k", num_buckets=8)
    assert rep["n_rows"] == 100
    assert rep["top_keys"]["key"].iloc[0] == "only"
    assert rep["bucket_loads"]["imbalance"] == 8.0  # all in one bucket
