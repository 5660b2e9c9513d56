"""Window functions (lag/lead/row_number/cumsum/rolling mean) gated
bit-for-bit against DuckDB's ``fn() OVER (PARTITION BY ... ORDER BY ...
ROWS ...)`` on the same frame — the independent oracle the driver gate
uses, run in-test because the 50-row registry is at its cap."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _frame(n=4000, seed=11, n_keys=37):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "conv_id": np.asarray(
            ["c%03d" % i for i in rng.integers(0, n_keys, n)], object),
        "ts": pd.to_datetime(
            rng.integers(0, 10**9, n) * 1000, unit="us"),
        "uid": np.arange(n, dtype=np.int64),
        "score": rng.integers(-50, 50, n).astype(np.int64),
        "fval": np.round(rng.normal(0, 4, n), 3),
    })


def _ds(df, blocks=9):
    import ray.data as rd
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


def _run(df, specs, num_buckets=8):
    from fasta_windows_ray.stages.window_funcs import window_functions
    out = window_functions(_ds(df), ["conv_id"], ["ts", "uid"], specs,
                           num_buckets=num_buckets).to_pandas()
    return out.sort_values("uid").reset_index(drop=True)


def test_matches_duckdb_window_sql(ray_session):
    df = _frame()
    out = _run(df, [
        ("row_number", "rn"),
        ("lag", "score", 1, "lag1"),
        ("lag", "fval", 3, "lag3"),
        ("lead", "score", 2, "lead2"),
        ("cumsum", "score", "run_sum"),
        ("rolling_mean", "score", 5, "roll5"),
    ])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT uid,
          row_number() OVER w AS rn,
          CAST(lag(score, 1) OVER w AS DOUBLE) AS lag1,
          lag(fval, 3) OVER w AS lag3,
          CAST(lead(score, 2) OVER w AS DOUBLE) AS lead2,
          CAST(sum(score) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS run_sum,
          round(avg(score) OVER (w ROWS BETWEEN 4 PRECEDING
                                 AND CURRENT ROW), 6) AS roll5
        FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, uid)
        ORDER BY uid
    """).df()
    con.close()
    got = out[["uid", "rn", "lag1", "lag3", "lead2", "run_sum", "roll5"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_preserves_rows_and_buckets_invariant(ray_session):
    df = _frame(n=800, n_keys=5)
    specs = [("lag", "score", 1, "lag1"), ("cumsum", "score", "cs")]
    a = _run(df, specs, num_buckets=1)
    b = _run(df, specs, num_buckets=13)
    assert len(a) == len(df)
    pd.testing.assert_frame_equal(a, b)


def test_edges_short_partitions_and_timestamps(ray_session):
    # partitions shorter than every offset/frame; lag of a timestamp
    df = pd.DataFrame({
        "conv_id": ["a", "a", "b", "c"],
        "ts": pd.to_datetime([3, 1, 5, 9], unit="s"),
        "uid": np.arange(4, dtype=np.int64),
        "score": np.int64([10, 20, 30, 40]),
        "fval": [1.0, 2.0, 3.0, 4.0],
    })
    out = _run(df, [
        ("lag", "ts", 1, "prev_ts"),
        ("lead", "score", 5, "lead5"),
        ("rolling_mean", "score", 10, "roll"),
        ("row_number", "rn"),
    ], num_buckets=3)
    # order within 'a' is ts-asc: uid=1 (1s) then uid=0 (3s)
    assert pd.isna(out.loc[1, "prev_ts"])
    assert out.loc[0, "prev_ts"] == pd.Timestamp("1970-01-01 00:00:01")
    assert out["lead5"].isna().all()
    assert out.loc[0, "roll"] == 15.0 and out.loc[1, "roll"] == 20.0
    assert list(out["rn"]) == [2, 1, 1, 1]


def test_bad_spec_raises(ray_session):
    from fasta_windows_ray.stages.window_funcs import window_functions
    with pytest.raises(ValueError):
        window_functions(_ds(_frame(50)), ["conv_id"], ["ts"],
                         [("lag", "score", "out")])
    with pytest.raises(ValueError):
        window_functions(_ds(_frame(50)), ["conv_id"], ["ts"],
                         [("median", "score", "out")])

def test_rank_dense_rank_ntile_match_duckdb(ray_session):
    """rank/dense_rank ordered by a LOW-cardinality key (real ties);
    ntile by a unique key (SQL leaves tie order unspecified)."""
    from fasta_windows_ray.stages.window_funcs import window_functions
    df = _frame(n=3000, n_keys=23)

    ranked = (window_functions(
        _ds(df), ["conv_id"], ["score"],
        [("rank", "rk"), ("dense_rank", "drk")], num_buckets=8)
        .to_pandas().sort_values("uid").reset_index(drop=True))
    tiled = _run(df, [("ntile", 7, "t7"), ("ntile", 4, "t4"),
                      ("row_number", "rn")])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT uid,
          rank() OVER (PARTITION BY conv_id ORDER BY score) AS rk,
          dense_rank() OVER (PARTITION BY conv_id ORDER BY score) AS drk,
          ntile(7) OVER w AS t7,
          ntile(4) OVER w AS t4
        FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, uid)
        ORDER BY uid
    """).df()
    con.close()
    pd.testing.assert_frame_equal(
        ranked[["uid", "rk", "drk"]], want[["uid", "rk", "drk"]],
        check_dtype=False)
    pd.testing.assert_frame_equal(
        tiled[["uid", "t7", "t4"]], want[["uid", "t7", "t4"]],
        check_dtype=False)


def test_ntile_tiny_partitions(ray_session):
    """Partitions shorter than b: every row its own tile, 1-based."""
    df = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "ts": pd.to_datetime([1, 2, 3], unit="s"),
        "uid": np.arange(3, dtype=np.int64),
        "score": np.int64([5, 6, 7]),
        "fval": [0.0, 0.0, 0.0]})
    out = _run(df, [("ntile", 5, "t5")])
    assert list(out["t5"]) == [1, 2, 1]

def test_percent_rank_cume_dist_first_last_match_duckdb(ray_session):
    """pr/cd on a low-cardinality order key (real ties, deterministic);
    fv/lv on the unique (ts, uid) key (SQL leaves tie order free)."""
    from fasta_windows_ray.stages.window_funcs import window_functions
    df = _frame(n=2500, n_keys=19)
    got = (window_functions(
        _ds(df), ["conv_id"], ["score"],
        [("percent_rank", "pr"), ("cume_dist", "cd")], num_buckets=8)
        .to_pandas().sort_values("uid").reset_index(drop=True))
    flv = _run(df, [("first_value", "fval", "fv"),
                    ("last_value", "fval", "lv")])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT uid,
          round(percent_rank() OVER w, 6) AS pr,
          round(cume_dist() OVER w, 6) AS cd,
          first_value(fval) OVER (u ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS fv,
          last_value(fval) OVER (u ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING) AS lv
        FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY score),
                      u AS (PARTITION BY conv_id ORDER BY ts, uid)
        ORDER BY uid
    """).df()
    con.close()
    # pr/cd: np.round vs DuckDB round() disagree on exact .5 ULPs at
    # the 6th decimal (banker's rounding) — compare at 1e-6 instead
    for c in ("pr", "cd"):
        assert np.allclose(got[c].to_numpy(), want[c].to_numpy(),
                           atol=1.1e-6, rtol=0), c
    pd.testing.assert_frame_equal(
        flv[["uid", "fv", "lv"]], want[["uid", "fv", "lv"]],
        check_dtype=False)


def test_range_frames_match_duckdb(ray_session):
    """Event-time RANGE frames (trailing r-µs window incl. ts ties) vs
    DuckDB RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW."""
    from fasta_windows_ray.stages.window_funcs import window_functions
    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "conv_id": np.asarray(["c%02d" % i
                               for i in rng.integers(0, 25, n)], object),
        # coarse ts so ties happen (RANGE peer semantics exercised)
        "ts": pd.to_datetime(
            rng.integers(0, 2000, n) * 1_000_000, unit="us"),
        "uid": np.arange(n, dtype=np.int64),
        "score": rng.integers(-50, 50, n).astype(np.int64),
        "fval": np.round(rng.normal(0, 4, n), 3)})
    df.loc[df.index % 41 == 0, "fval"] = np.nan
    R = 300 * 1_000_000          # 5-minute trailing window
    got = (window_functions(
        _ds(df), ["conv_id"], ["ts"],
        [("range_sum", "score", R, "rs"),
         ("range_mean", "score", R, "rm"),
         ("range_count", "fval", R, "rc")], num_buckets=8)
        .to_pandas().sort_values("uid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT uid,
          CAST(sum(score) OVER w AS DOUBLE) AS rs,
          round(avg(score) OVER w, 6) AS rm,
          CAST(count(fval) OVER w AS BIGINT) AS rc
        FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts
          RANGE BETWEEN INTERVAL '300 seconds' PRECEDING
                AND CURRENT ROW)
        ORDER BY uid
    """).df()
    con.close()
    pd.testing.assert_frame_equal(
        got[["uid", "rs", "rm", "rc"]], want, check_dtype=False)


def test_range_frames_huge_span_overflow_fallback(ray_session):
    """A segment-count x time-span product past int64 forces the
    per-segment fallback; results must still match DuckDB (regression
    for the composite-key overflow that silently corrupted frames)."""
    from fasta_windows_ray.stages.window_funcs import window_functions
    rng = np.random.default_rng(7)
    n = 400
    span = (1 << 61)              # rel alone near int64/4
    df = pd.DataFrame({
        "conv_id": np.asarray(["u%03d" % i
                               for i in rng.integers(0, 50, n)], object),
        # int64 event "times" spread over a deliberately absurd span
        "ts": rng.integers(0, span, n).astype(np.int64),
        "uid": np.arange(n, dtype=np.int64),
        "score": rng.integers(-9, 9, n).astype(np.int64)})
    R = span // 7
    got = (window_functions(_ds(df), ["conv_id"], ["ts"],
                            [("range_sum", "score", R, "rs")],
                            num_buckets=4)
           .to_pandas().sort_values("uid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(f"""
        SELECT uid, CAST(sum(score) OVER (PARTITION BY conv_id
          ORDER BY ts RANGE BETWEEN {R} PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS rs
        FROM t ORDER BY uid""").df()
    con.close()
    pd.testing.assert_frame_equal(got[["uid", "rs"]], want,
                                  check_dtype=False)
