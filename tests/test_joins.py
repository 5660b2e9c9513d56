"""As-of / range / semi-anti join edge cases."""

import numpy as np
import pandas as pd


def test_asof_and_range_edges(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.joins import asof_join, range_join, semi_join

    S = 1_000_000
    E = 1_704_067_200_000_000
    turns = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b"],
        "turn_uid": [0, 1, 2, 0],
        "ts": pd.to_datetime(np.array([E, E + 5 * S, E + 100 * S, E]),
                             unit="us"),
    })
    events = pd.DataFrame({
        "conv_id": ["a", "a"],
        "ts": pd.to_datetime(np.array([E, E + 50 * S]), unit="us"),
        "mark": [10, 20],
    })
    out = asof_join(rd.from_pandas(turns), events, ["mark"],
                    num_buckets=2).to_pandas()
    out = out.sort_values(["conv_id", "turn_uid"]).reset_index(drop=True)
    # turn at E+100s matches the later mark; conv b has no events -> NaN
    assert out.loc[2, "mark"] == 20
    assert out.loc[0, "mark"] == 10 and out.loc[1, "mark"] == 10
    assert np.isnan(out.loc[3, "mark"])

    iv = pd.DataFrame({
        "conv_id": ["a"],
        "session_start": pd.to_datetime([E], unit="us"),
        "session_end": pd.to_datetime([E + 10 * S], unit="us"),
    })
    r = range_join(rd.from_pandas(turns), iv, num_buckets=2).to_pandas()
    r = r.sort_values(["conv_id", "turn_uid"]).reset_index(drop=True)
    assert pd.notna(r.loc[0, "session_start"])          # inside
    assert pd.notna(r.loc[1, "session_start"])          # inside
    assert pd.isna(r.loc[2, "session_start"])           # after interval
    assert pd.isna(r.loc[3, "session_start"])           # conv without interval

    s = semi_join(rd.from_pandas(turns), {"a"}).to_pandas()
    assert set(s["conv_id"]) == {"a"} and len(s) == 3
    an = semi_join(rd.from_pandas(turns), {"a"}, anti=True).to_pandas()
    assert set(an["conv_id"]) == {"b"} and len(an) == 1


def test_hash_join_matches_pandas_merge(ray_session):
    import ray.data as rd
    from fasta_windows_ray.stages.joins import hash_join
    rng = np.random.default_rng(4)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "v": np.arange(500)})
    right = pd.DataFrame({"k": np.arange(0, 60, 2),
                          "w": np.arange(30) * 10})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                    num_buckets=8).to_pandas()
    want = left.merge(right, on="k", how="inner")
    key = ["k", "v", "w"]
    out = out[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)

    lo = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                   num_buckets=8, how="left").to_pandas()
    wl = left.merge(right, on="k", how="left")
    assert len(lo) == len(wl)
    assert lo["w"].isna().sum() == wl["w"].isna().sum()


def test_hash_join_edge_cases(ray_session):
    """Mixed int/float keys (pandas upcast equality), null keys, and a
    zero-match inner join keeping a typed schema."""
    import ray.data as rd
    from fasta_windows_ray.stages.joins import hash_join
    left = pd.DataFrame({"k": np.array([1, 2, 3], np.int64), "v": [10, 20, 30]})
    right = pd.DataFrame({"k": np.array([1.0, 2.0, 9.0]), "w": [1, 2, 9]})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                    num_buckets=8).to_pandas()
    assert sorted(out["w"]) == [1, 2]          # int 1,2 match float 1.0,2.0

    ln = pd.DataFrame({"k": ["a", None, "b"], "v": [1, 2, 3]})
    rn = pd.DataFrame({"k": ["a", None], "w": [7, 8]})
    outn = hash_join(rd.from_pandas(ln), rd.from_pandas(rn), on="k",
                     num_buckets=8).to_pandas()
    # no crash on null keys; 'a' matches (null-key match semantics
    # delegate to pandas merge inside the group)
    assert 7 in set(outn["w"])

    zl = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    zr = pd.DataFrame({"k": ["z"], "w": [9]})
    z = hash_join(rd.from_pandas(zl), rd.from_pandas(zr), on="k",
                  num_buckets=4).to_pandas()
    # Ray drops schema for ALL-empty datasets (documented caveat in the
    # hash_join docstring); the contract here is empty, not an error
    assert len(z) == 0


def test_hash_join_composite_key_matches_duckdb(ray_session):
    """Composite on=[k1, k2]: bucket on the joined canonical tuple;
    nulls in ANY key column never match (SQL AND semantics)."""
    import duckdb
    import ray.data as rd
    from fasta_windows_ray.stages.joins import hash_join
    rng = np.random.default_rng(31)
    n = 1500
    left = pd.DataFrame({
        "k1": rng.integers(0, 12, n).astype(np.int64),
        "k2": np.asarray(["g%d" % i for i in rng.integers(0, 5, n)],
                         object),
        "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({
        "k1": rng.integers(0, 14, 400).astype(np.int64),
        "k2": np.asarray(["g%d" % i for i in rng.integers(0, 6, 400)],
                         object),
        "rv": rng.random(400)})
    # plant nulls in both key columns on both sides
    left.loc[left.index % 97 == 0, "k1"] = None
    right.loc[right.index % 53 == 0, "k2"] = None
    for how in ("inner", "left"):
        out = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                         on=["k1", "k2"], how=how, num_buckets=16)
               .to_pandas())
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(f"""
            SELECT l.k1, l.k2, l.lv, r.rv
            FROM l {'LEFT' if how == 'left' else ''} JOIN r
              ON l.k1 = r.k1 AND l.k2 = r.k2
        """).df()
        con.close()
        key = ["lv", "rv"]
        a = (out[["k1", "k2", "lv", "rv"]].sort_values(key)
             .reset_index(drop=True).astype({"rv": "float64",
                                             "k1": "float64"}))
        b = (want.sort_values(key).reset_index(drop=True)
             .astype({"rv": "float64", "k1": "float64"}))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hash_join_right_and_full_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from fasta_windows_ray.stages.joins import hash_join
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 600).astype(np.int64),
        "lv": np.arange(600, dtype=np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(10, 30, 300).astype(np.int64),
        "rv": np.arange(300, dtype=np.int64) * 10})
    left.loc[left.index % 37 == 0, "k"] = None
    right.loc[right.index % 23 == 0, "k"] = None
    for how, sql in (("right", "RIGHT"), ("full", "FULL")):
        out = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                         on="k", how=how, num_buckets=8).to_pandas())
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(f"""
            SELECT coalesce(l.k, r.k) AS k, l.lv, r.rv
            FROM l {sql} JOIN r ON l.k = r.k
        """).df()
        con.close()
        key = ["lv", "rv", "k"]
        a = (out[["k", "lv", "rv"]].astype("float64")
             .sort_values(key).reset_index(drop=True))
        b = (want.astype("float64").sort_values(key)
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # unmatched counts: null-key rows must survive outer sides
        if how == "full":
            assert out["lv"].isna().sum() >= right["k"].isna().sum()
            assert out["rv"].isna().sum() >= left["k"].isna().sum()
