"""cogroup (stages/cogroup.py): the general keyed two-table UDF
primitive — gated by expressing known operators through it and
checking against DuckDB / the engine's own join."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.cogroup import cogroup

pytestmark = pytest.mark.usefixtures("ray_session")


def _sides(n=3000, seed=23):
    rng = np.random.default_rng(seed)
    l = pd.DataFrame({"k": rng.choice([f"u{i}" for i in range(60)], n),
                      "v": rng.integers(0, 50, n).astype(np.int64)})
    r = pd.DataFrame({"k": rng.choice([f"u{i}" for i in range(80)], n),
                      "v": rng.integers(0, 50, n).astype(np.int64)})
    return l, r


def test_cogroup_per_key_anti_difference_matches_duckdb():
    l, r = _sides()

    def per_key_except(k, lf, rf):
        keep = lf[~lf["v"].isin(set(rf["v"]))]
        return keep

    got = (cogroup(rd.from_pandas(l).repartition(4),
                   rd.from_pandas(r).repartition(3),
                   on="k", fn=per_key_except)
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    want = duckdb.sql("""
        SELECT k, v FROM l
        WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k AND r.v = l.v)
        ORDER BY k, v""").df()
    pd.testing.assert_frame_equal(got, want)


def test_cogroup_inner_join_equals_engine_hash_join():
    from fasta_windows_ray.stages.joins import hash_join
    l, r = _sides(800, seed=5)
    r = r.rename(columns={"v": "w"}).drop_duplicates("k")

    def join_fn(k, lf, rf):
        if not len(lf) or not len(rf):
            return None
        out = lf.copy()
        out["w"] = rf["w"].iloc[0]
        return out

    got = (cogroup(rd.from_pandas(l).repartition(3),
                   rd.from_pandas(r).repartition(2),
                   on="k", fn=join_fn,
                   left_cols={"k": "s", "v": "i"},
                   right_cols={"k": "s", "w": "i"})
           .to_pandas().sort_values(["k", "v", "w"])
           .reset_index(drop=True))
    want = (hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                      left_schema={"k": "string", "v": "int64"},
                      right_schema={"k": "string", "w": "int64"})
            .to_pandas().sort_values(["k", "v", "w"])
            .reset_index(drop=True))
    # padded int columns surface float64 through either union path —
    # compare values, not the incidental pad dtype
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_cogroup_empty_side_and_null_keys():
    l = pd.DataFrame({"k": ["a", "a", None], "v": [1, 2, 3]})
    r = pd.DataFrame({"k": pd.Series(dtype=object),
                      "v": pd.Series(dtype="int64")})

    def count_fn(k, lf, rf):
        return pd.DataFrame({"k": [k], "n_l": [len(lf)],
                             "n_r": [len(rf)]})

    got = (cogroup(rd.from_pandas(l), rd.from_pandas(r), on="k",
                   fn=count_fn, left_cols={"k": "s", "v": "i"},
                   right_cols={"k": "s", "v": "i"})
           .to_pandas())
    by_k = {k: (nl, nr) for k, nl, nr in
            zip(got["k"], got["n_l"], got["n_r"])}
    assert by_k["a"] == (2, 0)
    assert by_k[None] == (1, 0)        # null keys co-group under None


def test_cogroup_one_sided_hint_rejected():
    l = pd.DataFrame({"k": ["a"], "v": [1]})
    with pytest.raises(ValueError):
        cogroup(rd.from_pandas(l), rd.from_pandas(l), on="k",
                fn=lambda k, a, b: a, right_cols={"k": "s", "v": "i"})
