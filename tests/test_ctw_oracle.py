"""Planted-corpus CTW oracle (queries.SQL_TUMBLING_CTW): the recursive
closed-form KT/CTW tables the DuckDB oracle builds must match the real
sequential kernels exactly — every constant-run length, every
flush (a, 'other', b) pair, KT0 lengths, and the text-class wrapper.

Derivation under gate: the KT probability of a run of n equal symbols
(m=4) is prod_{i<n}(i+1/2)/(i+2) (kmeru8.rs:127-159); the depth-6 CTW
weighted mixture over a constant path telescopes to a 7-level recursion
on that form; a flush ('other' symbol: skipped AND context cleared,
kmeru8.rs:296-299) keeps node counts, so the final tree has counts
n_d = max(a-d,0)+max(b-d,0) with the leaf rule re-applied at depth
min(b-1,6).
"""

import duckdb
import numpy as np
import pytest

from fasta_windows_ray import kernels as K

# no ray needed: pure kernel + DuckDB


def _tables(select: str):
    from fasta_windows_ray.pipelines.queries import SQL_TUMBLING_CTW
    # reuse the oracle's own CTE block: swap the final SELECT
    head = SQL_TUMBLING_CTW[:SQL_TUMBLING_CTW.index(
        "SELECT p.conv_id")]
    # drop the data-dependent CTEs (w/base/plant reference the views)
    head = head.replace(
        head[head.index("w AS ("):head.index("seq AS (")], "")
    return duckdb.sql(head + select).df()


def test_const_closed_form_matches_kernel():
    df = _tables("SELECT * FROM ctwc ORDER BY L")
    assert len(df) == 96
    for L, bpb in zip(df["L"], df["bpb"]):
        assert abs(bpb - K.ctw_roles(["user"] * int(L))) < 1e-12, L


def test_flush_closed_form_matches_kernel():
    df = _tables("SELECT * FROM ctwf ORDER BY a, b")
    assert len(df) == 48 * 48
    for a, b, bpb in zip(df["a"], df["b"], df["bpb"]):
        k = K.ctw_roles(["user"] * int(a) + ["other"] + ["user"] * int(b))
        assert abs(bpb - k) < 1e-12, (a, b)


def test_kt0_closed_form_matches_kernel():
    df = _tables("SELECT * FROM ktb WHERE L <= 96 ORDER BY L")
    for L, bpb in zip(df["L"], df["bpb"]):
        k = K.ctw_roles(["user"] * int(L), max_depth=0)
        assert abs(bpb - k) < 1e-12, L


def test_text_wrapper_constant_class_equals_const_run():
    # 'x'*L is a constant class-0 stream -> same code length as a run
    for L in (1, 2, 6, 7, 13, 80):
        assert abs(K.ctw_text_classes(["x" * L])
                   - K.ctw_roles(["user"] * L)) < 1e-12


def test_flush_final_leaf_overwrites_deeper_mixture():
    # a >> b: run 2's shallow leaf rule must discard the deeper stale
    # mixture — the branch the closed form encodes via dmax=min(b-1,6)
    got = K.ctw_roles(["user"] * 20 + ["other"] + ["user"] * 2)
    import math
    lnp = lambda n: sum(math.log((i + 0.5) / (i + 2.0)) for i in range(n))
    a, b, D = 20, 2, 6
    dmax = min(b - 1, D)
    nd = lambda d: max(a - d, 0) + max(b - d, 0)
    lw = lnp(nd(dmax))
    for d in range(dmax - 1, -1, -1):
        lw = math.log(0.5 * math.exp(lnp(nd(d))) + 0.5 * math.exp(lw))
    assert abs(got - (-lw / math.log(2) / (a + b))) < 1e-12


def test_query_oracle_round_trip_sf0001(ray_session):
    """q_tumbling_ctw vs its SQL on the smallest fixture — full
    rows+schema+values (pre-rounded on both sides)."""
    from fasta_windows_ray.pipelines.queries import (SQL_TUMBLING_CTW,
                                                     q_tumbling_ctw)
    sf = "/root/testdata/sf0.001"
    got = q_tumbling_ctw(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.sql(SQL_TUMBLING_CTW).df()
    key = ["conv_id", "window_start"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want[got.columns].sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in got.columns:
        if got[c].dtype == object:
            assert (got[c] == want[c]).all(), c
        else:
            np.testing.assert_allclose(
                got[c].to_numpy(np.float64),
                want[c].to_numpy(np.float64), rtol=0, atol=0,
                err_msg=c)
