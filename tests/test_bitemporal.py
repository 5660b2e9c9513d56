"""Bitemporal (business-time) history + retroactive repair
(stages/temporal.py effective_history / effective_repair)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import catalog_write
from fasta_windows_ray.stages.temporal import (effective_history,
                                               effective_repair,
                                               temporal_join)

pytestmark = pytest.mark.usefixtures("ray_session")

US = 1_000_000
D = 86_400 * US


def _dim_v1():
    """Per-key rate schedule: key k has rates effective at day k, k+10."""
    rows = []
    for k in range(6):
        rows.append((f"k{k}", k * D, 10.0 + k))
        rows.append((f"k{k}", (k + 10) * D, 20.0 + k))
    return pd.DataFrame(rows, columns=["acct", "effective_from", "rate"])


def _events(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "acct": [f"k{i}" for i in rng.integers(0, 7, n)],
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 30 * D, n).astype(np.int64)})


def _oracle(ev, hist):
    con = duckdb.connect()
    con.register("e", ev)
    con.register("h", hist)
    out = con.execute("""
        SELECT e.event_id, e.acct, e.ts, h.rate
        FROM e LEFT JOIN h
          ON e.acct = h.acct AND e.ts >= h.valid_from
         AND (h.valid_to IS NULL OR e.ts < h.valid_to)
        ORDER BY e.event_id
    """).df()
    con.close()
    return out


def _norm(df):
    return (df[["event_id", "acct", "ts", "rate"]]
            .sort_values("event_id").reset_index(drop=True)
            .astype({"rate": "float64", "event_id": "int64",
                     "ts": "int64"}))


def test_effective_history_intervals():
    dim = _dim_v1()
    hist = (effective_history(rd.from_pandas(dim), "acct",
                              num_buckets=4)
            .to_pandas().sort_values(["acct", "valid_from"])
            .reset_index(drop=True))
    for k in range(6):
        sub = hist[hist["acct"] == f"k{k}"]
        assert list(sub["valid_from"]) == [k * D, (k + 10) * D]
        assert sub["valid_to"].iloc[0] == (k + 10) * D
        assert pd.isna(sub["valid_to"].iloc[1])


def test_join_on_effective_history_matches_duckdb():
    dim, ev = _dim_v1(), _events()
    hist = effective_history(rd.from_pandas(dim), "acct", num_buckets=4)
    got = (temporal_join(rd.from_pandas(ev), hist, key="acct",
                         value_cols=["rate"], num_buckets=4)
           .to_pandas())
    pd.testing.assert_frame_equal(_norm(got),
                                  _norm(_oracle(ev, hist.to_pandas())))


def test_duplicate_effective_date_raises():
    dim = pd.DataFrame({"acct": ["a", "a"],
                        "effective_from": [5 * D, 5 * D],
                        "rate": [1.0, 2.0]})
    with pytest.raises(Exception, match="effective date"):
        effective_history(rd.from_pandas(dim), "acct",
                          num_buckets=2).to_pandas()


def test_retroactive_correction_repair(tmp_path):
    """A correction committed LATER with an OLD effective date rewrites
    past intervals; repair over CDC-delta keys == full recompute."""
    d = str(tmp_path / "rates")
    dim1 = _dim_v1()
    catalog_write(rd.from_pandas(dim1), d, mode="overwrite")
    ev = _events()
    h1 = effective_history(rd.from_pandas(dim1), "acct", num_buckets=4)
    old = temporal_join(rd.from_pandas(ev), h1, key="acct",
                        value_cols=["rate"], num_buckets=4).to_pandas()

    # v2: retroactive fix — k2's day-2 rate was wrong from day 5 on
    fix = pd.DataFrame({"acct": ["k2"], "effective_from": [5 * D],
                        "rate": [99.0]})
    catalog_write(rd.from_pandas(fix), d, mode="append")

    repaired, report = effective_repair(
        rd.from_pandas(ev), d, key="acct", value_cols=["rate"],
        from_version=1)
    rep = repaired.to_pandas()
    assert report["affected_keys"] == 1
    assert set(rep["acct"]) <= {"k2"}
    # a PAST event (ts in [5d, 12d)) changed — no ts cutoff applies
    changed = rep.merge(old, on="event_id", suffixes=("", "_old"))
    changed = changed[changed["rate"].fillna(-1)
                      != changed["rate_old"].fillna(-1)]
    assert (changed["ts"] < 12 * D).any()

    merged = pd.concat(
        [old[~old["event_id"].isin(rep["event_id"])], rep],
        ignore_index=True)
    dim2 = pd.concat([dim1, fix], ignore_index=True)
    h2 = effective_history(rd.from_pandas(dim2), "acct", num_buckets=4)
    full = temporal_join(rd.from_pandas(ev), h2, key="acct",
                         value_cols=["rate"], num_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(_norm(merged), _norm(full))
