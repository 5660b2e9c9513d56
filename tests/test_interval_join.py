"""Stream-stream interval join (stages/joins.py interval_join):
(key-bucket x time-slab) partitioning, exactly-once pair discovery."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.joins import interval_join

pytestmark = pytest.mark.usefixtures("ray_session")

US = 1_000_000
BASE = pd.Timestamp("2024-01-01").value // 1_000  # us


def _events(n, seed, n_users=20, span_s=50_000):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": pd.to_datetime(
            BASE + rng.integers(0, span_s * US, n), unit="us"),
        "value": rng.random(n)})


def _pandas_interval_join(l, r, lower_us, upper_us):
    m = l.merge(r, on="user_id", suffixes=("", "_r"))
    d = (m["ts_r"].astype("datetime64[us]").astype("int64")
         - m["ts"].astype("datetime64[us]").astype("int64"))
    return m[(d >= lower_us) & (d <= upper_us)]


def _key(df):
    return (df[["event_id", "event_id_r"]]
            .sort_values(["event_id", "event_id_r"])
            .reset_index(drop=True))


@pytest.mark.parametrize("lower_us,upper_us,slab_us", [
    (0, 600 * US, None),                 # forward window
    (-300 * US, 300 * US, None),         # symmetric window
    (0, 600 * US, 200 * US),             # slab narrower than window
    (60 * US, 60 * US, None),            # degenerate point offset
])
def test_matches_pandas(lower_us, upper_us, slab_us):
    l, r = _events(800, 1), _events(700, 2)
    got = interval_join(
        rd.from_pandas(l), rd.from_pandas(r), on="user_id",
        lower_us=lower_us, upper_us=upper_us, num_buckets=8,
        slab_us=slab_us).to_pandas()
    want = _pandas_interval_join(l, r, lower_us, upper_us)
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(_key(got), _key(want))
        assert got["event_id"].dtype == np.int64
        assert got["event_id_r"].dtype == np.int64


def test_hot_key_splits_across_slabs():
    """One key holding ALL rows still partitions by time slab —
    per-task group size is bounded by the slab, not the key."""
    l = _events(3_000, 3, n_users=1, span_s=30_000)
    r = _events(3_000, 4, n_users=1, span_s=30_000)
    W = 1_000 * US
    ds = interval_join(rd.from_pandas(l), rd.from_pandas(r),
                       on="user_id", lower_us=0, upper_us=900 * US,
                       num_buckets=4, slab_us=W)
    got = ds.to_pandas()
    want = _pandas_interval_join(l, r, 0, 900 * US)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_key(got), _key(want))


def test_no_matches_yields_typed_empty():
    l, r = _events(50, 5), _events(50, 6)
    r = r.copy()
    r["ts"] = r["ts"] + pd.Timedelta(days=400)   # disjoint in time
    ds = interval_join(rd.from_pandas(l), rd.from_pandas(r),
                       on="user_id", lower_us=0, upper_us=60 * US)
    out = ds.to_pandas()
    assert len(out) == 0


def test_null_keys_never_match():
    l = pd.DataFrame({"event_id": [0, 1], "user_id": pd.array(
        [None, 7], dtype="Int64"),
        "ts": pd.to_datetime([BASE, BASE], unit="us")})
    r = pd.DataFrame({"event_id": [10, 11], "user_id": pd.array(
        [None, 7], dtype="Int64"),
        "ts": pd.to_datetime([BASE + US, BASE + US], unit="us")})
    out = interval_join(rd.from_pandas(l), rd.from_pandas(r),
                        on="user_id", lower_us=0,
                        upper_us=10 * US).to_pandas()
    assert len(out) == 1
    assert out["event_id"].iloc[0] == 1 and out["event_id_r"].iloc[0] == 11
