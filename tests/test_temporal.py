"""Event-time temporal join (stages/temporal.py): SCD-2 history derived
from catalog CDC, asof probe; DuckDB LEFT-JOIN oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_delete,
                                               catalog_merge,
                                               catalog_write)
from fasta_windows_ray.stages.temporal import scd2_history, temporal_join

pytestmark = pytest.mark.usefixtures("ray_session")

US = 1_000_000
T1, T2, T3 = 1_000 * US, 2_000 * US, 3_000 * US


def _mk_dim_table(tmp_path):
    """v1 (commit_ts in manifest): items 0..7; v2 (merge): reprice 0..3,
    insert 8; v3 (delete): drop items 6,7."""
    d = str(tmp_path / "dims")
    base = pd.DataFrame({"item_id": np.arange(8, dtype=np.int64),
                         "price": np.arange(8, dtype=np.float64) * 10.0})
    catalog_write(rd.from_pandas(base), d, mode="overwrite", commit_ts=T1)
    upd = pd.DataFrame({"item_id": np.array([0, 1, 2, 3, 8], np.int64),
                        "price": np.array([100., 101., 102., 103., 88.])})
    catalog_merge(rd.from_pandas(upd), d, on="item_id")
    catalog_delete(d, [("item_id", ">=", 6), ("item_id", "<=", 7)])
    return d


def _expected_history():
    rows = []
    for i in range(8):
        vt = T2 if i <= 3 else (T3 if i >= 6 else None)
        rows.append((i, i * 10.0, T1, vt))
    for i, p in [(0, 100.), (1, 101.), (2, 102.), (3, 103.), (8, 88.)]:
        rows.append((i, p, T2, None))
    return pd.DataFrame(rows, columns=["item_id", "price",
                                       "valid_from", "valid_to"])


def _norm(df):
    return (df.sort_values(list(df.columns))
              .reset_index(drop=True).astype("float64"))


def test_scd2_history_matches_construction(tmp_path):
    d = _mk_dim_table(tmp_path)
    got = scd2_history(d, "item_id",
                       version_ts={2: T2, 3: T3}).to_pandas()
    # v1's ts must come from the manifest commit_ts (not version_ts)
    assert set(got.columns) == {"item_id", "price", "valid_from",
                                "valid_to"}
    pd.testing.assert_frame_equal(_norm(got), _norm(_expected_history()))


def test_scd2_requires_a_version_ts(tmp_path):
    d = _mk_dim_table(tmp_path)
    with pytest.raises(ValueError, match="no commit_ts"):
        scd2_history(d, "item_id").to_pandas()  # v2/v3 unstamped


def test_commit_ts_must_be_monotonic(tmp_path):
    d = str(tmp_path / "t")
    one = rd.from_pandas(pd.DataFrame({"x": [1]}))
    catalog_write(one, d, mode="overwrite", commit_ts=T2)
    with pytest.raises(ValueError, match="non-decreasing"):
        catalog_write(one, d, mode="append", commit_ts=T1)


def _events(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "item_id": rng.integers(0, 10, n).astype(np.int64),  # 9 never dims
        "ts": rng.integers(0, 4_000 * US, n).astype(np.int64)})


def _oracle(events, hist):
    con = duckdb.connect()
    con.register("e", events)
    con.register("h", hist)
    return con.execute("""
        SELECT e.event_id, e.item_id, e.ts, h.price
        FROM e LEFT JOIN h
          ON e.item_id = h.item_id
         AND e.ts >= h.valid_from
         AND (h.valid_to IS NULL OR e.ts < h.valid_to)
        ORDER BY e.event_id
    """).df()


def test_temporal_join_matches_duckdb(tmp_path):
    d = _mk_dim_table(tmp_path)
    hist = scd2_history(d, "item_id", version_ts={2: T2, 3: T3})
    ev = _events()
    got = (temporal_join(rd.from_pandas(ev), hist, key="item_id",
                         value_cols=["price"], num_buckets=8)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = _oracle(ev, hist.to_pandas())
    pd.testing.assert_frame_equal(
        got[["event_id", "item_id", "ts", "price"]].astype(
            {"price": "float64"}),
        want.astype({"price": "float64"}))
    # spot semantics: before T1 no dim; 6/7 null after T3; 0 repriced at T2
    g = got.set_index("event_id")
    pre = ev[ev["ts"] < T1]
    assert g.loc[pre["event_id"], "price"].isna().all()
    del67 = ev[(ev["item_id"].isin([6, 7])) & (ev["ts"] >= T3)]
    assert g.loc[del67["event_id"], "price"].isna().all()
    re0 = ev[(ev["item_id"] == 0) & (ev["ts"] >= T2)]
    assert (g.loc[re0["event_id"], "price"] == 100.0).all()


def test_temporal_join_timestamp_events(tmp_path):
    d = _mk_dim_table(tmp_path)
    hist = scd2_history(d, "item_id", version_ts={2: T2, 3: T3})
    ev = _events(n=120, seed=3)
    ev_dt = ev.assign(ts=pd.to_datetime(ev["ts"], unit="us"))
    got = (temporal_join(rd.from_pandas(ev_dt), hist, key="item_id",
                         value_cols=["price"], num_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = _oracle(ev, hist.to_pandas())
    assert np.allclose(got["price"].to_numpy(dtype=float),
                       want["price"].to_numpy(dtype=float),
                       equal_nan=True)


def test_temporal_join_keeps_null_key_events(tmp_path):
    """SQL LEFT JOIN: null-key events never match but are kept,
    null-padded — and the DuckDB oracle agrees."""
    d = _mk_dim_table(tmp_path)
    hist = scd2_history(d, "item_id", version_ts={2: T2, 3: T3})
    ev = _events(n=90, seed=21).astype({"item_id": "float64"})
    ev.loc[ev.index % 9 == 0, "item_id"] = None
    got = (temporal_join(rd.from_pandas(ev), hist, key="item_id",
                         value_cols=["price"], num_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(got) == len(ev)
    nul = got[got["item_id"].isna()]
    assert len(nul) == (ev["item_id"].isna()).sum()
    assert nul["price"].isna().all()
    want = _oracle(ev, hist.to_pandas())
    assert np.allclose(got["price"].to_numpy(dtype=float),
                       want["price"].to_numpy(dtype=float),
                       equal_nan=True)


def test_temporal_join_rejects_overlap():
    hist = pd.DataFrame({"item_id": [1, 1],
                         "price": [1.0, 2.0],
                         "valid_from": [0, 5 * US],
                         "valid_to": [10 * US, None]})
    ev = pd.DataFrame({"event_id": [0], "item_id": [1],
                       "ts": [6 * US]})
    with pytest.raises(Exception, match="overlapping"):
        (temporal_join(rd.from_pandas(ev), rd.from_pandas(hist),
                       key="item_id", value_cols=["price"],
                       num_buckets=2).to_pandas())


def test_commit_ts_via_dml(tmp_path):
    """merge/delete stamp their own commit_ts — no version_ts needed."""
    d = str(tmp_path / "dml")
    base = pd.DataFrame({"item_id": np.arange(8, dtype=np.int64),
                         "price": np.arange(8, dtype=np.float64) * 10.0})
    catalog_write(rd.from_pandas(base), d, mode="overwrite", commit_ts=T1)
    upd = pd.DataFrame({"item_id": np.array([0, 1, 2, 3, 8], np.int64),
                        "price": np.array([100., 101., 102., 103., 88.])})
    catalog_merge(rd.from_pandas(upd), d, on="item_id", commit_ts=T2)
    catalog_delete(d, [("item_id", ">=", 6), ("item_id", "<=", 7)],
                   commit_ts=T3)
    got = scd2_history(d, "item_id").to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(_expected_history()))


def test_scd2_reconstruction_equals_time_travel(tmp_path):
    """Rows valid at version v's commit_ts (from the history) == the
    committed snapshot at v — the SCD-2/time-travel coherence law."""
    from fasta_windows_ray.sources.catalog import catalog_read
    d = _mk_dim_table(tmp_path)
    hist = scd2_history(d, "item_id",
                        version_ts={2: T2, 3: T3}).to_pandas()
    for v, ts in [(1, T1), (2, T2), (3, T3)]:
        live = hist[(hist["valid_from"] <= ts)
                    & (hist["valid_to"].isna() | (hist["valid_to"] > ts))]
        snap = catalog_read(d, version=v).to_pandas()
        a = (live[["item_id", "price"]].sort_values("item_id")
             .reset_index(drop=True).astype("float64"))
        b = (snap[["item_id", "price"]].sort_values("item_id")
             .reset_index(drop=True).astype("float64"))
        pd.testing.assert_frame_equal(a, b)


def test_temporal_repair_equals_full_reenrich(tmp_path):
    """Untouched slice of the v1 enrichment + the repair slice == the
    full v3 enrichment; the repair only touches changed keys past the
    delta's event-time cutoff."""
    from fasta_windows_ray.stages.temporal import temporal_repair
    d = _mk_dim_table(tmp_path)           # v1 @T1, merge @v2, delete @v3
    ev = _events(n=600, seed=17)
    ev_ds = rd.from_pandas(ev)

    hist_v1 = scd2_history(d, "item_id", version_ts={2: T2, 3: T3},
                           to_version=1)
    old = (temporal_join(ev_ds, hist_v1, key="item_id",
                         value_cols=["price"], num_buckets=8)
           .to_pandas())

    repaired, report = temporal_repair(
        ev_ds, d, key="item_id", value_cols=["price"], from_version=1,
        version_ts={2: T2, 3: T3})
    rep = repaired.to_pandas()
    # only changed keys (0-3 repriced, 6/7 deleted, 8 inserted) past T2
    assert report["ts_cutoff_us"] == T2
    assert set(rep["item_id"]) <= {0, 1, 2, 3, 6, 7, 8}
    assert (rep["ts"] >= T2).all()
    assert report["affected_keys"] == 7

    merged = pd.concat(
        [old[~old["event_id"].isin(rep["event_id"])], rep],
        ignore_index=True).sort_values("event_id").reset_index(drop=True)
    hist_v3 = scd2_history(d, "item_id", version_ts={2: T2, 3: T3})
    full = (temporal_join(ev_ds, hist_v3, key="item_id",
                          value_cols=["price"], num_buckets=8)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        merged[["event_id", "item_id", "ts", "price"]]
        .astype({"price": "float64"}),
        full[["event_id", "item_id", "ts", "price"]]
        .astype({"price": "float64"}))


def test_reinserted_key_gets_disjoint_intervals(tmp_path):
    d = str(tmp_path / "re")
    row = pd.DataFrame({"k": np.array([1], np.int64), "v": [7.0]})
    catalog_write(rd.from_pandas(row), d, mode="overwrite", commit_ts=T1)
    catalog_delete(d, [("k", "==", 1)])
    catalog_write(rd.from_pandas(row), d, mode="append", commit_ts=T3)
    hist = scd2_history(d, "k", version_ts={2: T2}).to_pandas()
    want = pd.DataFrame({"k": [1, 1], "v": [7.0, 7.0],
                         "valid_from": [T1, T3],
                         "valid_to": [float(T2), np.nan]})
    pd.testing.assert_frame_equal(_norm(hist), _norm(want))


def test_catalog_read_as_of_event_time(tmp_path):
    """Event-time time travel: as_of_us pins the latest version with
    commit_ts <= the instant."""
    from fasta_windows_ray.sources.catalog import (catalog_read,
                                                   version_as_of)
    d = str(tmp_path / "t")
    for i, ts in enumerate([T1, T2, T3]):
        catalog_write(rd.from_pandas(pd.DataFrame({"v": [i]})), d,
                      mode="overwrite", commit_ts=ts)
    assert version_as_of(d, T2) == 2
    assert version_as_of(d, T2 + 1) == 2
    assert version_as_of(d, T3 + 99) == 3
    assert catalog_read(d, as_of_us=T1).to_pandas()["v"].iloc[0] == 0
    assert catalog_read(d, as_of_us=T3).to_pandas()["v"].iloc[0] == 2
    with pytest.raises(ValueError, match="commit_ts"):
        version_as_of(d, T1 - 1)
    with pytest.raises(ValueError, match="not both"):
        catalog_read(d, version=1, as_of_us=T1)


def test_refresh_scd2_view_equals_from_scratch(tmp_path):
    """Incremental SCD-2 view == scd2_history recomputed from scratch
    after every refresh; no-op refresh applies nothing; spec pinned."""
    from fasta_windows_ray.stages.temporal import (read_scd2_view,
                                                   refresh_scd2_view)
    d = str(tmp_path / "dims")
    v = str(tmp_path / "hist_view")
    base = pd.DataFrame({"item_id": np.arange(8, dtype=np.int64),
                         "price": np.arange(8, dtype=np.float64) * 10.0})
    catalog_write(rd.from_pandas(base), d, mode="overwrite", commit_ts=T1)
    rep1 = refresh_scd2_view(d, v, "item_id")
    assert rep1 == {"versions_applied": 1, "opened": 8, "closed": 0}

    upd = pd.DataFrame({"item_id": np.array([0, 1, 2, 3, 8], np.int64),
                        "price": np.array([100., 101., 102., 103., 88.])})
    catalog_merge(rd.from_pandas(upd), d, on="item_id", commit_ts=T2)
    catalog_delete(d, [("item_id", ">=", 6), ("item_id", "<=", 7)],
                   commit_ts=T3)
    rep2 = refresh_scd2_view(d, v, "item_id")
    assert rep2["versions_applied"] == 2
    assert rep2["opened"] == 5 and rep2["closed"] == 6  # 4 upd + 2 del

    got = read_scd2_view(v).to_pandas()
    want = scd2_history(d, "item_id").to_pandas()
    pd.testing.assert_frame_equal(
        _norm(got[["item_id", "price", "valid_from", "valid_to"]]),
        _norm(want))
    # matches the planted construction too
    pd.testing.assert_frame_equal(_norm(got[want.columns.tolist()]),
                                  _norm(_expected_history()))

    # no-op refresh
    assert refresh_scd2_view(d, v, "item_id")["versions_applied"] == 0
    # spec pin
    with pytest.raises(ValueError, match="refusing"):
        refresh_scd2_view(d, v, "price")


def test_temporal_join_rejects_value_col_collision(ray_session):
    """An event column sharing a name with a value_col would be kept
    unsuffixed by merge_asof and clobbered by the interval nulling —
    refuse loudly (regression for silent enrichment corruption)."""
    import pyarrow as pa
    import ray.data as rd

    from fasta_windows_ray.stages.temporal import temporal_join
    ev = pd.DataFrame({"user_id": [1], "price": [9.0],
                       "ts": pd.to_datetime([1_000_000], unit="us")})
    hist = pd.DataFrame({"user_id": [1], "valid_from": [0],
                         "valid_to": [np.nan], "price": [5.0]})
    with pytest.raises(ValueError, match="collide"):
        temporal_join(
            rd.from_pandas(ev), rd.from_pandas(hist),
            key="user_id", value_cols=["price"],
            schemas=({"user_id": pa.int64(), "price": pa.float64(),
                      "ts": pa.timestamp("us")},
                     {"user_id": pa.int64(), "valid_from": pa.int64(),
                      "valid_to": pa.float64(),
                      "price": pa.float64()}))
