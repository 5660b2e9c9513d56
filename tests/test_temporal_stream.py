"""Streaming temporal join (state/temporal.py): watermark-buffered
probe vs the batch temporal_join / DuckDB oracle; bounded state;
checkpoint/resume."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.state.temporal import (TemporalConfig,
                                              TemporalJoiner,
                                              stateful_temporal_run,
                                              temporal_to_frame)

pytestmark = pytest.mark.usefixtures("ray_session")

US = 1_000_000


def _dim_script(n_keys=6, versions=4, seed=11):
    """Per-key version script -> (scd2 history frame, CDC row frame).
    Keys k0.. get `versions` price versions at staggered times; every
    third key is deleted after its last version."""
    rng = np.random.default_rng(seed)
    hist, cdc = [], []
    for k in range(n_keys):
        key = f"k{k}"
        times = np.sort(rng.choice(
            np.arange(1, 400) * 10 * US, versions, replace=False))
        prices = np.round(rng.random(versions) * 100, 3)
        ends = list(times[1:]) + [None]
        if k % 3 == 0:
            del_at = int(times[-1]) + 50 * US
            ends[-1] = del_at
        for f, t, p in zip(times, ends, prices):
            hist.append((key, float(p), int(f),
                         None if t is None else int(t)))
            cdc.append((key, int(f), "insert", float(p)))
            if t is not None:
                cdc.append((key, int(t), "delete", float(p)))
    h = pd.DataFrame(hist, columns=["item_id", "price",
                                    "valid_from", "valid_to"])
    c = pd.DataFrame(cdc, columns=["item_id", "ts", "_change", "price"])
    # an update's delete+insert share a ts: drop the delete rows that
    # coincide with an insert of the SAME key (the joiner nets them
    # anyway; keeping them also exercises order-independence)
    return h, c.sort_values("ts", kind="stable").reset_index(drop=True)


def _events(n=500, n_keys=8, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "item_id": [f"k{i}" for i in rng.integers(0, n_keys, n)],
        "turn_uid": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 4200 * US, n).astype(np.int64)})


def _oracle(events, hist):
    con = duckdb.connect()
    con.register("e", events)
    con.register("h", hist)
    return con.execute("""
        SELECT e.turn_uid, e.item_id, e.ts, h.price
        FROM e LEFT JOIN h
          ON e.item_id = h.item_id
         AND e.ts >= h.valid_from
         AND (h.valid_to IS NULL OR e.ts < h.valid_to)
        ORDER BY e.turn_uid
    """).df()


CFG = TemporalConfig(value_cols=("price",), key_col="item_id",
                     uid_col="turn_uid")


def _run_joiner(log, cfg=CFG):
    j = TemporalJoiner(cfg)
    rows = j.process_rows(log)
    rows.extend(j.flush())
    return temporal_to_frame(rows, cfg), j


def _merged(events, cdc):
    ev = events.assign(side=0, _change=None, price=np.nan)
    dm = cdc.assign(side=1, turn_uid=-1)
    log = pd.concat([ev, dm], ignore_index=True)
    return (log.sort_values(["ts", "side", "turn_uid"], kind="stable")
               .reset_index(drop=True))


def _norm(df):
    df = df.copy()
    if str(df["ts"].dtype).startswith("datetime"):
        df["ts"] = df["ts"].astype("datetime64[us]").astype("int64")
    df["price"] = df["price"].astype("float64")
    return (df[["turn_uid", "item_id", "ts", "price"]]
            .sort_values("turn_uid").reset_index(drop=True)
            .astype({"turn_uid": "int64"}))


def test_joiner_matches_duckdb():
    hist, cdc = _dim_script()
    ev = _events()
    got, j = _run_joiner(_merged(ev, cdc))
    pd.testing.assert_frame_equal(_norm(got), _norm(_oracle(ev, hist)))
    assert j.metrics.emitted == len(ev)
    assert j.buffered() == 0


def test_out_of_order_within_lateness():
    hist, cdc = _dim_script(seed=2)
    ev = _events(300, seed=9)
    log = _merged(ev, cdc)
    # bounded disorder: shuffle inside 40-row blocks, absorb with lateness
    rng = np.random.default_rng(1)
    idx = np.arange(len(log))
    for lo in range(0, len(log), 40):
        seg = idx[lo:lo + 40]
        rng.shuffle(seg)
    disordered = log.iloc[idx].reset_index(drop=True)
    span = (log["ts"].iloc[-1] - log["ts"].iloc[0])
    cfg = TemporalConfig(value_cols=("price",), key_col="item_id",
                         uid_col="turn_uid", lateness_us=int(span))
    got, _ = _run_joiner(disordered, cfg)
    pd.testing.assert_frame_equal(_norm(got), _norm(_oracle(ev, hist)))


def test_late_and_duplicate_rows_drop():
    # arrival order (NOT ts order): dim@10s, ev1@100s, dup ev1, ev2@5s
    log = pd.DataFrame({
        "item_id": ["a"] * 4,
        "turn_uid": np.array([-1, 1, 1, 2], np.int64),
        "side": np.array([1, 0, 0, 0], np.int8),
        "ts": np.array([10, 100, 100, 5], np.int64) * US,
        "_change": ["insert", None, None, None],
        "price": [5.0, np.nan, np.nan, np.nan]})
    got, j = _run_joiner(log)
    # uid 1 duplicated -> one emit; uid 2 at ts 5s arrives after
    # watermark hit 100s (lateness 0) -> late-dropped
    assert j.metrics.dup_dropped == 1
    assert j.metrics.late_dropped == 1
    assert list(got["turn_uid"]) == [1]
    assert got["price"].iloc[0] == 5.0


def test_pk_double_insert_same_ts_raises():
    j = TemporalJoiner(CFG)
    log = pd.DataFrame({
        "item_id": ["a", "a"], "turn_uid": [-1, -1], "side": [1, 1],
        "ts": [10 * US, 10 * US], "_change": ["insert", "insert"],
        "price": [1.0, 2.0]})
    with pytest.raises(ValueError, match="primary-keyed"):
        j.process_rows(log)


def test_state_bounded_and_pruned():
    """Hot-update key: 10k versions, events trailing — history stays
    bounded by the prune, buffer by the lateness horizon."""
    n = 10_000
    ts = (np.arange(n, dtype=np.int64) + 1) * US
    cdc = pd.DataFrame({"item_id": "hot", "ts": ts,
                        "_change": "insert", "price": np.arange(n) * 1.0})
    dels = pd.DataFrame({"item_id": "hot", "ts": ts[1:],
                         "_change": "delete",
                         "price": np.arange(n - 1) * 1.0})
    ev = pd.DataFrame({"item_id": "hot",
                       "turn_uid": np.arange(0, n, 100, dtype=np.int64),
                       "ts": ts[::100] + 2})
    got, j = _run_joiner(_merged(ev, pd.concat([cdc, dels],
                                               ignore_index=True)))
    assert j.metrics.hist_peak < 300           # not O(n versions)
    assert j.metrics.buf_peak < 16             # drains every watermark step
    assert j.history_size() < 300
    assert j.metrics.boundaries_pruned > 9_000
    # each event sees the version inserted 2µs before it
    want = (ev["turn_uid"].to_numpy() // 1) * 1.0
    gotp = (got.sort_values("turn_uid")["price"]
            .to_numpy(dtype=float))
    assert np.allclose(gotp, want)


def test_snapshot_restore_equals_fresh():
    hist, cdc = _dim_script(seed=4)
    ev = _events(200, seed=8)
    log = _merged(ev, cdc)
    cut = len(log) // 2
    j1 = TemporalJoiner(CFG)
    rows = j1.process_rows(log.iloc[:cut])
    j2 = TemporalJoiner.restore(j1.snapshot())
    rows.extend(j2.process_rows(log.iloc[cut:]))
    rows.extend(j2.flush())
    resumed = temporal_to_frame(rows, CFG)
    fresh, _ = _run_joiner(log)
    pd.testing.assert_frame_equal(_norm(resumed), _norm(fresh))


def test_streaming_job_crash_resume_equals_fresh(tmp_path):
    from fasta_windows_ray.state.temporal import StreamingTemporalJob
    hist, cdc = _dim_script(seed=13)
    ev = _events(250, seed=14)
    log = _merged(ev, cdc)

    fresh_dir = str(tmp_path / "fresh")
    job = StreamingTemporalJob(fresh_dir, CFG, num_partitions=3)
    job.run(log, batch_rows=23, checkpoint_every=2)
    fresh = _norm(job.output())
    pd.testing.assert_frame_equal(fresh, _norm(_oracle(ev, hist)))

    crash_dir = str(tmp_path / "crash")
    job1 = StreamingTemporalJob(crash_dir, CFG, num_partitions=3)
    assert job1.run(log, batch_rows=23, checkpoint_every=2,
                    crash_after_batches=5) is None
    job2 = StreamingTemporalJob(crash_dir, CFG, num_partitions=3,
                                resume=True)
    job2.run(log, batch_rows=23, checkpoint_every=2)
    pd.testing.assert_frame_equal(fresh, _norm(job2.output()))


def test_dataset_replay_matches_batch_twin():
    from fasta_windows_ray.stages.temporal import temporal_join
    hist, cdc = _dim_script(n_keys=10, versions=5, seed=3)
    ev = _events(800, n_keys=12, seed=6)
    got = (stateful_temporal_run(
        rd.from_pandas(ev), rd.from_pandas(cdc), CFG, num_buckets=8)
        .to_pandas())
    want = (temporal_join(rd.from_pandas(ev), rd.from_pandas(hist),
                          key="item_id", value_cols=["price"],
                          num_buckets=8).to_pandas())
    pd.testing.assert_frame_equal(
        _norm(got),
        _norm(want.rename(columns={})))
