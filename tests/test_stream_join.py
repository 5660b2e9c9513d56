"""Stateful stream-stream interval join (state/join.py StreamJoiner):
DuckDB band-join oracle, parity with the batch interval_join, left-outer
sentinel semantics, watermark late drops, bounded buffers, snapshot/
restore, and the Dataset bucket-replay path."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.state.join import (JoinConfig, StreamJoiner,
                                          joined_to_frame,
                                          stateful_join_run)
from fasta_windows_ray.synth import EPOCH_US, make_transcripts

pytestmark = pytest.mark.usefixtures("ray_session")

S = 1_000_000


def sides_from_synth(seed=7, n_convs=12, mean_turns=30):
    """user turns -> left, assistant turns -> right, unique uids."""
    t = make_transcripts(n_convs=n_convs, mean_turns=mean_turns,
                         seed=seed).to_pandas()
    t["turn_uid"] = np.arange(len(t), dtype=np.int64)
    left = t[t["role"] == "user"][["conv_id", "turn_uid", "ts", "role"]]
    right = t[t["role"] == "assistant"][["conv_id", "turn_uid", "ts",
                                         "role"]]
    return (left.reset_index(drop=True), right.reset_index(drop=True))


def merged_log(left, right):
    l = left.assign(side=np.int8(0))
    r = right.assign(side=np.int8(1))
    m = pd.concat([l, r], ignore_index=True)
    return m.sort_values(["ts", "side", "turn_uid"],
                         kind="stable").reset_index(drop=True)


def run_joiner(cfg, log):
    j = StreamJoiner(cfg)
    rows = j.process_rows(log)
    rows += j.flush()
    return j, joined_to_frame(rows, cfg.carry)


def duck_inner(left, right, lower_us, upper_us):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql(f"""
        SELECT l.conv_id, l.turn_uid AS left_uid, l.ts AS left_ts,
               r.turn_uid AS right_uid, r.ts AS right_ts,
               epoch_us(r.ts) - epoch_us(l.ts) AS delay_us
        FROM l JOIN r ON l.conv_id = r.conv_id
         AND epoch_us(r.ts) - epoch_us(l.ts) BETWEEN {lower_us} AND {upper_us}
    """).df()


def canon(df):
    df = df.copy()
    for c in ("left_ts", "right_ts"):
        if c in df.columns:
            df[c] = df[c].astype("datetime64[us]")
    for c in ("left_uid", "right_uid", "delay_us"):
        if c in df.columns:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(["conv_id", "left_uid", "right_uid"],
                          kind="stable").reset_index(drop=True)


def test_inner_matches_duckdb_band_join():
    left, right = sides_from_synth()
    cfg = JoinConfig(lower_us=0, upper_us=5 * S)
    _, mine = run_joiner(cfg, merged_log(left, right))
    oracle = duck_inner(left, right, 0, 5 * S)
    pd.testing.assert_frame_equal(
        canon(mine[oracle.columns.tolist()]), canon(oracle))


def test_negative_lower_band_and_carry():
    left, right = sides_from_synth(seed=11)
    cfg = JoinConfig(lower_us=-2 * S, upper_us=3 * S, carry=("role",))
    _, mine = run_joiner(cfg, merged_log(left, right))
    oracle = duck_inner(left, right, -2 * S, 3 * S)
    pd.testing.assert_frame_equal(
        canon(mine[oracle.columns.tolist()]), canon(oracle))
    if len(mine):
        assert set(mine["left_role"]) == {"user"}
        assert set(mine["right_role"]) == {"assistant"}


def test_left_outer_sentinel_matches_sql_coalesce():
    left, right = sides_from_synth(seed=3)
    cfg = JoinConfig(lower_us=0, upper_us=2 * S, how="left")
    j, mine = run_joiner(cfg, merged_log(left, right))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    oracle = con.sql(f"""
        SELECT l.conv_id, l.turn_uid AS left_uid, l.ts AS left_ts,
               COALESCE(r.turn_uid, -1) AS right_uid,
               COALESCE(r.ts, l.ts) AS right_ts,
               COALESCE(epoch_us(r.ts) - epoch_us(l.ts), -1) AS delay_us
        FROM l LEFT JOIN r ON l.conv_id = r.conv_id
         AND epoch_us(r.ts) - epoch_us(l.ts) BETWEEN 0 AND {2 * S}
    """).df()
    pd.testing.assert_frame_equal(
        canon(mine[oracle.columns.tolist()]), canon(oracle))
    assert j.metrics.unmatched_left == int((mine["right_uid"] == -1).sum())


def test_out_of_order_within_lateness_equals_sorted_replay():
    left, right = sides_from_synth(seed=5)
    log = merged_log(left, right)
    rng = np.random.default_rng(0)
    # bounded disorder: shuffle inside 4-second blocks
    jit = log["ts"].astype("datetime64[us]").astype("int64") \
        + rng.integers(0, 4 * S, len(log))
    disordered = log.iloc[np.argsort(jit, kind="stable")] \
        .reset_index(drop=True)
    cfg_sorted = JoinConfig(lower_us=0, upper_us=5 * S)
    cfg_late = JoinConfig(lower_us=0, upper_us=5 * S, lateness_us=8 * S)
    _, a = run_joiner(cfg_sorted, log)
    jb, b = run_joiner(cfg_late, disordered)
    assert jb.metrics.late_dropped == 0
    pd.testing.assert_frame_equal(canon(a), canon(b))


def test_late_rows_drop_and_dups_drop():
    base = EPOCH_US
    log = pd.DataFrame({
        "conv_id": ["c"] * 5,
        "turn_uid": np.asarray([0, 1, 1, 2, 3], np.int64),
        "ts": pd.to_datetime(
            [base, base + 10 * S,
             base + 10 * S,          # duplicate of uid 1 (pre-watermark)
             base + 100 * S,         # advances watermark to 100s
             base + 20 * S],         # late: below the watermark
            unit="us"),
        "side": np.asarray([0, 1, 1, 0, 1], np.int8),
    })
    j = StreamJoiner(JoinConfig(lower_us=0, upper_us=30 * S))
    j.process_rows(log)
    j.flush()
    assert j.metrics.dup_dropped == 1
    assert j.metrics.late_dropped == 1
    assert j.metrics.matches == 1       # (0 -> 10s) only


def test_buffers_bounded_by_horizon_not_stream_length():
    n = 20_000
    log = pd.DataFrame({
        "conv_id": ["c"] * n,
        "turn_uid": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(EPOCH_US + np.arange(n, dtype=np.int64) * S,
                             unit="us"),
        "side": np.asarray([0, 1] * (n // 2), np.int8),
    })
    cfg = JoinConfig(lower_us=0, upper_us=10 * S, lateness_us=5 * S)
    j = StreamJoiner(cfg)
    j.process_rows(log)
    # rows survive while ts + upper >= watermark = max_ts - lateness:
    # horizon = upper + lateness + 1 tick per side
    horizon_rows = 2 * (10 + 5 + 1)
    assert j.buffered() <= horizon_rows
    assert j.metrics.buf_peak <= n      # heap may lag, but state is purged
    assert j.metrics.matches > 0


def test_snapshot_restore_mid_log_equals_fresh():
    left, right = sides_from_synth(seed=9)
    log = merged_log(left, right)
    cfg = JoinConfig(lower_us=0, upper_us=4 * S, how="left",
                     carry=("role",))
    cut = len(log) // 2
    j1 = StreamJoiner(cfg)
    rows = j1.process_rows(log.iloc[:cut])
    j2 = StreamJoiner.restore(j1.snapshot())
    rows += j2.process_rows(log.iloc[cut:].reset_index(drop=True))
    rows += j2.flush()
    resumed = joined_to_frame(rows, cfg.carry)
    _, fresh = run_joiner(cfg, log)
    pd.testing.assert_frame_equal(canon(resumed), canon(fresh))


def test_dataset_path_matches_local_replay():
    left, right = sides_from_synth(seed=13, n_convs=25)
    cfg = JoinConfig(lower_us=0, upper_us=5 * S, carry=("role",))
    out = stateful_join_run(rd.from_pandas(left), rd.from_pandas(right),
                            cfg, num_buckets=8).to_pandas()
    if out.empty:
        out = joined_to_frame([], cfg.carry)
    _, local = run_joiner(cfg, merged_log(left, right))
    pd.testing.assert_frame_equal(canon(out), canon(local))


def test_empty_and_validation():
    cfg = JoinConfig(lower_us=0, upper_us=S)
    _, out = run_joiner(cfg, merged_log(
        pd.DataFrame(columns=["conv_id", "turn_uid", "ts", "role"]),
        pd.DataFrame(columns=["conv_id", "turn_uid", "ts", "role"])))
    assert out.empty and list(out.columns)[0] == "conv_id"
    with pytest.raises(ValueError):
        JoinConfig(lower_us=5, upper_us=1)
    with pytest.raises(ValueError):
        JoinConfig(lower_us=0, upper_us=1, how="full")


def test_streaming_join_job_crash_resume_equals_fresh(tmp_path):
    left, right = sides_from_synth(seed=21, n_convs=15)
    log = merged_log(left, right)
    cfg = JoinConfig(lower_us=0, upper_us=4 * S, how="left")

    from fasta_windows_ray.state.join import StreamingJoinJob
    fresh_dir = str(tmp_path / "fresh")
    job = StreamingJoinJob(fresh_dir, cfg, num_partitions=3)
    job.run(log, batch_rows=29, checkpoint_every=2)
    fresh = canon(job.output())

    crash_dir = str(tmp_path / "crash")
    job1 = StreamingJoinJob(crash_dir, cfg, num_partitions=3)
    r = job1.run(log, batch_rows=29, checkpoint_every=2,
                 crash_after_batches=5)
    assert r is None
    job2 = StreamingJoinJob(crash_dir, cfg, num_partitions=3, resume=True)
    job2.run(log, batch_rows=29, checkpoint_every=2)
    pd.testing.assert_frame_equal(fresh, canon(job2.output()))

    # both executions agree with the local single-machine replay
    _, local = run_joiner(cfg, log)
    pd.testing.assert_frame_equal(fresh[local.columns.tolist()],
                                  canon(local))
