"""End-to-end flagship pipeline: read → stats → join-back → resumable
partitioned sink; per-turn text equality under stable ordering (the
north rule's per-row invariant)."""

import os

import pandas as pd
import pyarrow.parquet as pq


def test_full_run_end_to_end(ray_session, tmp_path):
    from fasta_windows_ray.pipelines.flagship import full_run
    from fasta_windows_ray.sinks import read_partitioned

    out = str(tmp_path / "sink")
    rep = full_run("/root/testdata/sf0.001", out)
    assert not rep["skipped"].any()
    joined = read_partitioned(out)
    src = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    # every input turn appears exactly once with its window's stats
    assert len(joined) == len(src)
    assert joined["w_n_turns"].notna().all()
    # per-turn text equality under stable (conv_id, turn_uid) ordering
    j = joined.sort_values(["conv_id", "turn_uid"]).reset_index(drop=True)
    src["conv_id"] = src["user_id"].astype(str)
    s = src.sort_values(["conv_id", "event_id"]).reset_index(drop=True)
    assert (j["text"].to_numpy() == s["props"].to_numpy()).all()
    assert (j["turn_uid"].to_numpy() == s["event_id"].to_numpy()).all()

    # resume: drop one partition marker, rerun, identical result
    victims = [d for d in os.listdir(out) if d.startswith("part=")][:1]
    os.remove(os.path.join(out, victims[0], ".done"))
    rep2 = full_run("/root/testdata/sf0.001", out)
    assert rep2["skipped"].sum() == len(rep) - 1
    joined2 = read_partitioned(out)
    a = joined.sort_values(["conv_id", "turn_uid"]).reset_index(drop=True)
    b = joined2.sort_values(["conv_id", "turn_uid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
