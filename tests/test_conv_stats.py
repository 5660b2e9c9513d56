"""Conversation-stats gates: rollup equals a pandas ground truth,
partition invariance, starts_with_user argmin merge, filtering semantics
and survivor turn counts."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.conv_stats import (conv_documents,
                                                 conv_stats,
                                                 filter_conversations)
from fasta_windows_ray.synth import make_transcripts

pytestmark = pytest.mark.usefixtures("ray_session")


def ground_truth(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for conv, sub in pdf.groupby("conv_id", sort=True):
        sub = sub.sort_values("turn_idx")
        ts = sub["ts"].astype("datetime64[us]").astype("int64")
        nt = len(sub)
        dur = (ts.max() - ts.min()) / 1e6
        role = sub["role"].fillna("user")
        rows.append({
            "conv_id": conv, "n_turns": nt,
            "n_chars": int(sub["text"].fillna("").str.len().sum()),
            "n_tool_calls": int((sub["tool"].fillna("") != "").sum()),
            "duration_s": dur,
            "turns_per_hour": nt / (dur / 3600) if dur > 0 else np.inf,
            "chars_per_turn":
                sub["text"].fillna("").str.len().sum() / nt,
            "tool_rate": (sub["tool"].fillna("") != "").sum() / nt,
            "role_balance":
                abs((role == "user").sum() - (role == "assistant").sum())
                / nt,
            "starts_with_user": role.iloc[0] == "user",
            "n_user": int((role == "user").sum()),
            "n_assistant": int((role == "assistant").sum()),
            "n_system": int((role == "system").sum()),
            "n_tool": int((role == "tool").sum()),
            "n_other": int((~role.isin(
                ["user", "assistant", "system", "tool"])).sum()),
        })
    return pd.DataFrame(rows)


def test_matches_pandas_ground_truth():
    t = make_transcripts(n_convs=10, mean_turns=15, seed=41)
    pdf = t.to_pandas()
    got = conv_stats(rd.from_arrow(t).repartition(5))
    want = ground_truth(pdf)[got.columns]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict()).reset_index(drop=True))


def test_partition_invariance():
    t = make_transcripts(n_convs=6, mean_turns=12, seed=42)
    a = conv_stats(rd.from_arrow(t).repartition(1))
    b = conv_stats(rd.from_arrow(t).repartition(11))
    pd.testing.assert_frame_equal(a, b)


def test_starts_with_user_cross_batch():
    # first turn (idx 0, assistant) lands in a DIFFERENT block than the
    # rest — the argmin merge must still see it
    pdf = pd.DataFrame({
        "conv_id": ["c"] * 4,
        "turn_idx": np.array([0, 1, 2, 3], dtype=np.int32),
        "role": ["assistant", "user", "user", "user"],
        "text": ["a", "b", "c", "d"], "tool": [""] * 4,
        "ts": pd.to_datetime(np.arange(4), unit="s"),
    })
    ds = rd.from_pandas(pdf).repartition(4)
    st = conv_stats(ds)
    assert not st["starts_with_user"].iloc[0]


def test_filter_conversations():
    pdf = pd.concat([
        pd.DataFrame({"conv_id": ["solo"], "turn_idx": [0],
                      "role": ["user"], "text": ["hi"], "tool": [""],
                      "ts": pd.to_datetime([0], unit="s")}),
        pd.DataFrame({"conv_id": ["good"] * 4,
                      "turn_idx": np.arange(4, dtype=np.int32),
                      "role": ["user", "assistant"] * 2,
                      "text": ["a long enough message"] * 4,
                      "tool": [""] * 4,
                      "ts": pd.to_datetime(np.arange(4), unit="s")}),
        pd.DataFrame({"conv_id": ["tooly"] * 4,
                      "turn_idx": np.arange(4, dtype=np.int32),
                      "role": ["user", "tool", "tool", "tool"],
                      "text": ["x"] * 4, "tool": ["", "t", "t", "t"],
                      "ts": pd.to_datetime(np.arange(4), unit="s")}),
    ], ignore_index=True)
    ds = rd.from_pandas(pdf).repartition(3)
    kept_ds, stats = filter_conversations(
        ds, min_turns=2, max_tool_rate=0.5, require_user_start=True)
    kept = set(stats.loc[stats["kept"], "conv_id"])
    assert kept == {"good"}
    out = kept_ds.to_pandas()
    assert set(out["conv_id"]) == {"good"} and len(out) == 4


def test_conv_documents_order_and_concat():
    pdf = pd.DataFrame({
        "conv_id": ["a", "a", "b", "a"],
        "turn_idx": np.array([2, 0, 0, 1], dtype=np.int32),
        "role": ["user"] * 4,
        "text": ["three", "one", "solo", "two"], "tool": [""] * 4,
        "ts": pd.to_datetime([20, 0, 5, 10], unit="s"),
    })
    out = conv_documents(rd.from_pandas(pdf).repartition(3),
                         num_buckets=4).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    assert list(out["conv_id"]) == ["a", "b"]
    assert out["doc_id"].dtype == np.int64
    assert out["doc_id"].nunique() == 2
    assert out["text"].iloc[0] == "one\ntwo\nthree"
    assert out["text"].iloc[1] == "solo"


def test_conv_near_dups_planted():
    from fasta_windows_ray.stages.conv_stats import conv_near_dups
    base = ["hello there how are you doing today my friend",
            "i am fine thanks for asking about it",
            "let us talk about the weather in the city today"]
    def conv(cid, turns):
        return pd.DataFrame({
            "conv_id": [cid] * len(turns),
            "turn_idx": np.arange(len(turns), dtype=np.int32),
            "role": ["user"] * len(turns),
            "text": turns, "tool": [""] * len(turns),
            "ts": pd.to_datetime(np.arange(len(turns)), unit="s"),
        })
    rng = np.random.default_rng(5)
    uniq = [conv(f"u{i}", ["".join(rng.choice(list("abcdefgh"), 60))
                           for _ in range(3)]) for i in range(6)]
    pdf = pd.concat([conv("dupA", base), conv("dupB", base)] + uniq,
                    ignore_index=True)
    pairs = conv_near_dups(rd.from_pandas(pdf).repartition(4),
                           threshold=0.7)
    got = {tuple(sorted((a, b)))
           for a, b in zip(pairs["conv_a"], pairs["conv_b"])}
    assert ("dupA", "dupB") in got
    assert all({"dupA", "dupB"} == set(p) for p in got)  # no false pairs
