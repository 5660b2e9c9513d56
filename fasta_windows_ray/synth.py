"""Deterministic synthetic transcript tables (input_hint schema).

Used by the pytest fixtures (FIXTURES.md) and by scale/stateful tests.
Everything is seeded; no wall-clock, no randomness outside numpy's seeded
Generator. Scale knobs let the same generator produce the hot-key-skew and
out-of-order corpora (F21-F23).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-us

ROLES = np.array(["user", "assistant", "system", "tool", "other"])
_WORDS = np.array([
    "window", "stream", "state", "batch", "arrow", "shuffle", "actor",
    "join", "entropy", "kgram", "watermark", "ray", "data", "parquet",
    "turn", "conv", "role", "text", "tool", "ts",
])


def make_transcripts(n_convs: int = 20, mean_turns: int = 40, seed: int = 42,
                     turn_gap_us: int = 1_000_000,
                     hot_conv_turns: int = 0,
                     shuffle_within_us: int = 0,
                     dup_fraction: float = 0.0) -> pa.Table:
    """Seeded transcript table.

    - ``hot_conv_turns``: if >0, conversation ``c_hot`` gets that many turns
      (skew corpus, F23).
    - ``shuffle_within_us``: per-row timestamp jitter bound; rows are then
      emitted in jittered order (bounded out-of-orderness, F21).
    - ``dup_fraction``: fraction of rows duplicated verbatim (F22 replays).
    """
    rng = np.random.default_rng(seed)
    conv_ids, turn_idx, roles, texts, tools, ts = [], [], [], [], [], []

    sizes = rng.poisson(mean_turns, n_convs).clip(min=1)
    for ci, size in enumerate(sizes):
        cid = f"c{ci:04d}"
        n = int(size) if not (hot_conv_turns and ci == 0) else hot_conv_turns
        cid = "c_hot" if (hot_conv_turns and ci == 0) else cid
        r = rng.integers(0, len(ROLES), n)
        w = _WORDS[rng.integers(0, len(_WORDS), (n, 4))]
        start = EPOCH_US + int(rng.integers(0, 3600)) * 1_000_000
        for j in range(n):
            conv_ids.append(cid)
            turn_idx.append(j)
            roles.append(ROLES[r[j]])
            texts.append(" ".join(w[j]))
            tools.append("grep" if r[j] == 3 else "")
            ts.append(start + j * turn_gap_us)

    t = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(np.asarray(ts, dtype=np.int64), pa.timestamp("us")),
    })

    if dup_fraction > 0:
        n_dup = int(len(t) * dup_fraction)
        idx = rng.choice(len(t), n_dup, replace=False)
        t = pa.concat_tables([t, t.take(np.sort(idx))])

    if shuffle_within_us > 0:
        jitter = rng.integers(0, shuffle_within_us, len(t))
        order = np.argsort(
            t["ts"].to_numpy(zero_copy_only=False).astype("int64") + jitter,
            kind="stable")
        t = t.take(order)
    return t


def conv_from_string(conv_id: str, s: str, w_roles: bool = True,
                     start_us: int = EPOCH_US,
                     turn_gap_us: int = 1_000_000) -> pa.Table:
    """One conversation from a DNA-like string: char i -> turn i.

    Role alphabet mapping (FIXTURES.md): A→user C→assistant G→system
    T→tool N/other→other; lowercase char -> same role with tool="masked"
    (the masked analogue). ``text`` carries the char verbatim so char-level
    fixtures reuse the same rows.
    """
    m = {"A": "user", "C": "assistant", "G": "system", "T": "tool"}
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for i, ch in enumerate(s):
        up = ch.upper()
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(i)
        rows["role"].append(m.get(up, "other") if w_roles else "user")
        rows["text"].append(ch)
        rows["tool"].append("masked" if ch.islower() else "")
        rows["ts"].append(start_us + i * turn_gap_us)
    return pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": pa.array(rows["role"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "tool": pa.array(rows["tool"], pa.string()),
        "ts": pa.array(np.asarray(rows["ts"], np.int64), pa.timestamp("us")),
    })
