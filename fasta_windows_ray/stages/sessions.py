"""Session windows (gap-based) — north-star extension, no reference
counterpart (SURVEY.md §2.2 W4).

A session groups consecutive turns of one conversation whose inter-turn
gap is <= ``gap_us``; a strictly greater gap starts a new session.
Assignment is state-dependent (needs the key's sorted timestamps), so it
runs per hash bucket inside ``map_groups`` — same single-shuffle layout as
window_stats. The stateful/watermark path computes identical sessions
incrementally (state/engine.py); equality of the two is a pytest gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..windows import session_ids
from .window_stats import add_bucket


def session_stats(ds, gap_us: int, num_buckets: int = 64):
    """Dataset of (conv_id, session_start, session_end, n_turns)."""
    ds = add_bucket(ds, num_buckets)

    def bucket_sessions(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"conv_id": [], "session_start": [],
                                 "session_end": [], "n_turns": []})
        order = ["conv_id", "ts"] + (["turn_uid"] if "turn_uid" in df else [])
        df = df.sort_values(order, kind="stable").reset_index(drop=True)
        out = []
        for cid, g in df.groupby("conv_id", sort=True):
            ts = g["ts"].astype("int64").to_numpy()
            sid = session_ids(ts, gap_us)
            n = sid[-1] + 1
            counts = np.bincount(sid, minlength=n)
            # first/last per session: ts is sorted, sessions contiguous
            first_idx = np.searchsorted(sid, np.arange(n))
            last_idx = np.searchsorted(sid, np.arange(n), side="right") - 1
            starts, ends = ts[first_idx], ts[last_idx]
            out.append(pd.DataFrame({
                "conv_id": cid,
                "session_start": starts.astype("datetime64[us]"),
                "session_end": ends.astype("datetime64[us]"),
                "n_turns": counts.astype(np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    return ds.groupby("bucket").map_groups(bucket_sessions,
                                           batch_format="pandas")
