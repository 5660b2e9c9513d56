"""Events → transcript projection: the single source of truth shared by the
Ray pipelines and the DuckDB oracle SQL.

The driver's testdata has no native transcript table; we project the
``events`` stream onto the BASELINE.json input_hint schema
(conv_id, turn_idx?, role, text, tool, ts) with a fixed, documented
mapping. The same mapping is rendered as SQL (``events_as_transcripts_sql``)
so every windowing query has an ANSI-SQL oracle over the same rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Fixed event_type -> role mapping (alphabetical event types -> the role
# alphabet of FIXTURES.md: A→user C→assistant G→system T→tool N→other).
EVENT_ROLE_MAP = {
    "click": "user",
    "error": "assistant",
    "purchase": "system",
    "signup": "tool",
    "view": "other",
}

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_uid", pa.int64()),      # stable per-turn identity (event_id)
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def project_events_batch(t: pa.Table) -> pa.Table:
    """Vectorized Arrow projection of an events batch to transcript rows."""
    role = t["event_type"]
    # chain of if_else against the small fixed mapping (vectorized);
    # unmapped event types default to 'other' explicitly — the SQL CASE
    # carries the same ELSE so both sides agree by construction if the
    # events table ever gains a sixth type (round-1 ADVICE)
    out = pa.array(["other"] * len(t), pa.string())
    for etype, r in EVENT_ROLE_MAP.items():
        out = pc.if_else(pc.equal(role, etype), pa.scalar(r), out)
    return pa.table({
        "conv_id": pc.cast(t["user_id"], pa.string()),
        "turn_uid": pc.cast(t["event_id"], pa.int64()),
        "role": pc.cast(out, pa.string()),
        "text": t["props"],
        "tool": pa.array([""] * len(t), pa.string()),
        "ts": t["ts"],
    })


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    """Ray Dataset of transcript rows projected from ``events.parquet``.

    Column-prunes the parquet read to only the source columns the
    requested transcript columns need.
    """
    import ray.data as rd

    needed_src = {"conv_id": ["user_id"], "turn_uid": ["event_id"],
                  "role": ["event_type"], "text": ["props"],
                  "tool": [], "ts": ["ts"]}
    if columns is None:
        src_cols = ["event_id", "ts", "user_id", "event_type", "props"]
    else:
        src_cols = sorted({c for col in columns for c in needed_src[col]})
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=src_cols)

    def _proj(t: pa.Table) -> pa.Table:
        full = project_events_batch(_with_defaults(t))
        return full.select(columns) if columns else full

    return ds.map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)


def _with_defaults(t: pa.Table) -> pa.Table:
    """Fill source columns that were pruned away with typed nulls so the
    projection stays total."""
    defaults = {"event_id": pa.int64(), "ts": pa.timestamp("us"),
                "user_id": pa.int64(), "event_type": pa.string(),
                "props": pa.string()}
    for name, typ in defaults.items():
        if name not in t.column_names:
            t = t.append_column(name, pa.nulls(len(t), typ))
    return t


def events_as_transcripts_sql() -> str:
    """SQL subquery equivalent of :func:`project_events_batch` over the
    pre-registered ``events`` view (the DuckDB oracle's input)."""
    case = " ".join(
        f"WHEN '{etype}' THEN '{role}'" for etype, role in EVENT_ROLE_MAP.items())
    return (
        "SELECT CAST(user_id AS VARCHAR) AS conv_id, "
        "event_id AS turn_uid, "
        f"CASE event_type {case} ELSE 'other' END AS role, "
        "props AS text, '' AS tool, ts FROM events"
    )
