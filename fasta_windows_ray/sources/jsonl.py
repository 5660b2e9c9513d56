"""JSONL sources: transcript turns and documents as newline-delimited
JSON — the interchange format most LLM corpora ship in (one JSON object
per line, directories of .jsonl / .jsonl.gz shards).

Built on ``ray.data.read_json`` (arrow JSON reader: parallel per file,
gzip transparently by extension), then a schema-normalizing map_batches:
missing optional columns are defaulted, ``ts`` accepts either epoch
microseconds (int) or ISO-8601 strings, and output column order/types
match the parquet path exactly so every downstream operator works
unchanged (pytest-gated round-trip vs the parquet reader).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

DOCUMENT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def _norm_ts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Epoch-micros ints/floats or ISO-8601 strings → timestamp[us]."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    typ = arr.type
    if pa.types.is_timestamp(typ):
        return arr.cast(pa.timestamp("us"))
    if pa.types.is_integer(typ):
        return arr.cast(pa.int64()).cast(pa.timestamp("us"))
    if pa.types.is_floating(typ):
        # JSON serializers commonly emit epoch micros as doubles
        return pc.round(arr).cast(pa.int64()).cast(pa.timestamp("us"))
    # Arrow's string->timestamp cast parses ISO-8601, but a file mixing
    # naive and zone-suffixed strings fails both the naive and tz-aware
    # casts — pandas to_datetime(utc=True) handles the mix; normalize to
    # the engine's naive-UTC convention either way
    try:
        return arr.cast(pa.timestamp("us"))
    except pa.ArrowInvalid:
        import pandas as pd
        s = pd.to_datetime(arr.to_pandas(), utc=True, format="ISO8601")
        return pa.Array.from_pandas(s.dt.tz_localize(None)) \
            .cast(pa.timestamp("us"))


def _normalize(schema: pa.Schema, defaults: dict):
    def fix(t: pa.Table) -> pa.Table:
        cols = []
        n = len(t)
        for f in schema:
            if f.name in t.column_names:
                c = t[f.name]
                c = _norm_ts(c) if pa.types.is_timestamp(f.type) \
                    else c.combine_chunks().cast(f.type)
            else:
                c = pa.array([defaults[f.name]] * n, f.type)
            cols.append(c)
        return pa.table(dict(zip(schema.names, cols)))
    return fix


def read_transcripts_jsonl(paths):
    """Transcript turns from .jsonl(.gz) file(s)/dir. Required keys:
    conv_id, turn_idx, role, text, ts; optional: tool (default "")."""
    import ray.data as rd
    ds = rd.read_json(paths)
    return ds.map_batches(
        _normalize(TRANSCRIPT_SCHEMA, {"tool": ""}),
        batch_format="pyarrow", zero_copy_batch=True)


def read_documents_jsonl(paths):
    """Documents from .jsonl(.gz): doc_id, text required; lang/source
    default "unk"/"jsonl"; n_chars computed when absent."""
    import ray.data as rd
    ds = rd.read_json(paths)

    def fix(t: pa.Table) -> pa.Table:
        if "n_chars" not in t.column_names:
            t = t.append_column(
                "n_chars", pc.utf8_length(t["text"]).cast(pa.int64()))
        norm = _normalize(DOCUMENT_SCHEMA,
                          {"lang": "unk", "source": "jsonl", "n_chars": 0})
        return norm(t)

    return ds.map_batches(fix, batch_format="pyarrow",
                          zero_copy_batch=True)
