"""CSV/TSV sources: the third interchange format (after Parquet and
JSONL) — transcript turns and documents from delimited text, built on
``ray.data.read_csv`` (arrow CSV reader: parallel per file, gzip
transparently by extension) plus the SAME schema-normalizing map as the
JSONL path (``sources/jsonl.py``): missing optional columns defaulted,
``ts`` as epoch-micros ints or ISO-8601 strings, output column order and
types identical to the parquet reader so every downstream operator works
unchanged.

CSV-specific care: the arrow reader may type an all-digit column int64
or a ts column string — normalization handles both; empty strings in
optional columns stay "" (the engine-wide null sentinel).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .jsonl import DOCUMENT_SCHEMA, TRANSCRIPT_SCHEMA, _normalize


def _read(paths, delimiter: str):
    import ray.data as rd
    from pyarrow import csv as pacsv
    return rd.read_csv(
        paths, parse_options=pacsv.ParseOptions(delimiter=delimiter))


def read_transcripts_csv(paths, delimiter: str = ","):
    """Transcript turns from .csv(.gz) file(s)/dir with a header row.
    Required columns: conv_id, turn_idx, role, text, ts; optional:
    tool (default ""). ``delimiter='\\t'`` reads TSV."""
    ds = _read(paths, delimiter)

    def fix(t: pa.Table) -> pa.Table:
        # a fully-empty optional column arrives as null-typed; coerce
        if "tool" in t.column_names and pa.types.is_null(t["tool"].type):
            t = t.drop_columns(["tool"])
        out = _normalize(TRANSCRIPT_SCHEMA, {"tool": ""})(t)
        # CSV has no null-vs-empty distinction for strings; fold nulls
        return out.set_column(
            out.schema.get_field_index("tool"), "tool",
            out["tool"].combine_chunks().fill_null(""))

    return ds.map_batches(fix, batch_format="pyarrow",
                          zero_copy_batch=True)


def read_documents_csv(paths, delimiter: str = ","):
    """Documents from .csv(.gz): doc_id, text required; lang/source
    default "unk"/"csv"; n_chars computed when absent."""
    ds = _read(paths, delimiter)

    def fix(t: pa.Table) -> pa.Table:
        if "n_chars" not in t.column_names:
            t = t.append_column(
                "n_chars", pc.utf8_length(t["text"]).cast(pa.int64()))
        return _normalize(DOCUMENT_SCHEMA,
                          {"lang": "unk", "source": "csv", "n_chars": 0})(t)

    return ds.map_batches(fix, batch_format="pyarrow",
                          zero_copy_batch=True)
