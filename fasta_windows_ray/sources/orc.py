"""ORC source/sink — the fourth interchange format (after Parquet,
JSONL and CSV/TSV), for corpora that arrive from Hive/Spark lakes as
ORC. Ray Data 2.49 ships no ``read_orc``, so this wraps ``pyarrow.orc``
in a ``FileBasedDatasource``:

- one read task per file (Ray parallelizes across files, the standard
  file-source sharding), each file streamed STRIPE by stripe — a stripe
  is ORC's row-group analogue (~64 MB), so a huge file never
  materializes in one task heap and the streaming executor backpressures
  on stripe-sized blocks;
- ``columns=`` prunes at the reader (ORC is columnar: non-selected
  column streams are never decoded or read);
- ``write_orc`` mirrors the engine's sink convention: one file per
  block written inside the map_batches task via tmp + atomic rename,
  only file names travel to the driver.

Schema-normalizing twins (``read_transcripts_orc``/``read_documents_orc``)
reuse the JSONL path's ``_normalize`` so downstream operators see the
exact parquet-reader schema regardless of interchange format.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pyarrow as pa


def read_orc(paths, columns: list[str] | None = None, **kwargs):
    """ORC file(s)/dir as a Ray Dataset, stripe-streamed per file with
    reader-level column pruning. ``kwargs`` pass through to
    ``FileBasedDatasource`` (filesystem, partition_filter, ...)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class _OrcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def _open_input_source(self, filesystem, path, **open_args):
            # ORC needs random access (footer first, then stripes) —
            # the default open_input_stream is sequential-only
            return filesystem.open_input_file(path)

        def _read_stream(self, f: "pa.NativeFile",
                         path: str) -> Iterator[pa.Table]:
            from pyarrow import orc
            file = orc.ORCFile(f)
            use = columns
            if use is not None:
                # a requested-but-absent column (a defaultable one the
                # writer omitted) must not fail the read; keep at least
                # one real column so row counts survive
                use = [c for c in use if c in file.schema.names] \
                    or file.schema.names[:1]
            for i in range(file.nstripes):
                rb = file.read_stripe(i, columns=use)
                yield pa.Table.from_batches([rb])

    return rd.read_datasource(_OrcDatasource(paths, **kwargs))


def write_orc(ds, out_dir: str) -> list[str]:
    """Write a Dataset as ORC files, one per block, inside the
    distributed tasks (tmp + atomic rename; only names reach the
    driver). Returns the written FULL paths."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        from pyarrow import orc
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string())})
        name = f"part-{uuid.uuid4().hex}.orc"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        orc.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name])})

    paths = ds.map_batches(write_block, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    return sorted(os.path.join(out_dir, p)
                  for p in paths["path"]) if len(paths) else []


def _normalized_pruned(paths, schema, defaults, columns, pre=None):
    """Stripe-read only the columns the caller asked for (plus none of
    the defaultable ones that are absent anyway — ORC tolerates
    selecting a missing column name not at all, so intersect with the
    schema), normalize to the engine schema, then project."""
    sub = None
    out_schema = schema
    if columns is not None:
        unknown = set(columns) - set(schema.names)
        if unknown:
            raise KeyError(f"unknown columns {sorted(unknown)}")
        # "text" is needed only to COMPUTE a requested-but-absent
        # n_chars; decoding the corpus's largest column for a
        # doc_id-only projection would break the pruning contract
        need_text = pre is not None and "n_chars" in columns
        sub = sorted(set(columns) | ({"text"} if need_text else set()))
        out_schema = pa.schema([f for f in schema if f.name in sub])
    from .jsonl import _normalize
    norm = _normalize(out_schema, defaults)
    ds = read_orc(paths, columns=None if sub is None else sub)

    def fix(t: pa.Table) -> pa.Table:
        if pre is not None:
            t = pre(t)
        out = norm(t)
        return out.select(columns) if columns is not None else out

    return ds.map_batches(fix, batch_format="pyarrow",
                          zero_copy_batch=True)


def read_transcripts_orc(paths, columns: list[str] | None = None):
    """Transcript turns from ORC with the parquet reader's schema
    contract (missing optional ``tool`` defaulted, ``ts`` normalized to
    timestamp[us]); ``columns=`` prunes at the ORC reader."""
    from .jsonl import TRANSCRIPT_SCHEMA
    return _normalized_pruned(paths, TRANSCRIPT_SCHEMA, {"tool": ""},
                              columns)


def read_documents_orc(paths, columns: list[str] | None = None):
    """Documents from ORC: doc_id/text required, lang/source defaulted,
    n_chars computed when absent."""
    import pyarrow.compute as pc

    from .jsonl import DOCUMENT_SCHEMA

    def pre(t: pa.Table) -> pa.Table:
        if "n_chars" not in t.column_names and "text" in t.column_names:
            t = t.append_column(
                "n_chars", pc.utf8_length(t["text"]).cast(pa.int64()))
        return t

    return _normalized_pruned(paths, DOCUMENT_SCHEMA,
                              {"lang": "unk", "source": "orc",
                               "n_chars": 0}, columns, pre=pre)
