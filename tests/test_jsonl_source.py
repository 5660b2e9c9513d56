"""JSONL sources: schema parity with the parquet path, gzip shards,
ISO/epoch ts forms, and downstream-operator round trip."""

import gzip
import json
import os

import pandas as pd
import pyarrow as pa


def _write_jsonl(path, rows, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_transcripts_jsonl_matches_parquet_path(ray_session, tmp_path):
    from fasta_windows_ray.sources.jsonl import (TRANSCRIPT_SCHEMA,
                                                 read_transcripts_jsonl)

    import ray

    # epoch-microsecond ts in one shard, ISO strings in another —
    # each file type-consistent (arrow JSON inference is per file)
    p_epoch = os.path.join(tmp_path, "epoch.jsonl")
    p_iso = os.path.join(tmp_path, "iso.jsonl")
    _write_jsonl(p_epoch, [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hi", "tool": "", "ts": 1_700_000_000_000_000}])
    _write_jsonl(p_iso, [
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "hello", "ts": "2024-01-01T00:00:05"}])   # no tool key

    frames = []
    for p in (p_epoch, p_iso):
        blocks = [ray.get(r)
                  for r in read_transcripts_jsonl(p).to_arrow_refs()]
        t = pa.concat_tables([b for b in blocks if len(b)])
        assert t.schema.equals(TRANSCRIPT_SCHEMA)
        frames.append(t.to_pandas())
    df = pd.concat(frames).sort_values("turn_idx").reset_index(drop=True)
    assert df["tool"].tolist() == ["", ""]
    assert str(df["ts"].iloc[1]) == "2024-01-01 00:00:05"

    # downstream operator runs unchanged on the JSONL-sourced dataset
    from fasta_windows_ray.stages.window_stats import window_stats
    out = window_stats(read_transcripts_jsonl(p_iso), 60_000_000,
                       profile="counts", num_buckets=2).to_pandas()
    assert out["n_turns"].sum() == 1


def test_documents_jsonl_gzip_shards(ray_session, tmp_path):
    from fasta_windows_ray.sources.jsonl import (DOCUMENT_SCHEMA,
                                                 read_documents_jsonl)

    a = os.path.join(tmp_path, "a.jsonl.gz")
    b = os.path.join(tmp_path, "b.jsonl.gz")
    _write_jsonl(a, [{"doc_id": 1, "text": "one two", "lang": "en",
                      "source": "web", "n_chars": 7}], gz=True)
    _write_jsonl(b, [{"doc_id": 2, "text": "drei vier"}], gz=True)
    ds = read_documents_jsonl([a, b])
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == DOCUMENT_SCHEMA.names
    assert df["lang"].tolist() == ["en", "unk"]
    assert df["n_chars"].tolist() == [7, 9]   # computed when absent

    # a documents operator runs unchanged on the JSONL corpus
    from fasta_windows_ray.stages.curation_filters import repetition_stats
    rs = repetition_stats(ds).to_pandas()
    assert len(rs) == 2 and (rs["dup_word_frac"] == 0.0).all()
