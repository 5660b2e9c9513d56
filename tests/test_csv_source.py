"""CSV/TSV sources: schema parity with the parquet path, gzip, TSV
delimiter, epoch/ISO ts forms, missing optional columns, and a
downstream-operator round trip."""

import gzip
import os

import numpy as np
import pandas as pd
import pytest

from fasta_windows_ray.sources.csv import (read_documents_csv,
                                           read_transcripts_csv)
from fasta_windows_ray.sources.jsonl import TRANSCRIPT_SCHEMA

pytestmark = pytest.mark.usefixtures("ray_session")


def _write(path, text, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        f.write(text)


def test_transcripts_csv_schema_and_ts_forms(tmp_path):
    p1 = os.path.join(tmp_path, "epoch.csv")
    p2 = os.path.join(tmp_path, "iso.csv")
    _write(p1, "conv_id,turn_idx,role,text,tool,ts\n"
               "c1,0,user,hi,,1700000000000000\n"
               "c1,1,assistant,hello,search,1700000005000000\n")
    _write(p2, "conv_id,turn_idx,role,text,ts\n"          # no tool col
               "c2,0,user,hey,2024-01-01T00:00:05\n")
    for p in (p1, p2):
        df = read_transcripts_csv(p).to_pandas()
        assert list(df.columns) == TRANSCRIPT_SCHEMA.names
        assert str(df["ts"].dtype) == "datetime64[us]"
        assert df["turn_idx"].dtype == np.int32
    df2 = read_transcripts_csv(p2).to_pandas()
    assert df2["tool"].iloc[0] == ""
    assert df2["ts"].iloc[0] == pd.Timestamp("2024-01-01T00:00:05")


def test_tsv_and_gzip(tmp_path):
    p = os.path.join(tmp_path, "t.tsv.gz")
    _write(p, "conv_id\tturn_idx\trole\ttext\ttool\tts\n"
              "c1\t0\tuser\thello world\t\t1700000000000000\n", gz=True)
    df = read_transcripts_csv(p, delimiter="\t").to_pandas()
    assert len(df) == 1 and df["text"].iloc[0] == "hello world"


def test_documents_csv_defaults(tmp_path):
    p = os.path.join(tmp_path, "d.csv")
    _write(p, "doc_id,text\n1,alpha beta\n2,gamma\n")
    df = read_documents_csv(p).to_pandas().sort_values("doc_id")
    assert list(df["lang"]) == ["unk", "unk"]
    assert list(df["source"]) == ["csv", "csv"]
    assert list(df["n_chars"]) == [10, 5]


def test_downstream_roundtrip(tmp_path):
    """CSV-read turns run through the windowed-stats engine and equal
    the same rows fed from memory."""
    import ray.data as rd

    from fasta_windows_ray.stages.window_stats import window_stats
    from fasta_windows_ray.synth import make_transcripts
    t = make_transcripts(n_convs=4, mean_turns=10, seed=31)
    pdf = t.to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    p = os.path.join(tmp_path, "turns.csv")
    pdf.to_csv(p, index=False)
    a = window_stats(read_transcripts_csv(p), 3600 * 1_000_000,
                     num_buckets=4).to_pandas()
    b = window_stats(rd.from_arrow(t), 3600 * 1_000_000,
                     num_buckets=4).to_pandas()
    key = ["conv_id", "window_start"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
