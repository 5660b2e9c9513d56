"""ORC source/sink (sources/orc.py, round 4): stripe-streamed reads
with reader-level column pruning, distributed exactly-once-style
writes, and schema parity with the JSONL/CSV interchange readers."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from pyarrow import orc as pa_orc

from fasta_windows_ray.sources.jsonl import (DOCUMENT_SCHEMA,
                                             TRANSCRIPT_SCHEMA)
from fasta_windows_ray.sources.orc import (read_documents_orc, read_orc,
                                           read_transcripts_orc,
                                           write_orc)

pytestmark = pytest.mark.usefixtures("ray_session")


def _turns(n=3000):
    return pd.DataFrame({
        "conv_id": [f"c{i % 41}" for i in range(n)],
        "turn_idx": (np.arange(n) % 9).astype(np.int32),
        "role": np.where(np.arange(n) % 2 == 0, "user", "assistant"),
        "text": [f"turn text {i}" for i in range(n)],
        "ts": pd.date_range("2026-01-01", periods=n, freq="250ms"),
    })


def test_roundtrip_and_multistripe(tmp_path):
    df = _turns()
    p = str(tmp_path / "t.orc")
    # tiny stripes force the stripe-by-stripe streaming path
    pa_orc.write_table(pa.Table.from_pandas(df), p, stripe_size=16_384)
    assert pa_orc.ORCFile(p).nstripes > 1
    got = read_orc(p).to_pandas().sort_values("text").reset_index(drop=True)
    want = df.sort_values("text").reset_index(drop=True)
    want["ts"] = want["ts"].astype("datetime64[ns]")   # ORC ts is ns
    pd.testing.assert_frame_equal(got, want)


def test_write_orc_distributed_blocks(tmp_path):
    df = _turns(1200)
    out = str(tmp_path / "out")
    paths = write_orc(rd.from_pandas(df).repartition(4), out)
    assert len(paths) == 4 and all(p.endswith(".orc") for p in paths)
    assert not [n for n in os.listdir(out) if n.endswith(".tmp")]
    back = read_orc(out).to_pandas()
    assert len(back) == len(df)
    assert set(back["text"]) == set(df["text"])


def test_transcripts_schema_parity_and_pruning(tmp_path):
    df = _turns(500)
    p = str(tmp_path / "turns.orc")
    pa_orc.write_table(pa.Table.from_pandas(df), p)   # writer omits tool
    full = read_transcripts_orc(p).to_pandas()
    assert list(full.columns) == TRANSCRIPT_SCHEMA.names
    assert str(full["ts"].dtype) == "datetime64[us]"
    assert full["turn_idx"].dtype == np.int32
    assert (full["tool"] == "").all()
    # pruned read: includes a requested-but-absent defaultable column
    pr = read_transcripts_orc(p, columns=["conv_id", "ts", "tool"])
    pdf = pr.to_pandas()
    assert list(pdf.columns) == ["conv_id", "ts", "tool"]
    assert len(pdf) == 500 and (pdf["tool"] == "").all()
    with pytest.raises(KeyError):
        read_transcripts_orc(p, columns=["nope"])


def test_documents_defaults_and_downstream_op(tmp_path):
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "text": [f"doc body {i} " * (1 + i % 4) for i in range(400)],
    })
    out = str(tmp_path / "docs")
    write_orc(rd.from_pandas(df).repartition(2), out)
    docs = read_documents_orc(out)
    pdf = docs.to_pandas()
    assert list(pdf.columns) == DOCUMENT_SCHEMA.names
    assert (pdf["source"] == "orc").all() and (pdf["lang"] == "unk").all()
    assert pdf["n_chars"].tolist() == \
        pdf["text"].str.len().astype("int64").tolist()
    # the point of interchange parity: a real engine stage runs on the
    # ORC-sourced dataset exactly as on the parquet-sourced one
    from fasta_windows_ray.stages.dedup import exact_dedup
    dup = pd.concat([df, df.head(50).assign(doc_id=lambda x: x.doc_id
                                            + 1000)], ignore_index=True)
    write_orc(rd.from_pandas(dup), str(tmp_path / "dup"))
    kept = exact_dedup(read_documents_orc(str(tmp_path / "dup")),
                       text_col="text", id_col="doc_id").to_pandas()
    assert len(kept) == 400
