"""Bucketed catalog point lookup (sources/catalog.py catalog_lookup,
round 4): exact rows, bucket + stats pruning evidence, int and string
keys, snapshot pinning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_lookup,
                                               catalog_write)

pytestmark = pytest.mark.usefixtures("ray_session")


def _table(tmp_path, n=2000, n_buckets=16):
    df = pd.DataFrame({
        "conv_id": [f"c{i % 400}" for i in range(n)],
        "v": np.arange(n, dtype=np.int64)})
    d = str(tmp_path / "tbl")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
                  d, bucket_by=("conv_id", n_buckets))
    return d, df


def test_lookup_exact_rows_and_pruning(ray_session, tmp_path):
    d, df = _table(tmp_path)
    keys = ["c7", "c123", "c399", "missing"]
    ds, rep = catalog_lookup(d, keys, return_report=True)
    got = ds.to_pandas().sort_values(["conv_id", "v"]).reset_index(drop=True)
    want = (df[df["conv_id"].isin(keys)]
            .sort_values(["conv_id", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert rep["files_scanned"] < rep["files_total"]
    assert rep["rows_skipped"] > 0


def test_lookup_int_keys_digest_store(ray_session, tmp_path):
    from fasta_windows_ray.stages.ingest_dedup import (dedup_ingest,
                                                       stable_digest64)
    d = str(tmp_path / "corpus")
    rows = [{"doc_id": f"d{i}", "text": f"text-{i}"} for i in range(300)]
    dedup_ingest(rd.from_items(rows), d, n_buckets=16)
    dig = stable_digest64(["text-7", "text-250"])
    ds, rep = catalog_lookup(d, dig.tolist(),
                             columns=["doc_id"], return_report=True)
    got = ds.to_pandas()
    assert sorted(got["doc_id"]) == ["d250", "d7"]
    assert set(got.columns) == {"_digest", "doc_id"}
    assert rep["files_scanned"] <= 2


def test_lookup_empty_keys_and_version_pin(ray_session, tmp_path):
    d, df = _table(tmp_path)
    ds, rep = catalog_lookup(d, [], return_report=True)
    assert ds.count() == 0 and rep["files_scanned"] == 0
    # append more rows; a version-1 lookup must not see them
    extra = pd.DataFrame({"conv_id": ["c7"], "v": [999999]})
    catalog_write(rd.from_arrow(pa.Table.from_pandas(extra)), d,
                  bucket_by=("conv_id", 16))
    old = catalog_lookup(d, ["c7"], version=1).to_pandas()
    new = catalog_lookup(d, ["c7"]).to_pandas()
    assert len(new) == len(old) + 1
    assert 999999 not in old["v"].tolist()


def test_lookup_rejects_unbucketed(ray_session, tmp_path):
    d = str(tmp_path / "plain")
    catalog_write(rd.from_items([{"k": "a", "v": 1}]), d)
    with pytest.raises(ValueError, match="not bucketed"):
        catalog_lookup(d, ["a"])


# ---------------------------------------------------------------------------
# Per-file Bloom pruning (round 4): point lookups on UNBUCKETED tables,
# and extra pruning where min/max windows interleave
# ---------------------------------------------------------------------------

def _interleaved(tmp_path, bloom=True, n=16_000, files=16):
    """ids are round-robin across files, so every file's min/max spans
    ~the whole id range — min/max stats prune NOTHING."""
    rng = np.random.default_rng(3)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "v": ids * 2})
    d = str(tmp_path / ("bl" if bloom else "nobl"))
    catalog_write(rd.from_pandas(df).repartition(files), d,
                  bloom_cols=["doc_id"] if bloom else None)
    return d, df


def test_unbucketed_bloom_lookup_prunes(ray_session, tmp_path):
    d, df = _interleaved(tmp_path)
    keys = [5, 777, 15_221, 999_999]          # 3 present + 1 absent
    ds, rep = catalog_lookup(d, keys, key_col="doc_id",
                             return_report=True)
    # each present key lives in exactly one file; FPR adds at most a
    # couple more — far below the 16 files min/max would all scan
    assert rep["files_scanned"] <= 6 < rep["files_total"] == 16
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [5, 777, 15_221]
    assert got["v"].tolist() == [10, 1554, 30_442]

    # without blooms the same lookup must scan everything (no pruning
    # signal exists) — the contrast that proves the Bloom does the work
    d0, _ = _interleaved(tmp_path, bloom=False)
    _, rep0 = catalog_lookup(d0, keys, key_col="doc_id",
                             return_report=True)
    assert rep0["files_scanned"] == rep0["files_total"]


def test_read_equality_predicate_uses_bloom(ray_session, tmp_path):
    from fasta_windows_ray.sources.catalog import catalog_read
    d, df = _interleaved(tmp_path)
    ds, rep = catalog_read(d, predicate=[("doc_id", "==", 4242)],
                           return_report=True)
    assert rep["files_scanned"] <= 3 < rep["files_total"]
    pdf = ds.to_pandas()
    assert 4242 in set(pdf["doc_id"])         # superset semantics kept


def test_bloom_string_keys_and_bucketed_combo(ray_session, tmp_path):
    df = pd.DataFrame({"k": [f"user-{i}" for i in range(4000)],
                       "v": np.arange(4000)})
    d = str(tmp_path / "bstr")
    catalog_write(rd.from_pandas(df).repartition(8), d,
                  bucket_by=("k", 8), bloom_cols=["k"])
    # two appends -> 2 files per bucket; Bloom prunes the append file
    # that doesn't hold the key even inside the right bucket
    catalog_write(rd.from_pandas(pd.DataFrame(
        {"k": [f"new-{i}" for i in range(4000)],
         "v": np.arange(4000)})).repartition(8), d,
        bucket_by=("k", 8), bloom_cols=["k"])
    ds, rep = catalog_lookup(d, ["user-7"], return_report=True)
    assert rep["files_scanned"] == 1          # bucket (2 files) -> 1
    assert ds.to_pandas()["v"].tolist() == [7]


def test_bloom_null_keys_hash_parity(ray_session, tmp_path):
    # int column WITH nulls: build must still hash as int64 (nulls
    # dropped before to_pandas), or every probe would false-exclude
    df = pd.DataFrame({"doc_id": pd.array([1, 2, None, 4] * 250,
                                          dtype="Int64"),
                       "v": np.arange(1000)})
    d = str(tmp_path / "bnull")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
                  d, bloom_cols=["doc_id"])
    ds = catalog_lookup(d, [4], key_col="doc_id")
    assert len(ds.to_pandas()) == 250


def test_bloom_survives_compaction_and_merge(ray_session, tmp_path):
    """Maintenance must not silently degrade prunability: compaction
    and merge rewrites re-derive every Bloom the parent files carried."""
    from fasta_windows_ray.sources.catalog import (catalog_compact,
                                                   catalog_merge)
    rng = np.random.default_rng(5)
    ids = rng.permutation(6000).astype(np.int64)
    d = str(tmp_path / "tbl")
    # two bloom'd writes -> many small files
    catalog_write(rd.from_pandas(pd.DataFrame(
        {"doc_id": ids[:3000], "v": ids[:3000]})).repartition(8), d,
        bloom_cols=["doc_id"])
    catalog_write(rd.from_pandas(pd.DataFrame(
        {"doc_id": ids[3000:], "v": ids[3000:]})).repartition(8), d,
        bloom_cols=["doc_id"])
    catalog_compact(d, target_rows=1000)
    _, rep = catalog_lookup(d, [int(ids[7])], key_col="doc_id",
                            return_report=True)
    assert rep["files_total"] >= 6
    assert rep["files_scanned"] <= 2          # Blooms re-derived

    catalog_merge(rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([10_001, 10_002], np.int64),
         "v": np.array([1, 2], np.int64)})), d, on="doc_id")
    _, rep2 = catalog_lookup(d, [10_001], key_col="doc_id",
                             return_report=True)
    assert rep2["files_scanned"] < rep2["files_total"]


def test_zorder_table_survives_delete(ray_session, tmp_path):
    """DML interplay: a copy-on-write delete on a z-ordered table keeps
    results exact; untouched files keep their tight stats."""
    from fasta_windows_ray.sources.catalog import (catalog_delete,
                                                   catalog_read)
    rng = np.random.default_rng(8)
    n = 20_000
    df = pd.DataFrame({"x": rng.random(n), "y": rng.random(n),
                       "v": np.arange(n, dtype=np.int64)})
    d = str(tmp_path / "zt")
    catalog_write(rd.from_pandas(df).repartition(16), d,
                  mode="overwrite", zorder=["x", "y"])
    rep = catalog_delete(d, [("x", ">=", 0.9)])
    assert rep["rows_deleted"] == int((df["x"] >= 0.9).sum())
    box = [("x", ">=", 0.2), ("x", "<=", 0.3),
           ("y", ">=", 0.2), ("y", "<=", 0.3)]
    ds, prep = catalog_read(d, predicate=box, return_report=True)
    assert prep["files_scanned"] < prep["files_total"]   # pruning kept
    pdf = ds.to_pandas()
    pdf = pdf[pdf["x"].between(0.2, 0.3) & pdf["y"].between(0.2, 0.3)]
    want = df[(df["x"] < 0.9) & df["x"].between(0.2, 0.3)
              & df["y"].between(0.2, 0.3)]
    assert sorted(pdf["v"]) == sorted(want["v"])
