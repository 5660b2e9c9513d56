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
