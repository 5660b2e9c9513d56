"""Key-list copy-on-write delete (sources/catalog.py
catalog_delete_keys, round 4): bucket + stats pruning, exact rows
removed, time travel intact, unbucketed stats-only path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_delete_keys,
                                               catalog_read,
                                               catalog_write)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_bucketed_key_delete(ray_session, tmp_path):
    df = pd.DataFrame({"conv_id": [f"c{i % 100}" for i in range(1000)],
                       "v": np.arange(1000, dtype=np.int64)})
    d = str(tmp_path / "tbl")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
                  d, bucket_by=("conv_id", 16))
    keys = ["c7", "c13", "nope"]
    rep = catalog_delete_keys(d, "conv_id", keys)
    got = catalog_read(d).to_pandas()
    assert not got["conv_id"].isin(keys).any()
    assert rep["rows_deleted"] == 20
    assert len(got) == 980
    # bucket pruning: most bucket files never touched
    assert rep["files_untouched"] > 0
    assert rep["files_rewritten"] + rep["files_dropped"] <= 3
    # time travel: pre-delete snapshot intact
    old = catalog_read(d, version=1).to_pandas()
    assert len(old) == 1000


def test_unbucketed_stats_pruned_delete(ray_session, tmp_path):
    # sorted ranges per file -> disjoint min/max windows -> stats prune
    d = str(tmp_path / "plain")
    for lo in (0, 1000, 2000):
        df = pd.DataFrame({"k": np.arange(lo, lo + 1000, dtype=np.int64),
                           "v": np.arange(1000, dtype=np.int64)})
        catalog_write(rd.from_arrow(pa.Table.from_pandas(df)), d)
    rep = catalog_delete_keys(d, "k", [1500, 1501])
    got = catalog_read(d).to_pandas()
    assert rep["rows_deleted"] == 2 and len(got) == 2998
    assert rep["files_untouched"] >= 2       # the 0- and 2000-range files


def test_delete_whole_file_and_empty_keys(ray_session, tmp_path):
    d = str(tmp_path / "tbl")
    df = pd.DataFrame({"conv_id": ["a"] * 5 + ["b"] * 5,
                       "v": np.arange(10, dtype=np.int64)})
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)), d,
                  bucket_by=("conv_id", 4))
    rep = catalog_delete_keys(d, "conv_id", ["a"])
    assert rep["rows_deleted"] == 5
    # dropped if "a"'s bucket file held only "a" rows, else rewritten
    assert rep["files_dropped"] + rep["files_rewritten"] == 1
    assert catalog_read(d).to_pandas()["conv_id"].unique().tolist() == ["b"]
    rep2 = catalog_delete_keys(d, "conv_id", [])
    assert rep2["rows_deleted"] == 0


def test_delete_keys_bloom_pruning_and_preservation(ray_session, tmp_path):
    """On interleaved ids (min/max prunes nothing) the Bloom bounds the
    rewrite set to ~|keys| files, and rewritten files KEEP their Bloom
    so a second delete prunes just as hard."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fasta_windows_ray.sources.catalog import (catalog_delete_keys,
                                                   catalog_lookup,
                                                   catalog_write)
    rng = np.random.default_rng(11)
    ids = rng.permutation(8000).astype(np.int64)
    d = str(tmp_path / "tbl")
    catalog_write(rd.from_pandas(pd.DataFrame({"doc_id": ids,
                                               "v": ids}))
                  .repartition(16), d, bloom_cols=["doc_id"])
    rep = catalog_delete_keys(d, "doc_id", [3, 4444, 7999])
    assert rep["rows_deleted"] == 3
    assert rep["files_rewritten"] <= 4        # ~1 file per key + FPR
    # rewritten files kept their Bloom: a follow-up lookup still prunes
    _, lrep = catalog_lookup(d, [5, 6000], key_col="doc_id",
                             return_report=True)
    assert lrep["files_scanned"] <= 4 < lrep["files_total"]
    # and a second targeted delete is equally bounded
    rep2 = catalog_delete_keys(d, "doc_id", [5])
    assert rep2["rows_deleted"] == 1 and rep2["files_rewritten"] <= 2
