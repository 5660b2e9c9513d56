"""Bucketed catalog tables + shuffle-free bucketed_join
(sources/catalog.py, round 4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (bucketed_join, catalog_read,
                                               catalog_write)
from fasta_windows_ray.stages.window_stats import stable_bucket_of

pytestmark = pytest.mark.usefixtures("ray_session")

N_B = 8


def _left_frame(n=4_000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "conv_id": [f"c{int(i)}" for i in rng.integers(0, 700, n)],
        "v": np.arange(n, dtype=np.int64)})


def _right_frame():
    return pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(0, 900, 3)],
        "label": [f"L{i % 5}" for i in range(300)]})


def _write(tmp_path, name, df):
    d = str(tmp_path / name)
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(5),
                  d, bucket_by=("conv_id", N_B))
    return d


def test_bucketed_join_inner_equals_pandas(ray_session, tmp_path):
    left, right = _left_frame(), _right_frame()
    da, db = _write(tmp_path, "a", left), _write(tmp_path, "b", right)
    out = (bucketed_join(da, db, on="conv_id").to_pandas()
           .sort_values(["v"]).reset_index(drop=True))
    want = (left.merge(right, on="conv_id", how="inner")
                .sort_values(["v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["conv_id", "v", "label"]], want[["conv_id", "v", "label"]])


def test_bucketed_join_left_keeps_unmatched(ray_session, tmp_path):
    left = _left_frame(500)
    right = _right_frame().iloc[:5]   # most buckets empty on the right
    da, db = _write(tmp_path, "a", left), _write(tmp_path, "b", right)
    out = (bucketed_join(da, db, on="conv_id", how="left").to_pandas()
           .sort_values(["v"]).reset_index(drop=True))
    want = (left.merge(right, on="conv_id", how="left")
                .sort_values(["v"]).reset_index(drop=True))
    assert len(out) == len(want) == 500
    pd.testing.assert_frame_equal(out[["conv_id", "v"]],
                                  want[["conv_id", "v"]])
    assert out["label"].notna().sum() == want["label"].notna().sum()


def test_manifest_records_buckets_and_spec(ray_session, tmp_path):
    d = _write(tmp_path, "t", _left_frame(1_000))
    import json, os
    man = json.load(open(os.path.join(
        d, "_manifest", "v00000001.json")))
    assert man["bucket_by"] == ["conv_id", N_B]
    assert all("bucket" in f for f in man["files"])
    # bucket parity with the engine's stable_bucket_of: re-read each
    # file and check every row hashes to the file's recorded bucket
    import pyarrow.parquet as pq
    for f in man["files"]:
        t = pq.read_table(os.path.join(d, f["path"]))
        got = stable_bucket_of(t["conv_id"].to_numpy(zero_copy_only=False),
                               N_B)
        assert (got == f["bucket"]).all()


def test_bucketed_append_validates_spec(ray_session, tmp_path):
    d = _write(tmp_path, "t", _left_frame(200))
    more = rd.from_arrow(pa.Table.from_pandas(_left_frame(100, seed=9)))
    with pytest.raises(ValueError):        # silently unbucketed append
        catalog_write(more, d, mode="append")
    with pytest.raises(ValueError):        # different bucket count
        catalog_write(more, d, mode="append", bucket_by=("conv_id", 4))
    catalog_write(more, d, mode="append", bucket_by=("conv_id", N_B))
    assert catalog_read(d).count() == 300


def test_bucketed_join_requires_compatible_specs(ray_session, tmp_path):
    da = _write(tmp_path, "a", _left_frame(100))
    db = str(tmp_path / "plain")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(_right_frame())), db)
    with pytest.raises(ValueError):
        bucketed_join(da, db, on="conv_id")
    dc = str(tmp_path / "c4")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(_right_frame())), dc,
                  bucket_by=("conv_id", 4))
    with pytest.raises(ValueError):
        bucketed_join(da, dc, on="conv_id")


def test_catalog_compact_bucketed_preserves_join(ray_session, tmp_path):
    from fasta_windows_ray.sources.catalog import (catalog_compact,
                                                   catalog_vacuum)
    left, right = _left_frame(2_000), _right_frame()
    da, db = _write(tmp_path, "a", left), _write(tmp_path, "b", right)
    # three appends -> one file per (write, bucket) accumulates
    for seed in (11, 12):
        extra = _left_frame(500, seed=seed)
        left = pd.concat([left, extra], ignore_index=True)
        catalog_write(rd.from_arrow(pa.Table.from_pandas(extra)), da,
                      mode="append", bucket_by=("conv_id", N_B))
    import json, os
    man = catalog_compact(da)
    assert man["bucket_by"] == ["conv_id", N_B]
    used = {f["bucket"] for f in man["files"]}
    assert len(man["files"]) == len(used)   # exactly one file per bucket
    key = ["conv_id", "v", "label"]
    out = (bucketed_join(da, db, on="conv_id").to_pandas()
           .sort_values(key).reset_index(drop=True))
    want = (left.merge(right, on="conv_id", how="inner")
                .sort_values(key).reset_index(drop=True))
    assert len(out) == len(want)
    pd.testing.assert_frame_equal(out[["conv_id", "v", "label"]],
                                  want[["conv_id", "v", "label"]])
    # vacuum reclaims the pre-compaction layout; reads still work
    deleted = catalog_vacuum(da, keep_versions=1)
    assert deleted
    assert catalog_read(da).count() == len(left)


def test_catalog_compact_fast_path_equals_verified(ray_session, tmp_path):
    """trust_placement=True (per-bucket rewrite, no exchange) commits
    the same table contents as the exchange-verified path."""
    from fasta_windows_ray.sources.catalog import catalog_compact
    frames = [_left_frame(400, seed=s) for s in (1, 2, 3)]
    paths = {}
    for mode in ("fast", "verified"):
        d = _write(tmp_path, mode, frames[0])
        for f in frames[1:]:
            catalog_write(rd.from_arrow(pa.Table.from_pandas(f)), d,
                          mode="append", bucket_by=("conv_id", N_B))
        man = catalog_compact(d, trust_placement=(mode == "fast"))
        assert man["bucket_by"] == ["conv_id", N_B]
        assert len(man["files"]) == len({f["bucket"]
                                         for f in man["files"]})
        paths[mode] = d
    key = ["conv_id", "v"]
    a = (catalog_read(paths["fast"]).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (catalog_read(paths["verified"]).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[key], b[key])
    # per-file bucket row counts agree between the two paths
    from fasta_windows_ray.sources.catalog import (_latest_version,
                                                   _load_manifest)

    def bucket_rows(d):
        man = _load_manifest(d, _latest_version(d))
        return {f["bucket"]: f["rows"] for f in man["files"]}

    assert bucket_rows(paths["fast"]) == bucket_rows(paths["verified"])


def test_catalog_compact_unbucketed_rowcount(ray_session, tmp_path):
    from fasta_windows_ray.sources.catalog import catalog_compact
    d = str(tmp_path / "plain")
    for i in range(3):
        catalog_write(rd.from_arrow(pa.Table.from_pandas(
            _left_frame(300, seed=i))).repartition(4), d)
    import json, os
    man = catalog_compact(d, target_rows=10_000)
    assert man["total_rows"] == 900
    assert len(man["files"]) <= 3
    assert catalog_read(d).count() == 900
