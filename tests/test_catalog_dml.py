"""catalog_delete (copy-on-write predicate delete) and catalog_merge
(upsert) — sources/catalog.py, round 4."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_delete,
                                               catalog_merge,
                                               catalog_read,
                                               catalog_write)

pytestmark = pytest.mark.usefixtures("ray_session")

N_B = 8


def _frame(n=2_000, seed=7, lo=0, hi=700):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "conv_id": [f"c{int(i):04d}" for i in rng.integers(lo, hi, n)],
        "v": np.arange(n, dtype=np.int64),
        "score": rng.random(n)})


def _sorted(df, cols=("conv_id", "v")):
    return df.sort_values(list(cols)).reset_index(drop=True)


# ---------------------------------------------------------------- delete

def test_delete_matches_pandas_and_prunes(tmp_path):
    df = _frame()
    d = str(tmp_path / "t")
    # v is monotone across the 10 blocks -> files have disjoint v ranges,
    # so a v-range predicate must prune most files with zero I/O
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(10), d)
    rep = catalog_delete(d, [("v", "<", 200)])
    want = df[~(df["v"] < 200)]
    got = catalog_read(d).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))
    assert rep["rows_deleted"] == 200
    # 10 files x 200 rows: file 0 dropped whole, files 1..9 untouched
    assert rep["files_untouched"] >= 8
    assert rep["files_dropped"] >= 1
    assert rep["files_rewritten"] <= 1


def test_delete_conjunction_and_time_travel(tmp_path):
    df = _frame(1_000)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(4), d)
    v0 = 1
    rep = catalog_delete(d, [("v", ">=", 100), ("v", "<", 300)])
    want = df[~((df["v"] >= 100) & (df["v"] < 300))]
    got = catalog_read(d).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))
    assert rep["rows_deleted"] == 200
    # pre-delete snapshot still readable
    old = catalog_read(d, version=v0).to_pandas()
    assert len(old) == len(df)


def test_delete_bucketed_preserves_spec_and_join(tmp_path):
    df = _frame(1_500)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(5),
                  d, bucket_by=("conv_id", N_B))
    victim = df["conv_id"].iloc[0]
    rep = catalog_delete(d, [("conv_id", "==", victim)])
    want = df[df["conv_id"] != victim]
    got = catalog_read(d).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got[["conv_id", "v"]]),
                                  _sorted(want[["conv_id", "v"]]))
    assert rep["rows_deleted"] == int((df["conv_id"] == victim).sum())
    # spec survived the copy-on-write commit
    from fasta_windows_ray.sources.catalog import (_latest_version,
                                                   _load_manifest)
    man = _load_manifest(d, _latest_version(d))
    assert man["bucket_by"] == ["conv_id", N_B]


def test_delete_no_match_keeps_all_files(tmp_path):
    df = _frame(500)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(3), d)
    rep = catalog_delete(d, [("v", ">", 10_000_000)])
    assert rep["rows_deleted"] == 0
    assert rep["files_rewritten"] == 0 and rep["files_dropped"] == 0
    assert catalog_read(d).count() == 500


# ----------------------------------------------------------------- merge

def _merge_want(target: pd.DataFrame, src: pd.DataFrame,
                on="conv_id") -> pd.DataFrame:
    kept = target[~target[on].isin(src[on])]
    return pd.concat([kept, src], ignore_index=True)


def test_merge_bucketed_upsert(tmp_path):
    target = _frame(2_000, seed=1, hi=400)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(target)).repartition(6),
                  d, bucket_by=("conv_id", N_B))
    # source: half-updates (existing keys), half-inserts (new keys)
    src = pd.DataFrame({
        "conv_id": [f"c{i:04d}" for i in range(350, 450)],
        "v": np.arange(100, dtype=np.int64) + 10_000,
        "score": np.zeros(100)})
    rep = catalog_merge(rd.from_arrow(pa.Table.from_pandas(src)), d,
                        on="conv_id")
    got = catalog_read(d).to_pandas()
    want = _merge_want(target, src)
    # updated keys carry ONLY source rows; inserted keys present
    pd.testing.assert_frame_equal(_sorted(got[["conv_id", "v"]]),
                                  _sorted(want[["conv_id", "v"]]))
    n_upd = int(target["conv_id"].isin(src["conv_id"]).sum())
    assert rep["rows_updated"] == n_upd
    assert rep["rows_inserted"] == len(src) - n_upd
    assert rep["buckets_touched"] <= N_B
    # merged table still joins shuffle-free against a co-bucketed table
    from fasta_windows_ray.sources.catalog import bucketed_join
    other = pd.DataFrame({"conv_id": [f"c{i:04d}" for i in range(450)],
                          "label": ["x"] * 450})
    d2 = str(tmp_path / "u")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(other)), d2,
                  bucket_by=("conv_id", N_B))
    j = bucketed_join(d, d2, on="conv_id").to_pandas()
    wj = want.merge(other, on="conv_id", how="inner")
    assert len(j) == len(wj)


def test_merge_unbucketed_upsert_and_pruning(tmp_path):
    target = _frame(1_000, seed=2, hi=300)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(target)).repartition(5),
                  d)
    src = pd.DataFrame({
        "conv_id": [f"c{i:04d}" for i in range(290, 310)],
        "v": np.arange(20, dtype=np.int64) + 77_000,
        "score": np.ones(20)})
    rep = catalog_merge(rd.from_arrow(pa.Table.from_pandas(src)), d,
                        on="conv_id")
    got = catalog_read(d).to_pandas()
    want = _merge_want(target, src)
    pd.testing.assert_frame_equal(_sorted(got[["conv_id", "v"]]),
                                  _sorted(want[["conv_id", "v"]]))
    n_upd = int(target["conv_id"].isin(src["conv_id"]).sum())
    assert rep["rows_updated"] == n_upd
    assert rep["rows_inserted"] == len(src) - n_upd


def test_merge_rejects_duplicate_source_keys(tmp_path):
    target = _frame(200, seed=3)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(target)), d,
                  bucket_by=("conv_id", N_B))
    dup = pd.DataFrame({"conv_id": ["c0001", "c0001"],
                        "v": [1, 2], "score": [0.0, 0.0]})
    with pytest.raises(Exception, match="duplicate keys"):
        catalog_merge(rd.from_arrow(pa.Table.from_pandas(dup)), d,
                      on="conv_id")


def test_merge_all_inserts_touches_no_overlap(tmp_path):
    """A merge whose key range is disjoint from the table rewrites
    NOTHING on the unbucketed stats-pruned path."""
    target = _frame(600, seed=4, hi=100)     # keys c0000..c0099
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(target)).repartition(3),
                  d)
    src = pd.DataFrame({"conv_id": [f"d{i}" for i in range(10)],
                        "v": np.arange(10, dtype=np.int64),
                        "score": np.zeros(10)})
    rep = catalog_merge(rd.from_arrow(pa.Table.from_pandas(src)), d,
                        on="conv_id")
    assert rep["rows_updated"] == 0
    assert rep["rows_inserted"] == 10
    assert rep["files_untouched"] == 3
    assert rep["files_rewritten"] == 0
    assert catalog_read(d).count() == 610


# ------------------------------------------------------------- changes

def _changes_df(d, v0, v1=None):
    from fasta_windows_ray.sources.catalog import catalog_changes
    out = catalog_changes(d, v0, v1).to_pandas()
    return out


def test_changes_append_is_all_inserts(tmp_path):
    df = _frame(300, seed=11)
    extra = _frame(50, seed=12, lo=900, hi=950)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)), d)
    catalog_write(rd.from_arrow(pa.Table.from_pandas(extra)), d,
                  mode="append")
    ch = _changes_df(d, 1, 2)
    assert (ch["_change"] == "insert").all() and len(ch) == 50
    pd.testing.assert_frame_equal(
        _sorted(ch[["conv_id", "v"]]), _sorted(extra[["conv_id", "v"]]))


def test_changes_delete_is_exact_deletes(tmp_path):
    df = _frame(400, seed=13)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(df)).repartition(4), d)
    catalog_delete(d, [("v", "<", 100)])
    ch = _changes_df(d, 1, 2)
    assert (ch["_change"] == "delete").all() and len(ch) == 100
    want = df[df["v"] < 100]
    pd.testing.assert_frame_equal(
        _sorted(ch[["conv_id", "v"]]), _sorted(want[["conv_id", "v"]]))


def test_changes_merge_mixed(tmp_path):
    target = _frame(500, seed=14, hi=200)
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(target)).repartition(4),
                  d, bucket_by=("conv_id", N_B))
    src = pd.DataFrame({"conv_id": [f"c{i:04d}" for i in range(150, 250)],
                        "v": np.arange(100, dtype=np.int64) + 50_000,
                        "score": np.zeros(100)})
    catalog_merge(rd.from_arrow(pa.Table.from_pandas(src)), d,
                  on="conv_id")
    ch = _changes_df(d, 1, 2)
    dels = ch[ch["_change"] == "delete"]
    ins = ch[ch["_change"] == "insert"]
    want_del = target[target["conv_id"].isin(src["conv_id"])]
    assert len(dels) == len(want_del)
    pd.testing.assert_frame_equal(
        _sorted(dels[["conv_id", "v"]]), _sorted(want_del[["conv_id", "v"]]))
    pd.testing.assert_frame_equal(
        _sorted(ins[["conv_id", "v"]]), _sorted(src[["conv_id", "v"]]))


def test_changes_compaction_nets_to_zero(tmp_path):
    from fasta_windows_ray.sources.catalog import catalog_compact
    frames = [_frame(200, seed=s) for s in (21, 22, 23)]
    d = str(tmp_path / "t")
    catalog_write(rd.from_arrow(pa.Table.from_pandas(frames[0])), d,
                  bucket_by=("conv_id", N_B))
    for f in frames[1:]:
        catalog_write(rd.from_arrow(pa.Table.from_pandas(f)), d,
                      mode="append", bucket_by=("conv_id", N_B))
    v_pre = 3
    catalog_compact(d)
    ch = _changes_df(d, v_pre)
    assert len(ch) == 0      # pure rewrite: multiset diff cancels
