"""Bloom runtime-filter semi-join (stages/bloom.py) and catalog
incremental diff (sources/catalog.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_diff, catalog_read,
                                               catalog_write)
from fasta_windows_ray.stages.bloom import (bloom_contains, bloom_semi_join,
                                            build_bloom)

pytestmark = pytest.mark.usefixtures("ray_session")


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

N_BITS = 1 << 17   # small enough that the FPR is measurable


def test_bloom_no_false_negatives_and_design_fpr(ray_session):
    members = [f"k{i}" for i in range(10_000)]
    ds = rd.from_items([{"k": m} for m in members]).repartition(6)
    bm = build_bloom(ds, "k", n_bits=N_BITS)
    assert bloom_contains(bm, pd.Series(members)).all()
    probes = pd.Series([f"absent{i}" for i in range(20_000)])
    fpr = bloom_contains(bm, probes).mean()
    # design FPR = (1 - e^{-kn/m})^k ~ 0.5% here; 2% with slack
    assert fpr < 0.02, fpr


def test_bloom_build_is_partition_invariant(ray_session):
    rows = [{"k": f"u{i % 3000}"} for i in range(9_000)]
    a = build_bloom(rd.from_items(rows).repartition(3), "k", n_bits=1 << 16)
    b = build_bloom(rd.from_items(rows).repartition(11), "k", n_bits=1 << 16)
    assert (a == b).all()


def test_bloom_semi_join_exact_matches_pandas_semi(ray_session):
    rng = np.random.default_rng(31)
    left = pd.DataFrame({
        "conv_id": [f"c{int(i)}" for i in rng.integers(0, 5000, 20_000)],
        "v": np.arange(20_000)})
    # right has DUPLICATE keys — exact semi must not fan out left rows
    right_keys = [f"c{int(i)}" for i in rng.integers(0, 1000, 6_000)]
    right = pd.DataFrame({"conv_id": right_keys,
                          "extra": np.arange(6_000)})
    out = bloom_semi_join(
        rd.from_arrow(pa.Table.from_pandas(left)).repartition(5),
        rd.from_arrow(pa.Table.from_pandas(right)).repartition(4),
        on="conv_id", n_bits=N_BITS).to_pandas()
    want = left[left["conv_id"].isin(set(right_keys))]
    assert set(out.columns) == {"conv_id", "v"}
    got = (out[["conv_id", "v"]].sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.sort_values("v").reset_index(drop=True))


def test_bloom_semi_join_filter_only_is_superset(ray_session):
    left = pd.DataFrame({"k": [f"x{i}" for i in range(8_000)]})
    right = pd.DataFrame({"k": [f"x{i}" for i in range(0, 8_000, 7)]})
    out = bloom_semi_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        on="k", n_bits=N_BITS, exact=False).to_pandas()
    true = set(right["k"])
    assert true <= set(out["k"])                  # no false negatives
    assert len(out) <= len(true) + 0.02 * len(left)  # bounded FPs


# ---------------------------------------------------------------------------
# Catalog incremental diff
# ---------------------------------------------------------------------------

def _tbl(ids):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"doc {i}" for i in ids])}))


def test_catalog_diff_appends_only(ray_session, tmp_path):
    d = str(tmp_path / "t")
    catalog_write(_tbl(range(100)), d)                    # v1
    catalog_write(_tbl(range(100, 130)), d, mode="append")  # v2
    diff, rep = catalog_diff(d, 1, 2, return_report=True)
    got = sorted(diff.to_pandas()["doc_id"])
    assert got == list(range(100, 130))
    assert rep["rows_added"] == 30 and rep["files_removed"] == []
    # from_version=0 -> full scan, equal to a plain snapshot read
    assert catalog_diff(d, 0, 2).count() == catalog_read(d, version=2).count()


def test_catalog_diff_empty_and_overwrite(ray_session, tmp_path):
    d = str(tmp_path / "t")
    catalog_write(_tbl(range(50)), d)                     # v1
    assert catalog_diff(d, 1, 1).count() == 0             # no new files
    catalog_write(_tbl(range(500, 520)), d, mode="overwrite")  # v2
    diff, rep = catalog_diff(d, 1, 2, return_report=True)
    assert sorted(diff.to_pandas()["doc_id"]) == list(range(500, 520))
    assert len(rep["files_removed"]) > 0   # v1 files left the snapshot


def test_catalog_diff_incremental_merge_equals_full(ray_session, tmp_path):
    """The CDC consumer pattern: per-version diffs processed through a
    mergeable aggregate and folded == the same aggregate over the full
    table (here: word heavy-hitter counts, counter addition)."""
    from fasta_windows_ray.stages.heavy_hitters import heavy_hitters
    d = str(tmp_path / "t")
    catalog_write(_tbl(range(200)), d)
    catalog_write(_tbl(range(200, 260)), d, mode="append")
    parts = []
    for v in (1, 2):
        res = heavy_hitters(catalog_diff(d, v - 1, v), "text",
                            k=5, capacity=1024, n_candidates=1024,
                            tokenize="words")
        assert res.certified
        parts.append(res.top[["term", "n"]])
    folded = (pd.concat(parts).groupby("term", as_index=False)["n"].sum()
                .sort_values(["n", "term"], ascending=[False, True],
                             kind="stable").reset_index(drop=True))
    full = heavy_hitters(catalog_read(d), "text", k=5, capacity=1024,
                         n_candidates=1024, tokenize="words").top
    pd.testing.assert_frame_equal(folded.head(5)[["term", "n"]],
                                  full.head(5)[["term", "n"]])


def test_catalog_diff_version_validation(ray_session, tmp_path):
    d = str(tmp_path / "t")
    catalog_write(_tbl(range(10)), d)
    with pytest.raises(ValueError):
        catalog_diff(d, 5, 1)
