"""Incremental IVF append (stages/similarity.py ivf_append): appended
vectors become searchable without a rebuild, the existing index is
never read or rewritten, reruns of a committed batch are no-ops, and
partition pruning survives multi-file lists."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.stages.similarity import (brute_force_topk,
                                                 ivf_append, ivf_build,
                                                 ivf_list_files, ivf_query)

pytestmark = pytest.mark.usefixtures("ray_session")


def _vecs(n, d=24, seed=9, start=0):
    rng = np.random.default_rng(seed)
    E = rng.standard_normal((n, d)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
        "embedding": pa.array(list(E))}))
    return E, ds


def test_ivf_append_searchable_and_idempotent(tmp_path):
    E0, ds0 = _vecs(500, seed=9)
    E1, ds1 = _vecs(300, seed=10, start=500)
    idx = str(tmp_path / "ivf")
    ivf_build(ds0, idx, n_centroids=8, seed=3)
    n_files_before = len(ivf_list_files(idx))

    rep = ivf_append(ds1, idx, "b1")
    assert not rep["skipped"].any()
    assert rep["n_rows"].sum() == 300
    assert sum(rep.attrs["list_counts"].values()) == 800

    # appended vectors are searchable: near-exhaustive probe recovers
    # most of the exact top-5 over the UNION corpus
    union = rd.from_pandas(pd.concat([
        pd.DataFrame({"vec_id": np.arange(500),
                      "embedding": list(E0)}),
        pd.DataFrame({"vec_id": np.arange(500, 800),
                      "embedding": list(E1)})], ignore_index=True))
    Q = E1[:2].astype(np.float64)
    res = ivf_query(idx, Q, [500, 501], k=5, nprobe=7)
    exact = brute_force_topk(union, Q, [500, 501], k=5)
    for qid in (500, 501):
        got = set(res.loc[res["query_id"] == qid, "vec_id"])
        want = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        assert len(got & want) >= 4, (qid, got, want)

    # pruning still strict with multi-file lists
    narrow = ivf_query(idx, Q[:1], [500], k=5, nprobe=3)
    assert 0 < narrow.attrs["bytes_read"] < narrow.attrs["bytes_total"]

    # rerun of the same batch is a committed no-op
    rep2 = ivf_append(ds1, idx, "b1")
    assert rep2["skipped"].all()
    assert rep2.attrs["list_counts"] == rep.attrs["list_counts"]
    res2 = ivf_query(idx, Q, [500, 501], k=5, nprobe=7)
    pd.testing.assert_frame_equal(res.reset_index(drop=True),
                                  res2.reset_index(drop=True))

    # a second batch under a new id appends again
    E2, ds2 = _vecs(100, seed=11, start=800)
    rep3 = ivf_append(ds2, idx, "b2")
    assert rep3["n_rows"].sum() == 100
    assert sum(ivf_append(ds2, idx, "b2").attrs["list_counts"].values()) \
        == 900
    assert len(ivf_list_files(idx)) > n_files_before


def test_ivf_append_quantized_autodetect(tmp_path):
    E0, ds0 = _vecs(400, seed=5)
    E1, ds1 = _vecs(200, seed=6, start=400)
    idx = str(tmp_path / "ivfq")
    ivf_build(ds0, idx, n_centroids=8, seed=3, quantize=True)
    ivf_append(ds1, idx, "b1")
    import pyarrow.parquet as pq
    appended = [p for p in ivf_list_files(idx) if "data-b1" in p]
    assert appended
    cols = pq.ParquetFile(appended[0]).schema_arrow.names
    assert "emb_q" in cols and "scale" in cols and "embedding" not in cols
    # query_id 10_000 collides with no vec_id (self-hits are filtered
    # by query_id == vec_id, so an id in the corpus would mask itself)
    res = ivf_query(idx, E1[:1].astype(np.float64), [10_000], k=5, nprobe=7)
    assert 400 in set(res["vec_id"])  # finds itself through quantization


def test_ivf_append_guards(tmp_path):
    _, ds = _vecs(10)
    with pytest.raises(ValueError, match="not a completed IVF index"):
        ivf_append(ds, str(tmp_path / "nope"), "b1")
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx, n_centroids=2, seed=3)
    with pytest.raises(ValueError, match="batch_id"):
        ivf_append(ds, idx, "bad/../id")


def test_ivf_append_crash_resume(tmp_path):
    """A data file whose .done marker never landed is invisible to
    queries and gets re-committed by the rerun."""
    import os
    E0, ds0 = _vecs(300, seed=7)
    _, ds1 = _vecs(100, seed=8, start=300)
    idx = str(tmp_path / "ivf")
    ivf_build(ds0, idx, n_centroids=4, seed=3)
    ivf_append(ds1, idx, "b1")
    # simulate a crash: drop one marker, leaving the orphan data file
    victims = [p for p in ivf_list_files(idx) if "data-b1" in p]
    pdir = os.path.dirname(victims[0])
    os.remove(os.path.join(pdir, ".done-b1"))
    assert victims[0] not in ivf_list_files(idx)   # invisible now
    rep = ivf_append(ds1, idx, "b1")               # resume
    assert (~rep["skipped"]).sum() == 1            # only the victim redone
    assert victims[0] in ivf_list_files(idx)


def test_mine_hard_negatives(tmp_path):
    """Negatives = the most similar NON-positive corpus vectors: must
    match brute force minus positives at near-exhaustive probing."""
    from fasta_windows_ray.stages.similarity import mine_hard_negatives
    E, ds = _vecs(600, seed=12)
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx, n_centroids=8, seed=3)
    Q = E[:2].astype(np.float64)
    exact = brute_force_topk(ds, Q, [9001, 9002], k=8)
    positives = {
        9001: exact.loc[exact["query_id"] == 9001, "vec_id"].head(2)
        .tolist(),
        9002: exact.loc[exact["query_id"] == 9002, "vec_id"].head(3)
        .tolist()}
    negs = mine_hard_negatives(idx, Q, [9001, 9002], positives,
                               k=5, nprobe=7)
    for qid in (9001, 9002):
        got = negs.loc[negs["query_id"] == qid, "vec_id"].tolist()
        assert len(got) == 5
        assert not (set(got) & set(positives[qid]))        # no positives
        want = [v for v in
                exact.loc[exact["query_id"] == qid, "vec_id"].tolist()
                if v not in positives[qid]][:5]
        assert len(set(got) & set(want)) >= 4              # IVF recall
    assert (negs.groupby("query_id")["rank"].apply(
        lambda r: r.tolist() == [1, 2, 3, 4, 5]).all())
