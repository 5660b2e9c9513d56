"""Product-quantization gates: codebook determinism, ADC == decoded-dot
identity, reconstruction sanity, end-to-end IVF-PQ recall vs brute force,
byte shrinkage vs the float index, PQ append compatibility."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.stages.similarity import (
    adc_scores, brute_force_topk, ivf_append, ivf_build, ivf_list_files,
    ivf_query, pq_decode, pq_encode, pq_train, _norm_rows)

pytestmark = pytest.mark.usefixtures("ray_session")


def _vecs(n, d=32, seed=11, start=0, clusters=8, centers_seed=None):
    """Clustered unit vectors (realistic for embeddings). Pass
    ``centers_seed`` to draw fresh samples from the SAME cluster
    distribution (appends must match the build distribution — the
    frozen-centroid drift caveat is ivf_append's documented contract)."""
    crng = np.random.default_rng(centers_seed
                                 if centers_seed is not None else seed)
    centers = crng.standard_normal((clusters, d))
    rng = np.random.default_rng(seed)
    E = centers[rng.integers(0, clusters, n)] \
        + 0.3 * rng.standard_normal((n, d))
    E = E.astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
        "embedding": pa.array(list(E))}))
    return E, ds


def test_pq_train_deterministic_and_shapes():
    X = _norm_rows(np.random.default_rng(1).standard_normal((400, 32)))
    b1 = pq_train(X, m=4, n_codes=64, seed=5)
    b2 = pq_train(X, m=4, n_codes=64, seed=5)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (4, 64, 8)
    codes = pq_encode(X, b1)
    assert codes.shape == (400, 4) and codes.dtype == np.uint8


def test_adc_equals_decoded_dot():
    rng = np.random.default_rng(2)
    X = _norm_rows(rng.standard_normal((300, 24)))
    books = pq_train(X, m=4, n_codes=32, seed=3)
    codes = pq_encode(X, books)
    q = _norm_rows(rng.standard_normal((1, 24)))[0]
    adc = adc_scores(codes, q, books)
    direct = pq_decode(codes, books) @ q
    np.testing.assert_allclose(adc, direct, rtol=0, atol=1e-12)


def test_reconstruction_beats_random_codes():
    rng = np.random.default_rng(4)
    X = _norm_rows(rng.standard_normal((500, 32)))
    books = pq_train(X, m=8, n_codes=64, seed=3)
    codes = pq_encode(X, books)
    err = np.linalg.norm(pq_decode(codes, books) - X, axis=1).mean()
    rand = rng.integers(0, 64, codes.shape).astype(np.uint8)
    err_rand = np.linalg.norm(pq_decode(rand, books) - X, axis=1).mean()
    assert err < 0.6 * err_rand
    assert err < 0.5          # unit vectors: decent quantization


def test_pq_rejects_bad_config():
    X = np.zeros((10, 10))
    with pytest.raises(ValueError):
        pq_train(X, m=3)          # 10 % 3 != 0
    with pytest.raises(ValueError):
        pq_train(X, m=2, n_codes=512)


def test_ivf_pq_recall_and_bytes(tmp_path):
    E, ds = _vecs(1200, d=32, seed=11)
    idx_pq = str(tmp_path / "pq")
    idx_fl = str(tmp_path / "fl")
    ivf_build(ds, idx_pq, n_centroids=8, seed=3, pq_m=16)
    ivf_build(ds, idx_fl, n_centroids=8, seed=3)
    assert os.path.exists(os.path.join(idx_pq, "pq_codebooks.npy"))

    Q = E[:5].astype(np.float64)
    qids = list(range(5))
    res = ivf_query(idx_pq, Q, qids, k=10, nprobe=8)
    exact = brute_force_topk(ds, Q, qids, k=10)
    hits = 0
    for qid in qids:
        got = set(res.loc[res["query_id"] == qid, "vec_id"])
        want = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        hits += len(got & want)
    assert hits / (10 * len(qids)) >= 0.7          # lossy codes, high recall

    # the over-fetch contract: the exact top-10 is (almost) contained in
    # the ADC top-30 — callers needing higher recall over-fetch 3x
    wide = ivf_query(idx_pq, Q, qids, k=30, nprobe=8)
    contained = 0
    for qid in qids:
        got = set(wide.loc[wide["query_id"] == qid, "vec_id"])
        want = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        contained += len(got & want)
    assert contained / (10 * len(qids)) >= 0.9

    # byte story: PQ partitions are much smaller than float partitions
    pq_bytes = sum(os.path.getsize(p) for p in ivf_list_files(idx_pq))
    fl_bytes = sum(os.path.getsize(p) for p in ivf_list_files(idx_fl))
    assert pq_bytes < 0.5 * fl_bytes

    # quantize and pq are mutually exclusive
    with pytest.raises(ValueError):
        ivf_build(ds, str(tmp_path / "x"), quantize=True, pq_m=4)


def test_ivf_pq_append(tmp_path):
    E0, ds0 = _vecs(600, d=32, seed=11)
    E1, ds1 = _vecs(200, d=32, seed=12, start=600, centers_seed=11)
    idx = str(tmp_path / "pq")
    ivf_build(ds0, idx, n_centroids=8, seed=3, pq_m=16)
    rep = ivf_append(ds1, idx, "b1")
    assert rep["n_rows"].sum() == 200

    union = rd.from_pandas(pd.concat([
        pd.DataFrame({"vec_id": np.arange(600), "embedding": list(E0)}),
        pd.DataFrame({"vec_id": np.arange(600, 800),
                      "embedding": list(E1)})], ignore_index=True))
    Q = E1[:3].astype(np.float64)
    qids = [600, 601, 602]
    res = ivf_query(idx, Q, qids, k=5, nprobe=7)
    exact = brute_force_topk(union, Q, qids, k=5)
    hits = sum(len(set(res.loc[res["query_id"] == q, "vec_id"])
                   & set(exact.loc[exact["query_id"] == q, "vec_id"]))
               for q in qids)
    assert hits / 15 >= 0.6
