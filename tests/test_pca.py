"""Distributed-PCA gates: components/variance equal a local eigh on the
full data, partition invariance, deterministic signs, transform +
whitening math, reconstruction improves with k."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.similarity import pca_fit, pca_transform

pytestmark = pytest.mark.usefixtures("ray_session")


def data(n=600, d=16, seed=5):
    rng = np.random.default_rng(seed)
    # anisotropic: a few strong directions
    basis = rng.standard_normal((d, d))
    scales = np.linspace(3, 0.1, d)
    X = rng.standard_normal((n, d)) * scales @ basis + rng.normal(2, 1, d)
    return X.astype(np.float64)


def ds_of(X, blocks=5):
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": list(X.astype(np.float32))})).repartition(blocks)


def local_pca(X, k):
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w)[:k]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    return comps * flip[:, None], w[order]


def test_matches_local_eigh():
    X = data()
    Xf = np.stack(ds_of(X).to_pandas()["embedding"].to_numpy()) \
        .astype(np.float64)                   # float32 roundtrip = input
    m = pca_fit(ds_of(X), n_components=4)
    comps, ev = local_pca(Xf, 4)
    np.testing.assert_allclose(m["components"], comps, atol=1e-8)
    np.testing.assert_allclose(m["explained_variance"], ev, rtol=1e-10)
    assert (m["explained_ratio"] > 0).all() and m["explained_ratio"].sum() < 1


def test_partition_invariance():
    X = data(seed=6)
    a = pca_fit(ds_of(X, 1), 3)
    b = pca_fit(ds_of(X, 9), 3)
    np.testing.assert_allclose(a["components"], b["components"], atol=1e-9)
    np.testing.assert_allclose(a["mean"], b["mean"], atol=1e-12)


def test_transform_and_whiten():
    X = data(seed=7)
    m = pca_fit(ds_of(X), 5)
    out = pca_transform(ds_of(X), m, out_col="proj") \
        .to_pandas().sort_values("vec_id")
    Y = np.stack(out["proj"].to_numpy()).astype(np.float64)
    Xf = np.stack(ds_of(X).to_pandas()["embedding"].to_numpy()) \
        .astype(np.float64)
    want = (Xf - m["mean"]) @ m["components"].T
    np.testing.assert_allclose(Y, want, atol=1e-3)   # float32 storage
    # whitened: per-component sample variance ~ 1
    w = pca_transform(ds_of(X), m, out_col="proj", whiten=True) \
        .to_pandas().sort_values("vec_id")
    Z = np.stack(w["proj"].to_numpy()).astype(np.float64)
    np.testing.assert_allclose(Z.var(axis=0, ddof=1), np.ones(5),
                               rtol=1e-2)


def test_reconstruction_improves_with_k():
    X = data(seed=8)
    errs = []
    for k in (2, 8):
        m = pca_fit(ds_of(X), k)
        Y = (X - m["mean"]) @ m["components"].T
        rec = Y @ m["components"] + m["mean"]
        errs.append(np.linalg.norm(X - rec) / np.linalg.norm(X))
    assert errs[1] < errs[0] < 1.0


def test_empty_raises():
    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series(dtype=np.int64),
        "embedding": pd.Series(dtype=object)}))
    with pytest.raises(ValueError):
        pca_fit(empty, 2)
