"""Drift-detection gates: PSI ~0 on identically-distributed snapshots,
large under a planted shift, binned-KS matches the scipy-free exact
computation on discrete data, categorical drift catches new categories,
partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.drift import (categorical_drift, drift_report,
                                            numeric_drift, psi)

pytestmark = pytest.mark.usefixtures("ray_session")


def num_ds(vals, blocks=4):
    return rd.from_pandas(pd.DataFrame({"x": np.asarray(vals, np.float64)})) \
        .repartition(blocks)


def cat_ds(vals, blocks=4):
    return rd.from_pandas(pd.DataFrame({"c": list(vals)})).repartition(blocks)


def test_psi_zero_iff_identical():
    assert psi([10, 20, 30], [10, 20, 30]) == pytest.approx(0, abs=1e-9)
    assert psi([1, 2, 3], [2, 4, 6]) == pytest.approx(0, abs=1e-9)  # scaled
    assert psi([10, 0, 0], [0, 0, 10]) > 1.0
    assert np.isnan(psi([0, 0], [1, 2]))


def test_numeric_no_drift_vs_planted_shift():
    rng = np.random.default_rng(3)
    ref = rng.normal(0, 1, 20000)
    same = rng.normal(0, 1, 20000)
    shifted = rng.normal(1.2, 1, 20000)
    d_same = numeric_drift(num_ds(ref), num_ds(same), "x")
    d_shift = numeric_drift(num_ds(ref), num_ds(shifted), "x")
    assert d_same["psi"] < 0.02
    assert d_shift["psi"] > 0.25          # "major shift" threshold
    assert d_same["ks_binned"] < 0.02
    assert d_shift["ks_binned"] > 0.3


def test_binned_ks_exact_on_discrete_data():
    # integer-valued data: bin edges land on the values, binned KS == exact KS
    ref = np.repeat([0, 1, 2, 3, 4], 200)
    cur = np.repeat([0, 1, 2, 3, 4], [100, 100, 200, 300, 300])
    d = numeric_drift(num_ds(ref), num_ds(cur), "x", bins=5)
    # exact KS over the discrete support
    cdf_r = np.cumsum([200] * 5) / 1000
    cdf_c = np.cumsum([100, 100, 200, 300, 300]) / 1000
    assert d["ks_binned"] == pytest.approx(np.abs(cdf_r - cdf_c).max())


def test_partition_stability():
    """Edges come from a t-digest, whose centroids shift slightly with
    batch boundaries — the CONTRACT is verdict stability across
    partitionings (PSI within ~10%, same threshold bucket), not
    bit-equality."""
    rng = np.random.default_rng(5)
    ref, cur = rng.normal(0, 1, 5000), rng.normal(0.5, 1, 5000)
    a = numeric_drift(num_ds(ref, 1), num_ds(cur, 1), "x")
    b = numeric_drift(num_ds(ref, 9), num_ds(cur, 9), "x")
    assert a["psi"] == pytest.approx(b["psi"], rel=0.1)
    assert a["ks_binned"] == pytest.approx(b["ks_binned"], abs=0.02)
    assert (a["psi"] > 0.1) == (b["psi"] > 0.1)


def test_categorical_drift_and_new_categories():
    ref = ["en"] * 700 + ["de"] * 200 + ["fr"] * 100
    same = ["en"] * 350 + ["de"] * 100 + ["fr"] * 50
    moved = ["en"] * 100 + ["de"] * 200 + ["zz"] * 700
    d_same = categorical_drift(cat_ds(ref), cat_ds(same), "c")
    d_move = categorical_drift(cat_ds(ref), cat_ds(moved), "c")
    assert d_same["psi"] < 1e-6 and d_same["new_categories"] == 0
    assert d_move["psi"] > 0.25 and d_move["new_categories"] == 1


def test_nulls_fold_to_sentinel_category():
    ref = ["a", "a", None, "b"]
    cur = [None, None, "a", "b"]
    d = categorical_drift(cat_ds(ref), cat_ds(cur), "c")
    assert np.isfinite(d["psi"]) and d["new_categories"] == 0


def test_drift_report_shape():
    rng = np.random.default_rng(7)
    mk = lambda mu: rd.from_pandas(pd.DataFrame({
        "x": rng.normal(mu, 1, 2000),
        "lang": rng.choice(["en", "de"], 2000)}))
    rep = drift_report(mk(0), mk(2), numeric_cols=["x"],
                       categorical_cols=["lang"])
    assert list(rep["column"]) == ["x", "lang"]
    assert rep.loc[0, "psi"] > 0.25
    assert rep.loc[1, "psi"] < 0.05
    assert np.isnan(rep.loc[1, "ks_binned"])


def test_constant_column_degenerate_edges():
    d = numeric_drift(num_ds([5.0] * 100), num_ds([5.0] * 100), "x")
    assert d["psi"] == pytest.approx(0, abs=1e-9)
