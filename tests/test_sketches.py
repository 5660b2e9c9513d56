"""Accuracy + partition-invariance gates for the mergeable sketches
(stages/sketches.py) — the approximate scale path cannot hash-match a
SQL oracle, so the gate is (a) error bounds against the EXACT twin
operator on synthetic corpora, (b) invariance of the merged sketch to
how rows were partitioned into batches, (c) kernel-level properties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.stages.sketches import (hll_distinct, hll_estimate,
                                               hll_partial,
                                               tdigest_compress,
                                               tdigest_quantile,
                                               tdigest_quantiles,
                                               windowed_distinct_hll)

pytestmark = pytest.mark.usefixtures("ray_session")


# ---------------------------------------------------------------------------
# HLL kernels
# ---------------------------------------------------------------------------

def _regs_of(keys: pd.Series, p: int) -> np.ndarray:
    regs = np.zeros(1 << p, np.int64)
    idx, rho = hll_partial(keys, p)
    np.maximum.at(regs, idx, rho)
    return regs


def test_hll_estimate_within_standard_error():
    p = 12
    for n in (100, 5_000, 200_000):
        keys = pd.Series([f"user-{i}" for i in range(n)])
        est = hll_estimate(_regs_of(keys, p))
        # 1.04/sqrt(m) ~= 1.6% at p=12; allow 4 sigma
        assert abs(est - n) / n < 4 * 1.04 / np.sqrt(1 << p), (n, est)


def test_hll_merge_is_partition_invariant():
    p = 10
    keys = pd.Series([f"k{i % 700}" for i in range(3000)])
    whole = _regs_of(keys, p)
    merged = np.maximum(_regs_of(keys.iloc[:1111], p),
                        _regs_of(keys.iloc[1111:], p))
    assert (whole == merged).all()


def test_hll_duplicates_do_not_inflate():
    p = 12
    once = hll_estimate(_regs_of(pd.Series([f"u{i}" for i in range(1000)]), p))
    many = hll_estimate(_regs_of(
        pd.Series([f"u{i % 1000}" for i in range(50_000)]), p))
    assert once == many  # same key set -> identical registers


# ---------------------------------------------------------------------------
# HLL distributed operators vs exact twins
# ---------------------------------------------------------------------------

def _event_frame(n=20_000, n_users=3_000, seed=5):
    rng = np.random.default_rng(seed)
    ts = (np.sort(rng.integers(0, 40, n).cumsum())
          * 50_000).astype("datetime64[us]")
    users = [f"u{int(i)}" for i in rng.integers(0, n_users, n)]
    return pd.DataFrame({"ts": ts, "user": users})


def test_windowed_distinct_hll_matches_exact_within_bound(ray_session):
    from fasta_windows_ray.stages.analytics import windowed_distinct
    df = _event_frame()
    size_us = 10 * 60 * 1_000_000
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    exact = windowed_distinct(ds, "ts", "user", size_us)
    approx = windowed_distinct_hll(ds, "ts", "user", size_us, p=12)
    m = exact.merge(approx, on="window_start", suffixes=("", "_a"))
    assert len(m) == len(exact) == len(approx)
    # n_events is additive, not sketched — must be EXACT
    assert (m["n_events"] == m["n_events_a"]).all()
    rel = (m["n_users_approx"] - m["n_users"]).abs() / m["n_users"]
    assert rel.max() < 4 * 1.04 / np.sqrt(1 << 12)


def test_hll_distinct_grouped(ray_session):
    rng = np.random.default_rng(11)
    langs = ["en", "fr", "de"]
    true = {"en": 4000, "fr": 900, "de": 50}
    rows = [{"lang": g, "user": f"{g}-{int(i)}"}
            for g in langs for i in rng.integers(0, true[g], true[g] * 3)]
    ds = rd.from_items(rows).repartition(6)
    out = hll_distinct(ds, "user", ["lang"], p=12).to_pandas()
    got = dict(zip(out["lang"], out["n_distinct_approx"]))
    # exact distinct per group from the same rows
    exact = pd.DataFrame(rows).groupby("lang")["user"].nunique()
    for g in langs:
        assert abs(got[g] - exact[g]) / exact[g] < 4 * 1.04 / np.sqrt(1 << 12)


def test_hll_distinct_ungrouped(ray_session):
    ds = rd.from_items([{"k": f"x{i % 2500}"} for i in range(10_000)])
    out = hll_distinct(ds, "k", None, p=12).to_pandas()
    assert len(out) == 1
    assert abs(out["n_distinct_approx"].iloc[0] - 2500) / 2500 < 0.07


# ---------------------------------------------------------------------------
# t-digest kernels
# ---------------------------------------------------------------------------

def test_tdigest_compress_preserves_mass_and_mean():
    rng = np.random.default_rng(3)
    v = rng.normal(10, 4, 50_000)
    m, w = tdigest_compress(v, np.ones(len(v)), 200)
    assert len(m) <= 120  # ~delta/2 + tails
    assert w.sum() == pytest.approx(len(v))
    assert (m * w).sum() / w.sum() == pytest.approx(v.mean())
    assert (np.diff(m) >= 0).all()


def test_tdigest_quantile_exact_on_tiny_input():
    v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    m, w = tdigest_compress(v, np.ones(5), 200)
    # 5 points at delta=200 stay singleton centroids -> exact interp
    assert tdigest_quantile(m, w, [0.5])[0] == pytest.approx(3.0)
    assert tdigest_quantile(m, w, [0.0])[0] <= 1.0 + 1e-9
    assert tdigest_quantile(m, w, [1.0])[0] >= 5.0 - 1e-9


def _rank_error(sample: np.ndarray, est: float, q: float) -> float:
    return abs(np.searchsorted(np.sort(sample), est) / len(sample) - q)


@pytest.mark.parametrize("dist", ["uniform", "zipfish", "normal"])
def test_tdigest_rank_error_bound(dist):
    rng = np.random.default_rng(17)
    n = 200_000
    v = {"uniform": rng.uniform(0, 1, n),
         "zipfish": rng.pareto(1.3, n),
         "normal": rng.normal(0, 1, n)}[dist]
    m, w = tdigest_compress(v, np.ones(n), 200)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = tdigest_quantile(m, w, [q])[0]
        assert _rank_error(v, est, q) < 0.02, (dist, q)


# ---------------------------------------------------------------------------
# t-digest distributed operator
# ---------------------------------------------------------------------------

def test_tdigest_quantiles_distributed_and_partition_stable(ray_session):
    rng = np.random.default_rng(23)
    v = rng.lognormal(1.0, 0.8, 60_000)
    qs = [0.1, 0.5, 0.9, 0.99]
    a = tdigest_quantiles(
        rd.from_arrow(pa.table({"x": v})).repartition(4), "x", qs)
    b = tdigest_quantiles(
        rd.from_arrow(pa.table({"x": v})).repartition(13), "x", qs)
    for q, est in zip(a["q"], a["value"]):
        assert _rank_error(v, est, q) < 0.02
    # partitioning changes which batch each centroid came from; the
    # canonical re-sort in the merge keeps estimates tightly stable
    assert np.allclose(a["value"], b["value"], rtol=0.02)


def test_tdigest_quantiles_grouped(ray_session):
    rng = np.random.default_rng(29)
    rows = pd.DataFrame({
        "g": np.repeat(["a", "b"], 30_000),
        "x": np.concatenate([rng.normal(0, 1, 30_000),
                             rng.normal(100, 5, 30_000)])})
    out = tdigest_quantiles(
        rd.from_arrow(pa.Table.from_pandas(rows)).repartition(7),
        "x", [0.5], group_col="g")
    med = dict(zip(out["g"], out["value"]))
    assert abs(med["a"] - 0.0) < 0.1
    assert abs(med["b"] - 100.0) < 0.5


def test_tdigest_empty_and_single(ray_session):
    out = tdigest_quantiles(
        rd.from_arrow(pa.table({"x": pa.array([], pa.float64())})),
        "x", [0.5])
    assert np.isnan(out["value"]).all()
    one = tdigest_quantiles(
        rd.from_arrow(pa.table({"x": [7.0]})), "x", [0.0, 0.5, 1.0])
    assert (one["value"] == 7.0).all()


def test_windowed_quantiles_error_bound(ray_session):
    import ray.data as rd
    from fasta_windows_ray.stages.sketches import windowed_quantiles
    rng = np.random.default_rng(12)
    n = 40_000
    US = 1_000_000
    df = pd.DataFrame({
        "ts": pd.to_datetime(rng.integers(0, 6 * 3600, n) * US, unit="us"),
        "lat": rng.lognormal(3.0, 1.0, n)})
    got = windowed_quantiles(
        rd.from_pandas([d for d in np.array_split(df, 9)]),
        "ts", "lat", size_us=3600 * US, qs=[0.5, 0.95, 0.99])
    ts_us = df["ts"].astype("datetime64[us]").astype("int64")
    df2 = df.assign(w=(ts_us // (3600 * US)) * 3600 * US)
    assert set(got["window_start"]) == set(df2["w"])
    for w, sub in df2.groupby("w"):
        vals = np.sort(sub["lat"].to_numpy())
        for q in (0.5, 0.95, 0.99):
            approx = float(got[(got["window_start"] == w)
                               & (got["q"] == q)]["value"].iloc[0])
            # rank error: position of approx within the exact sorted
            # values must be within ~1.5% of q (k1 bound at delta=200)
            rank = np.searchsorted(vals, approx) / len(vals)
            assert abs(rank - q) < 0.02, (w, q, rank)


def test_windowed_quantiles_empty(ray_session):
    import ray.data as rd
    from fasta_windows_ray.stages.sketches import windowed_quantiles
    empty = rd.from_pandas(pd.DataFrame({
        "ts": pd.Series(dtype="datetime64[us]"),
        "lat": pd.Series(dtype=float)}))
    out = windowed_quantiles(empty, "ts", "lat", 1000, [0.5])
    assert out.empty and list(out.columns) == ["window_start", "q",
                                               "value"]
