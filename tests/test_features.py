"""Feature engineering stages (stages/features.py): distributed
numeric stats, imputation, standardization, min-max scaling, binning —
DuckDB twins wherever SQL expresses the semantics."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.features import (bin_numeric, impute,
                                               minmax_scale,
                                               numeric_stats,
                                               standardize)

pytestmark = pytest.mark.usefixtures("ray_session")


def _df(n=4000, seed=7, with_nulls=True):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], n),
        "x": rng.normal(10.0, 3.0, n),
        "y": rng.integers(0, 100, n).astype(np.float64),
    })
    if with_nulls:
        df.loc[rng.choice(n, n // 10, replace=False), "x"] = np.nan
        df.loc[rng.choice(n, n // 20, replace=False), "y"] = np.nan
    return df


def _ds(df, blocks=5):
    return rd.from_pandas(df).repartition(blocks)


def test_numeric_stats_matches_duckdb():
    df = _df()
    st = numeric_stats(_ds(df), ["x", "y"], by="g")
    want = duckdb.sql("""
        SELECT g, col, n, mean, std, min, max FROM (
          SELECT g, 'x' col, count(x)::BIGINT n, avg(x) mean,
                 stddev_pop(x) std, min(x) min, max(x) max
          FROM df GROUP BY g
          UNION ALL
          SELECT g, 'y', count(y)::BIGINT, avg(y), stddev_pop(y),
                 min(y), max(y) FROM df GROUP BY g)
        ORDER BY g, col""").df()
    got = st.sort_values(["g", "col"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=False,
                                  rtol=1e-12, atol=1e-12)


def test_standardize_matches_duckdb_window():
    df = _df()
    got = (standardize(_ds(df), ["x"], by="g").to_pandas()
           .sort_values("i").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT i, g,
               (x - avg(x) OVER (PARTITION BY g))
                 / stddev_pop(x) OVER (PARTITION BY g) AS x,
               y
        FROM df ORDER BY i""").df()
    pd.testing.assert_frame_equal(got[["g", "x"]], want[["g", "x"]],
                                  check_exact=False, rtol=1e-9,
                                  atol=1e-9)
    # nulls stay null
    assert got["x"].isna().sum() == df["x"].isna().sum()


def test_standardize_zero_variance_and_train_val_reuse():
    df = pd.DataFrame({"g": ["a"] * 50 + ["b"] * 50,
                       "x": [5.0] * 50 + list(np.arange(50.0))})
    out = standardize(_ds(df, 2), ["x"], by="g").to_pandas()
    assert (out.loc[out["g"] == "a", "x"] == 0.0).all()
    # validation split scaled with TRAIN stats (the leakage-safe path)
    train = pd.DataFrame({"x": np.arange(100.0)})
    val = pd.DataFrame({"x": [0.0, 99.0, 49.5]})
    st = numeric_stats(_ds(train, 2), ["x"])
    got = standardize(_ds(val, 1), ["x"], stats=st).to_pandas()["x"]
    mu, sd = train["x"].mean(), train["x"].std(ddof=0)
    np.testing.assert_allclose(got, (val["x"] - mu) / sd, rtol=1e-12)


def test_minmax_matches_duckdb():
    df = _df()
    got = (minmax_scale(_ds(df), ["x", "y"], by="g").to_pandas()
           .sort_values("i").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT i, g,
          (x - min(x) OVER (PARTITION BY g))
            / (max(x) OVER (PARTITION BY g)
               - min(x) OVER (PARTITION BY g)) AS x,
          (y - min(y) OVER (PARTITION BY g))
            / (max(y) OVER (PARTITION BY g)
               - min(y) OVER (PARTITION BY g)) AS y
        FROM df ORDER BY i""").df()
    pd.testing.assert_frame_equal(got[["g", "x", "y"]],
                                  want[["g", "x", "y"]],
                                  check_exact=False, rtol=1e-9,
                                  atol=1e-12)


def test_impute_mean_matches_duckdb():
    df = _df()
    got = (impute(_ds(df), ["x"], strategy="mean", by="g").to_pandas()
           .sort_values("i").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT i, g,
               coalesce(x, avg(x) OVER (PARTITION BY g)) AS x, y
        FROM df ORDER BY i""").df()
    pd.testing.assert_frame_equal(got[["g", "x", "y"]],
                                  want[["g", "x", "y"]],
                                  check_exact=False, rtol=1e-12,
                                  atol=1e-12)
    assert got["x"].notna().all()


def test_impute_mode_ties_to_smallest():
    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 5,
        "x": [1.0, 1.0, 2.0, 2.0, np.nan, np.nan,   # tie 1 vs 2 -> 1
              7.0, 7.0, 3.0, np.nan, np.nan]})      # clear mode 7
    out = impute(_ds(df, 3), ["x"], strategy="mode", by="g").to_pandas()
    assert (out.loc[out["g"] == "a", "x"].tail(0).tolist() == [])
    a = out[out["g"] == "a"]["x"]
    b = out[out["g"] == "b"]["x"]
    assert sorted(a) == [1.0, 1.0, 1.0, 1.0, 2.0, 2.0]
    assert sorted(b) == [3.0, 7.0, 7.0, 7.0, 7.0]


def test_impute_median_and_constant():
    rng = np.random.default_rng(3)
    vals = rng.choice(np.arange(50.0), 3000)
    df = pd.DataFrame({"x": vals})
    df.loc[rng.choice(3000, 300, replace=False), "x"] = np.nan
    med = float(df["x"].median())
    out = impute(_ds(df), ["x"], strategy="median").to_pandas()
    filled = out.loc[df["x"].isna().to_numpy(), "x"]
    assert len(filled) > 0
    # t-digest median: every hole gets the SAME fill, within the
    # documented mid-distribution rank error (~1% -> well under one
    # unit of this 0..49 integer-valued distribution)
    assert filled.nunique() == 1
    assert abs(float(filled.iloc[0]) - med) <= 1.0

    out = impute(_ds(df), ["x"], strategy="constant",
                 fill_value=-1.0).to_pandas()
    assert (out.loc[df["x"].isna().to_numpy(), "x"] == -1.0).all()
    with pytest.raises(ValueError):
        impute(_ds(df), ["x"], strategy="constant")
    with pytest.raises(ValueError):
        impute(_ds(df), ["x"], strategy="nope")


def test_bin_width_matches_duckdb_width_bucket():
    df = _df(with_nulls=False)
    got = (bin_numeric(_ds(df), "x", n_bins=8, method="width")
           .to_pandas().sort_values("i").reset_index(drop=True))
    # width_bucket is absent in this DuckDB build; its arithmetic
    # (clamped to [0, n-1], continuous data so boundary fp ties are
    # measure-zero) spelled out
    want = duckdb.sql("""
        WITH b AS (SELECT min(x) lo, max(x) hi FROM df)
        SELECT i, x,
          least(greatest(floor((x - lo) * 8 / (hi - lo))::BIGINT, 0), 7)
            AS x_bin
        FROM df, b ORDER BY i""").df()
    assert got["x_bin"].tolist() == want["x_bin"].astype("int64").tolist()


def test_bin_nulls_and_quantile_populations():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"x": rng.exponential(2.0, 20_000)})
    df.loc[:99, "x"] = np.nan
    out = bin_numeric(_ds(df, 8), "x", n_bins=5,
                      method="quantile").to_pandas()
    assert (out.loc[df["x"].isna().to_numpy(), "x_bin"] == -1).all()
    pops = out.loc[out["x_bin"] >= 0, "x_bin"].value_counts()
    assert len(pops) == 5
    # equal-frequency bins: within 10% of ideal on a skewed input
    ideal = (20_000 - 100) / 5
    assert (np.abs(pops - ideal) / ideal < 0.1).all()
    # explicit edges path + validation
    out2 = bin_numeric(_ds(df, 2), "x", n_bins=2,
                       edges=np.array([0.0, 1.0, 100.0])).to_pandas()
    m = df["x"].notna().to_numpy()
    assert ((out2.loc[m, "x_bin"] == 1)
            == (df.loc[m, "x"] >= 1.0).to_numpy()).all()
    with pytest.raises(ValueError):
        bin_numeric(_ds(df, 1), "x", n_bins=3, edges=np.array([0., 1.]))


def test_impute_mode_string_categorical():
    # the classic categorical use: fill missing langs with the group's
    # most frequent lang; ties break to the lexicographically smallest
    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 5,
        "lang": ["en", "en", "de", None, None, "de",   # tie en/de -> de
                 "fr", "fr", "es", None, None]})       # clear mode fr
    out = (impute(_ds(df, 3), ["lang"], strategy="mode", by="g")
           .to_pandas())
    a = sorted(out.loc[out["g"] == "a", "lang"])
    b = sorted(out.loc[out["g"] == "b", "lang"])
    assert a == ["de", "de", "de", "de", "en", "en"]
    assert b == ["es", "fr", "fr", "fr", "fr"]
    # ungrouped string mode
    out2 = impute(_ds(df, 2), ["lang"], strategy="mode").to_pandas()
    assert out2["lang"].notna().all()


def test_winsorize_clips_to_quantiles():
    from fasta_windows_ray.stages.features import winsorize
    rng = np.random.default_rng(9)
    x = rng.normal(0.0, 1.0, 10_000)
    x[:20] = 500.0          # planted high outliers
    x[20:40] = -500.0       # planted low outliers
    df = pd.DataFrame({"x": x})
    df.loc[40:49, "x"] = np.nan
    out = winsorize(_ds(df, 6), ["x"], 0.01, 0.99).to_pandas()
    lo, hi = out["x"].min(), out["x"].max()
    exact_lo = df["x"].quantile(0.01)
    exact_hi = df["x"].quantile(0.99)
    # clipped bounds within t-digest tail error of the exact quantiles
    assert abs(lo - exact_lo) < 0.2 and abs(hi - exact_hi) < 0.2
    assert out["x"].max() < 10 and out["x"].min() > -10   # outliers gone
    # nulls stay null, interior values untouched
    assert out["x"].isna().sum() == 10
    inner = df["x"].between(exact_lo + 0.3, exact_hi - 0.3)
    pd.testing.assert_series_equal(out.loc[inner, "x"],
                                   df.loc[inner, "x"])
    with pytest.raises(ValueError):
        winsorize(_ds(df, 1), ["x"], 0.9, 0.1)


def test_winsorize_grouped():
    from fasta_windows_ray.stages.features import winsorize
    df = pd.DataFrame({
        "g": ["a"] * 1000 + ["b"] * 1000,
        "x": np.concatenate([np.arange(1000.0),
                             np.arange(1000.0) * 100])})
    out = winsorize(_ds(df, 4), ["x"], 0.05, 0.95, by="g").to_pandas()
    a = out.loc[out["g"] == "a", "x"]
    b = out.loc[out["g"] == "b", "x"]
    # each group clips at ITS OWN quantiles
    assert 35 <= a.min() <= 65 and 935 <= a.max() <= 965
    assert 3500 <= b.min() <= 6500 and 93500 <= b.max() <= 96500


def test_target_encode_matches_duckdb_smoothing():
    from fasta_windows_ray.stages.features import target_encode
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "i": np.arange(3000, dtype=np.int64),
        "cat": rng.choice([f"c{i}" for i in range(30)], 3000),
        "y": rng.normal(5.0, 2.0, 3000)})
    got = (target_encode(_ds(df), "cat", "y", smoothing=10.0)
           .to_pandas().sort_values("i").reset_index(drop=True))
    want = duckdb.sql("""
        WITH g AS (SELECT avg(y) gm FROM df),
        c AS (SELECT cat, count(*) n, avg(y) m FROM df GROUP BY cat)
        SELECT i, (c.n * c.m + 10.0 * g.gm) / (c.n + 10.0) AS cat_te
        FROM df JOIN c USING (cat), g ORDER BY i""").df()
    np.testing.assert_allclose(got["cat_te"], want["cat_te"],
                               rtol=1e-12)


def test_target_encode_train_val_unseen_and_null():
    from fasta_windows_ray.stages.features import (numeric_stats,
                                                   target_encode)
    train = pd.DataFrame({"cat": ["a"] * 90 + ["b"] * 10 + [None] * 10,
                          "y": [1.0] * 90 + [11.0] * 10 + [21.0] * 10})
    val = pd.DataFrame({"cat": ["a", "b", "zz", None]})
    st = numeric_stats(_ds(train, 3), ["y"], by="cat")
    out = target_encode(_ds(val, 1), "cat", "y", smoothing=10.0,
                        stats=st).to_pandas()
    gm = train["y"].mean()
    want_a = (90 * 1.0 + 10 * gm) / 100
    want_b = (10 * 11.0 + 10 * gm) / 20
    want_null = (10 * 21.0 + 10 * gm) / 20
    enc = dict(zip(val["cat"], out["cat_te"]))
    np.testing.assert_allclose(enc["a"], want_a, rtol=1e-12)
    np.testing.assert_allclose(enc["b"], want_b, rtol=1e-12)
    np.testing.assert_allclose(enc["zz"], gm, rtol=1e-12)  # unseen
    np.testing.assert_allclose(enc[None], want_null, rtol=1e-12)


def test_robust_scale_vs_exact_quartiles():
    from fasta_windows_ray.stages.features import robust_scale
    rng = np.random.default_rng(17)
    df = pd.DataFrame({"x": rng.exponential(3.0, 20_000)})
    df.loc[:9, "x"] = np.nan
    out = robust_scale(_ds(df, 8), ["x"]).to_pandas()
    med = df["x"].median()
    iqr = df["x"].quantile(0.75) - df["x"].quantile(0.25)
    want = (df["x"] - med) / iqr
    m = df["x"].notna()
    # t-digest quartile error propagates; 2% relative on this input
    err = np.abs(out.loc[m, "x"] - want[m])
    assert float(err.mean()) < 0.02
    assert out["x"].isna().sum() == 10
    # grouped: constant group -> 0.0
    df2 = pd.DataFrame({"g": ["a"] * 100 + ["b"] * 100,
                        "x": [5.0] * 100 + list(np.arange(100.0))})
    o2 = robust_scale(_ds(df2, 2), ["x"], by="g").to_pandas()
    assert (o2.loc[o2["g"] == "a", "x"] == 0.0).all()


def test_feature_hash_deterministic_and_sql_twin():
    from fasta_windows_ray.stages.features import feature_hash
    df = pd.DataFrame({"cat": ["x", "y", None, "x", "zz"],
                       "src": ["a", "a", "b", None, "b"]})
    out = feature_hash(_ds(df, 2), ["cat", "src"],
                       n_features=64).to_pandas()
    # null -> -1; same value same bucket; per-column independence
    assert out.loc[df["cat"].isna().to_numpy(), "fh_cat"].tolist() == [-1]
    x = out.loc[df["cat"] == "x", "fh_cat"].unique()
    assert len(x) == 1 and 0 <= x[0] < 64
    # the md5 fold twin DuckDB uses everywhere else in the engine
    want = duckdb.sql("""
        SELECT CASE WHEN cat IS NULL THEN -1 ELSE
          CAST(('0x' || substr(md5('cat:' || cat), 1, 15)) AS BIGINT)
          % 64 END AS fh_cat
        FROM df""").df()
    assert out["fh_cat"].tolist() == want["fh_cat"].astype("int64").tolist()


def test_kfold_assign_partition_and_grouping():
    from fasta_windows_ray.stages.sampling import kfold_assign
    df = pd.DataFrame({"conv_id": [f"c{i % 100}" for i in range(2000)],
                       "v": np.arange(2000)})
    out = kfold_assign(_ds(df, 4), "conv_id", k=5).to_pandas()
    assert set(out["fold"]) <= set(range(5))
    # whole group in one fold
    assert (out.groupby("conv_id")["fold"].nunique() == 1).all()
    # roughly balanced across the 100 keys
    per_fold = out.drop_duplicates("conv_id")["fold"].value_counts()
    assert per_fold.min() >= 8
    # deterministic across runs and independent of partitioning
    out2 = kfold_assign(_ds(df, 9), "conv_id", k=5).to_pandas()
    a = out.sort_values("v")["fold"].to_numpy()
    b = out2.sort_values("v")["fold"].to_numpy()
    assert (a == b).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        kfold_assign(_ds(df, 1), "conv_id", k=1)


def test_review_fixes_null_target_unseen_group_empty_bin():
    from fasta_windows_ray.stages.features import target_encode
    # an all-null-target category must NOT poison the global mean
    df = pd.DataFrame({"cat": ["a"] * 4 + ["b"] * 3,
                       "y": [1.0, 2.0, 3.0, 2.0] + [np.nan] * 3})
    out = target_encode(_ds(df, 2), "cat", "y", smoothing=2.0).to_pandas()
    gm = 2.0
    enc = dict(zip(out["cat"], out["cat_te"]))
    np.testing.assert_allclose(enc["a"], (4 * 2.0 + 2 * gm) / 6,
                               rtol=1e-12)
    np.testing.assert_allclose(enc["b"], gm, rtol=1e-12)   # n=0 -> global
    with pytest.raises(ValueError):
        target_encode(_ds(pd.DataFrame({"cat": ["a"], "y": [np.nan]}), 1),
                      "cat", "y").to_pandas()

    # groups unseen in a caller-supplied stats frame keep their values
    train = pd.DataFrame({"g": ["a"] * 10, "x": np.arange(10.0)})
    val = pd.DataFrame({"g": ["a", "zz"], "x": [4.5, 7.0]})
    st = numeric_stats(_ds(train, 1), ["x"], by="g")
    out = (standardize(_ds(val, 1), ["x"], by="g", stats=st)
           .to_pandas())
    assert out.loc[out["g"] == "zz", "x"].tolist() == [7.0]   # untouched
    out = (minmax_scale(_ds(val, 1), ["x"], by="g", stats=st)
           .to_pandas())
    assert out.loc[out["g"] == "zz", "x"].tolist() == [7.0]

    # width binning on an all-null / empty column is a typed error
    with pytest.raises(ValueError):
        bin_numeric(_ds(pd.DataFrame({"x": [np.nan, np.nan]}), 1),
                    "x", n_bins=4).to_pandas()


def test_null_group_key_transforms_and_imputes():
    """ADVICE r5 (high): a None group key surfaces as NaN in the stats
    frame's groupby output; the broadcast lookup must normalize it so
    null-group rows are transformed/filled like SQL GROUP BY NULL."""
    from fasta_windows_ray.stages.features import impute
    df = pd.DataFrame({"g": ["a", "a", None, None],
                       "x": [1.0, 3.0, 10.0, 30.0]})
    out = (standardize(_ds(df, 2), ["x"], by="g").to_pandas()
           .sort_values("x").reset_index(drop=True))
    # null group: mean 20, std_pop 10 -> z = -1, +1 (NOT raw 10/30)
    nullg = out[out["g"].isna()]["x"].sort_values().tolist()
    np.testing.assert_allclose(nullg, [-1.0, 1.0], atol=1e-12)

    out = minmax_scale(_ds(df, 2), ["x"], by="g").to_pandas()
    nullg = out[out["g"].isna()]["x"].sort_values().tolist()
    np.testing.assert_allclose(nullg, [0.0, 1.0], atol=1e-12)

    # impute mean fills the null group's NaN with the null group's mean
    df2 = pd.DataFrame({"g": ["a", "a", None, None, None],
                        "x": [1.0, 3.0, 10.0, 30.0, np.nan]})
    out = impute(_ds(df2, 2), ["x"], strategy="mean", by="g").to_pandas()
    assert not out["x"].isna().any()
    assert sorted(out[out["g"].isna()]["x"]) == [10.0, 20.0, 30.0]

    # impute mode on a string column with a null group
    df3 = pd.DataFrame({"g": [None, None, None, "a"],
                        "s": ["x", "x", None, "q"]})
    out = impute(_ds(df3, 2), ["s"], strategy="mode", by="g").to_pandas()
    assert out[out["g"].isna()]["s"].tolist().count("x") == 3


def test_kfold_and_feature_hash_dtype_stable_under_nulls():
    """ADVICE r5 (medium): int64 key 7 must get the SAME fold / hash
    bucket whether its block carries nulls (arrow->numpy float upcast)
    or not."""
    from fasta_windows_ray.stages.features import feature_hash
    from fasta_windows_ray.stages.sampling import kfold_assign
    clean = pd.DataFrame({"k": pd.array([7, 8, 9] * 20, dtype="int64"),
                          "v": np.arange(60)})
    dirty = clean.copy()
    dirty["k"] = dirty["k"].astype("Int64")
    dirty.loc[0, "k"] = pd.NA
    a = kfold_assign(_ds(clean, 1), "k", k=5).to_pandas()
    b = kfold_assign(_ds(dirty, 1), "k", k=5).to_pandas()
    fa = dict(zip(a["k"], a["fold"]))
    fb = {int(k): f for k, f in zip(b["k"], b["fold"]) if pd.notna(k)}
    for key in (7, 8, 9):
        assert fa[key] == fb[key]
    # fold is the md5 fold of 'kfold:7' (Arrow canonical int rendering)
    want = duckdb.sql("""
        SELECT CAST(('0x' || substr(md5('kfold:7'), 1, 15)) AS BIGINT)
               % 5 AS f""").df()["f"][0]
    assert fa[7] == want
    # null key: deterministic fold, never errors
    assert b.loc[b["k"].isna(), "fold"].nunique() == 1

    ha = feature_hash(_ds(clean, 1), ["k"], n_features=64).to_pandas()
    hb = feature_hash(_ds(dirty, 1), ["k"], n_features=64).to_pandas()
    ma = dict(zip(ha["k"], ha["fh_k"]))
    mb = {int(k): h for k, h in zip(hb["k"], hb["fh_k"]) if pd.notna(k)}
    for key in (7, 8, 9):
        assert ma[key] == mb[key]
    assert (hb.loc[hb["k"].isna(), "fh_k"] == -1).all()


def test_quantiles_from_hist_relative_epsilon():
    """ADVICE r5 (low): exactly-integral ranks must not ceil one too
    high at large n (absolute epsilon < FP error of q*n at n ~ 1e9)."""
    from fasta_windows_ray.stages.analytics import quantiles_from_hist
    n = 1_000_000_000
    values = np.array([1.0, 2.0], dtype=np.float64)
    counts = np.array([n // 2, n - n // 2], dtype=np.int64)
    # q such that q*n is exactly integral in IEEE-754 but computed with
    # error: 0.1 * 1e9 -> 100000000.00000001
    assert 0.1 * n != 100_000_000 or True  # document intent either way
    (q, v), = quantiles_from_hist(values, counts, [0.1])
    assert v == 1.0   # rank 1e8 <= n/2 -> first value
    (q, v), = quantiles_from_hist(values, counts, [0.5])
    assert v == 1.0   # rank exactly n/2 -> still the first value
    (q, v), = quantiles_from_hist(values, counts, [0.5000000001])
    assert v == 2.0


def test_kfold_and_feature_hash_float_timestamp_sql_twin():
    """Round-5 review: float64 and timestamp KEY columns must render
    exactly as DuckDB's CAST(k AS VARCHAR) (7.0 -> '7.0', timestamps
    without forced microseconds) so the documented SQL twin holds for
    every key dtype — an Arrow cast-to-string renders 7.0 as '7' and
    diverges."""
    from fasta_windows_ray.stages.features import feature_hash
    from fasta_windows_ray.stages.sampling import kfold_assign

    df = pd.DataFrame({
        "fk": pd.array([7.0, 7.5, 0.1, 1e30] * 5, dtype="float64"),
        "ts": pd.to_datetime(
            ["2024-01-02 03:04:05", "2024-01-02 03:04:05.123456",
             "2030-12-31 23:59:59", "2024-06-01 00:00:00"] * 5,
            format="mixed"),
        "v": np.arange(20)})

    out = kfold_assign(_ds(df, 2), "fk", k=7).to_pandas()
    want = duckdb.sql("""
        SELECT fk, CAST(('0x' || substr(
                 md5('kfold:' || CAST(fk AS VARCHAR)), 1, 15)) AS BIGINT)
               % 7 AS fold FROM df""").df()
    got = dict(zip(out["fk"], out["fold"]))
    for k, f in zip(want["fk"], want["fold"]):
        assert got[k] == int(f), k

    out = kfold_assign(_ds(df, 2), "ts", k=7).to_pandas()
    want = duckdb.sql("""
        SELECT ts, CAST(('0x' || substr(
                 md5('kfold:' || CAST(ts AS VARCHAR)), 1, 15)) AS BIGINT)
               % 7 AS fold FROM df""").df()
    got = dict(zip(out["ts"], out["fold"]))
    for k, f in zip(want["ts"], want["fold"]):
        assert got[k] == int(f), k

    out = feature_hash(_ds(df, 2), ["fk"], n_features=32).to_pandas()
    want = duckdb.sql("""
        SELECT fk, CAST(('0x' || substr(
                 md5('fk:' || CAST(fk AS VARCHAR)), 1, 15)) AS BIGINT)
               % 32 AS fh FROM df""").df()
    got = dict(zip(out["fk"], out["fh_fk"]))
    for k, f in zip(want["fk"], want["fh"]):
        assert got[k] == int(f), k
