"""Gates for the one-pass dataset profiler (stages/profile.py):
exact fields match pandas ground truth exactly; sketch fields stay
inside their published error bounds; the whole profile is invariant
to how rows were partitioned into blocks; nulls and empty inputs are
typed correctly."""

import json

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.profile import dataset_profile

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(n=20_000, seed=7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    lang = rng.choice(["en", "de", "fr", "ja", None], n,
                      p=[0.6, 0.2, 0.1, 0.05, 0.05])
    score = rng.lognormal(0.0, 1.0, n)
    score[rng.rand(n) < 0.02] = np.nan
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": pd.array(lang, dtype=object),
        "score": score,
        "text": [f"doc {i % 997} body" * (1 + i % 4) for i in range(n)],
        "ts": pd.to_datetime("2026-01-01")
        + pd.to_timedelta(rng.randint(0, 86_400, n), unit="s"),
    })


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.fixture(scope="module")
def profile(corpus):
    ds = rd.from_pandas(corpus).repartition(8)
    return dataset_profile(ds).set_index("column")


def test_exact_fields_match_pandas(corpus, profile):
    n = len(corpus)
    for col in ("doc_id", "score", "ts", "lang", "text"):
        row = profile.loc[col]
        assert row["count"] == n
        assert row["null_count"] == int(corpus[col].isna().sum())
    s = corpus["score"].dropna()
    row = profile.loc["score"]
    assert row["min"] == s.min() and row["max"] == s.max()
    assert abs(row["mean"] - s.mean()) < 1e-9
    assert abs(row["std"] - s.std(ddof=0)) < 1e-9
    # timestamps profile as int64 microseconds
    ts = corpus["ts"].astype("datetime64[us]").astype("int64")
    row = profile.loc["ts"]
    assert row["min"] == ts.min() and row["max"] == ts.max()


def test_string_length_and_top_values(corpus, profile):
    row = profile.loc["lang"]
    lens = corpus["lang"].dropna().str.len()
    assert row["min_len"] == lens.min() and row["max_len"] == lens.max()
    assert abs(row["avg_len"] - lens.mean()) < 1e-9
    top = dict(map(tuple, json.loads(row["top_values"])))
    exact = corpus["lang"].value_counts()
    # cardinality (4) << capacity, so counts must be provably exact
    assert row["top_values_err_bound"] == 0
    assert top == exact.to_dict()
    # text column: 997 distinct values, still under capacity -> exact
    trow = profile.loc["text"]
    assert trow["top_values_err_bound"] == 0
    ttop = json.loads(trow["top_values"])
    texact = corpus["text"].value_counts()
    assert all(texact[v] == c for v, c in ttop)


def test_sketch_fields_within_bounds(corpus, profile):
    # HLL: 4-sigma of 1.04/sqrt(2^12)
    for col, truth in (("doc_id", len(corpus)),
                       ("lang", corpus["lang"].nunique()),
                       ("text", corpus["text"].nunique())):
        est = profile.loc[col, "n_distinct_approx"]
        assert abs(est - truth) / max(truth, 1) < 4 * 1.04 / np.sqrt(1 << 12)
    # t-digest: rank error < 2% at delta=200
    s = np.sort(corpus["score"].dropna().to_numpy())
    for q in (0.5, 0.95, 0.99):
        got = profile.loc["score", f"p{int(q * 100)}"]
        rank = np.searchsorted(s, got) / len(s)
        assert abs(rank - q) < 0.02, (q, got, rank)


def test_partition_invariance(corpus, profile):
    other = dataset_profile(
        rd.from_pandas(corpus).repartition(37)).set_index("column")
    for col in profile.index:
        a, b = profile.loc[col], other.loc[col]
        for f in ("count", "null_count", "n_distinct_approx", "min", "max",
                  "min_len", "max_len", "top_values",
                  "top_values_err_bound"):
            av, bv = a[f], b[f]
            assert (av == bv) or (av != av and bv != bv), (col, f, av, bv)
    # t-digest is partition-SENSITIVE in value space (different partial
    # centroid multisets), so invariance is asserted in RANK space: both
    # partitionings must sit within the same rank-error budget
    s = np.sort(corpus["score"].dropna().to_numpy())
    for prof in (profile, other):
        for q in (0.5, 0.95, 0.99):
            got = prof.loc["score", f"p{int(q * 100)}"]
            assert abs(np.searchsorted(s, got) / len(s) - q) < 0.02


def test_capacity_truncation_reports_bound():
    # 50k distinct values >> capacity=64: the operator must not lie
    df = pd.DataFrame({"v": [f"u{i}" for i in range(50_000)]})
    prof = dataset_profile(rd.from_pandas(df).repartition(6),
                           capacity=64).set_index("column")
    assert prof.loc["v", "top_values_err_bound"] > 0


def test_cli_profile_subcommand(corpus, tmp_path):
    from fasta_windows_ray.__main__ import main
    src = tmp_path / "docs.parquet"
    corpus.to_parquet(src, index=False)
    out = tmp_path / "card.parquet"
    rc = main(["profile", str(src), "--columns", "lang,score",
               "--out", str(out)])
    assert rc == 0
    card = pd.read_parquet(out)
    assert list(card["column"]) == ["lang", "score"]
    assert (card["count"] == len(corpus)).all()


def test_column_subset_and_empty(corpus):
    ds = rd.from_pandas(corpus)
    prof = dataset_profile(ds, columns=["score", "lang"])
    assert list(prof["column"]) == ["score", "lang"]
    empty = dataset_profile(rd.from_pandas(corpus.iloc[:0]))
    assert len(empty) == len(corpus.columns)
    assert (empty["count"] == 0).all()
    assert (empty["n_distinct_approx"] == 0).all()


def test_embedding_column_norm_profile():
    """list<float> columns profile the per-row L2 norm (numeric
    fields) and the vector dim (length fields)."""
    import pyarrow as pa
    rng = np.random.RandomState(4)
    E = rng.randn(3000, 16)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(3000, dtype=np.int64)),
        "embedding": pa.array(list(E.astype(np.float32)))}))
    prof = dataset_profile(ds.repartition(5)).set_index("column")
    row = prof.loc["embedding"]
    norms = np.linalg.norm(E.astype(np.float32).astype(np.float64),
                           axis=1)
    assert row["kind"] == "embedding" and row["count"] == 3000
    assert abs(row["min"] - norms.min()) < 1e-9
    assert abs(row["max"] - norms.max()) < 1e-9
    assert abs(row["mean"] - norms.mean()) < 1e-9
    assert row["min_len"] == 16 and row["max_len"] == 16
    assert abs(row["avg_len"] - 16) < 1e-12
    # p50 of the norm within t-digest rank error
    s = np.sort(norms)
    assert abs(np.searchsorted(s, row["p50"]) / len(s) - 0.5) < 0.02


def test_cli_profile_catalog_table(corpus, tmp_path):
    """--catalog profiles the LATEST snapshot (overwritten versions'
    data files on disk are ignored)."""
    from fasta_windows_ray.__main__ import main
    from fasta_windows_ray.sources.catalog import catalog_write
    t = str(tmp_path / "tbl")
    catalog_write(rd.from_pandas(corpus), t)
    catalog_write(rd.from_pandas(corpus.iloc[:500]), t, mode="overwrite")
    out = tmp_path / "card.parquet"
    rc = main(["profile", t, "--catalog", "--columns", "doc_id",
               "--out", str(out)])
    assert rc == 0
    card = pd.read_parquet(out)
    assert card.loc[0, "count"] == 500          # snapshot, not all files


def test_skew_report_flags_hot_key(ray_session):
    import ray.data as rd
    from fasta_windows_ray.stages.profile import skew_report
    rng = np.random.default_rng(5)
    n = 30_000
    keys = np.asarray([f"u{i}" for i in rng.integers(0, 500, n)], object)
    keys[: n // 3] = "HOT"                      # one key = 1/3 of rows
    df = pd.DataFrame({"k": keys, "x": np.arange(n)})
    rep = skew_report(
        rd.from_pandas([d for d in np.array_split(df, 8)]), "k",
        num_buckets=64, topn=5)
    assert rep["n_rows"] == n
    assert rep["top_keys"]["key"].iloc[0] == "HOT"
    assert abs(rep["top_keys"]["share"].iloc[0] - 1 / 3) < 0.01
    # the hot key concentrates one bucket: imbalance >> 1, salt >= 20
    assert rep["bucket_loads"]["imbalance"] > 10
    assert rep["salt_factor"] >= 20
    # exact top counts vs pandas
    want = df["k"].value_counts().iloc[:5]
    got = rep["top_keys"].set_index("key")["count"]
    assert all(got[k] == want[k] for k in want.index)


def test_skew_report_uniform_and_empty(ray_session):
    import ray.data as rd
    from fasta_windows_ray.stages.profile import skew_report
    df = pd.DataFrame({"k": [f"u{i}" for i in range(4096)],
                       "x": np.arange(4096)})
    rep = skew_report(rd.from_pandas(df), "k", num_buckets=16)
    assert rep["bucket_loads"]["imbalance"] < 1.5
    assert rep["salt_factor"] == 1
    assert rep["n_keys"] == 4096
    empty = rd.from_pandas(df.head(0))
    rep0 = skew_report(empty, "k", num_buckets=8)
    assert rep0["n_rows"] == 0 and rep0["salt_factor"] == 1
