"""Analytics / sampling / PII operators: grouped top-k, exact
quantiles, windowed distinct, deterministic hash sampling, redaction —
each gated against an independent local ground truth (pandas / numpy /
Python re), with multi-batch inputs so the partial-aggregate merge
paths are exercised."""

import re

import numpy as np
import pandas as pd
import pytest


def _events(n=5000, seed=7, n_users=40, n_types=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "ts": pd.to_datetime(
            rng.integers(0, 40 * 3600, n) * 1_000_000, unit="us"),
        "user_id": rng.integers(0, n_users, n),
        "event_type": np.asarray(["t%d" % i for i in
                                  rng.integers(0, n_types, n)], object),
        "value": np.round(rng.normal(10, 3, n), 3),
    })


def _ds(df, blocks=7):
    import ray.data as rd
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


def test_grouped_topk_matches_pandas(ray_session):
    from fasta_windows_ray.stages.analytics import grouped_topk
    df = _events()
    out = grouped_topk(_ds(df), "event_type", "user_id", k=5,
                       weight_col="value")
    out = out.sort_values(["event_type", "rank"]).reset_index(drop=True)

    agg = df.groupby(["event_type", "user_id"]).agg(
        n_rows=("user_id", "size"), sum_weight=("value", "sum")).reset_index()
    want = (agg.sort_values(["n_rows", "user_id"], ascending=[False, True])
               .groupby("event_type").head(5)
               .sort_values(["event_type", "n_rows", "user_id"],
                            ascending=[True, False, True])
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["event_type", "user_id", "n_rows"]],
        want[["event_type", "user_id", "n_rows"]])
    assert np.allclose(out["sum_weight"], want["sum_weight"])
    assert (out.groupby("event_type")["rank"].apply(
        lambda r: list(r) == list(range(1, len(r) + 1)))).all()


def test_grouped_topk_no_weight(ray_session):
    from fasta_windows_ray.stages.analytics import grouped_topk
    df = _events(n=800, seed=2)
    out = grouped_topk(_ds(df, 3), "event_type", "user_id", k=3)
    assert list(out.columns) == ["event_type", "user_id", "n_rows", "rank"]
    want = (df.groupby(["event_type", "user_id"]).size()
              .rename("n_rows").reset_index()
              .sort_values(["n_rows", "user_id"], ascending=[False, True])
              .groupby("event_type").head(3))
    got = out.sort_values(["event_type", "rank"]).reset_index(drop=True)
    want = want.sort_values(["event_type", "n_rows", "user_id"],
                            ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_type", "user_id", "n_rows"]], want)


def test_hash_sample_unstratified(ray_session):
    from fasta_windows_ray.stages.sampling import hash_sample
    from fasta_windows_ray.stages.window_stats import stable_bucket_of
    df = pd.DataFrame({"doc_id": np.arange(2500)})
    out = hash_sample(_ds(df, 4), "doc_id", permille=150).to_pandas()
    slots = stable_bucket_of(df["doc_id"].to_numpy(), 1000)
    assert set(out["doc_id"]) == set(df.loc[slots < 150, "doc_id"])


def test_mixture_sample_temperature(ray_session):
    from fasta_windows_ray.stages.sampling import (mixture_permilles,
                                                   mixture_sample)
    from fasta_windows_ray.stages.window_stats import stable_bucket_of
    rng = np.random.default_rng(17)
    langs = np.repeat(["en", "zh", "fr"], [900, 300, 100])
    df = pd.DataFrame({"doc_id": np.arange(len(langs)),
                       "lang": rng.permutation(langs)})
    out, pm = mixture_sample(_ds(df, 5), "doc_id", "lang",
                             alpha=0.5, target_permille=200)
    out = out.to_pandas()
    # alpha<1 upsamples the tail RELATIVE to natural share: keep-rate
    # ordering inverts the count ordering
    assert pm["fr"] > pm["zh"] > pm["en"]
    # formula check against a direct computation
    Z = 900**0.5 + 300**0.5 + 100**0.5
    for lang, n in [("en", 900), ("zh", 300), ("fr", 100)]:
        assert pm[lang] == min(1000, int(200 * 1300 * n**-0.5 / Z + 1e-9))
    # membership is exactly the slot rule (pure function of key)
    slots = stable_bucket_of(df["doc_id"].to_numpy(), 1000)
    want = set(df.loc[slots < df["lang"].map(pm).to_numpy(), "doc_id"])
    assert set(out["doc_id"]) == want
    # re-run with different partitioning selects identical rows
    out2, _ = mixture_sample(_ds(df, 2), "doc_id", "lang",
                             alpha=0.5, target_permille=200)
    assert set(out2.to_pandas()["doc_id"]) == want


@pytest.mark.parametrize("n,hi", [(1, 5), (997, 50), (5000, 3)])
def test_exact_quantiles_inverted_cdf(ray_session, n, hi):
    from fasta_windows_ray.stages.analytics import exact_quantiles
    rng = np.random.default_rng(n)
    vals = rng.integers(0, hi, n)
    df = pd.DataFrame({"x": vals})
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    out = exact_quantiles(_ds(df, blocks=min(n, 5)), "x", qs)
    srt = np.sort(vals)
    for q, v in zip(out["q"], out["value"]):
        idx = 0 if q <= 0 else int(np.ceil(q * n)) - 1
        assert v == srt[idx], (q, v, srt[idx])


def test_windowed_distinct_exact(ray_session):
    from fasta_windows_ray.stages.analytics import windowed_distinct
    df = _events()
    size = 6 * 3600 * 1_000_000
    out = windowed_distinct(_ds(df), "ts", "user_id", size,
                            value_col="value")
    out = out.sort_values("window_start").reset_index(drop=True)
    w = (df["ts"].astype("datetime64[us]").astype("int64") // size) * size
    want = df.assign(w=w).groupby("w").agg(
        n_events=("user_id", "size"), n_users=("user_id", "nunique"),
        sum_value=("value", "sum")).reset_index()
    assert list(out["window_start"]) == list(want["w"])
    assert list(out["n_events"]) == list(want["n_events"])
    assert list(out["n_users"]) == list(want["n_users"])
    assert np.allclose(out["sum_value"], want["sum_value"])


def test_hash_sample_deterministic_and_stratified(ray_session):
    from fasta_windows_ray.stages.sampling import hash_sample
    df = pd.DataFrame({
        "doc_id": np.arange(4000),
        "lang": np.where(np.arange(4000) % 3 == 0, "en", "de"),
    })
    kw = dict(permille=200, strata_col="lang",
              strata_permille={"en": 50})
    a = hash_sample(_ds(df, 3), "doc_id", **kw).to_pandas()
    b = hash_sample(_ds(df.iloc[::-1], 11), "doc_id", **kw).to_pandas()
    ka = set(a["doc_id"])
    assert ka == set(b["doc_id"])          # partitioning-invariant
    # rates land near the target (binomial, generous tolerance)
    n_en = (df["lang"] == "en").sum()
    got_en = (a["lang"] == "en").sum()
    got_de = len(a) - got_en
    assert abs(got_en / n_en - 0.05) < 0.03
    assert abs(got_de / (len(df) - n_en) - 0.2) < 0.05
    # membership is a pure function of the key
    from fasta_windows_ray.stages.window_stats import stable_bucket_of
    slots = stable_bucket_of(df["doc_id"].to_numpy(), 1000)
    want = set(df.loc[(slots < np.where(df["lang"] == "en", 50, 200)),
                      "doc_id"])
    assert ka == want


def test_lm_quality_score_matches_reference(ray_session):
    """Distributed bigram-LM scoring == a from-scratch Python model:
    Laplace smoothing, unseen bigrams/contexts, empty and 1-char docs."""
    import math
    from collections import Counter
    from fasta_windows_ray.stages.text_analysis import lm_quality_score
    texts = ["abcabc", "abcd", "", "x", "zzzz", "abc xyz", "aa"]
    ids = np.arange(len(texts)) * 5          # ids 0,5,10.. -> %10==0 trains
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    out = (lm_quality_score(_ds(df, 3), train_mod=10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    train = [t for i, t in zip(ids, texts) if i % 10 == 0]
    cb: Counter = Counter()
    for t in train:
        cb.update(t[i:i + 2] for i in range(len(t) - 1))
    cc: Counter = Counter()
    for (a, _), c in cb.items():
        cc[a] += c
    V = len(cc)
    for i, t in enumerate(texts):
        bgs = [t[j:j + 2] for j in range(len(t) - 1)]
        if not bgs:
            want = 0.0
        else:
            want = round(sum(
                math.log((cb.get(b, 0) + 1) / (cc.get(b[0], 0) + V))
                for b in bgs) / len(bgs), 6)
        row = out[out["doc_id"] == ids[i]].iloc[0]
        assert row["n_bigrams"] == len(bgs)
        assert abs(row["lm_score"] - want) < 1e-9, (t, row["lm_score"], want)


def test_semantic_clusters_matches_local_lloyd(ray_session):
    """Distributed k-means (broadcast centroids + partial-sum fold)
    must equal a single-process Lloyd run with the same init, both at
    iterations=0 (pure assignment) and after refinement rounds."""
    from fasta_windows_ray.stages.similarity import (_norm_rows,
                                                     semantic_clusters)
    rng = np.random.default_rng(11)
    n, d, k = 600, 16, 5
    E = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": list(E)})
    C0 = E[:k].astype(np.float64)

    def local(iters):
        C = _norm_rows(C0.copy())
        X = E.astype(np.float64)
        for _ in range(iters):
            a = np.argmax(_norm_rows(X) @ C.T, axis=1)
            newC = C.copy()
            for ci in range(k):
                m = a == ci
                if m.any():
                    newC[ci] = X[m].sum(axis=0) / m.sum()
            C = _norm_rows(newC)
        return np.argmax(_norm_rows(X) @ C.T, axis=1)

    for iters in (0, 3):
        out = (semantic_clusters(_ds(df, 6), C0, iterations=iters)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        assert list(out["cluster"]) == list(local(iters)), iters
    # refinement should change at least one assignment on random data
    assert (local(0) != local(3)).any()


def test_pack_documents_prefix_scan(ray_session):
    """Distributed two-phase prefix scan == local exclusive cumsum, for
    non-contiguous ids across many blocks and slab boundaries."""
    from fasta_windows_ray.stages.analytics import pack_documents
    rng = np.random.default_rng(9)
    ids = np.sort(rng.choice(100_000, 3000, replace=False))
    df = pd.DataFrame({"doc_id": ids,
                       "n_tokens": rng.integers(1, 400, len(ids))})
    out = (pack_documents(_ds(df.sample(frac=1.0, random_state=1), 9),
                          budget_tokens=1000, slab=777)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    srt = df.sort_values("doc_id").reset_index(drop=True)
    prefix_excl = np.concatenate(([0],
                                  np.cumsum(srt["n_tokens"].to_numpy())[:-1]))
    assert list(out["doc_id"]) == list(srt["doc_id"])
    assert list(out["pack_id"]) == list(prefix_excl // 1000)
    # packs are contiguous and ordered
    assert (np.diff(out["pack_id"]) >= 0).all()


def test_label_centroids_matches_numpy(ray_session):
    from fasta_windows_ray.stages.similarity import label_centroids
    rng = np.random.default_rng(21)
    n, d = 400, 8
    E = rng.normal(size=(n, d)).astype(np.float32)
    labs = rng.integers(0, 5, n)
    df = pd.DataFrame({"label": labs, "embedding": list(E)})
    labels, C, counts = label_centroids(_ds(df, 7))
    for i, lab in enumerate(labels):
        m = labs == lab
        assert counts[i] == m.sum()
        assert np.allclose(C[i], E[m].astype(np.float64).mean(axis=0))


def test_cep_match_sequence(ray_session):
    """Strict-contiguity pattern matching vs a per-key Python reference,
    including the within-span cutoff and cross-key non-matches."""
    from fasta_windows_ray.stages.cep import match_sequence
    df = _events(n=4000, seed=3, n_users=25, n_types=3)
    pat = ["t0", "t1", "t2"]
    within = 3 * 3600 * 1_000_000
    df2 = df.copy()
    df2["event_id"] = np.arange(len(df2))
    out = match_sequence(_ds(df2, 5), "user_id", "event_type", "ts",
                         "event_id", pat, within, num_buckets=8).to_pandas()
    out = out.sort_values(["user_id", "start_event_id"]).reset_index(drop=True)

    want = []
    for uid, g in df2.sort_values(["ts", "event_id"]).groupby("user_id"):
        t = g["event_type"].to_numpy()
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g) - 2):
            if (list(t[i:i + 3]) == pat
                    and ts[i + 2] - ts[i] <= within):
                want.append((uid, ids[i], ids[i + 2]))
    want = sorted(want)
    got = list(zip(out["user_id"], out["start_event_id"],
                   out["end_event_id"]))
    assert got == want and len(want) > 0


def test_adjacent_delays_matches_reference(ray_session):
    from fasta_windows_ray.stages.cep import adjacent_delays
    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "conv_id": np.asarray([f"c{i}" for i in
                               rng.integers(0, 40, n)], object),
        "turn_uid": np.arange(n),
        "role": np.asarray(rng.choice(["user", "assistant", "tool"], n),
                           object),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="us"),
    })
    out = adjacent_delays(_ds(df, 6), "conv_id", "role", "ts", "turn_uid",
                          "user", "assistant", num_buckets=8).to_pandas()
    out = out.sort_values("conv_id").reset_index(drop=True)

    want = []
    for cid, g in df.sort_values(["ts", "turn_uid"]).groupby("conv_id"):
        r = g["role"].to_numpy()
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        d = ts[1:][(r[:-1] == "user") & (r[1:] == "assistant")] - \
            ts[:-1][(r[:-1] == "user") & (r[1:] == "assistant")]
        if len(d):
            want.append((cid, len(d), round(d.sum() / len(d), 6), d.max()))
    want = pd.DataFrame(want, columns=["conv_id", "n_pairs",
                                       "mean_delay_us", "max_delay_us"])
    want = want.sort_values("conv_id").reset_index(drop=True)
    assert list(out["conv_id"]) == list(want["conv_id"])
    assert list(out["n_pairs"]) == list(want["n_pairs"])
    assert np.allclose(out["mean_delay_us"], want["mean_delay_us"])
    assert list(out["max_delay_us"]) == list(want["max_delay_us"])
    assert len(want) > 10


def test_hash_topk_sample_exact_k_and_stable(ray_session):
    """Exact-k per stratum; survivors invariant under re-partitioning
    AND under adding rows that hash later (the reservoir property)."""
    from fasta_windows_ray.stages.sampling import hash_topk_sample
    from fasta_windows_ray.stages.window_stats import stable_bucket_of
    df = pd.DataFrame({"doc_id": np.arange(900),
                       "lang": np.where(np.arange(900) % 4 == 0,
                                        "en", "de")})
    a = hash_topk_sample(_ds(df, 7), "doc_id", 10, strata_col="lang")
    b = hash_topk_sample(_ds(df.iloc[::-1], 3), "doc_id", 10,
                         strata_col="lang")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a.groupby("lang").size() == 10).all()
    # matches the definition: k smallest (slot, doc_id) per stratum
    slots = stable_bucket_of(df["doc_id"].to_numpy(), 1000)
    want = (df.assign(slot=slots)
              .sort_values(["slot", "doc_id"], kind="stable")
              .groupby("lang", sort=False).head(10)
              .sort_values(["lang", "doc_id"]))
    assert a["doc_id"].tolist() == want["doc_id"].tolist()


def test_redact_pii_counts_and_text(ray_session):
    from fasta_windows_ray.stages.pii import PII_PATTERNS, redact_pii
    texts = [
        "write to bob.smith@corp.example.org today",
        "call 555-0199 or 555-12345 from 192.168.0.1",
        "no pii here",
        "a@b.io then c_d@e-f.co and 8.8.8.8",
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = redact_pii(_ds(df, 2)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # independent ground truth via Python re, same order
    want_counts = {f"n_{k}": [] for k, _, _ in PII_PATTERNS}
    want_text = []
    for t in texts:
        for kind, pat, rep in PII_PATTERNS:
            want_counts[f"n_{kind}"].append(len(re.findall(pat, t)))
            t = re.sub(pat, rep, t)
        want_text.append(t)
    for k, v in want_counts.items():
        assert list(out[k]) == v, k
    assert list(out["text"]) == want_text
    # the 555-12345 tail: first 4 digits match, 5th survives
    assert "[PHONE]5" in out["text"][1]


# ---------------------------------------------------------------- split

def test_train_val_test_split_oracle(ray_session, tmp_path):
    """Split assignment matches the SQL md5-slot twin; conv-keyed rows
    stay together; rebalancing val/test never moves a train key."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from fasta_windows_ray.stages.sampling import train_val_test_split

    df = pd.DataFrame({
        "conv_id": [f"c{i % 200}" for i in range(1000)],
        "v": np.arange(1000, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (train_val_test_split(ds, "conv_id",
                                {"train": 900, "val": 60, "test": 40})
           .to_pandas().sort_values("v").reset_index(drop=True))

    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("""
        WITH h AS (SELECT *, md5(CAST(conv_id AS VARCHAR)) AS hx FROM t),
        s AS (SELECT conv_id, v,
              (CAST(('0x' || substr(hx, 1, 15)) AS BIGINT) % 1000) AS slot
              FROM h)
        SELECT conv_id, v,
               CASE WHEN slot < 900 THEN 'train'
                    WHEN slot < 960 THEN 'val' ELSE 'test' END AS split
        FROM s ORDER BY v""").df()
    pd.testing.assert_frame_equal(got, want)

    # leakage safety: one split per conv
    assert (got.groupby("conv_id")["split"].nunique() == 1).all()
    # rebalance stability: shifting val/test leaves train untouched
    got2 = (train_val_test_split(ds, "conv_id",
                                 {"train": 900, "val": 10, "test": 90})
            .to_pandas().sort_values("v").reset_index(drop=True))
    tr1 = set(got.loc[got["split"] == "train", "conv_id"])
    tr2 = set(got2.loc[got2["split"] == "train", "conv_id"])
    assert tr1 == tr2

    with pytest.raises(ValueError, match="sum to 1000"):
        train_val_test_split(ds, "conv_id", {"train": 5})
