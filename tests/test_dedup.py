"""Dedup operator correctness on corpora with injected duplicates."""

import numpy as np
import pandas as pd


def make_docs(n=60, seed=5, with_near_dups=True):
    rng = np.random.default_rng(seed)
    words = ["stream", "window", "state", "batch", "arrow", "shuffle",
             "actor", "join", "entropy", "kgram", "watermark", "parquet"]
    texts, ids = [], []
    for i in range(n):
        w = rng.choice(words, 30)
        texts.append(" ".join(w))
        ids.append(i)
    # exact duplicates of docs 0 and 1
    texts += [texts[0], texts[1], texts[0]]
    ids += [100, 101, 102]
    if with_near_dups:
        # near-duplicate of doc 2: one word changed
        t = texts[2].split()
        t[5] = "changed"
        texts.append(" ".join(t))
        ids.append(200)
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_exact_dedup(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.dedup import exact_dedup

    docs = make_docs(with_near_dups=False)
    out = exact_dedup(rd.from_pandas(docs)).to_pandas()
    # doc 0 has 3 copies (0, 100, 102), doc 1 has 2 (1, 101)
    assert int(out.loc[out["doc_id"] == 0, "n_copies"].iloc[0]) == 3
    assert int(out.loc[out["doc_id"] == 1, "n_copies"].iloc[0]) == 2
    assert out["n_copies"].sum() == len(docs)
    # min-id kept: 100/101/102 absent
    assert not set(out["doc_id"]) & {100, 101, 102}


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.dedup import (lsh_candidate_pairs,
                                                minhash_band_rows,
                                                verify_jaccard)

    docs = make_docs()
    bands = minhash_band_rows(rd.from_pandas(docs))
    cand = lsh_candidate_pairs(bands).to_pandas()
    verified = verify_jaccard(cand, docs, threshold=0.7)
    pairs = set(map(tuple, verified[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 100) in pairs or (0, 102) in pairs   # exact dups collide
    assert (2, 200) in pairs                         # near-dup found
    jac = verified.set_index(["doc_a", "doc_b"])["jaccard"]
    assert jac[(0, 100)] == 1.0
    assert 0.7 <= jac[(2, 200)] < 1.0


def test_simhash_near_dups_close(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.dedup import simhash_fingerprints

    docs = make_docs()
    out = simhash_fingerprints(rd.from_pandas(docs)).to_pandas()
    fp = out.set_index("doc_id")["simhash"]

    def hamming(a, b):
        return bin((int(a) & 0xFFFFFFFFFFFFFFFF) ^ (int(b) & 0xFFFFFFFFFFFFFFFF)).count("1")

    assert hamming(fp[0], fp[100]) == 0             # exact dup
    assert hamming(fp[2], fp[200]) <= 12            # near dup: small distance
    rng_pairs = [(3, 4), (5, 6), (7, 8)]
    assert min(hamming(fp[a], fp[b]) for a, b in rng_pairs) > 12


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.dedup import embedding_near_dups

    rng = np.random.default_rng(9)
    E = rng.standard_normal((40, 32)).astype(np.float32)
    E[7] = E[3] + 0.01 * rng.standard_normal(32)    # planted near-dup
    df = pd.DataFrame({"vec_id": np.arange(40),
                       "embedding": list(E)})
    out = embedding_near_dups(rd.from_pandas(df), threshold=0.95).to_pandas()
    pairs = set(map(tuple, out[["vec_a", "vec_b"]].to_numpy())) if len(out) else set()
    assert (3, 7) in pairs
    assert all(c >= 0.95 for c in out["cos_sim"])


def test_distributed_verify_equals_driver_verify(ray_session):
    """The distributed verification (semi-join + co-partitioned text
    attach + in-task Jaccard) must produce exactly the pairs of the
    driver-side reference implementation at the same shingle_k."""
    import ray.data as rd

    from fasta_windows_ray.stages.dedup import (lsh_candidate_pairs,
                                                minhash_band_rows,
                                                verify_jaccard,
                                                verify_jaccard_distributed)

    docs = make_docs(n=80, seed=9)
    k = 7
    bands = minhash_band_rows(rd.from_pandas(docs), shingle_k=k)
    cand = lsh_candidate_pairs(bands)
    # small_side_limit=0 forces the co-partitioned scale path
    dist = verify_jaccard_distributed(cand, rd.from_pandas(docs),
                                      shingle_k=k, threshold=0.5,
                                      small_side_limit=0) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    fast = verify_jaccard_distributed(cand, rd.from_pandas(docs),
                                      shingle_k=k, threshold=0.5) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    ref = verify_jaccard(cand.to_pandas(), docs, shingle_k=k,
                         threshold=0.5) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, ref, check_dtype=False)
    pd.testing.assert_frame_equal(fast, ref, check_dtype=False)
    assert len(ref) > 0            # the gate is non-vacuous


def test_signatures_batch_equals_per_doc():
    """The batched rolling-hash/minimum-reduceat path is bit-identical to
    the per-doc signature() loop (round-2 VERDICT #6 vectorization)."""
    from fasta_windows_ray.stages.dedup import MinHasher

    texts = ["the quick brown fox jumps over the lazy dog", "", "abc",
             "ab", "the quick brown fox jumps over the lazy cat",
             "héllo wörld ünïcode текст" * 3, "aaaaaaa", "ab" * 40]
    mh = MinHasher(num_perm=64, shingle_k=5, seed=7)
    batch = mh.signatures_batch(texts)
    for i, t in enumerate(texts):
        assert (batch[i] == mh.signature(t)).all()
    vals, offs = mh.shingle_segments(texts)
    for i, t in enumerate(texts):
        assert (vals[offs[i]:offs[i + 1]] == mh.shingles(t)).all()
    # all-empty batch shape
    vals, offs = mh.shingle_segments(["", "ab"])
    assert len(vals) == 0 and offs.tolist() == [0, 0, 0]
    sig = mh.signatures_batch(["", "ab"])
    assert sig.shape == (2, 64)
    # TRAILING-empty doc: its reduceat offset equals the value-array
    # length (regression: IndexError before the non-empty-docs-only fix)
    for texts2 in (["hello world text", ""],
                   ["hello world", "", "", "more text here", ""]):
        b2 = mh.signatures_batch(texts2)
        for i, t in enumerate(texts2):
            assert (b2[i] == mh.signature(t)).all()


def test_lsh_dedup_false_verified_equal(ray_session):
    """dedup=False skips the pair-hash exchange; after verification the
    result must be IDENTICAL to the dedup=True path on both the
    driver fast path and the co-partitioned path (small_side_limit=0)."""
    import ray.data as rd
    from fasta_windows_ray.stages.dedup import (lsh_candidate_pairs,
                                                minhash_band_rows,
                                                verify_jaccard_distributed)
    docs = make_docs()
    ds = rd.from_pandas(docs)
    bands = minhash_band_rows(ds, shingle_k=5).materialize()

    def run(dedup, limit):
        out = verify_jaccard_distributed(
            lsh_candidate_pairs(bands, dedup=dedup),
            rd.from_pandas(docs), shingle_k=5, threshold=0.4,
            small_side_limit=limit).to_pandas()
        return (out.sort_values(["doc_a", "doc_b"])
                   .reset_index(drop=True))

    base = run(True, 50_000)
    for dedup, limit in ((False, 50_000), (False, 0), (True, 0)):
        got = run(dedup, limit)
        pd.testing.assert_frame_equal(got, base)


def test_exact_dup_filter_requires_full_digest_match(ray_session):
    """Round-5 review (high): row DELETION must require the full
    126-bit digest. Build the winner broadcast by hand with the real
    h1 of a text but a WRONG h2 — the filter must keep the text (a
    63-bit h1 match alone is not deletion-grade) — then with the real
    h2, it must drop the loser."""
    import ray
    import ray.data as rd

    from fasta_windows_ray.stages import dedup as dd

    ds = rd.from_items([
        {"doc_id": 0, "text": "alpha"},
        {"doc_id": 2, "text": "alpha"},
        {"doc_id": 5, "text": "gamma"},
    ])
    h1 = dd._text_hash_int64(["alpha"]).astype(np.int64)
    h2 = dd._text_hash2_int64(["alpha"]).astype(np.int64)
    winners = np.array([0], dtype=np.int64)

    # h1 matches alpha, h2 deliberately wrong -> nothing may be dropped
    bad_ref = ray.put((h1, (h2 ^ 1).astype(np.int64), winners))
    kept = dd.apply_exact_dup_filter(ds, bad_ref).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2, 5]

    # full digest matches -> the non-winner copy (doc 2) is dropped
    good_ref = ray.put((h1, h2, winners))
    kept = dd.apply_exact_dup_filter(ds, good_ref).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 5]

    # and end-to-end with real hashing: true dup collapses to min id
    kept = dd.drop_exact_dups(ds).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 5]
    counts = dd.exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert dict(zip(counts["doc_id"], counts["n_copies"])) == {0: 2, 5: 1}
