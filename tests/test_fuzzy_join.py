"""Fuzzy string join (stages/fuzzy.py): LSH-blocked cross-table
similarity join, gated against the all-pairs exact reference —
precision must be EXACT (verification is exact Jaccard), recall gated
at the LSH collision probability."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.fuzzy import fuzzy_join, fuzzy_join_exact

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpora(n=300, seed=11):
    """Right side = perturbed copies of a third of the left side
    (typo / suffix noise), plus unrelated strings."""
    rng = np.random.default_rng(seed)
    # distinctive bodies: random alnum tokens, so unplanted cross-side
    # pairs sit far below the 0.7 threshold
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))

    def token():
        return "".join(rng.choice(alphabet, 8))

    left = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(token() for _ in range(5)) for _ in range(n)],
    })
    rows = []
    rid = 0
    for i in range(0, n, 3):            # every third entity gets a twin
        t = left["text"][i]
        pos = int(rng.integers(0, len(t)))
        rows.append((rid, t[:pos] + t[pos + 1:]))     # one char dropped
        rid += 1
    for i in range(n // 2):             # plus unrelated noise
        rows.append((rid, f"unrelated {rng.integers(1e9)} zzz "
                          f"{rng.integers(1e9)}"))
        rid += 1
    right = pd.DataFrame(rows, columns=["doc_id", "text"])
    right["doc_id"] = right["doc_id"].astype(np.int64)
    return left, right


def test_fuzzy_join_recall_and_exact_precision():
    left, right = _corpora()
    got = fuzzy_join(rd.from_pandas(left).repartition(4),
                     rd.from_pandas(right).repartition(3),
                     threshold=0.7, shingle_k=3).to_pandas()
    want = fuzzy_join_exact(left, right, threshold=0.7, shingle_k=3)
    gp = set(zip(got["left_id"], got["right_id"]))
    wp = set(zip(want["left_id"], want["right_id"]))
    # precision is exact by construction: every emitted pair is a
    # verified jaccard >= threshold pair
    assert gp <= wp
    # recall: P(candidate) = 1-(1-j^4)^16 >= 0.99 at j >= 0.7
    assert len(gp) >= 0.95 * len(wp) > 0
    # jaccard values bit-match the reference on the common pairs
    gj = {(a, b): j for a, b, j in
          zip(got["left_id"], got["right_id"], got["jaccard"])}
    wj = {(a, b): j for a, b, j in
          zip(want["left_id"], want["right_id"], want["jaccard"])}
    for k in gp:
        assert abs(gj[k] - wj[k]) < 1e-12
    # planted twins dominate the match set
    assert sum(1 for (a, b) in gp if a % 3 == 0) >= 0.9 * len(gp)


def test_fuzzy_join_no_same_side_pairs_and_id_roundtrip():
    # left contains two near-identical rows; they must NOT pair with
    # each other (same side), only with the right-side twin
    left = pd.DataFrame({"doc_id": np.array([10, 11], dtype=np.int64),
                         "text": ["the quick brown fox jumps high",
                                  "the quick brown fox jumps higher"]})
    right = pd.DataFrame({"doc_id": np.array([77], dtype=np.int64),
                          "text": ["the quick brown fox jumps high!"]})
    got = fuzzy_join(rd.from_pandas(left), rd.from_pandas(right),
                     threshold=0.5, shingle_k=3).to_pandas()
    assert set(got["right_id"]) == {77}
    assert set(got["left_id"]) <= {10, 11}
    assert 10 in set(got["left_id"])


def test_fuzzy_join_empty_and_id_validation():
    left = pd.DataFrame({"doc_id": np.array([1], dtype=np.int64),
                         "text": ["aaaa bbbb cccc"]})
    empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                          "text": pd.Series(dtype=str)})
    got = fuzzy_join(rd.from_pandas(left), rd.from_pandas(empty),
                     threshold=0.5).to_pandas()
    assert len(got) == 0
    big = pd.DataFrame({"doc_id": np.array([1 << 62], dtype=np.int64),
                        "text": ["x"]})
    with pytest.raises(Exception):
        fuzzy_join(rd.from_pandas(big), rd.from_pandas(left),
                   threshold=0.5).to_pandas()
