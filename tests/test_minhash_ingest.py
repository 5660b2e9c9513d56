"""Incremental MinHash near-dup ingest (stages/ingest_dedup.py
minhash_ingest, round 4): within-batch and vs-store near-dup drops,
tau respected, rerun idempotence, parameter pinning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import catalog_read
from fasta_windows_ray.stages.ingest_dedup import minhash_ingest

pytestmark = pytest.mark.usefixtures("ray_session")


def _long_text(seed, n_words=120):
    rng = np.random.default_rng(seed)
    return " ".join(f"tok{int(v):03d}" for v in rng.integers(0, 400, n_words))


BASE_A = _long_text(1)
BASE_B = _long_text(2)
NEAR_A = BASE_A.replace("tok", "tak", 3)          # ~high Jaccard vs A
FAR_A = " ".join(BASE_A.split()[:40] + _long_text(9, 80).split())  # ~1/3


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows),
                                              preserve_index=False))


def _ids(ds):
    return sorted(ds.to_pandas()["doc_id"].tolist())


def test_within_batch_and_vs_store(ray_session, tmp_path):
    store = str(tmp_path / "mh")
    surv1, r1 = minhash_ingest(_ds([
        {"doc_id": "a1", "text": BASE_A},
        {"doc_id": "a2", "text": NEAR_A},          # near-dup of a1
        {"doc_id": "b1", "text": BASE_B},
    ]), store, n_buckets=8)
    assert _ids(surv1) == ["a1", "b1"]
    assert r1["n_new"] == 2 and r1["dropped_ids"] == ["a2"]

    surv2, r2 = minhash_ingest(_ds([
        {"doc_id": "c1", "text": BASE_A.replace("tok", "tuk", 2)},  # vs store
        {"doc_id": "c2", "text": _long_text(5)},                   # fresh
    ]), store, n_buckets=8)
    assert _ids(surv2) == ["c2"]
    assert r2["dropped_ids"] == ["c1"] and r2["n_new"] == 1

    sigs = catalog_read(str(tmp_path / "mh" / "sigs")).to_pandas()
    assert sorted(sigs["doc_id"]) == ["a1", "b1", "c2"]


def test_moderate_similarity_kept(ray_session, tmp_path):
    store = str(tmp_path / "mh")
    minhash_ingest(_ds([{"doc_id": "a1", "text": BASE_A}]), store,
                   n_buckets=8)
    surv, r = minhash_ingest(_ds([{"doc_id": "f1", "text": FAR_A}]),
                             store, n_buckets=8)
    assert _ids(surv) == ["f1"] and r["n_new"] == 1


def test_rerun_is_idempotent(ray_session, tmp_path):
    store = str(tmp_path / "mh")
    batch = [{"doc_id": "a1", "text": BASE_A},
             {"doc_id": "b1", "text": BASE_B}]
    minhash_ingest(_ds(batch), store, n_buckets=8)
    surv, r = minhash_ingest(_ds(batch), store, n_buckets=8)
    assert r["n_new"] == 0 and surv.count() == 0
    sigs = catalog_read(str(tmp_path / "mh" / "sigs")).to_pandas()
    assert len(sigs) == 2                     # nothing re-appended


def test_param_pinning(ray_session, tmp_path):
    store = str(tmp_path / "mh")
    minhash_ingest(_ds([{"doc_id": "a1", "text": BASE_A}]), store,
                   n_buckets=8)
    with pytest.raises(ValueError, match="was built with"):
        minhash_ingest(_ds([{"doc_id": "x", "text": BASE_B}]), store,
                       num_perm=64, n_buckets=8)
