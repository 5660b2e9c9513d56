"""End-to-end curation pipeline (pipelines/curation.py curate_full):
the full funnel — signal filters, near-dup keep-best-quality,
decontamination, leakage-safe split — on a corpus with planted
outcomes for every stage."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.pipelines.curation import curate_full

pytestmark = pytest.mark.usefixtures("ray_session")

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall fence and the birds sing in the garden "
        "as the sun sets slowly behind the old red barn near the river")


def _corpus():
    rows = [
        # 0: good doc A (unique — no shared shingles with the pair)
        {"doc_id": 0, "text": "every morning the baker would rise "
                              "before dawn to knead the dough and the "
                              "smell of the fresh bread would drift "
                              "through all of the sleepy town streets"},
        # 1/2: near-dup pair; 2 has MORE stopwords -> higher quality
        {"doc_id": 1, "text": BASE.replace("birds sing", "frogs croak")
         + " extra trailing words here"},
        {"doc_id": 2, "text": BASE.replace("birds sing", "frogs croak")
         + " and then of the end"},
        # 3: too short -> quality filter
        {"doc_id": 3, "text": "short junk"},
        # 4: boilerplate -> repetition + compression filters
        {"doc_id": 4, "text": "buy now " * 200},
        # 5: good doc, but shares a 5-gram with the eval set
        {"doc_id": 5, "text": "it was the best of times and the worst "
                              "of days for the people of the small "
                              "village by the sea with their boats"},
        # 6: good doc B (unique)
        {"doc_id": 6, "text": "a long time ago in a land far away the "
                              "people would gather at the square to "
                              "trade stories and the goods of the day"},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_curate_full_funnel_and_policies():
    eval_ds = rd.from_items(
        [{"doc_id": 100, "text": "it was the best of times indeed"}])
    survivors, funnel = curate_full(_corpus(), eval_ds)
    pdf = survivors.to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert funnel == {"n_raw": 7, "n_filtered": 5,   # 3, 4 filtered
                      "n_unique": 4,                 # one of 1/2 dropped
                      "n_clean": 3}                  # 5 decontaminated
    # keep-best-quality: doc 2 (more stopwords) is the keeper of {1,2}
    assert pdf["doc_id"].tolist() == [0, 2, 6]
    assert (pdf.loc[pdf["doc_id"] == 2, "cluster_id"] == 1).all()
    # split column present, valid, and keyed deterministically
    assert set(pdf["split"]) <= {"train", "val", "test"}
    # payload + signals survived the whole composition
    assert {"text", "n_tokens", "quality"} <= set(pdf.columns)
    assert (pdf["n_tokens"] >= 10).all()

    # determinism: the whole funnel reproduces bit-identically
    survivors2, funnel2 = curate_full(_corpus(), eval_ds)
    pdf2 = survivors2.to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert funnel2 == funnel
    pd.testing.assert_frame_equal(pdf, pdf2)


def test_curate_full_without_eval_set():
    survivors, funnel = curate_full(_corpus())
    got = set(survivors.to_pandas()["doc_id"])
    assert funnel["n_clean"] == funnel["n_unique"] == 4
    assert got == {0, 2, 5, 6}


def test_cli_curate_subcommand(tmp_path):
    from fasta_windows_ray.__main__ import main
    src = tmp_path / "docs.parquet"
    _corpus().to_pandas().to_parquet(src, index=False)
    out = tmp_path / "curated"
    rc = main(["curate", str(src), str(out)])
    assert rc == 0
    got = pd.read_parquet(out)
    assert set(got["doc_id"]) == {0, 2, 5, 6}
    assert "split" in got.columns


def test_curate_full_checkpoint_path_equals_materialize(tmp_path):
    """r5: checkpoint_dir= replaces the object-store materialize() with
    a catalog commit + column-pruned re-reads; output and funnel must be
    bit-identical to the default path, and the checkpoint itself must be
    a readable catalog table of the filtered corpus."""
    from fasta_windows_ray.sources.catalog import catalog_read
    eval_ds = rd.from_items(
        [{"doc_id": 100, "text": "it was the best of times indeed"}])
    base, funnel_a = curate_full(_corpus(), eval_ds)
    ckpt = str(tmp_path / "filtered_ckpt")
    chk, funnel_b = curate_full(_corpus(), eval_ds, checkpoint_dir=ckpt)
    assert funnel_a == funnel_b
    a = base.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = chk.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])

    # the checkpoint is the filtered corpus (stage-2 survivors),
    # committed exactly-once and re-readable column-pruned
    filt = catalog_read(ckpt).to_pandas()
    assert sorted(filt["doc_id"]) == [0, 1, 2, 5, 6]
    slim = catalog_read(ckpt, columns=["doc_id", "text"]).to_pandas()
    assert list(slim.columns) == ["doc_id", "text"]


def test_exact_dup_clique_collapses_before_minhash(ray_session):
    """Round-5 scale finding: identical texts replicated across shards
    (boilerplate / stopword-only docs) form O(copies^2) LSH candidate
    cliques; the exact-dedup pre-filter must collapse each clique to
    its min-id representative BEFORE MinHash, and the funnel must
    count the copies as removed duplicates."""
    import ray.data as rd

    from fasta_windows_ray.pipelines.curation import curate_full
    from fasta_windows_ray.stages.dedup import drop_exact_dups

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "going with plenty of distinct words to pass the filters "
            "alpha beta gamma delta epsilon zeta eta theta")
    rows = []
    # one text exactly replicated 40x (the clique), plus 10 unique docs
    for i in range(40):
        rows.append({"doc_id": i, "text": base})
    for i in range(40, 50):
        rows.append({"doc_id": i,
                     "text": base.replace("fox", f"unique{i} wolverine "
                                          f"badger{i} ocelot{i}")})
    ds = rd.from_items(rows)

    kept = drop_exact_dups(ds).to_pandas()
    # exactly one representative (min id) of the clique survives
    assert (kept["text"] == base).sum() == 1
    assert 0 in set(kept["doc_id"])
    assert len(kept) == 11

    survivors, funnel = curate_full(ds)
    assert funnel["n_raw"] == 50
    # the 39 exact copies are gone from n_unique (near-dup clustering
    # may remove more among the 'unique' variants; never doc 0's slot)
    assert funnel["n_unique"] <= funnel["n_filtered"] - 39
    out = survivors.to_pandas()
    assert (out["text"] == base).sum() <= 1
