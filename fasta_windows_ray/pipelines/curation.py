"""Training-data curation pipelines: the composed document flow a
100 TB text corpus runs before training.

``curate``       — quality filter → exact dedup → per-language rollup
                   (the round-2 stats pipeline).
``curate_full``  — the round-4 end-to-end flow that RETURNS the
                   curated corpus: normalize → one-pass signal filter
                   (C4 heuristics + DEFLATE ratio + word repetition)
                   → MinHash near-dup clustering keeping the BEST-
                   quality copy → eval-set decontamination →
                   leakage-safe train/val/test split.

Scale shape of ``curate_full``: normalize+signals are ONE shuffle-free
streaming pass (all three signal kernels run on the same batch); the
MinHash band exchange is the only corpus shuffle; cluster/keeper
tables and eval n-grams are broadcast small sides; the split is a pure
hash of the id. Nothing materializes the corpus on the driver — the
result is a lazy Dataset ready for ``catalog_write``/``write_parquet``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def curate(docs_ds, min_tokens: int = 10, min_stop: float = 0.05,
           max_punct: float = 0.2):
    """documents → per-lang counts of (raw, quality-passing, surviving
    after exact dedup) docs plus surviving token volume.

    Dedup keeps the min doc_id per distinct text AMONG quality passers.
    Returns a small pandas DataFrame (lang, n_docs, n_quality, n_unique,
    unique_tokens).
    """
    from ..stages.text_analysis import QualityScorer

    class ScoreKeep(QualityScorer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            scored = super().__call__(batch)
            scored["lang"] = batch["lang"].to_numpy()
            scored["text"] = batch["text"].to_numpy()
            return scored

    def bind(batch: pd.DataFrame) -> pd.DataFrame:
        return ScoreKeep(min_tokens=min_tokens, min_stop=min_stop,
                         max_punct=max_punct)(batch)

    scored = docs_ds.map_batches(bind, batch_format="pandas")

    # dedup among passers: hash-bucket on text, keep min doc_id per text
    import hashlib

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_hb"] = [int.from_bytes(hashlib.sha1(t.encode()).digest()[:4],
                                    "big") % 64 for t in df["text"]]
        return df

    def rollup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        passers = df[df["passes"] == 1]
        if len(passers):
            keep = passers.sort_values("doc_id").drop_duplicates("text")
        else:
            keep = passers
        out = []
        for lang, g in df.groupby("lang", sort=True):
            gp = g[g["passes"] == 1]
            gk = keep[keep["lang"] == lang]
            out.append((lang, len(g), len(gp), len(gk),
                        int(gk["n_tokens"].sum())))
        return pd.DataFrame(out, columns=["lang", "n_docs", "n_quality",
                                          "n_unique", "unique_tokens"])

    partial = (scored.map_batches(add_bucket, batch_format="pandas")
                     .groupby("_hb").map_groups(rollup_bucket,
                                                batch_format="pandas"))
    pdf = partial.to_pandas()
    final = pdf.groupby("lang", sort=True).sum(numeric_only=True).reset_index()
    for c in ("n_docs", "n_quality", "n_unique", "unique_tokens"):
        final[c] = final[c].astype(np.int64)
    return final


def curate_full(docs_ds, eval_ds=None, *, min_tokens: int = 10,
                min_stop: float = 0.05, max_punct: float = 0.2,
                max_dup_word_frac: float = 0.6,
                ratio_bounds: tuple = (0.03, 0.98),
                jaccard_tau: float = 0.5, shingle_k: int = 7,
                split_weights: dict | None = None,
                checkpoint_dir: str | None = None):
    """Normalize → filter → near-dup keep-best → decontaminate → split.

    Returns ``(survivors, funnel)``: a lazy Dataset of the curated
    docs (original columns + ``n_tokens``, ``quality``,
    ``cluster_id``, ``split``) and a funnel dict of per-stage
    survivor counts. ``quality`` (the keeper criterion) is the
    stopword ratio — the strongest single naturalness signal of the
    heuristic family; swap by passing a pre-computed column instead.

    ``checkpoint_dir``: the 100-TB path for the filtered-corpus fan-out.
    Four consumers read the filter output (count, band rows, pair
    verify, cluster assignment). By default it is pinned once in the
    (spillable) object store via ``materialize()``; with
    ``checkpoint_dir=`` it is instead committed to a catalog table
    (exactly-once parquet) and each consumer re-reads it COLUMN-PRUNED
    — the MinHash/verify passes read only (doc_id, text), never the
    full row — so no copy of the corpus needs to stay resident and a
    crashed run resumes from the checkpoint instead of re-filtering.
    Output is bit-identical between the two paths (gated in pytest).
    """
    import pyarrow.compute as pc

    from ..stages.curation_filters import (_token_segments, decontaminate,
                                           normalize_text)
    from ..stages.dedup import (apply_exact_dup_filter, dedup_clusters,
                                exact_dup_winners, lsh_candidate_pairs,
                                minhash_band_rows,
                                verify_jaccard_distributed)
    from ..stages.sampling import train_val_test_split
    from ..stages.text_analysis import QualityScorer

    n_raw = docs_ds.count()
    norm = normalize_text(docs_ds)
    lo, hi = ratio_bounds

    class SignalFilter:
        """All three shuffle-free signal kernels on one batch, then one
        mask — a single streaming pass over the corpus."""

        def __init__(self):
            self.scorer = QualityScorer(min_tokens, min_stop, max_punct)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            import zlib
            if batch.empty:
                out = batch.copy()
                out["n_tokens"] = pd.Series(dtype=np.int64)
                out["quality"] = pd.Series(dtype=np.float64)
                return out
            batch = batch.reset_index(drop=True)
            scored = self.scorer(batch)
            # word repetition (the canonical segment kernel of
            # curation_filters.repetition_stats)
            codes, offs = _token_segments(list(batch["text"]))
            ntok = offs[1:] - offs[:-1]
            nd = len(batch)
            doc_of = np.repeat(np.arange(nd), ntok)
            V = int(codes.max()) + 1 if len(codes) else 1
            distinct = np.bincount(np.unique(doc_of * V + codes) // V,
                                   minlength=nd)
            dup_frac = np.where(ntok > 0,
                                1.0 - distinct / np.maximum(ntok, 1), 0.0)
            # DEFLATE redundancy ratio
            ratio = np.full(nd, np.nan)
            for i, s in enumerate(batch["text"]):
                if s:
                    b = s.encode("utf-8")
                    ratio[i] = len(zlib.compress(b, 6)) / len(b)
            keep = ((scored["passes"].to_numpy() == 1)
                    & (dup_frac <= max_dup_word_frac)
                    & (ratio >= lo) & (ratio <= hi))
            out = batch.loc[keep].copy()
            out["n_tokens"] = scored["n_tokens"].to_numpy()[keep]
            out["quality"] = scored["stop_ratio"].to_numpy()[keep]
            return out

    # four consumers follow (count, band rows, pair verify, cluster
    # assignment): pin the filtered corpus ONCE instead of re-running
    # normalize+signals per consumer — in the (spillable) object store
    # by default, or as a catalog checkpoint with pruned re-reads when
    # checkpoint_dir is given (the fleet-scale path)
    filt_stage = norm.map_batches(SignalFilter, batch_format="pandas",
                                  concurrency=(1, 8))
    if checkpoint_dir is None:
        filtered = filt_stage.materialize()
        n_filtered = filtered.count()
        slim = filtered          # already resident; no second copy
    else:
        from ..sources.catalog import catalog_read, catalog_write
        man = catalog_write(filt_stage, checkpoint_dir, mode="overwrite")
        n_filtered = int(man["total_rows"])
        filtered = catalog_read(checkpoint_dir)
        slim = catalog_read(checkpoint_dir, columns=["doc_id", "text"])

    # exact content dedup BEFORE MinHash: identical texts (boilerplate,
    # stopword-only docs replicated across shards/sites) otherwise form
    # O(copies²) LSH candidate cliques — a 1024-shard rehearsal hit
    # ~50 M candidate pairs from this degeneracy alone — while exact
    # dedup removes them at O(copies) cost (digest-only exchange +
    # bounded dup-winner broadcast). Identical text ⇒ identical quality
    # signals, so min-id-per-digest IS keep-best with a deterministic
    # tie-break; the kept representative then competes in near-dup
    # clustering on behalf of its copies. ONE digest pass (on the
    # pruned view) filters both views via the same winner broadcast.
    dup_ref = exact_dup_winners(slim)
    if checkpoint_dir is None:
        # re-pin the POST-dedup corpus (smaller in exactly the
        # dup-heavy regimes this stage targets) so the four downstream
        # consumers read it directly instead of re-running the
        # hash+filter per consumer; the pre-dedup pin is released with
        # `filtered`'s rebind
        filtered = apply_exact_dup_filter(filtered, dup_ref).materialize()
        slim = filtered
    else:
        # checkpoint path: the filter re-applies per pruned re-read —
        # a searchsorted over the broadcast winner set, O(batch)
        filtered = apply_exact_dup_filter(filtered, dup_ref)
        slim = apply_exact_dup_filter(slim, dup_ref)

    # star candidate mode: curation only needs CLUSTERS (keep best per
    # near-dup group), so each LSH bucket contributes hub edges
    # (≤ n−1) instead of all pairs (n²/2) — without this, a k-copy
    # boilerplate clique costs O(k²) verify volume (a 1024-shard
    # rehearsal hit ~50 M candidate pairs; star mode makes the same
    # corpus linear). Connected components recovers the clique through
    # its hub; dedup_clusters then keeps the best-quality member.
    bands = minhash_band_rows(slim, shingle_k=shingle_k)
    pairs = verify_jaccard_distributed(
        lsh_candidate_pairs(bands, dedup=False, mode="star"), slim,
        shingle_k=shingle_k, threshold=jaccard_tau)
    clustered = dedup_clusters(filtered, pairs, quality_col="quality",
                               append_to_docs=True)
    unique = clustered.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], 1)).drop_columns(["keep"]),
        batch_format="pyarrow", zero_copy_batch=True)
    n_unique = unique.count()

    n_clean = n_unique
    if eval_ds is not None:
        unique = decontaminate(unique, eval_ds, append_to_docs=True) \
            .map_batches(
                lambda t: t.filter(pc.equal(t["contaminated"], False))
                           .drop_columns(["contaminated"]),
                batch_format="pyarrow", zero_copy_batch=True)
        n_clean = unique.count()

    survivors = train_val_test_split(unique, "doc_id",
                                     weights=split_weights)
    funnel = {"n_raw": int(n_raw), "n_filtered": int(n_filtered),
              "n_unique": int(n_unique), "n_clean": int(n_clean)}
    return survivors, funnel
