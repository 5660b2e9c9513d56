"""Training-data curation pipeline: the composed document flow a
100 TB text corpus runs before training — quality filter → exact dedup →
per-language rollup. Demonstrates operator composition (stages share the
Dataset; no intermediate materialization beyond the tiny rollup).
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
