"""chunk_documents gated against a DuckDB list-slicing oracle
(string_split + generate_series + array_to_string) and substring /
coverage invariants, including multi-space, empty and unicode docs."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _docs(n=300, seed=5):
    rng = np.random.default_rng(seed)
    words = ["sort", "merge", "join", "the", "window", "scan", "a",
             "batch", "données", "straße"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 90)))
             for _ in range(n)]
    texts += ["", "one", "two  spaces  here", " leading", "trailing "]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def _ds(df, blocks=6):
    import ray.data as rd
    return rd.from_pandas([d for d in np.array_split(df, blocks)])


def _run(df, size, stride):
    from fasta_windows_ray.stages.chunking import chunk_documents
    out = chunk_documents(_ds(df), size=size, stride=stride).to_pandas()
    return (out.sort_values(["doc_id", "chunk_id"])
               .reset_index(drop=True))


def _oracle(df, size, stride):
    con = duckdb.connect()
    con.register("docs", df)
    want = con.execute(f"""
        WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
                     len(string_split(text, ' ')) AS nt FROM docs),
        c AS (SELECT *, CASE WHEN nt <= {size} THEN 1
                ELSE CAST(ceil((nt - {size}) / {stride}.0) AS BIGINT) + 1
                END AS nc FROM d)
        SELECT doc_id, gs AS chunk_id,
          array_to_string(toks[gs*{stride}+1 :
                               least(gs*{stride}+{size}, nt)], ' ')
            AS chunk,
          least(gs*{stride}+{size}, nt) - gs*{stride} AS n_tokens
        FROM c, LATERAL unnest(generate_series(0, nc-1)) AS g(gs)
        ORDER BY doc_id, chunk_id
    """).df()
    con.close()
    return want.reset_index(drop=True)


@pytest.mark.parametrize("size,stride", [(16, 12), (8, 8), (5, 2)])
def test_matches_duckdb_list_slice_oracle(ray_session, size, stride):
    df = _docs()
    got = _run(df, size, stride)
    want = _oracle(df, size, stride)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_chunks_are_exact_substrings_and_cover(ray_session):
    df = _docs(80, seed=9)
    out = _run(df, 16, 12)
    text = dict(zip(df["doc_id"], df["text"]))
    for _, r in out.iterrows():
        assert r["chunk"] in text[r["doc_id"]]
    # overlap-stitch coverage: tiling chunks reconstruct the document
    tiled = _run(df, 10, 10)
    rebuilt = (tiled.groupby("doc_id")["chunk"]
                    .apply(lambda c: " ".join(c)))
    for doc_id, s in rebuilt.items():
        assert s == text[doc_id]


def test_bad_params_raise(ray_session):
    from fasta_windows_ray.stages.chunking import chunk_documents
    with pytest.raises(ValueError):
        chunk_documents(_ds(_docs(5)), size=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(_ds(_docs(5)), size=4, stride=-1)
