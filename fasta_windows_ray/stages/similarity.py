"""Similarity search over the ``embeddings`` table (list<float> column).

- Brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put``), each batch does one numpy matmul, partial top-k per
  batch, tiny final merge on the driver. No shuffle of the corpus.
- IVF variant: k-means-ish coarse centroids (seeded, trained on a sample),
  batches route vectors to nearest centroid, search probes only the
  closest ``nprobe`` lists — the 100-TB path where brute force won't.
- semantic_clusters: distributed Lloyd k-means over the FULL corpus
  (SemDeDup-style semantic grouping, Abbas et al. 2023): centroids are
  broadcast per iteration, each batch emits K partial (sum, count)
  rows, the driver folds the tiny partials into new centroids. The
  corpus is never shuffled or collected; per-iteration traffic is
  O(K * d * blocks).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _norm_rows(E: np.ndarray) -> np.ndarray:
    return E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, query_vecs: np.ndarray, query_ids: list[int],
                     k: int = 10, exclude_self: bool = True) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Returns a small pandas
    DataFrame (query_id, rank, vec_id, cos_sim), rank 1-based, ties broken
    by vec_id ascending."""
    Q = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put(Q)          # broadcast once; ray.get in a task is a
                               # zero-copy read from the local store

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(qref)
        E = _norm_rows(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = E @ Qm.T                          # (n, q)
        ids = batch["vec_id"].to_numpy()
        out = []
        kk = min(k + 1, len(ids))
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            top = np.argpartition(-s, kk - 1)[:kk]
            out.append(pd.DataFrame({
                "query_id": query_ids[qi], "vec_id": ids[top],
                "cos_sim": s[top]}))
        return pd.concat(out, ignore_index=True)

    partial = ds.map_batches(partial_topk, batch_format="pandas")
    pdf = partial.to_pandas()                        # tiny: q * (k+1) * blocks
    if exclude_self:
        pdf = pdf[pdf["query_id"] != pdf["vec_id"]]
    pdf = pdf.sort_values(["query_id", "cos_sim", "vec_id"],
                          ascending=[True, False, True], kind="stable")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[["query_id", "rank", "vec_id", "cos_sim"]]


def semantic_clusters(ds, init_centroids: np.ndarray, iterations: int = 0
                      ) -> "ray.data.Dataset":
    """Assign every vector to its nearest centroid by cosine, optionally
    refining centroids with ``iterations`` rounds of distributed Lloyd
    k-means first. Deterministic: ties break toward the lower cluster
    index (numpy argmax first-max), matching a SQL
    ``row_number() ... ORDER BY c DESC, cluster`` oracle when
    ``iterations=0``.

    Each refinement round broadcasts the K×d centroid matrix
    (``ray.put``) and map_batches emits at most K partial
    (cluster, vec_sum, count) rows per batch; the driver folds those
    partials — the small-side-merge shape, never a corpus shuffle.
    Empty clusters keep their previous centroid. Returns a Dataset of
    (vec_id, cluster).
    """
    C = _norm_rows(np.asarray(init_centroids, dtype=np.float64))

    if iterations:
        # cache upstream blocks once: each refinement round re-executes
        # the lazy plan otherwise (N reads of the corpus for N rounds)
        ds = ds.materialize()

    for _ in range(iterations):
        cref = ray.put(C)

        def partial_sums(batch: pd.DataFrame) -> pd.DataFrame:
            C_ = ray.get(cref)
            E = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            assign = np.argmax(_norm_rows(E) @ C_.T, axis=1)
            rows = []
            for ci in np.unique(assign):
                m = assign == ci
                rows.append((int(ci), E[m].sum(axis=0), int(m.sum())))
            return pd.DataFrame(rows, columns=["cluster", "vsum", "n"])

        parts = ds.map_batches(partial_sums,
                               batch_format="pandas").to_pandas()
        newC = C.copy()
        for ci, grp in parts.groupby("cluster"):
            tot = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            n = grp["n"].sum()
            if n:
                newC[ci] = tot / n
        C = _norm_rows(newC)

    cref = ray.put(C)

    def assign_final(batch: pd.DataFrame) -> pd.DataFrame:
        C_ = ray.get(cref)
        E = _norm_rows(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        return pd.DataFrame({
            "vec_id": batch["vec_id"].to_numpy(),
            "cluster": np.argmax(E @ C_.T, axis=1).astype(np.int64)})

    return ds.map_batches(assign_final, batch_format="pandas")


def label_centroids(ds, label_col: str = "label",
                    vec_col: str = "embedding"):
    """Mean-pool embeddings per label (class prototypes — the building
    block for SemDeDup-style semantic dedup diagnostics and prototype
    classifiers): per-batch partial (sum, count) per label, tiny driver
    fold — label cardinality is bounded, the corpus never moves.
    Returns (labels, centroid_matrix float64, counts)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        E = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        labels = batch[label_col].to_numpy()
        uniq, inv = np.unique(labels, return_inverse=True)
        rows = [(u, E[inv == i].sum(axis=0), int((inv == i).sum()))
                for i, u in enumerate(uniq)]
        return pd.DataFrame(rows, columns=[label_col, "vsum", "n"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        raise ValueError("label_centroids: empty input dataset — no "
                         "labels to pool")
    out_labels, cents, counts = [], [], []
    for lab, grp in parts.groupby(label_col, sort=True):
        tot = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
        n = int(grp["n"].sum())
        out_labels.append(lab)
        cents.append(tot / n)
        counts.append(n)
    return out_labels, np.stack(cents), np.asarray(counts, np.int64)


def _train_coarse_centroids(ds, n_centroids: int, seed: int,
                            train_sample: int) -> np.ndarray:
    """Seeded fixed-iteration k-means on a bounded corpus sample."""
    sample = ds.limit(train_sample).to_pandas()
    X = _norm_rows(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), min(n_centroids, len(X)), replace=False)]
    for _ in range(10):
        assign = np.argmax(X @ C.T, axis=1)
        for ci in range(len(C)):
            members = X[assign == ci]
            if len(members):
                C[ci] = members.mean(axis=0)
        C = _norm_rows(C)
    return C


def sq8_encode(E: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-vector symmetric int8 scalar quantization: q = round(127 *
    v / max|v|), dequantize as q * (max|v|/127).  On unit-normalized
    vectors the per-dim error is <= 1/254, negligible for cosine
    ranking, while the stored bytes drop 8x vs float64 lists."""
    amax = np.abs(E).max(axis=1)
    amax[amax == 0] = 1.0
    scale = (amax / 127.0).astype(np.float32)
    q = np.rint(E / scale[:, None]).astype(np.int8)
    return q, scale


def pq_train(X: np.ndarray, m: int, n_codes: int = 256, seed: int = 3,
             iters: int = 10) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    d dims into ``m`` subspaces and k-means each independently.
    Returns (m, k, d/m) float64; k = min(n_codes, n_train) ≤ 256 so
    codes fit uint8. Seeded + fixed iterations — deterministic."""
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n == 0:
        raise ValueError("pq_train on empty sample")
    if n_codes > 256:
        raise ValueError("n_codes > 256 breaks the uint8 code layout")
    sub_d = d // m
    k = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, sub_d))
    for j in range(m):
        sub = X[:, j * sub_d:(j + 1) * sub_d]
        C = sub[rng.choice(n, k, replace=False)].copy()
        for _ in range(iters):
            # L2 assign via the expanded form (no n×k×d intermediate)
            a = np.argmin((C * C).sum(1) - 2.0 * (sub @ C.T), axis=1)
            for ci in range(k):
                mem = sub[a == ci]
                if len(mem):
                    C[ci] = mem.mean(axis=0)
        books[j] = C
    return books


def pq_encode(E: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Assign each vector's subspaces to nearest codewords → (n, m) uint8."""
    m, k, sub_d = books.shape
    codes = np.zeros((len(E), m), np.uint8)
    for j in range(m):
        sub = E[:, j * sub_d:(j + 1) * sub_d]
        C = books[j]
        codes[:, j] = np.argmin((C * C).sum(1) - 2.0 * (sub @ C.T),
                                axis=1).astype(np.uint8)
    return codes


def pq_decode(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstruct approximate vectors from codes: concat codewords."""
    m = books.shape[0]
    return np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)


def adc_scores(codes: np.ndarray, q: np.ndarray,
               books: np.ndarray) -> np.ndarray:
    """Asymmetric-distance dot products: score(x) = q · decode(x),
    computed as m LUT hits per vector — the per-subspace tables
    ``books[j] @ q_sub`` are built once per query, then each code row
    sums m table entries (no decode materialization)."""
    m, k, sub_d = books.shape
    lut = np.einsum("mkd,md->mk", books,
                    q.reshape(m, sub_d))            # (m, k)
    return lut[np.arange(m)[None, :], codes].sum(axis=1)


def ivf_build(ds, index_dir: str, n_centroids: int = 16, seed: int = 3,
              train_sample: int = 2048, quantize: bool = False,
              pq_m: int = 0) -> np.ndarray:
    """One-time PERSISTED IVF index build (round-3 VERDICT #2).

    Trains coarse centroids on a bounded sample, quantizes every vector
    ONCE, and writes the corpus partitioned by list id through the
    exactly-once partitioned sink (``{index_dir}/part={list}/`` with
    .done markers — a killed build resumes, skipping committed lists).
    Centroids land atomically in ``{index_dir}/centroids.npy``. Query
    time (``ivf_query``) then reads ONLY the probed list partitions, so
    bytes read scale with nprobe/n_centroids, not corpus size.

    ``quantize=True`` stores int8 scalar-quantized NORMALIZED vectors
    (``emb_q`` list<int8> + per-vector ``scale``) INSTEAD of the float
    embedding column — probed reads then move ~8x fewer bytes on top of
    the nprobe/n_lists pruning; ``ivf_query`` auto-detects via the
    recorded index meta. ``pq_m=M`` (mutually exclusive with
    ``quantize``) stores M-byte product-quantization codes instead —
    bytes per vector drop d×8 → M (e.g. 64 for d=64/m=8), query scoring
    runs as ADC lookup-table sums (FAISS IVFPQ shape); codebooks are
    trained on the same bounded sample and persist next to the
    centroids. Returns the centroid matrix."""
    from ..sinks import write_partitioned

    if quantize and pq_m:
        raise ValueError("quantize (sq8) and pq_m are alternatives")
    cpath = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cpath) and os.path.exists(
            os.path.join(index_dir, ".index_done")):
        return np.load(cpath)
    os.makedirs(index_dir, exist_ok=True)
    C = _train_coarse_centroids(ds, n_centroids, seed, train_sample)
    books = None
    if pq_m:
        # codebooks train on RESIDUALS (vector − its coarse centroid),
        # the IVFPQ formulation — the code budget then resolves the
        # within-list fine structure instead of re-describing the
        # centroid every vector shares
        sample = ds.limit(train_sample).to_pandas()
        X = _norm_rows(np.stack(sample["embedding"].to_numpy())
                       .astype(np.float64))
        resid = X - C[np.argmax(X @ C.T, axis=1)]
        books = pq_train(resid, pq_m, seed=seed)
    cref = ray.put((C, books))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        C_, books_ = ray.get(cref)
        E = _norm_rows(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        batch = batch.copy()
        lid = np.argmax(E @ C_.T, axis=1)
        batch["list_id"] = lid.astype(np.int64)
        if quantize:
            q, scale = sq8_encode(E)
            batch = batch.drop(columns=["embedding"])
            batch["emb_q"] = list(q)
            batch["scale"] = scale
        elif books_ is not None:
            codes = pq_encode(E - C_[lid], books_)
            batch = batch.drop(columns=["embedding"])
            batch["pq_code"] = list(codes)
        return batch

    write_partitioned(ds.map_batches(assign, batch_format="pandas"),
                      index_dir, partition_col="list_id",
                      keep_partition_col=True)
    if books is not None:
        btmp = os.path.join(index_dir, "pq_codebooks.npy.tmp")
        with open(btmp, "wb") as f:
            np.save(f, books)
        os.replace(btmp, os.path.join(index_dir, "pq_codebooks.npy"))
    _atomic_meta(index_dir, {"quantize": bool(quantize),
                             "pq_m": int(pq_m),
                             "n_centroids": int(len(C))})
    tmp = cpath + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, C)
    os.replace(tmp, cpath)
    with open(os.path.join(index_dir, ".index_done"), "w") as f:
        f.write(str(len(C)))
    return C


def ivf_list_files(index_dir: str, list_ids=None) -> list[str]:
    """COMMITTED data files of the given lists (default: all lists):
    the build's ``data.parquet`` (committed via ``.done``) plus any
    ``ivf_append`` batches' ``data-{batch}.parquet`` (committed via
    ``.done-{batch}``).  Uncommitted files from a crashed append are
    invisible until the batch is rerun to completion."""
    import glob as _glob
    import re

    if list_ids is None:
        pdirs = sorted(_glob.glob(os.path.join(index_dir, "part=*")))
    else:
        pdirs = [os.path.join(index_dir, f"part={li}") for li in list_ids]
    out = []
    for pdir in pdirs:
        if not os.path.isdir(pdir):
            continue
        names = set(os.listdir(pdir))
        if "data.parquet" in names and ".done" in names:
            out.append(os.path.join(pdir, "data.parquet"))
        for name in sorted(names):
            m = re.fullmatch(r"data-(.+)\.parquet", name)
            if m and f".done-{m.group(1)}" in names:
                out.append(os.path.join(pdir, name))
    return out


def ivf_append(ds, index_dir: str, batch_id: str) -> pd.DataFrame:
    """Incremental add to a PERSISTED IVF index — no rebuild, no full
    rewrite: new vectors are assigned to the FROZEN coarse centroids
    (quantized iff the index was built with ``quantize=True``, per the
    recorded meta) and appended as ONE atomically-committed file per
    touched list: ``part={li}/data-{batch_id}.parquet`` + a
    ``.done-{batch_id}`` marker written after the rename.  A rerun of
    the same ``batch_id`` skips committed lists, so a crashed append
    resumes and a completed one is idempotent (the same observational
    exactly-once protocol as ``sinks.write_partitioned``).  I/O is one
    pass over the NEW rows only — the existing index is never read.

    Frozen centroids mean recall degrades only if the appended data
    drifts from the build-time distribution; the returned report
    carries ``attrs['list_counts']`` (per-list committed row counts,
    from parquet footers of the touched + existing files) so callers
    can trigger a rebuild on imbalance.  Returns (list_id, n_rows,
    skipped) per touched list."""
    import re

    import pyarrow.parquet as pq

    if not os.path.exists(os.path.join(index_dir, ".index_done")):
        raise ValueError(f"{index_dir}: not a completed IVF index "
                         "(run ivf_build first)")
    if not re.fullmatch(r"[A-Za-z0-9_\-]+", batch_id):
        raise ValueError(f"batch_id {batch_id!r}: use [A-Za-z0-9_-]+ "
                         "(it names files and commit markers)")
    C = np.load(os.path.join(index_dir, "centroids.npy"))
    meta = _load_meta(index_dir)
    quantize = bool(meta.get("quantize"))
    books = (np.load(os.path.join(index_dir, "pq_codebooks.npy"))
             if meta.get("pq_m") else None)
    cref = ray.put((C, books))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        C_, books_ = ray.get(cref)
        E = _norm_rows(np.stack(batch["embedding"].to_numpy())
                       .astype(np.float64))
        batch = batch.copy()
        lid = np.argmax(E @ C_.T, axis=1)
        batch["list_id"] = lid.astype(np.int64)
        if quantize:
            q, scale = sq8_encode(E)
            batch = batch.drop(columns=["embedding"])
            batch["emb_q"] = list(q)
            batch["scale"] = scale
        elif books_ is not None:
            # residual encoding per the recorded IVFPQ design
            batch = batch.drop(columns=["embedding"])
            batch["pq_code"] = list(pq_encode(E - C_[lid], books_))
        return batch

    def write_list(df: pd.DataFrame) -> pd.DataFrame:
        li = int(df["list_id"].iloc[0])
        pdir = os.path.join(index_dir, f"part={li}")
        done = os.path.join(pdir, f".done-{batch_id}")
        if os.path.exists(done):
            return pd.DataFrame([{"list_id": li, "n_rows": 0,
                                  "skipped": True}])
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, f"data-{batch_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, path)
        with open(done + ".tmp", "w") as f:
            f.write(str(len(df)))
        os.replace(done + ".tmp", done)
        return pd.DataFrame([{"list_id": li, "n_rows": len(df),
                              "skipped": False}])

    report = (ds.map_batches(assign, batch_format="pandas")
                .groupby("list_id").map_groups(write_list,
                                               batch_format="pandas")
                .to_pandas())
    counts = {}
    for p in ivf_list_files(index_dir):
        li = int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
        counts[li] = counts.get(li, 0) + pq.ParquetFile(p).metadata.num_rows
    report.attrs["list_counts"] = counts
    return report


def _atomic_meta(index_dir: str, meta: dict) -> None:
    import json
    p = os.path.join(index_dir, "index_meta.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, p)


def _load_meta(index_dir: str) -> dict:
    import json
    p = os.path.join(index_dir, "index_meta.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"quantize": False}   # pre-r4 indexes stored float embeddings


def ivf_query(index_dir: str, query_vecs: np.ndarray, query_ids: list[int],
              k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """Approximate top-k against a PERSISTED IVF index: loads the (tiny)
    centroid matrix, picks each query's ``nprobe`` nearest lists, and
    issues a parquet read over ONLY the union of probed list partitions
    — the scan and the I/O are both pruned (no re-quantization: the
    stored ``list_id`` column routes rows to queries). Sets
    ``pdf.attrs['bytes_read' / 'bytes_total']`` for scale evidence."""
    import ray.data as rd

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    Q = _norm_rows(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]   # (q, nprobe)
    wanted = [set(p) for p in probes.tolist()]
    lists_needed = sorted(set(probes.ravel().tolist()))
    # committed build + append files of the probed lists only
    paths = ivf_list_files(index_dir, lists_needed)
    bytes_read = sum(os.path.getsize(p) for p in paths)
    bytes_total = sum(os.path.getsize(p) for p in ivf_list_files(index_dir))
    meta = _load_meta(index_dir)
    quantized = bool(meta.get("quantize"))
    books = (np.load(os.path.join(index_dir, "pq_codebooks.npy"))
             if meta.get("pq_m") else None)
    qref = ray.put((Q, wanted, books, C if books is not None else None))

    def probed_topk(batch: pd.DataFrame) -> pd.DataFrame:
        Qm, wanted_, books_, C_ = ray.get(qref)
        codes = None
        if books_ is not None:
            # ADC path: score = q·centroid(list) + LUT sums over the
            # m-byte RESIDUAL codes — no vector reconstruction
            codes = np.stack(batch["pq_code"].to_numpy()).astype(np.uint8)
            E = None
        elif quantized:
            # dequantize int8 -> ~unit vectors; renorm absorbs the
            # <= 1/254-per-dim quantization drift
            E = _norm_rows(np.stack(batch["emb_q"].to_numpy())
                           .astype(np.float64)
                           * batch["scale"].to_numpy()[:, None])
        else:
            E = _norm_rows(np.stack(batch["embedding"].to_numpy())
                           .astype(np.float64))
        lists = batch["list_id"].to_numpy()
        ids = batch["vec_id"].to_numpy()
        out = []
        for qi in range(len(Qm)):
            mask = np.isin(lists, list(wanted_[qi]))
            if not mask.any():
                continue
            s = (C_[lists[mask]] @ Qm[qi]
                 + adc_scores(codes[mask], Qm[qi], books_)
                 if codes is not None else E[mask] @ Qm[qi])
            sub = ids[mask]
            kk = min(k + 1, len(sub))
            top = np.argpartition(-s, kk - 1)[:kk]
            out.append(pd.DataFrame({
                "query_id": query_ids[qi], "vec_id": sub[top],
                "cos_sim": s[top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "cos_sim": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    if not paths:
        pdf = pd.DataFrame({"query_id": [], "rank": [], "vec_id": [],
                            "cos_sim": []})
        pdf.attrs.update(bytes_read=0, bytes_total=bytes_total)
        return pdf
    partial = rd.read_parquet(paths).map_batches(probed_topk,
                                                 batch_format="pandas")
    pdf = partial.to_pandas()
    pdf = pdf[pdf["query_id"] != pdf["vec_id"]]
    pdf = pdf.sort_values(["query_id", "cos_sim", "vec_id"],
                          ascending=[True, False, True], kind="stable")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    pdf = pdf[["query_id", "rank", "vec_id", "cos_sim"]]
    pdf.attrs.update(bytes_read=bytes_read, bytes_total=bytes_total)
    return pdf


def mine_hard_negatives(index_dir: str, query_vecs: np.ndarray,
                        query_ids: list[int], positives: dict,
                        k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-``k`` most similar corpus vectors that are NOT among its known
    positives — the negatives that actually move an InfoNCE/triplet
    loss, mined straight off the persisted IVF index (probed-partition
    reads only; I/O ∝ nprobe/n_lists).

    ``positives``: ``{query_id: iterable of positive vec_ids}`` (the
    query's own id is always excluded by ``ivf_query``).  The probe
    over-fetches ``k + max|positives|`` then filters and re-ranks on
    the driver — the hit table is q×k-small by construction.  Returns
    (query_id, rank, vec_id, cos_sim).
    """
    pos = {int(q): set(int(v) for v in vs) for q, vs in positives.items()}
    extra = max((len(v) for v in pos.values()), default=0)
    hits = ivf_query(index_dir, query_vecs, query_ids,
                     k=k + extra, nprobe=nprobe)
    if not len(hits):
        return hits
    drop = np.fromiter(
        (int(v) in pos.get(int(q), ()) for q, v in
         zip(hits["query_id"].to_numpy(), hits["vec_id"].to_numpy())),
        bool, len(hits))
    out = hits[~drop].copy()
    out = out.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out.attrs.update(hits.attrs)
    return out[["query_id", "rank", "vec_id", "cos_sim"]]


def ivf_topk(ds, query_vecs: np.ndarray, query_ids: list[int], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 3,
             train_sample: int = 2048, quantize: bool = False,
             pq_m: int = 0, index_dir: str | None = None) -> pd.DataFrame:
    """IVF approximate top-k = ``ivf_build`` (skipped when the persisted
    index already exists) + ``ivf_query`` (pruned read of the nprobe
    probed lists). With ``index_dir=None`` a fresh ephemeral index is
    built under /tmp for this call (callers wanting reuse pass
    index_dir)."""
    import shutil
    import tempfile

    ephemeral = index_dir is None
    if ephemeral:
        index_dir = tempfile.mkdtemp(prefix="fw_ray_ivf_")
    try:
        ivf_build(ds, index_dir, n_centroids=n_centroids, seed=seed,
                  train_sample=train_sample, quantize=quantize, pq_m=pq_m)
        return ivf_query(index_dir, query_vecs, query_ids, k=k,
                         nprobe=nprobe)
    finally:
        if ephemeral:
            shutil.rmtree(index_dir, ignore_errors=True)


def pca_fit(ds, n_components: int, emb_col: str = "embedding",
            center: bool = True) -> dict:
    """Distributed PCA over an embedding column — the dimensionality-
    reduction / whitening step before ANN or clustering.

    Exact, one pass, bounded exchange: each batch emits its (d×d)
    Gram-matrix partial, the column sum and the row count (d=768 →
    ~4.7 MB per partial); the driver folds the tiny partials, forms the
    covariance (X'X − n·μμ')/(n−1) and eigendecomposes LOCALLY (d×d —
    independent of corpus size). Deterministic: eigh is deterministic
    and each component's sign is fixed so its max-|loading| coordinate
    is positive. Returns {"components" (k, d), "mean" (d,),
    "explained_variance" (k,), "explained_ratio" (k,)}."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        E = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "gram": [ (E.T @ E).ravel() ],
            "colsum": [E.sum(axis=0)],
            "n": [len(E)]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        raise ValueError("pca_fit on an empty dataset")
    gram = np.sum(np.stack(parts["gram"].to_numpy()), axis=0)
    colsum = np.sum(np.stack(parts["colsum"].to_numpy()), axis=0)
    n = int(parts["n"].sum())
    d = len(colsum)
    G = gram.reshape(d, d)
    mean = colsum / n
    if center:
        cov = (G - n * np.outer(mean, mean)) / max(n - 1, 1)
    else:
        cov = G / max(n - 1, 1)
        mean = np.zeros(d)
    w, v = np.linalg.eigh(cov)              # ascending
    order = np.argsort(-w)[:n_components]
    comps = v[:, order].T                   # (k, d)
    # deterministic sign: max-|loading| coordinate positive per component
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    ev = np.maximum(w[order], 0.0)
    tot = np.maximum(w.sum(), 1e-300)
    return {"components": comps, "mean": mean,
            "explained_variance": ev, "explained_ratio": ev / tot}


def pca_transform(ds, model: dict, emb_col: str = "embedding",
                  out_col: str = "embedding", whiten: bool = False):
    """Project embeddings onto the fitted components (optionally
    whitened: unit variance per component). Model broadcast once;
    shuffle-free one-matmul map per batch."""
    import ray
    scale = (1.0 / np.sqrt(np.maximum(model["explained_variance"], 1e-12))
             if whiten else None)
    mref = ray.put((model["components"], model["mean"], scale))

    def proj(batch: pd.DataFrame) -> pd.DataFrame:
        comps, mean, sc = ray.get(mref)
        E = np.stack(batch[emb_col].to_numpy()).astype(np.float64)
        Y = (E - mean) @ comps.T
        if sc is not None:
            Y = Y * sc
        out = batch.copy()
        if out_col in out.columns and out_col != emb_col:
            out = out.drop(columns=[out_col])
        out[out_col] = list(Y.astype(np.float32))
        return out

    return ds.map_batches(proj, batch_format="pandas")
