"""Incremental exact dedup against a PERSISTED fingerprint store — the
continuous-ingestion story: a corpus that grows by batches over months
must dedup each new batch against everything already accepted, without
ever re-scanning old text.

Design: the corpus catalog table IS the fingerprint store. Rows are
stored with their content digest and hash-BUCKETED on it
(``catalog_write(bucket_by=("_digest", n))`` layout), so an incoming
batch anti-joins against the store by reading, per touched bucket, ONLY
the store's ``_digest`` column of that bucket's files — Parquet column
pruning makes the "store scan" cost the fingerprint index (16 B/row),
not the corpus, and bucket pruning skips store buckets the new batch
never hashes into. Survivors are written INSIDE the same per-bucket
task (the catalog's distributed-write shape), so the whole ingest is
ONE hash exchange of the new batch; the store read and the data-file
write ride the same task. The atomic manifest commit at the end makes
the ingest exactly-once: a crashed run leaves only unreferenced data
files (``catalog_vacuum`` reclaims them) and a rerun is a full,
correct redo; a rerun after success finds every digest in the store
and commits nothing.

At 100 TB: the exchange is O(new batch); the store I/O is
O(fingerprints of touched buckets), which for a small incremental
batch is a small fraction of the store and NEVER includes text bytes.
Skewed content (one viral text duplicated millions of times in the new
batch) collapses inside the per-bucket task to one survivor row before
any store I/O.

The digest must be stable ACROSS RUNS AND VERSIONS (it is persisted),
so this module does not use ``dedup._text_hash_int64`` (polars xxhash,
documented run-stable only). ``stable_digest64`` is blake2b/64
(cryptographic — collision safety matters when fingerprints are the
PERMANENT dedup authority), pinned by literal test vectors. It is a
per-row hashlib call, a MEASURED exception to the vectorize-everything
rule: C-per-row blake2b runs 7.5× faster than the previous pure-numpy
polynomial digest (0.09 s vs 0.67 s / 40 k docs / 12 MB) because u64
cumprod/cumsum are serial dependency chains numpy cannot SIMD, while
hashlib's per-call overhead is ~1.5 µs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_DIGEST_COL = "_digest"


def stable_digest64(texts) -> np.ndarray:
    """63-bit blake2b content digest per text (non-negative int64 for
    Arrow/SQL friendliness): low 8 little-endian digest bytes, top bit
    masked. Stability contract: hashlib.blake2b is a pinned public
    standard (RFC 7693) — the persisted store survives library
    upgrades. Pinned literal vectors in ``tests/test_ingest_dedup.py``.
    """
    import hashlib
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode("utf-8"),
                                        digest_size=8).digest(),
                        "little") & 0x7FFFFFFFFFFFFFFF
         for t in texts), np.int64, len(texts))


def _store_snapshot(table_dir: str, n_buckets: int):
    """Resolve the store's committed snapshot ONCE on the driver.

    Returns (version, files_by_bucket, rows_by_bucket); version 0 =
    fresh store. Validates the bucket spec against ``n_buckets``.
    """
    from ..sources.catalog import _latest_version, _load_manifest
    v = _latest_version(table_dir)
    if v == 0:
        return 0, {}, {}
    m = _load_manifest(table_dir, v)
    spec = m.get("bucket_by")
    if spec != [_DIGEST_COL, n_buckets]:
        raise ValueError(
            f"store {table_dir} is bucketed by {spec}; dedup_ingest "
            f"needs [{_DIGEST_COL!r}, {n_buckets}] — pass the store's "
            "own n_buckets")
    files: dict[int, list[str]] = {}
    rows: dict[int, int] = {}
    for f in m["files"]:
        b = f["bucket"]
        files.setdefault(b, []).append(os.path.join(table_dir, f["path"]))
        rows[b] = rows.get(b, 0) + f["rows"]
    return v, files, rows


_EMPTY_REPORT = {"path": "", "rows": 0, "stats": "{}", "bucket": -1,
                 "schema": "{}"}


def dedup_ingest(new_ds, table_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", n_buckets: int = 64) -> dict:
    """Ingest ``new_ds`` into the self-deduplicating corpus table at
    ``table_dir``: rows whose text digest already exists in the store
    (or earlier in this batch — min ``id_col`` survives) are dropped;
    survivors are appended as one new catalog version, bucketed on
    ``_digest`` so the NEXT ingest prunes its store reads the same way.

    Returns a report dict: version committed (unchanged if the whole
    batch was duplicate), n_in / n_new / n_dup_within_batch /
    n_dup_vs_store, and the store-read evidence
    (store_buckets_read, store_rows_read vs store_rows_total).
    """
    from ..sources.catalog import (_commit_files, _write_data_file)
    from .window_stats import stable_bucket_of

    from ..sources.catalog import _MANIFEST
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(table_dir, _MANIFEST), exist_ok=True)
    version, store_files, store_rows = _store_snapshot(table_dir, n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        dig = stable_digest64(t[text_col].to_pylist())
        t = t.append_column(_DIGEST_COL, pa.array(dig, pa.int64()))
        b = stable_bucket_of(dig, n_buckets)
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    tagged = new_ds.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)

    def ingest_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        n_in = len(df)
        bucket = int(df["_bucket"].iloc[0])
        # intra-batch: min id per digest survives (deterministic)
        df = df.sort_values([_DIGEST_COL, id_col],
                            kind="stable").drop_duplicates(_DIGEST_COL)
        n_batch_dup = n_in - len(df)
        # store anti-join: digest column only, this bucket's files only
        seen_rows = 0
        paths = store_files.get(bucket, [])
        if paths:
            seen = pa.concat_tables(
                [pq.read_table(p, columns=[_DIGEST_COL]) for p in paths])
            seen_rows = len(seen)
            mask = ~np.isin(df[_DIGEST_COL].to_numpy(),
                            seen[_DIGEST_COL].to_numpy())
            df = df[mask]
        n_store_dup = (n_in - n_batch_dup) - len(df)
        row = dict(_EMPTY_REPORT)
        if len(df):
            rep = _write_data_file(pa.Table.from_pandas(
                df, preserve_index=False), data_dir)
            row = {k: rep[k][0].as_py() for k in row}
        row.update({"n_in": n_in, "n_batch_dup": n_batch_dup,
                    "n_store_dup": n_store_dup,
                    "seen_rows": seen_rows,
                    "read_store": int(bool(paths))})
        return pd.DataFrame([row])

    report = (tagged.groupby("_bucket")
                    .map_groups(ingest_bucket,
                                batch_format="pandas").to_pandas())

    out = {"table_dir": table_dir, "version": version,
           "n_in": int(report["n_in"].sum()) if len(report) else 0,
           "n_dup_within_batch":
               int(report["n_batch_dup"].sum()) if len(report) else 0,
           "n_dup_vs_store":
               int(report["n_store_dup"].sum()) if len(report) else 0,
           "store_buckets_read":
               int(report["read_store"].sum()) if len(report) else 0,
           "store_rows_read":
               int(report["seen_rows"].sum()) if len(report) else 0,
           "store_rows_total": int(sum(store_rows.values()))}
    new_files = report[report["path"] != ""] if len(report) else report
    out["n_new"] = int(new_files["rows"].sum()) if len(new_files) else 0
    if len(new_files):
        manifest = _commit_files(table_dir, new_files, "append",
                                 (_DIGEST_COL, n_buckets))
        out["version"] = manifest["version"]
    return out


# ---------------------------------------------------------------------------
# Near-duplicate (MinHash) incremental ingest
# ---------------------------------------------------------------------------

_BANDS_TBL, _SIGS_TBL = "bands", "sigs"
_MERSENNE = (1 << 61) - 1


def _band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signatures → (n, bands) folded int64 band keys.
    Same per-band fold as ``dedup.minhash_band_rows`` with band_id
    mixed in, so one key column carries (band_id, band_hash)."""
    n, num_perm = sigs.shape
    rpb = num_perm // bands
    out = np.empty((n, bands), np.int64)
    for bi in range(bands):
        seg = sigs[:, bi * rpb:(bi + 1) * rpb]
        h = np.zeros(n, np.int64)
        for c in range(rpb):
            h = (h * 1_000_003 + seg[:, c]) % _MERSENNE
        out[:, bi] = (bi * 1_000_003 + h) % _MERSENNE
    return out


def _minhash_meta(store_dir: str, params: dict) -> None:
    """Pin the hasher parameters on first ingest; later ingests with
    different parameters would silently never match — refuse them."""
    from ..sources.catalog import _atomic_json
    p = os.path.join(store_dir, "minhash_meta.json")
    if os.path.exists(p):
        with open(p) as f:
            committed = json.load(f)
        if committed != params:
            raise ValueError(f"store {store_dir} was built with "
                             f"{committed}, got {params}")
        return
    os.makedirs(store_dir, exist_ok=True)
    _atomic_json(p, params)


def minhash_ingest(new_ds, store_dir: str, text_col: str = "text",
                   id_col: str = "doc_id", num_perm: int = 128,
                   bands: int = 16, shingle_k: int = 7, seed: int = 7,
                   tau: float = 0.7, n_buckets: int = 64,
                   bucket_cap: int = 200):
    """Incremental NEAR-duplicate dedup against a persisted MinHash
    store — the fuzzy twin of :func:`dedup_ingest`.

    Store layout under ``store_dir`` (two bucketed catalog tables):
    ``bands/`` (band_key, doc_id) bucketed on band_key — the discovery
    index; ``sigs/`` (doc_id, sig list<int64>) bucketed on doc_id —
    the verification payloads, fetched per candidate via
    ``catalog_lookup`` (I/O bounded by candidates, never store size).

    Per batch: signatures once (vectorized ``MinHasher``), band keys
    re-derived FROM the signatures (no second text pass), one bounded
    bucket exchange where each task reads only its store band bucket;
    candidate pairs (new×store ∪ new×new, hot buckets capped like
    ``lsh_candidate_pairs``) are verified by signature-estimated
    Jaccard (mean equal slots ≥ ``tau``). Within-batch verified pairs
    union-find into components: a component touching a store dup is
    dropped whole, otherwise its min id survives. A candidate with the
    SAME id as a store row counts as a store dup (exact re-ingest), so
    rerunning a committed batch appends nothing.

    Commit order: ``sigs`` then ``bands`` — visibility is the bands
    commit (discovery goes through bands). A crash in between leaves
    orphan sig rows, which are benign: the sig fetch dedups on doc_id
    and the batch replays cleanly.

    Returns ``(survivors_ds, report)``: survivors filtered from
    ``new_ds`` by broadcasting the DROPPED id set (the small side by
    construction — it is the duplicates).
    """
    import ray
    import ray.data as rd

    from ..sources.catalog import (_latest_version, _load_manifest,
                                   catalog_lookup, catalog_write)
    from .dedup import MinHasher
    from .window_stats import stable_bucket_of

    _minhash_meta(store_dir, {"num_perm": num_perm, "bands": bands,
                              "shingle_k": shingle_k, "seed": seed})
    bands_dir = os.path.join(store_dir, _BANDS_TBL)
    sigs_dir = os.path.join(store_dir, _SIGS_TBL)

    hasher_cfg = dict(num_perm=num_perm, shingle_k=shingle_k, seed=seed)

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        mh = MinHasher(**hasher_cfg)
        sigs = mh.signatures_batch(batch[text_col].tolist())
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "sig": list(sigs)})

    sig_ds = new_ds.map_batches(sig_rows, batch_format="pandas") \
                   .materialize()          # reused 3x; 1 KB/doc

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["sig"].to_numpy())
        bk = _band_keys(sigs, bands)
        n = len(batch)
        df = pd.DataFrame({
            "band_key": bk.ravel(),
            id_col: np.repeat(batch[id_col].to_numpy(), bands)})
        df["_bucket"] = stable_bucket_of(df["band_key"].to_numpy(),
                                         n_buckets)
        return df

    new_bands = sig_ds.map_batches(band_rows, batch_format="pandas")

    # store band files by bucket, resolved once on the driver
    bv = _latest_version(bands_dir)
    store_band_files: dict[int, list[str]] = {}
    if bv:
        for f in _load_manifest(bands_dir, bv)["files"]:
            store_band_files.setdefault(f["bucket"], []).append(
                os.path.join(bands_dir, f["path"]))

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        bucket = int(df["_bucket"].iloc[0])
        paths = store_band_files.get(bucket, [])
        if paths:
            store = pa.concat_tables(
                [pq.read_table(p, columns=["band_key", id_col])
                 for p in paths]).to_pandas()
            store["_new"] = False
        else:
            store = df.iloc[0:0][["band_key", id_col]].assign(_new=False)
        cur = df[["band_key", id_col]].assign(_new=True)
        allr = pd.concat([cur, store], ignore_index=True)
        out_a, out_b, out_st = [], [], []
        for _, g in allr.groupby("band_key", sort=False):
            gn = g[g["_new"]]
            if not len(gn):
                continue
            new_ids = np.unique(gn[id_col].to_numpy())
            old_ids = np.unique(g.loc[~g["_new"], id_col].to_numpy())
            if len(new_ids) + len(old_ids) < 2:
                continue
            if len(new_ids) > bucket_cap:
                rng = np.random.default_rng(bucket & 0x7FFFFFFF)
                new_ids = np.sort(rng.choice(new_ids, bucket_cap,
                                             replace=False))
            if len(old_ids) > bucket_cap:
                rng = np.random.default_rng((bucket + 1) & 0x7FFFFFFF)
                old_ids = np.sort(rng.choice(old_ids, bucket_cap,
                                             replace=False))
            # new x new (a < b)
            if len(new_ids) > 1:
                ia, ib = np.triu_indices(len(new_ids), k=1)
                out_a.append(new_ids[ia]); out_b.append(new_ids[ib])
                out_st.append(np.zeros(len(ia), bool))
            # new x store (same id = exact re-ingest -> store dup)
            if len(old_ids):
                aa = np.repeat(new_ids, len(old_ids))
                bb = np.tile(old_ids, len(new_ids))
                out_a.append(aa); out_b.append(bb)
                out_st.append(np.ones(len(aa), bool))
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "b_store": pd.Series(dtype=bool)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "b_store": np.concatenate(out_st)}
                            ).drop_duplicates()

    cand = (new_bands.groupby("_bucket")
                     .map_groups(candidates, batch_format="pandas")
                     .to_pandas())
    if len(cand):
        cand = cand.drop_duplicates(subset=["a", "b", "b_store"])

    # --- verification: signature-estimated Jaccard ---------------------
    new_ids_needed = set(cand["a"]) | set(cand.loc[~cand["b_store"], "b"]) \
        if len(cand) else set()
    store_ids_needed = set(cand.loc[cand["b_store"], "b"]) \
        if len(cand) else set()
    # same-id pair = exact re-ingest: dup by definition, skip sig math
    self_dup = cand[cand["b_store"] & (cand["a"] == cand["b"])] \
        if len(cand) else cand
    store_ids_needed -= set(self_dup["b"]) if len(self_dup) else set()

    def fetch_sigs(ids, from_store: bool) -> dict:
        if not ids:
            return {}
        if from_store:
            pdf = catalog_lookup(sigs_dir, sorted(ids)).to_pandas()
            pdf = pdf.drop_duplicates(subset=[id_col])   # orphan safety
        else:
            wanted = ray.put(set(ids))

            def pick(b: pd.DataFrame) -> pd.DataFrame:
                w = ray.get(wanted)
                return b[b[id_col].isin(w)]
            pdf = sig_ds.map_batches(pick,
                                     batch_format="pandas").to_pandas()
        return dict(zip(pdf[id_col], pdf["sig"]))

    sig_of = fetch_sigs(new_ids_needed, False)
    sig_of.update(fetch_sigs(store_ids_needed, True))

    dup_pairs = []          # verified (a, b, b_store)
    if len(cand):
        # same-id store pair = exact re-ingest: dup by definition
        selfm = (cand["b_store"] & (cand["a"] == cand["b"])).to_numpy()
        dup_pairs += [(a, b, True) for a, b, _ in
                      cand[selfm].itertuples(index=False)]
        rest = cand[~selfm]
        if len(rest):
            # vectorized estimate: one (n_pairs, num_perm) equality
            ids = list(sig_of)
            idx = {v: i for i, v in enumerate(ids)}
            S = np.stack([np.asarray(sig_of[i]) for i in ids]) \
                if ids else np.zeros((0, num_perm), np.int64)
            ai = np.fromiter((idx.get(a, -1) for a in rest["a"]),
                             np.int64, len(rest))
            bi = np.fromiter((idx.get(b, -1) for b in rest["b"]),
                             np.int64, len(rest))
            ok = (ai >= 0) & (bi >= 0)       # orphan bands: skip
            est = np.zeros(len(rest))
            est[ok] = (S[ai[ok]] == S[bi[ok]]).mean(axis=1)
            hit = est >= tau
            dup_pairs += list(zip(rest["a"].to_numpy()[hit],
                                  rest["b"].to_numpy()[hit],
                                  rest["b_store"].to_numpy()[hit]))

    # --- component resolution ------------------------------------------
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    anchored = set()        # roots with a store-dup edge
    for a, b, b_store in dup_pairs:
        if b_store:
            anchored.add(find(a))
        else:
            ra, rb = find(a), find(b)
            if ra != rb:            # union: min id becomes the root
                parent[max(ra, rb)] = min(ra, rb)
    # re-anchor after unions (roots may have moved)
    anchored = {find(r) for r in anchored}

    comp: dict = {}
    for a, b, b_store in dup_pairs:
        for x in ((a, b) if not b_store else (a,)):
            comp.setdefault(find(x), set()).add(x)
    dropped = set()
    for root, members in comp.items():
        if root in anchored:
            dropped |= members
        else:
            dropped |= members - {min(members)}

    n_in = sig_ds.count()
    # survivors: broadcast the dropped set (the small side)
    dref = ray.put(dropped)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dref)
        return b[~b[id_col].isin(d)]

    survivors = new_ds.map_batches(keep, batch_format="pandas")
    surv_sigs = sig_ds.map_batches(keep, batch_format="pandas")

    # --- append kept fingerprints (sigs first, bands = commit point) ---
    # normalize sig to a canonical Arrow list<int64> at the write
    # boundary: pandas blocks of fixed-size numpy arrays are otherwise
    # recorded as Ray's tensor extension type by SOME conversion paths
    # and as plain lists by others, which trips the catalog's
    # schema-evolution conflict check between batches
    def to_arrow_sigs(b: pd.DataFrame) -> pa.Table:
        sigs = (np.stack(b["sig"].to_numpy()).astype(np.int64)
                if len(b) else np.zeros((0, num_perm), np.int64))
        return pa.table({id_col: pa.array(b[id_col].tolist()),
                         "sig": pa.array(list(sigs),
                                         pa.list_(pa.int64()))})

    n_new = n_in - len(dropped)
    if n_new > 0:
        catalog_write(surv_sigs.map_batches(to_arrow_sigs,
                                            batch_format="pandas"),
                      sigs_dir, mode="append",
                      bucket_by=(id_col, n_buckets))

        def kept_band_rows(batch: pd.DataFrame) -> pd.DataFrame:
            sigs = np.stack(batch["sig"].to_numpy())
            bk = _band_keys(sigs, bands)
            return pd.DataFrame({
                "band_key": bk.ravel(),
                id_col: np.repeat(batch[id_col].to_numpy(), bands)})

        catalog_write(surv_sigs.map_batches(kept_band_rows,
                                            batch_format="pandas"),
                      bands_dir, mode="append",
                      bucket_by=("band_key", n_buckets))

    report = {"n_in": int(n_in), "n_new": int(n_new),
              "n_dropped": len(dropped),
              "n_candidates": int(len(cand)),
              "n_verified_dups": len(dup_pairs),
              "store_band_buckets": len(store_band_files),
              "dropped_ids": sorted(dropped)}
    return survivors, report
