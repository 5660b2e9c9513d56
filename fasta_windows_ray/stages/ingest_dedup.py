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
documented run-stable only). ``stable_digest64`` is a pure-numpy
order-sensitive polynomial hash mod 2^64, pinned by this module's own
test vectors: digest(d) = (Σ_i w_i·M^i)·M^{-start} · M + byte_len,
computed with wrapping uint64 cumsum/cumprod (M odd ⇒ invertible mod
2^64), one vector pass per batch — no per-row loop.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

# golden-ratio odd multiplier; odd ⇒ invertible mod 2^64
_M = np.uint64(0x9E3779B97F4A7C15)
_MINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_DIGEST_COL = "_digest"


def stable_digest64(texts) -> np.ndarray:
    """Order-sensitive 63-bit content digest per text, vectorized.

    Each text's UTF-8 bytes are zero-padded to 8-byte words; the padded
    words of ALL texts form one buffer. With P[i] = M^i (wrapping
    cumprod) and a wrapping cumsum of w_i·P[i], each doc's Horner sum
    is two gather-subtracts; multiplying by M^{-start} rebases it to
    the doc's own origin. The true byte length is mixed in last, so
    zero padding cannot collide ("a" vs "a\\x00"). Returns non-negative
    int64 (top bit MASKED, not shifted — a shift would drop the
    length-mix low bit) for Arrow/SQL friendliness.
    """
    enc = [t.encode("utf-8") for t in texts]
    nd = len(enc)
    blens = np.fromiter((len(e) for e in enc), np.uint64, nd)
    padded = [e + b"\x00" * (-len(e) % 8) for e in enc]
    wlens = np.fromiter((len(p) >> 3 for p in padded), np.int64, nd)
    buf = np.frombuffer(b"".join(padded), dtype="<u8")
    n = len(buf)
    with np.errstate(over="ignore"):
        powers = np.full(n, _M, np.uint64)
        if n:
            powers[0] = np.uint64(1)
        np.cumprod(powers, out=powers)              # M^i  (mod 2^64)
        inv_powers = np.full(n, _MINV, np.uint64)
        if n:
            inv_powers[0] = np.uint64(1)
        np.cumprod(inv_powers, out=inv_powers)      # M^-i (mod 2^64)
        csum = np.zeros(n + 1, np.uint64)
        np.cumsum(buf * powers, out=csum[1:])
        starts = np.zeros(nd, np.int64)
        np.cumsum(wlens[:-1], out=starts[1:] if nd else starts[:0])
        ends = starts + wlens
        seg = csum[ends] - csum[starts]             # wrapping Σ w_i·M^i
        base = np.where(wlens > 0, inv_powers[np.minimum(starts, n - 1)]
                        if n else np.uint64(1), np.uint64(1))
        dig = (seg * base) * _M + blens
    return (dig & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


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
