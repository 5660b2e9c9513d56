"""Catalog table source/sink — a Delta/Iceberg-style versioned parquet
table layout with NO external dependencies (round-3 VERDICT "what users
would hit next": catalog sources).

Layout::

    table_dir/
      _manifest/v00000001.json   one immutable manifest per commit:
                                 data files + row counts + per-column
                                 min/max stats + schema + parent version
      _manifest/_LATEST          atomic pointer to the committed version
      data/part-*.parquet        immutable data files

Semantics (the useful subset of a lakehouse table format):

- **Atomic commits / snapshot isolation**: data files are written first
  (distributed, inside Ray tasks); the manifest then lands via
  write-tmp + ``os.replace``. A reader resolves its version ONCE at
  open, so concurrent appends never tear a scan; a crashed writer
  leaves only unreferenced data files (see ``catalog_vacuum``).
- **Time travel**: ``catalog_read(..., version=N)`` scans any committed
  snapshot.
- **File pruning**: per-file min/max column stats recorded at write
  time; ``predicate=[(col, op, value), ...]`` skips files whose stats
  windows cannot match — the catalog analogue of ``read_parquet``'s
  row-group pruning, and the 100-TB lever (a time- or key-range query
  reads only the matching files).

Ray-Data-first: writes happen inside ``map_batches`` tasks (one file
per input block — blocks are already ~target_max_block_size); reads are
a plain ``ray.data.read_parquet`` over the pruned file list, so all
downstream streaming/pruning behavior is stock Ray Data.
"""

from __future__ import annotations

import functools
import json
import os
import random
import time
import uuid

import numpy as np
import pyarrow as pa

_MANIFEST = "_manifest"
_LATEST = "_LATEST"

_OPS = {
    "==": lambda lo, hi, v: not (v < lo or hi < v),
    "<=": lambda lo, hi, v: not (v < lo),          # some row may be <= v
    ">=": lambda lo, hi, v: not (hi < v),
    "<": lambda lo, hi, v: lo < v,
    ">": lambda lo, hi, v: hi > v,
}


def _scalar(v):
    """JSON-serializable scalar from an Arrow/numpy min/max."""
    if v is None:
        return None
    if isinstance(v, (np.generic,)):
        v = v.item()
    if isinstance(v, (pa.TimestampScalar,)):
        v = v.value
    if hasattr(v, "as_py"):
        v = v.as_py()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _versions(table_dir: str) -> list[int]:
    mdir = os.path.join(table_dir, _MANIFEST)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _latest_version(table_dir: str) -> int:
    """Committed latest: the _LATEST pointer, falling back to a manifest
    scan (pointer write is atomic but a writer could die between the
    manifest rename and the pointer rename)."""
    p = os.path.join(table_dir, _MANIFEST, _LATEST)
    vs = _versions(table_dir)
    if not vs:
        return 0
    if os.path.exists(p):
        with open(p) as f:
            return max(int(f.read().strip()), vs[-1]) if vs else 0
    return vs[-1]


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(table_dir, _MANIFEST,
                           f"v{version:08d}.json")) as f:
        return json.load(f)


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first — re-read the latest
    snapshot and retry the commit (optimistic concurrency)."""


def _atomic_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _atomic_json_exclusive(path: str, obj) -> None:
    """Exclusive-create commit: fails (instead of clobbering) if another
    writer landed the same version — the lakehouse optimistic-concurrency
    primitive, via hard-link-from-tmp which is atomic on POSIX."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"{os.path.basename(path)} was committed by another writer; "
            "re-read the table and retry") from None
    finally:
        os.remove(tmp)


def _z_boundaries(ds, cols: list[str], bits: int) -> dict:
    """One streaming pass over ``cols`` -> per-column quantile
    boundaries (2^bits - 1 cut points) via merged t-digests — the
    rank map that makes z-values distribution-aware (uniform in RANK
    space, so skewed columns still spread across files)."""
    import pandas as pd

    from ..stages.sketches import (_merge_digests, tdigest_compress,
                                   tdigest_quantile)

    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            v = np.asarray(t[c].to_numpy(zero_copy_only=False))
            if np.issubdtype(v.dtype, np.datetime64):
                v = v.astype("datetime64[us]").astype(np.int64)
            v = v.astype(np.float64)
            v = v[~np.isnan(v)]
            m, w = tdigest_compress(v, np.ones(len(v)), 200)
            frames.append(pd.DataFrame({"_col": c, "_mean": m,
                                        "_weight": w}))
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                    preserve_index=False)

    parts = (ds.select_columns(cols)
               .map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas())
    qs = list(np.linspace(0.0, 1.0, (1 << bits) + 1)[1:-1])
    out = {}
    for c in cols:
        sub = parts[parts["_col"] == c]
        m, w = _merge_digests(sub, 200)
        out[c] = np.asarray(tdigest_quantile(m, w, qs), np.float64)
    return out


def _z_values(t: pa.Table, boundaries: dict, bits: int) -> np.ndarray:
    """Vectorized Morton/Z-value: per column, rank against the
    boundaries (searchsorted -> a ``bits``-bit code), then interleave
    the code bits across columns."""
    cols = list(boundaries)
    codes = []
    for c in cols:
        v = np.asarray(t[c].to_numpy(zero_copy_only=False))
        if np.issubdtype(v.dtype, np.datetime64):
            v = v.astype("datetime64[us]").astype(np.int64)
        v = v.astype(np.float64)
        code = np.searchsorted(boundaries[c], v, side="right")
        code[np.isnan(v)] = 0          # nulls/NaN sort first
        codes.append(code.astype(np.int64))
    z = np.zeros(len(t), np.int64)
    k = len(codes)
    for b in range(bits):
        for ci, code in enumerate(codes):
            z |= ((code >> b) & 1) << (b * k + ci)
    return z


def catalog_write(ds, table_dir: str, mode: str = "append",
                  stats_cols: list[str] | None = None,
                  bucket_by: tuple[str, int] | None = None,
                  zorder: list[str] | None = None,
                  bloom_cols: list[str] | None = None,
                  bloom_bits: int = 1 << 17,
                  bloom_store: str = "inline",
                  commit_ts: int | None = None,
                  expect_parent: int | None = None) -> dict:
    """Commit a Dataset to the catalog table as one new version.

    ``expect_parent`` (optional) pins the commit to a snapshot version:
    if the table advanced past it the commit is refused with
    ``ConcurrentWriteError`` instead of retried — for writes whose
    CONTENT was derived from that snapshot (compaction uses this; a
    plain user overwrite intentionally replaces whatever is current
    and does not pass it).

    ``commit_ts`` (optional, int64 epoch-µs) stamps the manifest with
    an event-time for this version — the hook ``scd2_history`` /
    ``temporal_join`` (stages/temporal.py) use to place snapshot
    boundaries on the stream's event-time axis.  Caller-supplied (not
    wall clock) so replays/backfills stay deterministic; must be
    monotonically non-decreasing across versions (enforced at commit).

    ``mode``: "append" adds this write's files to the current snapshot;
    "overwrite" starts a snapshot containing only this write's files
    (older versions stay readable via time travel). ``stats_cols``
    limits which columns get min/max stats (default: all primitive
    columns). Returns the committed manifest dict.

    ``bucket_by=(col, n)`` writes a BUCKETED table: rows are
    hash-partitioned on ``col`` with the engine's `stable_bucket_of`
    (the same function every join/groupby stage uses), one data file
    per (write, bucket), with the bucket id recorded per file and the
    spec in the manifest.  Two tables bucketed identically are
    co-partitioned ON DISK — ``bucketed_join`` then joins them with NO
    shuffle at all (the 100-TB payoff: the exchange is paid once at
    write time and amortized over every downstream join).  Appends must
    keep the parent snapshot's spec; the tagged ``_bucket`` column is
    stored in the files.

    ``zorder=[cols]`` clusters this write's rows along a Morton
    (Z-order) curve over the named numeric/timestamp columns before
    the per-block file writes: each value is mapped to its RANK
    (t-digest quantile boundaries, one extra streaming pass — skew-
    proof), the rank bits are interleaved, and rows are range-
    partitioned by the z-value (one sort exchange, paid once at write
    time).  Each file then covers a tight hyper-rectangle in the
    z-columns, so the EXISTING min/max file pruning in
    ``catalog_read`` becomes selective on EVERY z-column at once —
    the multi-dimensional data-skipping trick of the lakehouse
    engines.  Advisory (not a join contract like ``bucket_by``, which
    it is mutually exclusive with): appends may z-order themselves or
    not; the manifest records the spec per write.  A single-column
    ``zorder=[col]`` degenerates to a rank-ordered write — the plain
    "sort the table by time at rest" layout.

    ``bloom_cols=[cols]`` additionally records a per-FILE Bloom bitmap
    of each named int/float/string column in the manifest
    (``bloom_bits`` bits -> bits/8 bytes per file per column;
    no-false-negative membership). ``catalog_read`` equality
    predicates and ``catalog_lookup`` key sets then skip files the
    Bloom PROVES clean — the pruning that min/max stats cannot do when
    value ranges interleave across files (e.g. hash-distributed ids),
    and the one that makes point lookups work on UNBUCKETED tables.
    ``bloom_store="sidecar"`` keeps each bitmap in a raw sidecar file
    next to its data file instead of base64 inside the manifest — the
    layout for big tables (at 10^5 files an inline-bloom manifest is
    GBs and EVERY version load/commit pays it; sidecar manifests stay
    ~100 B/file and a bitmap is read, LRU-cached, only when a probe
    reaches that file).  Modes interoperate per file; copy-on-write
    maintenance preserves whichever store the table uses.

    The data files are written DISTRIBUTED (one per input block, inside
    the map_batches tasks); only the tiny per-file manifest rows travel
    to the driver for the atomic commit.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    if bloom_store not in ("inline", "sidecar"):
        raise ValueError(f"unknown bloom_store {bloom_store!r}")
    if zorder is not None and bucket_by is not None:
        raise ValueError("zorder and bucket_by are mutually exclusive "
                         "(range clustering vs hash co-partitioning)")
    data_dir = os.path.join(table_dir, "data")
    mdir = os.path.join(table_dir, _MANIFEST)
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    if bucket_by is not None:
        bcol, n_buckets = bucket_by
        parent_v = _latest_version(table_dir)
        if mode == "append" and parent_v:
            spec = _load_manifest(table_dir, parent_v).get("bucket_by")
            if spec != [bcol, n_buckets]:
                raise ValueError(
                    f"bucket spec {[bcol, n_buckets]} does not match the "
                    f"table's committed spec {spec}")
        from ..stages.window_stats import stable_bucket_of

        def tag(t: pa.Table) -> pa.Table:
            b = stable_bucket_of(
                t[bcol].to_numpy(zero_copy_only=False), n_buckets)
            return t.append_column("_bucket", pa.array(b, pa.int64()))

        # one all-to-all, paid HERE so downstream joins never pay it;
        # the write happens INSIDE map_groups (one call per bucket
        # group) — a downstream map_batches could coalesce several
        # groups into one batch and mislabel the file's bucket
        tagged = ds.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)

    def write_block(t: pa.Table) -> pa.Table:
        return _write_data_file(t, data_dir, stats_cols,
                                bloom_cols, bloom_bits, bloom_store)

    if bucket_by is not None:
        report = (tagged.groupby("_bucket")
                        .map_groups(write_block,
                                    batch_format="pyarrow").to_pandas())
    elif zorder is not None:
        import ray

        bits = min(16, 63 // max(len(zorder), 1))
        bref = ray.put(_z_boundaries(ds, zorder, bits))

        def tag_z(t: pa.Table) -> pa.Table:
            z = _z_values(t, ray.get(bref), bits)
            return t.append_column("_z", pa.array(z, pa.int64()))

        def write_zblock(t: pa.Table) -> pa.Table:
            return _write_data_file(t.drop_columns(["_z"]), data_dir,
                                    stats_cols, bloom_cols, bloom_bits,
                                    bloom_store)

        report = (ds.map_batches(tag_z, batch_format="pyarrow",
                                 zero_copy_batch=True)
                    .sort("_z")
                    .map_batches(write_zblock, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas())
    else:
        report = ds.map_batches(write_block, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    return _commit_files(table_dir, report, mode, bucket_by,
                         zorder=zorder, commit_ts=commit_ts,
                         expect_parent=expect_parent)


def _file_bloom(col: pa.ChunkedArray, n_bits: int):
    """Per-file Bloom bitmap of a key column (int/float/string only —
    types whose probe-side pandas hash matches the build side; nulls
    are dropped so an int column with nulls still hashes as int64).
    Returns ``(meta, raw_bytes)`` — the caller decides where the
    bitmap lives (inline base64 in the manifest or a sidecar file)."""
    from ..stages.bloom import _bloom_positions
    ty = col.type
    if not (pa.types.is_integer(ty) or pa.types.is_floating(ty)
            or pa.types.is_string(ty) or pa.types.is_large_string(ty)):
        return None
    keys = col.drop_null().to_pandas()
    bitmap = np.zeros(n_bits // 64, np.uint64)
    if len(keys):
        pos = _bloom_positions(keys, n_bits, 4).ravel()
        np.bitwise_or.at(bitmap, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64)
                                          & np.uint64(63)))
    return {"n_bits": n_bits, "n_hashes": 4}, bitmap.tobytes()


@functools.lru_cache(maxsize=256)
def _load_sidecar_bloom_cached(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


def _load_sidecar_bloom(path: str) -> bytes | None:
    """Read a sidecar Bloom bitmap (immutable once committed — new
    writes mint new file names — so a plain path-keyed LRU is safe).
    Missing/unreadable sidecar -> None (callers must not prune) — and
    such failures are NOT cached: a transient read error must not
    disable pruning for that file for the process lifetime."""
    try:
        return _load_sidecar_bloom_cached(path)
    except OSError:
        return None


def _coerce_keys(vals: list, type_str: str | None):
    """Coerce probe values to the column's hashed dtype (manifest
    per-file schema string) so the Bloom probe hashes like the build;
    None = uncoercible -> caller must not prune."""
    import pandas as pd
    try:
        if type_str is None:
            return pd.Series(vals)
        if type_str.startswith(("int", "uint")):
            return pd.Series([int(v) for v in vals], dtype=np.int64)
        if type_str in ("float", "double", "halffloat"):
            return pd.Series([float(v) for v in vals], dtype=np.float64)
        if "string" in type_str:
            return pd.Series([str(v) for v in vals], dtype=object)
    except (TypeError, ValueError):
        return None
    return None


def _bloom_excludes(st: dict | None, vals: list,
                    type_str: str | None,
                    table_dir: str | None = None) -> bool:
    """True iff the file's Bloom PROVES none of ``vals`` is present
    (no false negatives — safe to skip the file).  The bitmap is
    either inline (``b64``) or in a sidecar file (``sidecar``, path
    relative to ``table_dir``); an unreadable sidecar is merely
    unprunable, never an error."""
    import base64

    import pandas as pd

    from ..stages.bloom import bloom_contains
    bl = (st or {}).get("bloom")
    if not bl or not vals:
        return False
    keys = _coerce_keys(vals, type_str)
    if keys is None or not isinstance(keys, pd.Series):
        return False
    if "b64" in bl:
        raw = base64.b64decode(bl["b64"])
    elif "sidecar" in bl and table_dir is not None:
        raw = _load_sidecar_bloom(os.path.join(table_dir, bl["sidecar"]))
        if raw is None or len(raw) * 8 != bl["n_bits"]:
            return False
    else:
        return False
    bitmap = np.frombuffer(raw, np.uint64)
    return not bool(bloom_contains(bitmap, keys, bl["n_hashes"]).any())


def _manifest_bloom_spec(manifest: dict) \
        -> tuple[list[str] | None, int, str]:
    """The table's effective Bloom spec — the union of columns any
    parent file carries a Bloom for (+ the largest bit width + the
    storage mode: ``sidecar`` if ANY parent bloom lives in a sidecar,
    else ``inline``).  Every copy-on-write rewrite (delete / merge /
    compact) passes this to its ``_write_data_file`` calls so
    maintenance never silently degrades the table's prunability or
    demotes sidecar tables back to manifest-inflating inline bitmaps."""
    cols: dict[str, int] = {}
    store = "inline"
    for f in manifest.get("files", []):
        for c, st in f.get("stats", {}).items():
            if isinstance(st, dict) and isinstance(st.get("bloom"), dict):
                cols[c] = max(cols.get(c, 0), st["bloom"]["n_bits"])
                if "sidecar" in st["bloom"]:
                    store = "sidecar"
    if not cols:
        return None, 1 << 17, store
    return sorted(cols), max(cols.values()), store


def _write_data_file(t: pa.Table, data_dir: str,
                     stats_cols: list[str] | None = None,
                     bloom_cols: list[str] | None = None,
                     bloom_bits: int = 1 << 17,
                     bloom_store: str = "inline") -> pa.Table:
    """Write one data file (tmp + atomic rename) and return its
    one-row manifest report (path, rows, per-column min/max stats,
    optional per-column Bloom bitmaps, bucket id if tagged, schema).
    ``bloom_store="sidecar"`` writes each bitmap as a raw sidecar file
    next to the data file (manifest records only its path) — at 10^5+
    files the inline base64 bitmaps dominate manifest size (~21 KB per
    file per column at the default 2^17 bits) and every manifest load
    pays for them; sidecars keep the manifest O(100 B)/file and load a
    bitmap only when a probe actually reaches that file.
    Runs INSIDE distributed tasks."""
    import pyarrow.parquet as pq
    if len(t) == 0:
        return pa.table({"path": pa.array([], pa.string()),
                         "rows": pa.array([], pa.int64()),
                         "stats": pa.array([], pa.string()),
                         "bucket": pa.array([], pa.int64()),
                         "schema": pa.array([], pa.string())})
    bucket = (int(t["_bucket"][0].as_py())
              if "_bucket" in t.column_names else -1)
    name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(data_dir, f".{name}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(data_dir, name))
    stats = {}
    for field in t.schema:
        if stats_cols is not None and field.name not in stats_cols:
            continue
        ty = field.type
        if not (pa.types.is_integer(ty) or pa.types.is_floating(ty)
                or pa.types.is_string(ty) or pa.types.is_timestamp(ty)
                or pa.types.is_date(ty)):
            continue
        import pyarrow.compute as pc
        col = t[field.name]
        if col.null_count == len(col):
            continue
        mm = pc.min_max(col)
        stats[field.name] = {"min": _scalar(mm["min"]),
                             "max": _scalar(mm["max"])}
    for bc in (bloom_cols or []):
        if bc not in t.column_names:
            continue
        fb = _file_bloom(t[bc], bloom_bits)
        if fb is None:
            continue
        meta, raw = fb
        if bloom_store == "sidecar":
            import re
            safe = re.sub(r"[^A-Za-z0-9_.-]", "_", bc)
            side = f"{name}.{safe}.bloom"
            stmp = os.path.join(data_dir, f".{side}.tmp")
            with open(stmp, "wb") as fh:
                fh.write(raw)
            os.replace(stmp, os.path.join(data_dir, side))
            meta["sidecar"] = f"data/{side}"
        else:
            import base64
            meta["b64"] = base64.b64encode(raw).decode()
        stats.setdefault(bc, {"min": None, "max": None})["bloom"] = meta
    schema_json = json.dumps({f.name: str(f.type) for f in t.schema})
    return pa.table({"path": pa.array([f"data/{name}"]),
                     "rows": pa.array([len(t)], pa.int64()),
                     "stats": pa.array([json.dumps(stats)]),
                     "bucket": pa.array([bucket], pa.int64()),
                     "schema": pa.array([schema_json])})


def _commit_files(table_dir: str, report, mode: str,
                  bucket_by: tuple[str, int] | None,
                  base_files: list | None = None,
                  zorder: list[str] | None = None,
                  commit_ts: int | None = None,
                  expect_parent: int | None = None,
                  max_retries: int = 10) -> dict:
    """Assemble the file list from distributed write reports and commit
    one new manifest version (the atomic commit point).

    ``base_files`` (copy-on-write commits: delete/merge/compact-subset)
    is an explicit list of parent file entries to RETAIN alongside this
    write's files — it overrides the mode-derived parent handling.

    Optimistic concurrency contract (two writers, one table):

    - **Append vs append: both commit, serialized.** The manifest
      create is a compare-and-swap on the version id (exclusive file
      create); the loser re-reads the fresh snapshot and retries HERE —
      its data files are already on disk and an append's file list is
      a pure function of (parent files + own files), so the retry is
      metadata-only and commutative. Bounded by ``max_retries``, after
      which ``ConcurrentWriteError`` escapes to the caller.
    - **Row-level / snapshot-rewriting commits (delete / merge /
      update / compact) are NOT retried.** They pass ``expect_parent``
      = the snapshot version their rewrite was computed from; if the
      table has advanced past it (or advances mid-commit), the commit
      is cleanly REFUSED with ``ConcurrentWriteError`` — retrying the
      manifest alone would silently drop the interleaved writer's
      files (lost update). The caller must re-run the operation on a
      fresh snapshot.
    - Schema-evolution conflicts and bucket-spec mismatches are
      rejected at commit time regardless of interleaving (checked
      against the parent actually committed against, per attempt).
    """
    mdir = os.path.join(table_dir, _MANIFEST)
    new_files = []
    for p, r, s, b, sc in zip(report.get("path", []),
                              report.get("rows", []),
                              report.get("stats", []),
                              report.get("bucket", []),
                              report.get("schema", [])):
        entry = {"path": p, "rows": int(r), "stats": json.loads(s),
                 "schema": json.loads(sc)}
        if int(b) >= 0:
            entry["bucket"] = int(b)
        new_files.append(entry)

    for attempt in range(max_retries + 1):
        parent = _latest_version(table_dir)
        if expect_parent is not None and parent != expect_parent:
            raise ConcurrentWriteError(
                f"snapshot v{expect_parent} is stale: the table advanced "
                f"to v{parent} while this copy-on-write {mode} was "
                "running; re-run it against the fresh snapshot")
        if base_files is not None:
            files = list(base_files) + new_files
        elif mode == "append" and parent:
            files = _load_manifest(table_dir, parent)["files"] + new_files
        else:
            files = new_files
        # unified table schema = union of per-file schemas; ADD-only
        # evolution (a same-named column with a different type is an
        # error at COMMIT time, not a surprise at read time)
        unified: dict = {}
        for f in files:
            for cname, ctype in f.get("schema", {}).items():
                if cname in unified and unified[cname] != ctype:
                    raise ValueError(
                        f"schema evolution conflict on column {cname!r}: "
                        f"{unified[cname]} vs {ctype} — only ADDING "
                        "columns is supported")
                unified.setdefault(cname, ctype)
        version = parent + 1
        manifest = {"version": version, "parent": parent, "mode": mode,
                    "files": files, "schema": unified,
                    "total_rows": int(sum(f["rows"] for f in files))}
        if zorder is not None:
            manifest["zorder"] = list(zorder)
        if commit_ts is not None:
            prev_ts = (_load_manifest(table_dir, parent).get("commit_ts")
                       if parent else None)
            if prev_ts is not None and int(commit_ts) < int(prev_ts):
                raise ValueError(
                    f"commit_ts {commit_ts} < parent version's {prev_ts}: "
                    "version event-times must be non-decreasing")
            manifest["commit_ts"] = int(commit_ts)
        if bucket_by is not None:
            manifest["bucket_by"] = [bucket_by[0], int(bucket_by[1])]
        elif mode == "append" and parent:
            spec = _load_manifest(table_dir, parent).get("bucket_by")
            if spec is not None:
                raise ValueError(
                    f"table is bucketed by {spec}; appends must pass "
                    "bucket_by to preserve co-partitioning")
        # exclusive manifest create = the commit point (version CAS): a
        # concurrent writer racing to the same version fails the create
        # instead of clobbering
        try:
            _atomic_json_exclusive(
                os.path.join(mdir, f"v{version:08d}.json"), manifest)
        except ConcurrentWriteError:
            if expect_parent is not None or attempt == max_retries:
                raise
            # commutative commit lost the CAS — back off briefly and
            # rebuild against the winner's snapshot
            time.sleep(random.uniform(0.005, 0.02 * (attempt + 1)))
            continue
        _atomic_json(os.path.join(mdir, _LATEST), version)
        return manifest
    raise AssertionError("unreachable")


_TYPE_PARSERS = {
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
    "uint32": pa.uint32(), "uint64": pa.uint64(), "float": pa.float32(),
    "double": pa.float64(), "string": pa.string(),
    "large_string": pa.large_string(), "binary": pa.binary(),
    "bool": pa.bool_(), "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"), "date32[day]": pa.date32(),
}


def _parse_type(s: str) -> pa.DataType:
    if s in _TYPE_PARSERS:
        return _TYPE_PARSERS[s]
    if s.startswith("list<item: ") and s.endswith(">"):
        return pa.list_(_parse_type(s[len("list<item: "):-1]))
    raise ValueError(f"cannot reconstruct Arrow type from {s!r} for "
                     "schema-evolution padding")


def _predicate_expr(predicate: list[tuple]):
    """The predicate conjunction as a pyarrow dataset expression (for
    row-group/row-level pushdown). Null semantics match SQL: a null
    never satisfies any term."""
    import pyarrow.compute as pc
    expr = None
    for col, op, val in predicate:
        f = pc.field(col)
        term = {"==": f == val, "<=": f <= val, ">=": f >= val,
                "<": f < val, ">": f > val}[op]
        expr = term if expr is None else expr & term
    return expr


def version_as_of(table_dir: str, as_of_us: int) -> int:
    """Latest committed version whose ``commit_ts`` <= ``as_of_us`` —
    time travel on the EVENT-TIME axis the temporal joins use.
    Unstamped versions inherit the nearest earlier stamp's position
    (they are <= the next stamped version's event-time by the
    monotonicity rule); raises if no version is old enough."""
    best = 0
    for v in sorted(_versions(table_dir)):
        ts = _load_manifest(table_dir, v).get("commit_ts")
        if ts is None:
            if best == v - 1 and best > 0:
                best = v          # rides its stamped predecessor
            continue
        if int(ts) <= int(as_of_us):
            best = v
        else:
            break
    if best == 0:
        raise ValueError(
            f"no version of {table_dir} has commit_ts <= {as_of_us}")
    return best


def catalog_read(table_dir: str, columns: list[str] | None = None,
                 version: int | None = None,
                 predicate: list[tuple] | None = None,
                 return_report: bool = False,
                 pushdown: bool = False,
                 as_of_us: int | None = None):
    """Snapshot scan of a catalog table as a Ray Dataset.

    ``as_of_us`` (int64 epoch-µs, mutually exclusive with ``version``)
    time-travels on the event-time axis: the scan pins the latest
    version whose manifest ``commit_ts`` <= the given instant
    (``version_as_of``).

    ``version=None`` resolves the latest committed version ONCE (snapshot
    isolation — later appends don't affect this scan). ``predicate`` is
    a conjunction of ``(col, op, value)`` with op in {==,<=,>=,<,>}:
    files whose min/max stats window cannot satisfy every term are
    skipped entirely (file pruning; rows inside surviving files still
    need a downstream filter for exact semantics). With
    ``pushdown=True`` the predicate is ALSO handed to the Arrow
    reader as a dataset filter — parquet row-group stats prune inside
    surviving files and the scan returns EXACTLY the matching rows
    (SQL null semantics), so no downstream filter is needed; kept
    opt-in because the default contract is the conservative superset.
    With ``return_report=True`` returns (dataset, report) where report
    shows files/rows scanned vs skipped — the pruning evidence.
    """
    import ray.data as rd

    row_filter = (_predicate_expr(predicate)
                  if pushdown and predicate else None)
    if as_of_us is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_us, not both")
        version = version_as_of(table_dir, as_of_us)
    v = version if version is not None else _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    kept, skipped_rows = [], 0
    for f in manifest["files"]:
        keep = True
        for col, op, val in (predicate or []):
            st = f["stats"].get(col)
            if op == "==" and _bloom_excludes(
                    st, [val], f.get("schema", {}).get(col), table_dir):
                keep = False                  # Bloom-proven absent
                break
            if st is None or st["min"] is None:
                continue                      # no stats -> can't prune
            lo, hi = st["min"], st["max"]
            if hasattr(val, "isoformat"):
                val = val.isoformat()
            if not _OPS[op](lo, hi, val):
                keep = False
                break
        if keep:
            kept.append(f)
        else:
            skipped_rows += f["rows"]
    paths = [os.path.join(table_dir, f["path"]) for f in kept]
    # schema evolution: group kept files by column set; a single group
    # is a plain pruned read, multiple groups are read per-group, each
    # padded with typed nulls to the manifest's unified schema, and
    # unioned (pre-evolution manifests without per-file schemas fall
    # into the single-group path)
    sigs = {tuple(sorted(f.get("schema", {}))) for f in kept}
    if len(sigs) <= 1 or not manifest.get("schema"):
        ds = (rd.read_parquet(paths, columns=columns, filter=row_filter)
              if paths else rd.from_arrow(pa.table({})))
    else:
        unified = manifest["schema"]
        want = [c for c in unified if columns is None or c in columns]

        def pad_to(missing):
            types = {c: _parse_type(unified[c]) for c in missing}

            def _pad(t: pa.Table) -> pa.Table:
                for c, ty in types.items():
                    t = t.append_column(c, pa.nulls(len(t), ty))
                return t.select(want)
            return _pad

        groups: dict[tuple, list[str]] = {}
        for f in kept:
            groups.setdefault(tuple(sorted(f.get("schema", {}))),
                              []).append(os.path.join(table_dir, f["path"]))
        pred_cols = {c for c, _, _ in (predicate or [])}
        parts = []
        for sig, ps in sorted(groups.items()):
            if row_filter is not None and not pred_cols <= set(sig):
                continue   # a missing pred column reads as all-null ->
                # no row can match under SQL semantics: skip the group
            have = [c for c in want if c in sig]
            missing = [c for c in want if c not in sig]
            sub = rd.read_parquet(ps, columns=have, filter=row_filter)
            parts.append(sub.map_batches(pad_to(missing),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))
        if not parts:
            ds = rd.from_arrow(pa.table({}))
        else:
            ds = parts[0]
            for p in parts[1:]:
                ds = ds.union(p)
    if return_report:
        return ds, {"version": v, "files_total": len(manifest["files"]),
                    "files_scanned": len(kept),
                    "rows_skipped": int(skipped_rows)}
    return ds


def catalog_vacuum(table_dir: str, keep_versions: int = 1,
                   dry_run: bool = False) -> list[str]:
    """Delete data files not referenced by the newest ``keep_versions``
    manifests (crashed-writer orphans and overwritten snapshots), and
    drop the older manifests. Returns the deleted paths.

    ``dry_run=True`` returns the same list WITHOUT deleting anything
    (and keeps all manifests) — the safe default for operators
    auditing what a vacuum would reclaim before giving up time travel
    to the pruned versions."""
    vs = _versions(table_dir)
    if not vs:
        return []
    keep = set(vs[-keep_versions:])
    live = set()
    for v in keep:
        for f in _load_manifest(table_dir, v)["files"]:
            live.add(f["path"])
            for st in f.get("stats", {}).values():
                bl = st.get("bloom") if isinstance(st, dict) else None
                if isinstance(bl, dict) and "sidecar" in bl:
                    live.add(bl["sidecar"])   # bitmap lives with its file
    deleted = []
    data_dir = os.path.join(table_dir, "data")
    for name in os.listdir(data_dir):
        rel = f"data/{name}"
        if rel not in live and not name.startswith("."):
            if not dry_run:
                os.remove(os.path.join(data_dir, name))
            deleted.append(rel)
    if not dry_run:
        for v in vs:
            if v not in keep:
                os.remove(os.path.join(table_dir, _MANIFEST,
                                       f"v{v:08d}.json"))
    return sorted(deleted)


def catalog_restore(table_dir: str, version: int,
                    commit_ts: int | None = None) -> dict:
    """Roll the table back to snapshot ``version`` as a NEW commit
    whose file list is the old snapshot's — metadata-only (no data
    I/O, instant at any table size), history-preserving (the bad
    versions stay readable via time travel until vacuumed), and safe
    under the same exclusive-create commit race as any write.

    The restored commit re-records the old snapshot's bucket spec and
    schema, so downstream bucketed joins / lookups behave exactly as
    they did at ``version``.  Data files referenced only by the rolled-
    back versions become vacuum candidates, not deletions.
    """
    cur = _latest_version(table_dir)
    if cur == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    if not 1 <= version <= cur:
        raise ValueError(f"version {version} not in [1, {cur}]")
    old = _load_manifest(table_dir, version)
    new_v = cur + 1
    manifest = {"version": new_v, "parent": cur, "mode": "restore",
                "restored_from": version,
                "files": old["files"], "schema": old.get("schema", {}),
                "total_rows": old["total_rows"]}
    if commit_ts is not None:
        prev_ts = _load_manifest(table_dir, cur).get("commit_ts")
        if prev_ts is not None and int(commit_ts) < int(prev_ts):
            raise ValueError(
                f"commit_ts {commit_ts} < parent version's {prev_ts}: "
                "version event-times must be non-decreasing")
        manifest["commit_ts"] = int(commit_ts)
    if old.get("bucket_by") is not None:
        manifest["bucket_by"] = old["bucket_by"]
    if old.get("zorder") is not None:
        manifest["zorder"] = old["zorder"]
    mdir = os.path.join(table_dir, _MANIFEST)
    _atomic_json_exclusive(os.path.join(mdir, f"v{new_v:08d}.json"),
                           manifest)
    _atomic_json(os.path.join(mdir, _LATEST), new_v)
    return manifest


def catalog_fsck(table_dir: str, deep: bool = False) -> dict:
    """Table integrity check (the lakehouse `fsck`): verifies the
    LATEST snapshot without reading data (manifest-only), plus an
    optional ``deep`` pass that reads every live file.

    Manifest-level checks (free):
    - ``missing``: referenced data files absent or zero-byte on disk,
    - ``orphans``: files under ``data/`` referenced by NO retained
      manifest version (crashed writers; ``catalog_vacuum`` reclaims),
    - ``stats_invalid``: per-file min > max, or an inline Bloom whose
      decoded bitmap length disagrees with its declared ``n_bits``,
    - ``schema_conflicts``: same-named column with differing types
      across live files (should be impossible post-commit — ADD-only
      evolution rejects it — so a hit means manual tampering).

    ``deep=True`` additionally opens every live file DISTRIBUTED (one
    Ray task batch per file): parquet footer row count must equal the
    manifest's ``rows``, and on bucketed tables every row's key must
    hash to the file's recorded bucket (``placement_errors``).

    Returns a report dict; ``clean`` is True iff every list is empty.
    """
    v = _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    report = {"version": v, "files": len(manifest["files"]),
              "missing": [], "orphans": [], "stats_invalid": [],
              "schema_conflicts": [], "rowcount_mismatch": [],
              "placement_errors": []}

    live_all = set()
    for vv in _versions(table_dir):
        for f in _load_manifest(table_dir, vv)["files"]:
            live_all.add(f["path"])
            for st in f.get("stats", {}).values():
                bl = st.get("bloom") if isinstance(st, dict) else None
                if isinstance(bl, dict) and "sidecar" in bl:
                    live_all.add(bl["sidecar"])
    data_dir = os.path.join(table_dir, "data")
    for name in sorted(os.listdir(data_dir)) if os.path.isdir(data_dir) \
            else []:
        if not name.startswith(".") and f"data/{name}" not in live_all:
            report["orphans"].append(f"data/{name}")

    import base64
    unified: dict = {}
    for f in manifest["files"]:
        p = os.path.join(table_dir, f["path"])
        if not os.path.exists(p) or os.path.getsize(p) == 0:
            report["missing"].append(f["path"])
        for c, st in f.get("stats", {}).items():
            if not isinstance(st, dict):
                continue
            try:
                if (st.get("min") is not None and st.get("max") is not None
                        and st["min"] > st["max"]):
                    report["stats_invalid"].append(
                        {"path": f["path"], "column": c,
                         "reason": "min > max"})
            except TypeError:
                pass
            bl = st.get("bloom")
            if isinstance(bl, dict):
                try:
                    if "sidecar" in bl:
                        sp = os.path.join(table_dir, bl["sidecar"])
                        ok = (os.path.getsize(sp) * 8 == bl["n_bits"])
                    else:
                        raw = base64.b64decode(bl["b64"], validate=True)
                        ok = len(raw) * 8 == bl["n_bits"]
                except Exception:
                    ok = False
                if not ok:
                    report["stats_invalid"].append(
                        {"path": f["path"], "column": c,
                         "reason": "bloom bitmap/n_bits mismatch"})
        for c, ty in f.get("schema", {}).items():
            if c in unified and unified[c] != ty:
                report["schema_conflicts"].append(
                    {"column": c, "types": sorted({unified[c], ty})})
            unified.setdefault(c, ty)

    if deep and manifest["files"]:
        import ray.data as rd

        from ..stages.window_stats import stable_bucket_of
        spec = manifest.get("bucket_by")

        def check_file(batch) -> pa.Table:
            import pyarrow.parquet as pq
            entry = json.loads(str(batch["entry"][0]))
            p = os.path.join(table_dir, entry["path"])
            probs = []
            if not os.path.exists(p):
                return pa.table({"problem": pa.array([], pa.string())})
            pf = pq.ParquetFile(p)
            if pf.metadata.num_rows != entry["rows"]:
                probs.append(json.dumps(
                    {"kind": "rowcount", "path": entry["path"],
                     "manifest": entry["rows"],
                     "footer": pf.metadata.num_rows}))
            if spec is not None and entry.get("bucket", -1) >= 0:
                keys = pq.read_table(p, columns=[spec[0]])[spec[0]]
                b = stable_bucket_of(
                    keys.to_numpy(zero_copy_only=False), spec[1])
                bad = int((b != entry["bucket"]).sum())
                if bad:
                    probs.append(json.dumps(
                        {"kind": "placement", "path": entry["path"],
                         "misplaced_rows": bad}))
            return pa.table({"problem": pa.array(probs, pa.string())})

        work = rd.from_items([{"entry": json.dumps(f)}
                              for f in manifest["files"]])
        probs = work.map_batches(check_file, batch_size=1,
                                 batch_format="numpy").to_pandas()
        for s in probs.get("problem", []):
            d = json.loads(s)
            key = ("rowcount_mismatch" if d["kind"] == "rowcount"
                   else "placement_errors")
            report[key].append(d)

    report["clean"] = all(
        not report[k] for k in ("missing", "orphans", "stats_invalid",
                                "schema_conflicts", "rowcount_mismatch",
                                "placement_errors"))
    return report


def catalog_diff(table_dir: str, from_version: int,
                 to_version: int | None = None,
                 columns: list[str] | None = None,
                 return_report: bool = False):
    """Incremental scan: ONLY the rows added between ``from_version``
    (exclusive) and ``to_version`` (inclusive, default latest) — the
    CDC primitive that turns a batch pipeline into an incremental one.
    Because every engine aggregate is mergeable (window histograms,
    sketches, MG summaries), a consumer processes the diff and merges
    into prior state instead of rescanning the table: at 100 TB an
    hourly append is re-read in O(new files), not O(table).

    The diff is computed from manifests alone (no data I/O): files in
    ``to``'s snapshot whose path is absent from ``from``'s.  This is
    correct for appends AND for overwrite snapshots (an overwrite's
    fresh files all count as added; rows REMOVED by the overwrite are
    reported in the report's ``files_removed``, for consumers that must
    invalidate state).  ``from_version=0`` = full scan of ``to``.
    """
    import ray.data as rd

    to_v = to_version if to_version is not None \
        else _latest_version(table_dir)
    if to_v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    if from_version > to_v:
        raise ValueError(f"from_version {from_version} > to {to_v}")
    old_paths = set()
    if from_version > 0:
        old_paths = {f["path"]
                     for f in _load_manifest(table_dir,
                                             from_version)["files"]}
    manifest = _load_manifest(table_dir, to_v)
    new_paths = {f["path"] for f in manifest["files"]}
    added = [f for f in manifest["files"] if f["path"] not in old_paths]
    paths = [os.path.join(table_dir, f["path"]) for f in added]
    ds = (rd.read_parquet(paths, columns=columns) if paths
          else rd.from_arrow(pa.table({})))
    if return_report:
        return ds, {"from_version": from_version, "to_version": to_v,
                    "files_added": len(added),
                    "rows_added": int(sum(f["rows"] for f in added)),
                    "files_removed": sorted(old_paths - new_paths)}
    return ds


def catalog_changes(table_dir: str, from_version: int,
                    to_version: int | None = None,
                    num_buckets: int = 32):
    """Row-level CDC between two snapshots (Delta's Change Data Feed
    analogue, computed after the fact from immutable snapshots): a
    Dataset of the table's columns plus ``_change`` in
    {'insert','delete'}, as an exact MULTISET diff.

    I/O is O(changed files): only files added or removed between the
    snapshots are read (``catalog_diff`` gives the file lists from
    manifests alone).  Added-file rows enter tagged +1, removed-file
    rows -1; one hash exchange on a row-content bucket, then a
    per-group full-row groupby sums the tags — rows merely REWRITTEN
    between the versions (compaction, the untouched remainder of a
    delete/merge rewrite) cancel to net 0 and are NOT reported, so a
    pure ``catalog_compact`` yields an empty change feed while a
    ``catalog_merge`` yields exactly the deletes of replaced rows plus
    the inserts of source rows.

    Whole-row semantics: a duplicate-row table nets the count
    difference.  The internal ``_bucket`` column of bucketed tables is
    excluded from row identity (a rewrite may re-tag it).
    """
    import pandas as pd
    import ray.data as rd

    to_v = to_version if to_version is not None \
        else _latest_version(table_dir)
    if to_v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    old_files = []
    if from_version > 0:
        old_files = _load_manifest(table_dir, from_version)["files"]
    new_files = _load_manifest(table_dir, to_v)["files"]
    old_paths = {f["path"] for f in old_files}
    new_paths = {f["path"] for f in new_files}
    added = [f["path"] for f in new_files if f["path"] not in old_paths]
    removed = [f["path"] for f in old_files if f["path"] not in new_paths]

    def tagger(tag):
        def _t(t: pa.Table) -> pa.Table:
            if "_bucket" in t.column_names:
                t = t.drop_columns(["_bucket"])
            return t.append_column("_tag",
                                   pa.array([tag] * len(t), pa.int64()))
        return _t

    parts = []
    if added:
        parts.append(rd.read_parquet(
            [os.path.join(table_dir, p) for p in added])
            .map_batches(tagger(1), batch_format="pyarrow",
                         zero_copy_batch=True))
    if removed:
        parts.append(rd.read_parquet(
            [os.path.join(table_dir, p) for p in removed])
            .map_batches(tagger(-1), batch_format="pyarrow",
                         zero_copy_batch=True))
    if not parts:
        return rd.from_arrow(pa.table({"_change": pa.array([],
                                                           pa.string())}))
    both = parts[0]
    for p in parts[1:]:
        both = both.union(p)

    def add_rb(df: pd.DataFrame) -> pd.DataFrame:
        cols = [c for c in df.columns if c != "_tag"]
        h = pd.util.hash_pandas_object(df[cols], index=False)
        df = df.copy()
        df["_rb"] = (h % num_buckets).astype(np.int64)
        return df

    def net(df: pd.DataFrame) -> pd.DataFrame:
        cols = [c for c in df.columns if c not in ("_tag", "_rb")]
        g = (df.groupby(cols, dropna=False, sort=False)["_tag"]
               .sum().reset_index())
        g = g[g["_tag"] != 0]
        if g.empty:
            out = df.head(0)[cols].copy()
            out["_change"] = pd.Series(dtype=str)
            return out
        reps = g["_tag"].abs().to_numpy()
        out = g.loc[g.index.repeat(reps), cols].reset_index(drop=True)
        out["_change"] = np.repeat(
            np.where(g["_tag"].to_numpy() > 0, "insert", "delete"), reps)
        return out

    return (both.map_batches(add_rb, batch_format="pandas")
                .groupby("_rb")
                .map_groups(net, batch_format="pandas"))


_ROW_OPS = {
    "==": "equal", "<=": "less_equal", ">=": "greater_equal",
    "<": "less", ">": "greater",
}


def _row_mask(t: pa.Table, predicate: list[tuple]):
    """Row-level conjunction mask (nulls never match, SQL-style)."""
    import pyarrow.compute as pc
    mask = None
    for col, op, val in predicate:
        term = getattr(pc, _ROW_OPS[op])(t[col], val)
        term = pc.fill_null(term, False)
        mask = term if mask is None else pc.and_(mask, term)
    return mask


def _untouched_report_row(entry: dict) -> pa.Table:
    """A report row that RETAINS an existing data file unchanged
    (its manifest entry re-emitted verbatim through the commit path)."""
    return pa.table({"path": pa.array([entry["path"]]),
                     "rows": pa.array([entry["rows"]], pa.int64()),
                     "stats": pa.array([json.dumps(entry["stats"])]),
                     "bucket": pa.array([entry.get("bucket", -1)],
                                        pa.int64()),
                     "schema": pa.array([json.dumps(
                         entry.get("schema", {}))])})


def catalog_delete(table_dir: str, predicate: list[tuple],
                   commit_ts: int | None = None) -> dict:
    """Delete all rows matching EVERY ``(col, op, value)`` term, as one
    new copy-on-write commit (time travel keeps the pre-delete
    snapshot; ``catalog_vacuum`` reclaims replaced files).

    The 100-TB path: per-file min/max stats split the snapshot into
    files that CANNOT contain a matching row (retained in the new
    manifest with zero I/O) and candidate files, which are rewritten
    minus matching rows — one distributed task per candidate file, so
    a key- or time-ranged delete touches O(matching files), not
    O(table).  A candidate whose rows all survive is retained
    unchanged (no write); one whose rows all match is dropped.

    Returns a report: committed version, rows_deleted, files
    untouched / rewritten / dropped.
    """
    import ray.data as rd

    v = _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    untouched, cands = [], []
    for f in manifest["files"]:
        may = True
        for col, op, val in predicate:
            st = f["stats"].get(col)
            if st is None or st["min"] is None:
                continue
            sval = val.isoformat() if hasattr(val, "isoformat") else val
            if not _OPS[op](st["min"], st["max"], sval):
                may = False
                break
        (cands if may else untouched).append(f)

    data_dir = os.path.join(table_dir, "data")
    rows_before = sum(f["rows"] for f in cands)
    bcols, bbits, bstore = _manifest_bloom_spec(manifest)

    def rewrite(batch) -> pa.Table:
        import pyarrow.parquet as pq
        entry = json.loads(str(batch["entry"][0]))
        t = pq.read_table(os.path.join(table_dir, entry["path"]))
        import pyarrow.compute as pc
        keep = t.filter(pc.invert(_row_mask(t, predicate)))
        if len(keep) == len(t):
            return _untouched_report_row(entry)    # false positive
        if len(keep) == 0:
            return _write_data_file(pa.table({}), data_dir)  # drop file
        return _write_data_file(keep, data_dir, bloom_cols=bcols,
                                bloom_bits=bbits, bloom_store=bstore)

    if cands:
        work = rd.from_items([{"entry": json.dumps(f)} for f in cands])
        report = work.map_batches(rewrite, batch_size=1,
                                  batch_format="numpy").to_pandas()
    else:
        report = {"path": [], "rows": [], "stats": [], "bucket": [],
                  "schema": []}
    spec = manifest.get("bucket_by")
    new_man = _commit_files(table_dir, report, "delete",
                            tuple(spec) if spec else None,
                            base_files=untouched, commit_ts=commit_ts,
                            expect_parent=v)
    rows_after = new_man["total_rows"] - sum(f["rows"] for f in untouched)
    # an all-empty report Dataset loses column names through to_pandas()
    _p = report.get("path", None)
    kept_paths = set(_p) if _p is not None else set()
    cand_paths = {f["path"] for f in cands}
    retained = len(cand_paths & kept_paths)     # false-positive files
    rewritten = len(kept_paths - cand_paths)
    return {"version": new_man["version"],
            "rows_deleted": int(rows_before - rows_after),
            "files_untouched": len(untouched) + retained,
            "files_rewritten": rewritten,
            "files_dropped": len(cands) - retained - rewritten}


def catalog_merge(ds, table_dir: str, on: str,
                  commit_ts: int | None = None) -> dict:
    """Upsert (MERGE): target rows whose ``on`` key appears in ``ds``
    are replaced by the source row; unseen keys are inserted.  One
    copy-on-write commit; source keys must be unique (validated).

    Scale paths, picked automatically:

    - **Bucketed table, bucketed on the merge key** (the 100-TB path):
      the source pays ONE hash exchange into the table's bucket spec;
      each touched bucket is merged in one distributed task that reads
      only that bucket's files (drop matched keys, concat source rows,
      rewrite) — the target is NEVER shuffled, and buckets the source
      doesn't touch are retained with zero I/O.
    - **Unbucketed table**: the source key set is collected and shipped
      to the candidate-file rewrite tasks (files whose key stats
      overlap the source's key range); source rows append as new
      files.  Correct at any size, but driver state is O(source keys)
      — bucket the table on the merge key for big-source merges.

    Returns a report: committed version, rows_updated, rows_inserted,
    buckets/files touched.
    """
    import ray.data as rd
    import pyarrow.compute as pc

    v = _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    data_dir = os.path.join(table_dir, "data")
    spec = manifest.get("bucket_by")
    bcols_m, bbits_m, bstore_m = _manifest_bloom_spec(manifest)

    def check_unique(keys: pa.ChunkedArray, n: int) -> None:
        if pc.count_distinct(keys, mode="all").as_py() != n:
            raise ValueError(
                "catalog_merge source has duplicate keys in "
                f"{on!r} — upsert would be ambiguous")

    if spec and spec[0] == on:
        bcol, n_buckets = spec
        from ..stages.window_stats import stable_bucket_of
        by_bucket: dict[int, list[dict]] = {}
        for f in manifest["files"]:
            by_bucket.setdefault(f.get("bucket", -1), []).append(f)

        def tag(t: pa.Table) -> pa.Table:
            if "_bucket" in t.column_names:
                t = t.drop_columns(["_bucket"])
            b = stable_bucket_of(
                t[on].to_numpy(zero_copy_only=False), n_buckets)
            return t.append_column("_bucket", pa.array(b, pa.int64()))

        def merge_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq
            keys = t[on].combine_chunks()
            check_unique(keys, len(t))
            b = int(t["_bucket"][0].as_py())
            paths = [e["path"] for e in by_bucket.get(b, [])]
            n_updated = 0
            merged = t
            if paths:
                target = pa.concat_tables(
                    [pq.read_table(os.path.join(table_dir, p))
                     for p in paths], promote_options="default")
                hit = pc.fill_null(pc.is_in(target[on], value_set=keys),
                                   False)
                keep = target.filter(pc.invert(hit))
                n_updated = len(target) - len(keep)
                merged = pa.concat_tables([keep, t],
                                          promote_options="default")
            rep = _write_data_file(merged, data_dir, bloom_cols=bcols_m,
                                   bloom_bits=bbits_m,
                                   bloom_store=bstore_m)
            return rep.append_column(
                "updated", pa.array([n_updated] * len(rep), pa.int64()))

        tagged = ds.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
        report = (tagged.groupby("_bucket")
                        .map_groups(merge_bucket, batch_format="pyarrow")
                        .to_pandas())
        touched = {int(b) for b in report.get("bucket", [])}
        base = [f for f in manifest["files"]
                if f.get("bucket", -1) not in touched]
        new_man = _commit_files(table_dir, report, "merge",
                                (bcol, n_buckets), base_files=base,
                                commit_ts=commit_ts, expect_parent=v)
        n_updated = int(sum(report.get("updated", [])))
        return {"version": new_man["version"],
                "rows_updated": n_updated,
                "rows_inserted":
                    int(new_man["total_rows"] - manifest["total_rows"]),
                "buckets_touched": len(touched),
                "files_untouched": len(base)}

    # --- unbucketed path: broadcast source key set ---
    src = ds.materialize()
    key_frame = src.select_columns([on]).to_pandas()
    keys = pa.Table.from_pandas(key_frame)[on].combine_chunks()
    check_unique(keys, len(keys))
    if len(keys) == 0:
        raise ValueError("catalog_merge source is empty")
    kmin, kmax = (_scalar(s) for s in
                  (pc.min(keys), pc.max(keys)))
    untouched, cands = [], []
    for f in manifest["files"]:
        st = f["stats"].get(on)
        if st is None or st["min"] is None:
            cands.append(f)
        elif st["max"] < kmin or kmax < st["min"]:
            untouched.append(f)
        else:
            cands.append(f)

    import ray
    keys_ref = ray.put(keys)

    def rewrite(batch) -> pa.Table:
        import pyarrow.parquet as pq
        entry = json.loads(str(batch["entry"][0]))
        t = pq.read_table(os.path.join(table_dir, entry["path"]))
        kset = ray.get(keys_ref)
        hit = pc.fill_null(pc.is_in(t[on], value_set=kset), False)
        keep = t.filter(pc.invert(hit))
        if len(keep) == len(t):
            rep = _untouched_report_row(entry)
            upd = 0
        elif len(keep) == 0:
            rep = _write_data_file(pa.table({}), data_dir)
            upd = len(t)
        else:
            rep = _write_data_file(keep, data_dir, bloom_cols=bcols_m,
                                   bloom_bits=bbits_m,
                                   bloom_store=bstore_m)
            upd = len(t) - len(keep)
        return rep.append_column("updated",
                                 pa.array([upd] * len(rep), pa.int64()))

    import pandas as pd
    parts = []
    if cands:
        work = rd.from_items([{"entry": json.dumps(f)} for f in cands])
        parts.append(work.map_batches(rewrite, batch_size=1,
                                      batch_format="numpy").to_pandas())
    parts.append(src.map_batches(
        lambda t: _write_data_file(t, data_dir, bloom_cols=bcols_m,
                                   bloom_bits=bbits_m,
                                   bloom_store=bstore_m).append_column(
            "updated", pa.array([0], pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas())
    report = pd.concat(parts, ignore_index=True) if len(parts) > 1 \
        else parts[0]
    new_man = _commit_files(table_dir, report, "merge", None,
                            base_files=untouched, commit_ts=commit_ts,
                            expect_parent=v)
    n_updated = int(report["updated"].sum())
    return {"version": new_man["version"],
            "rows_updated": n_updated,
            "rows_inserted":
                int(new_man["total_rows"] - manifest["total_rows"]),
            "files_untouched": len(untouched),
            "files_rewritten": len(cands)}


def bucketed_join(table_a: str, table_b: str, on: str, how: str = "inner",
                  version_a: int | None = None,
                  version_b: int | None = None,
                  columns_a: list[str] | None = None,
                  columns_b: list[str] | None = None,
                  right_suffix: str = "_r"):
    """SHUFFLE-FREE equi-join of two catalog tables bucketed on the
    join key: because both tables were hash-partitioned on disk with
    the same `stable_bucket_of` spec, matching keys live in matching
    bucket files — one Ray task per bucket reads its file pair locally
    and merges, and NO data crosses the network beyond the reads.
    This is the storage-layout answer to "pick ONE partitioning key
    and reuse it": the write-time exchange is amortized over every
    downstream join/groupby on that key.

    Requirements (validated from manifests, no data I/O): both tables
    committed with ``bucket_by == [on, n]`` for the same ``n``.
    ``how``: "inner" or "left". Null keys follow pandas merge inside a
    bucket (nulls hash to the '' sentinel bucket; SQL-strict callers
    should pre-filter). Returns a Ray Dataset.
    """
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    def spec_of(table_dir, version):
        v = version if version is not None else _latest_version(table_dir)
        m = _load_manifest(table_dir, v)
        spec = m.get("bucket_by")
        if spec is None:
            raise ValueError(f"{table_dir} is not bucketed; "
                             "bucketed_join needs bucket_by tables")
        return m, spec

    ma, sa = spec_of(table_a, version_a)
    mb, sb = spec_of(table_b, version_b)
    if sa != sb or sa[0] != on:
        raise ValueError(f"incompatible bucket specs {sa} vs {sb} "
                         f"for join key {on!r}")
    n_buckets = sa[1]

    def files_by_bucket(m, table_dir):
        out: dict[int, list[str]] = {}
        for f in m["files"]:
            out.setdefault(f["bucket"], []).append(
                os.path.join(table_dir, f["path"]))
        return out

    fa = files_by_bucket(ma, table_a)
    fb = files_by_bucket(mb, table_b)

    def read_concat(paths, cols):
        want = None if cols is None else list(dict.fromkeys([on] + cols))
        ts = [pq.read_table(p, columns=want) for p in paths]
        return pa.concat_tables(ts, promote_options="default").to_pandas()

    def join_bucket(batch) -> "pd.DataFrame":
        frames = []
        for b in batch["bucket"].tolist():
            b = int(b)
            pa_, pb_ = fa.get(b, []), fb.get(b, [])
            if not pa_ or (how == "inner" and not pb_):
                continue
            left = read_concat(pa_, columns_a).drop(
                columns=["_bucket"], errors="ignore")
            if pb_:
                right = read_concat(pb_, columns_b).drop(
                    columns=["_bucket"], errors="ignore")
            else:           # left join against an empty bucket
                right = left.iloc[0:0][[on]]
            frames.append(left.merge(right, on=on, how=how,
                                     suffixes=("", right_suffix)))
        if not frames:
            return pd.DataFrame({on: pd.Series(dtype=object)})
        return pd.concat(frames, ignore_index=True)

    work = rd.range(n_buckets, override_num_blocks=n_buckets).map_batches(
        lambda t: pd.DataFrame({"bucket": t["id"]}), batch_format="numpy")
    return work.map_batches(join_bucket, batch_format="pandas")


def catalog_compact(table_dir: str, target_rows: int = 1 << 20,
                    trust_placement: bool = True) -> dict:
    """Compact a catalog table's small files into ~``target_rows``
    files, committed as one new OVERWRITE version (time travel keeps
    the old layout; ``catalog_vacuum`` reclaims it).  The lakehouse
    maintenance op: steady appends leave one file per (write, bucket),
    and read planning degrades with file count long before data size.

    Bucketed tables compact to one file per bucket with the spec
    preserved — ``bucketed_join`` keeps working on the compacted
    snapshot.  With ``trust_placement=True`` (default) each bucket is
    read, concatenated and rewritten INSIDE one distributed task with
    NO hash exchange: every committed data file already records its
    bucket id and the bucketed write placed its rows by construction,
    so compaction is a pure per-bucket file rewrite (manifest rows are
    the only thing that reaches the driver).  ``trust_placement=False``
    routes rows through the standard bucketed write, whose hash
    exchange re-verifies placement — for tables whose files may have
    been produced outside ``catalog_write``.  Unbucketed tables
    re-block through Ray and rewrite.  Returns the new manifest.
    """
    import ray.data as rd

    v = _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    spec = manifest.get("bucket_by")
    bcols_m, bbits_m, bstore_m = _manifest_bloom_spec(manifest)

    if spec is not None:
        bcol, n_buckets = spec
        groups: dict[int, list[str]] = {}
        for f in manifest["files"]:
            groups.setdefault(f["bucket"], []).append(
                os.path.join(table_dir, f["path"]))

        work = rd.from_items([{"bucket": b} for b in sorted(groups)])

        def load_bucket(batch) -> pa.Table:
            import pyarrow.parquet as pq
            tables = []
            for b in batch["bucket"].tolist():
                for p in groups[int(b)]:
                    tables.append(pq.read_table(p))
            return pa.concat_tables(tables, promote_options="default") \
                if tables else pa.table({})

        if trust_placement:
            data_dir = os.path.join(table_dir, "data")

            def compact_bucket(batch) -> pa.Table:
                return _write_data_file(load_bucket(batch), data_dir,
                                        bloom_cols=bcols_m,
                                        bloom_bits=bbits_m,
                                        bloom_store=bstore_m)

            report = work.map_batches(compact_bucket, batch_size=1,
                                      batch_format="numpy").to_pandas()
            return _commit_files(table_dir, report, "overwrite",
                                 (bcol, n_buckets), expect_parent=v)

        ds = work.map_batches(load_bucket, batch_size=1,
                              batch_format="numpy")
        # map_groups-per-bucket inside catalog_write re-establishes one
        # file per bucket; rows already carry their _bucket column but
        # the write re-derives it from the key column (same hash)
        ds = ds.map_batches(
            lambda t: t.drop_columns(["_bucket"]),
            batch_format="pyarrow", zero_copy_batch=True)
        return catalog_write(ds, table_dir, mode="overwrite",
                             bucket_by=(bcol, n_buckets),
                             bloom_cols=bcols_m, bloom_bits=bbits_m,
                             bloom_store=bstore_m, expect_parent=v)

    paths = [os.path.join(table_dir, f["path"]) for f in manifest["files"]]
    ds = rd.read_parquet(paths)
    n_files = max(1, (manifest["total_rows"] + target_rows - 1)
                  // target_rows)
    return catalog_write(ds.repartition(n_files), table_dir,
                         mode="overwrite",
                         bloom_cols=bcols_m, bloom_bits=bbits_m,
                         bloom_store=bstore_m, expect_parent=v)


def catalog_lookup(table_dir: str, keys, columns: list[str] | None = None,
                   version: int | None = None,
                   return_report: bool = False,
                   key_col: str | None = None):
    """Point lookup: rows whose key is in ``keys``, reading only the
    files that can possibly hold them.

    On a BUCKETED table the lookup reads ONLY the bucket files the
    keys hash into, further skipping files whose min/max stats window
    and (when written with ``bloom_cols``) per-file Bloom prove clean.
    On an UNBUCKETED table pass ``key_col=``: pruning then relies on
    file stats + Blooms alone — with ``bloom_cols`` at write time
    this still reads ~|keys| files out of any number (the Bloom is
    what min/max cannot do when key ranges interleave across files).

    This is the storage-layout answer to "fetch these ids from a
    100 TB table": I/O is bounded by the touched files, not table
    size. ``keys`` is driver-small by contract (a point-lookup key
    set, not a join side — use ``bucketed_join`` for that). Returns a
    Ray Dataset of exactly the matching rows; with
    ``return_report=True`` also the pruning evidence dict.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.window_stats import stable_bucket_of

    v = version if version is not None else _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    spec = manifest.get("bucket_by")
    if spec is None and key_col is None:
        raise ValueError(f"{table_dir} is not bucketed; pass key_col= "
                         "to look up via file stats/Bloom pruning, or "
                         "use catalog_read + filter for full scans")
    n_buckets = None
    if spec is not None:
        key_col, n_buckets = spec
    keys = list(dict.fromkeys(keys))          # dedup, keep order
    if not keys:
        empty = rd.from_arrow(pa.table({}))
        return (empty, {"files_scanned": 0,
                        "files_total": len(manifest["files"]),
                        "rows_skipped": int(manifest["total_rows"])}) \
            if return_report else empty
    by_bucket: dict[int, list] = {}
    if n_buckets is not None:
        kb = stable_bucket_of(np.asarray(keys, dtype=object), n_buckets)
        for k, b in zip(keys, kb.tolist()):
            by_bucket.setdefault(b, []).append(k)

    kept, skipped_rows = [], 0
    for f in manifest["files"]:
        if n_buckets is not None:
            ks = by_bucket.get(f.get("bucket", -1))
            if ks is None:
                skipped_rows += f["rows"]
                continue
        else:
            ks = keys
        st = f["stats"].get(key_col)
        try:
            prunable = (st is not None and st["min"] is not None
                        and not any(st["min"] <= k <= st["max"]
                                    for k in ks))
        except TypeError:            # incomparable key/stat types
            prunable = False
        if not prunable and _bloom_excludes(
                st, ks, f.get("schema", {}).get(key_col), table_dir):
            prunable = True
        if prunable:
            skipped_rows += f["rows"]
            continue
        kept.append(os.path.join(table_dir, f["path"]))

    want = None if columns is None else \
        list(dict.fromkeys([key_col] + columns))
    keyset = pa.array(keys)

    def exact(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[key_col], value_set=keyset))
        if "_bucket" in t.column_names and (
                columns is None or "_bucket" not in columns):
            t = t.drop_columns(["_bucket"])
        return t

    # isin pushdown: parquet row-group stats prune inside kept files
    # (the in-task `exact` filter stays — it also drops _bucket and is
    # the correctness backstop if a reader ignores the filter)
    ds = (rd.read_parquet(kept, columns=want,
                          filter=pc.field(key_col).isin(keys)) if kept
          else rd.from_arrow(pa.table({})))
    if kept:
        ds = ds.map_batches(exact, batch_format="pyarrow",
                            zero_copy_batch=True)
    if return_report:
        return ds, {"files_scanned": len(kept),
                    "files_total": len(manifest["files"]),
                    "rows_skipped": int(skipped_rows)}
    return ds


def catalog_delete_keys(table_dir: str, key_col: str, keys,
                        commit_ts: int | None = None) -> dict:
    """Delete every row whose ``key_col`` is in ``keys`` (the
    right-to-be-forgotten shape: "remove these ids"), as one
    copy-on-write commit.

    Candidate selection composes both prunes: on a table BUCKETED on
    ``key_col`` only files in the buckets the keys hash into are
    candidates; within any candidate set, files whose min/max stats
    window contains none of the keys are retained with zero I/O.
    Each surviving candidate is rewritten minus matching rows in its
    own distributed task — a 10k-id delete on a 100 TB table touches
    O(touched buckets') files, never the table. ``keys`` is
    driver-small by contract (an id list, not a join side).

    Returns the same report shape as ``catalog_delete``.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.window_stats import stable_bucket_of

    v = _latest_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _load_manifest(table_dir, v)
    keys = list(dict.fromkeys(keys))
    spec = manifest.get("bucket_by")

    by_bucket = None
    if spec is not None and spec[0] == key_col:
        kb = stable_bucket_of(np.asarray(keys, dtype=object), spec[1])
        by_bucket = {}
        for k, b in zip(keys, kb.tolist()):
            by_bucket.setdefault(b, []).append(k)

    untouched, cands = [], []
    for f in manifest["files"]:
        ks = keys
        if by_bucket is not None:
            ks = by_bucket.get(f.get("bucket", -1))
            if ks is None:
                untouched.append(f)
                continue
        st = f["stats"].get(key_col)
        try:
            prunable = (st is not None and st["min"] is not None
                        and not any(st["min"] <= k <= st["max"]
                                    for k in ks))
        except TypeError:
            prunable = False
        if not prunable and _bloom_excludes(
                st, ks, f.get("schema", {}).get(key_col), table_dir):
            prunable = True            # Bloom-proven clean: zero I/O
        (untouched if prunable else cands).append(f)

    data_dir = os.path.join(table_dir, "data")
    rows_before = sum(f["rows"] for f in cands)
    keyset = pa.array(keys)
    # preserve the table's Blooms through the rewrite (an absent Bloom
    # is never wrong, just unprunable later)
    bcols, bbits, bstore = _manifest_bloom_spec(manifest)

    def rewrite(batch) -> pa.Table:
        import pyarrow.parquet as pq
        entry = json.loads(str(batch["entry"][0]))
        t = pq.read_table(os.path.join(table_dir, entry["path"]))
        keep = t.filter(pc.invert(pc.fill_null(
            pc.is_in(t[key_col], value_set=keyset), False)))
        if len(keep) == len(t):
            return _untouched_report_row(entry)
        if len(keep) == 0:
            return _write_data_file(pa.table({}), data_dir)
        return _write_data_file(keep, data_dir, bloom_cols=bcols,
                                bloom_bits=bbits, bloom_store=bstore)

    if cands:
        work = rd.from_items([{"entry": json.dumps(f)} for f in cands])
        report = work.map_batches(rewrite, batch_size=1,
                                  batch_format="numpy").to_pandas()
    else:
        report = {"path": [], "rows": [], "stats": [], "bucket": [],
                  "schema": []}
    new_man = _commit_files(table_dir, report, "delete",
                            tuple(spec) if spec else None,
                            base_files=untouched, commit_ts=commit_ts,
                            expect_parent=v)
    rows_after = new_man["total_rows"] - sum(f["rows"] for f in untouched)
    _p = report.get("path", None)
    kept_paths = set(_p) if _p is not None else set()
    cand_paths = {f["path"] for f in cands}
    retained = len(cand_paths & kept_paths)
    rewritten = len(kept_paths - cand_paths)
    return {"version": new_man["version"],
            "rows_deleted": int(rows_before - rows_after),
            "files_untouched": len(untouched) + retained,
            "files_rewritten": rewritten,
            "files_dropped": len(cands) - retained - rewritten}
