"""Catalog optimistic concurrency (sources/catalog.py): the
two-concurrent-writers contract.

- Append vs append: the manifest create is a version-id CAS; the loser
  retries against the fresh snapshot, so N interleaved appends all
  commit, serialized, with no lost files.
- Copy-on-write DML (delete/merge) vs an interleaved append: the DML
  commit carries ``expect_parent`` (the snapshot its rewrite came
  from) and is cleanly REFUSED with ``ConcurrentWriteError`` — never a
  silent drop of the interleaved writer's files; re-running on the
  fresh snapshot succeeds.
"""

import threading

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from fasta_windows_ray.sources import catalog as cat
from fasta_windows_ray.sources.catalog import (ConcurrentWriteError,
                                               catalog_delete,
                                               catalog_merge, catalog_read,
                                               catalog_write)


def _mk(ids, lang="en"):
    ids = list(ids)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "lang": pa.array([lang] * len(ids)),
        "score": pa.array(np.asarray(ids, dtype=np.float64) * 0.5)}))


def test_concurrent_appends_both_commit(ray_session, tmp_path):
    """Four threads append through one barrier: every commit lands
    (serialized by the version CAS + retry), no rows lost."""
    t = str(tmp_path / "tbl")
    catalog_write(_mk(range(10)), t)

    n_writers = 4
    barrier = threading.Barrier(n_writers)
    errors = []

    def writer(i):
        ds = _mk(range(1000 * (i + 1), 1000 * (i + 1) + 10))
        barrier.wait()
        try:
            catalog_write(ds, t, mode="append")
        except Exception as e:          # pragma: no cover - must not fire
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,))
               for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert errors == []
    assert cat._latest_version(t) == 1 + n_writers        # serialized
    got = sorted(catalog_read(t).to_pandas()["doc_id"])
    want = sorted(list(range(10)) +
                  [1000 * (i + 1) + j
                   for i in range(n_writers) for j in range(10)])
    assert got == want
    # version chain is linear: each manifest's parent is version-1
    for v in range(1, n_writers + 2):
        m = cat._load_manifest(t, v)
        assert m["parent"] == v - 1


def test_append_cas_loser_retries_deterministic(ray_session, tmp_path,
                                                monkeypatch):
    """Deterministic CAS loss: a competing manifest lands at the exact
    version our append targets, between parent-read and create. The
    append must retry on the fresh snapshot and keep BOTH writers'
    files."""
    t = str(tmp_path / "tbl")
    catalog_write(_mk(range(5)), t)

    orig = cat._atomic_json_exclusive
    state = {"fired": False}

    def inject(path, obj):
        if not state["fired"] and path.endswith("v00000002.json"):
            state["fired"] = True
            # the competitor wins v2 with a one-file manifest
            orig(path, {"version": 2, "parent": 1, "mode": "append",
                        "files": cat._load_manifest(t, 1)["files"],
                        "schema": obj["schema"], "total_rows": 5})
        return orig(path, obj)

    monkeypatch.setattr(cat, "_atomic_json_exclusive", inject)
    m = catalog_write(_mk(range(100, 105)), t, mode="append")
    assert state["fired"]
    assert m["version"] == 3 and m["parent"] == 2          # retried past v2
    assert catalog_read(t, version=3).count() == 10


def test_stale_cow_delete_refused_no_lost_update(ray_session, tmp_path,
                                                 monkeypatch):
    """An append interleaves inside a delete (after its snapshot read,
    before its commit): the delete is refused, the append's rows
    survive, and re-running the delete on the fresh snapshot works."""
    t = str(tmp_path / "tbl")
    catalog_write(_mk(range(10)), t)

    orig = cat._commit_files
    state = {"interleaved": False}

    def interleave(table_dir, report, mode, *a, **kw):
        if mode == "delete" and not state["interleaved"]:
            state["interleaved"] = True
            catalog_write(_mk(range(500, 505)), table_dir, mode="append")
        return orig(table_dir, report, mode, *a, **kw)

    monkeypatch.setattr(cat, "_commit_files", interleave)
    with pytest.raises(ConcurrentWriteError):
        catalog_delete(t, [("doc_id", "<", 3)])

    # no lost update: the interleaved append's rows are all present
    got = set(catalog_read(t).to_pandas()["doc_id"])
    assert got == set(range(10)) | set(range(500, 505))

    # the documented recovery: re-run on the fresh snapshot
    monkeypatch.setattr(cat, "_commit_files", orig)
    rep = catalog_delete(t, [("doc_id", "<", 3)])
    assert rep["rows_deleted"] == 3
    got = set(catalog_read(t).to_pandas()["doc_id"])
    assert got == set(range(3, 10)) | set(range(500, 505))


def test_stale_cow_merge_refused(ray_session, tmp_path, monkeypatch):
    t = str(tmp_path / "tbl")
    catalog_write(_mk(range(10)), t)

    orig = cat._commit_files
    state = {"interleaved": False}

    def interleave(table_dir, report, mode, *a, **kw):
        if mode == "merge" and not state["interleaved"]:
            state["interleaved"] = True
            catalog_write(_mk(range(600, 603)), table_dir, mode="append")
        return orig(table_dir, report, mode, *a, **kw)

    monkeypatch.setattr(cat, "_commit_files", interleave)
    with pytest.raises(ConcurrentWriteError):
        catalog_merge(_mk(range(5, 8), lang="fr"), t, on="doc_id")
    got = set(catalog_read(t).to_pandas()["doc_id"])
    assert got == set(range(10)) | set(range(600, 603))


def test_stale_compact_refused(ray_session, tmp_path, monkeypatch):
    """Compaction rewrites a snapshot; an append landing mid-compact
    must refuse the compact commit (it would drop the append's files),
    for BOTH the trust_placement fast path and the rewrite fallback."""
    from fasta_windows_ray.sources.catalog import catalog_compact

    for trust in (True, False):
        t = str(tmp_path / f"tbl_{trust}")
        catalog_write(_mk(range(5)), t, bucket_by=("doc_id", 4))
        catalog_write(_mk(range(5, 10)), t, mode="append",
                      bucket_by=("doc_id", 4))

        orig = cat._commit_files
        state = {"interleaved": False}

        def interleave(table_dir, report, mode, *a, **kw):
            if mode == "overwrite" and not state["interleaved"]:
                state["interleaved"] = True
                catalog_write(_mk(range(700, 703)), table_dir,
                              mode="append", bucket_by=("doc_id", 4))
            return orig(table_dir, report, mode, *a, **kw)

        monkeypatch.setattr(cat, "_commit_files", interleave)
        with pytest.raises(ConcurrentWriteError):
            catalog_compact(t, trust_placement=trust)
        monkeypatch.setattr(cat, "_commit_files", orig)

        got = set(catalog_read(t).to_pandas()["doc_id"])
        assert got == set(range(10)) | set(range(700, 703))
        # fresh-snapshot re-run compacts cleanly and keeps every row
        m = catalog_compact(t, trust_placement=trust)
        got = set(catalog_read(t, version=m["version"])
                  .to_pandas()["doc_id"])
        assert got == set(range(10)) | set(range(700, 703))


def test_restore_race_refused(ray_session, tmp_path, monkeypatch):
    """catalog_restore's metadata-only commit is also a version CAS:
    a concurrent writer landing the same version forces a clean
    refusal, never a clobber."""
    from fasta_windows_ray.sources.catalog import catalog_restore

    t = str(tmp_path / "tbl")
    catalog_write(_mk(range(5)), t)
    catalog_write(_mk(range(5, 10)), t, mode="append")

    orig = cat._atomic_json_exclusive

    def inject(path, obj):
        if obj.get("mode") == "restore":
            # competitor lands v3 first
            orig(path, {"version": obj["version"],
                        "parent": obj["parent"], "mode": "append",
                        "files": cat._load_manifest(t, 2)["files"],
                        "schema": obj["schema"],
                        "total_rows": 10})
        return orig(path, obj)

    monkeypatch.setattr(cat, "_atomic_json_exclusive", inject)
    with pytest.raises(ConcurrentWriteError):
        catalog_restore(t, version=1)
    monkeypatch.setattr(cat, "_atomic_json_exclusive", orig)
    # the competitor's v3 is intact; a fresh restore succeeds as v4
    assert cat._latest_version(t) == 3
    m = catalog_restore(t, version=1)
    assert m["version"] == 4
    assert catalog_read(t).count() == 5
