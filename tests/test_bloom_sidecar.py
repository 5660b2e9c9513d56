"""Sidecar Bloom storage (sources/catalog.py, round 4): bitmaps live in
raw files next to the data files instead of base64 inside the manifest
— the layout that keeps manifests O(100 B)/file at 10^5+ files.

Contracts under test:
- sidecar tables prune identically to inline tables (lookup + read);
- the manifest carries NO bitmap bytes, only the sidecar path;
- copy-on-write maintenance (delete_keys / merge / compact) preserves
  the sidecar store — no silent demotion to inline;
- vacuum reclaims a dead file's sidecars and keeps live ones;
- fsck flags truncated sidecars, treats live ones as non-orphans;
- inline and sidecar files interoperate within one table (migration).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (_latest_version,
                                               _load_manifest,
                                               _load_sidecar_bloom_cached,
                                               catalog_fsck,
                                               catalog_lookup,
                                               catalog_read,
                                               catalog_vacuum,
                                               catalog_write)

pytestmark = pytest.mark.usefixtures("ray_session")

BITS = 1 << 14


def _interleaved(tmp_path, name, store, n=8000, files=8):
    """Round-robin ids: every file's min/max spans the whole range, so
    only the Bloom can prune."""
    rng = np.random.default_rng(11)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "v": ids * 3})
    d = str(tmp_path / name)
    catalog_write(rd.from_pandas(df).repartition(files), d,
                  bloom_cols=["doc_id"], bloom_bits=BITS,
                  bloom_store=store)
    return d, df


def _blooms(table_dir, version=None):
    v = version or _latest_version(table_dir)
    m = _load_manifest(table_dir, v)
    out = []
    for f in m["files"]:
        for c, st in f["stats"].items():
            if isinstance(st, dict) and isinstance(st.get("bloom"), dict):
                out.append((f["path"], c, st["bloom"]))
    return m, out


def test_sidecar_manifest_shape_and_pruning_parity(ray_session, tmp_path):
    ds_, dfs = _interleaved(tmp_path, "side", "sidecar")
    di, dfi = _interleaved(tmp_path, "inl", "inline")

    m, bls = _blooms(ds_)
    assert bls, "sidecar table must record blooms"
    for path, col, bl in bls:
        assert "b64" not in bl
        sp = os.path.join(ds_, bl["sidecar"])
        assert os.path.getsize(sp) * 8 == bl["n_bits"] == BITS
        assert bl["sidecar"].startswith("data/")
    # the scale claim itself: a sidecar manifest is small
    mlen = len(json.dumps(m))
    assert mlen < len(json.dumps(_blooms(di)[0]))

    keys = [5, 777, 7001, 999_999]
    got_s, rep_s = catalog_lookup(ds_, keys, key_col="doc_id",
                                  return_report=True)
    got_i, rep_i = catalog_lookup(di, keys, key_col="doc_id",
                                  return_report=True)
    # identical bitmaps either side -> identical pruning decisions
    assert rep_s["files_scanned"] == rep_i["files_scanned"] \
        < rep_s["files_total"]
    a = got_s.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = got_i.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].tolist() == [5, 777, 7001]

    dsr, repr_ = catalog_read(ds_, predicate=[("doc_id", "==", 4242)],
                              return_report=True)
    assert repr_["files_scanned"] < repr_["files_total"]
    assert 4242 in set(dsr.to_pandas()["doc_id"])


def test_cow_preserves_sidecar_store(ray_session, tmp_path):
    from fasta_windows_ray.sources.catalog import (catalog_compact,
                                                   catalog_delete_keys)
    d, df = _interleaved(tmp_path, "cow", "sidecar")
    catalog_delete_keys(d, "doc_id", [5, 777])
    _, bls = _blooms(d)
    assert bls and all("sidecar" in bl and "b64" not in bl
                       for _, _, bl in bls)
    catalog_compact(d)
    _, bls = _blooms(d)
    assert bls and all("sidecar" in bl and "b64" not in bl
                       for _, _, bl in bls)
    # rows intact post-maintenance, pruning still live
    got, rep = catalog_lookup(d, [7001], key_col="doc_id",
                              return_report=True)
    assert got.to_pandas()["v"].tolist() == [21003]
    left = catalog_read(d).to_pandas()
    assert len(left) == len(df) - 2 and not {5, 777} & set(left["doc_id"])


def test_vacuum_reclaims_dead_sidecars_keeps_live(ray_session, tmp_path):
    d, df = _interleaved(tmp_path, "vac", "sidecar")
    _, bls_v1 = _blooms(d, version=1)
    old_sides = {bl["sidecar"] for _, _, bl in bls_v1}
    # overwrite -> v1's files + sidecars become dead weight
    catalog_write(rd.from_pandas(df.head(100)), d, mode="overwrite",
                  bloom_cols=["doc_id"], bloom_bits=BITS,
                  bloom_store="sidecar")
    _, bls_v2 = _blooms(d)
    new_sides = {bl["sidecar"] for _, _, bl in bls_v2}
    deleted = catalog_vacuum(d, keep_versions=1)
    assert old_sides <= set(deleted)          # dead sidecars reclaimed
    assert not new_sides & set(deleted)       # live ones kept
    for s in new_sides:
        assert os.path.exists(os.path.join(d, s))
    assert catalog_fsck(d)["clean"]
    # pruning still works off the retained sidecars
    _, rep = catalog_lookup(d, [999_999], key_col="doc_id",
                            return_report=True)
    assert rep["files_scanned"] == 0


def test_fsck_flags_truncated_sidecar_not_live_orphans(ray_session,
                                                       tmp_path):
    d, _ = _interleaved(tmp_path, "fsck", "sidecar")
    rep = catalog_fsck(d)
    assert rep["clean"] and not rep["orphans"]
    _, bls = _blooms(d)
    victim = os.path.join(d, bls[0][2]["sidecar"])
    with open(victim, "wb") as fh:
        fh.write(b"\x00" * 7)                  # wrong size
    rep = catalog_fsck(d)
    assert any(x["reason"] == "bloom bitmap/n_bits mismatch"
               for x in rep["stats_invalid"])


def test_missing_sidecar_is_unprunable_not_fatal(ray_session, tmp_path):
    d, df = _interleaved(tmp_path, "miss", "sidecar")
    _load_sidecar_bloom_cached.cache_clear()
    _, bls = _blooms(d)
    for _, _, bl in bls:
        os.remove(os.path.join(d, bl["sidecar"]))
    # absent bitmap -> no Bloom pruning: a mid-range key (inside every
    # file's min/max window) now scans every file, but rows stay right
    got, rep = catalog_lookup(d, [4001], key_col="doc_id",
                              return_report=True)
    assert rep["files_scanned"] == rep["files_total"]
    assert got.to_pandas()["v"].tolist() == [12003]
    _load_sidecar_bloom_cached.cache_clear()


def test_inline_and_sidecar_interoperate(ray_session, tmp_path):
    d, df = _interleaved(tmp_path, "mix", "inline")
    extra = pd.DataFrame({"doc_id": np.arange(100_000, 100_050,
                                              dtype=np.int64),
                          "v": np.arange(50, dtype=np.int64)})
    catalog_write(rd.from_pandas(extra), d, bloom_cols=["doc_id"],
                  bloom_bits=BITS, bloom_store="sidecar")
    _, bls = _blooms(d)
    stores = {("sidecar" if "sidecar" in bl else "inline")
              for _, _, bl in bls}
    assert stores == {"inline", "sidecar"}
    got, rep = catalog_lookup(d, [100_007, 5], key_col="doc_id",
                              return_report=True)
    assert sorted(got.to_pandas()["doc_id"]) == [5, 100_007]
    assert rep["files_scanned"] < rep["files_total"]
    # COW over a mixed table promotes to sidecar (never demotes)
    from fasta_windows_ray.sources.catalog import catalog_delete_keys
    catalog_delete_keys(d, "doc_id", [100_007])
    m = _load_manifest(d, _latest_version(d))
    rewritten = [f for f in m["files"]
                 if f["stats"].get("doc_id", {}).get("bloom")
                 and "sidecar" in f["stats"]["doc_id"]["bloom"]]
    assert rewritten
