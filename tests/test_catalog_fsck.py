"""catalog_fsck (sources/catalog.py): manifest-level and deep
integrity checks — healthy tables report clean; each planted fault is
detected in its own bucket."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_fsck,
                                               catalog_write)

pytestmark = pytest.mark.usefixtures("ray_session")


def _tbl(tmp_path, bucketed=True):
    df = pd.DataFrame({"k": [f"u{i}" for i in range(2000)],
                       "v": np.arange(2000, dtype=np.int64)})
    d = str(tmp_path / "tbl")
    kw = {"bucket_by": ("k", 8)} if bucketed else {}
    catalog_write(rd.from_pandas(df).repartition(4), d,
                  bloom_cols=["k"], **kw)
    return d


def test_fsck_clean_table(tmp_path):
    d = _tbl(tmp_path)
    rep = catalog_fsck(d, deep=True)
    assert rep["clean"], rep
    assert rep["files"] == 8


def test_fsck_detects_missing_and_orphans(tmp_path):
    d = _tbl(tmp_path, bucketed=False)
    data = os.path.join(d, "data")
    victim = sorted(os.listdir(data))[0]
    os.remove(os.path.join(data, victim))
    with open(os.path.join(data, "part-orphan.parquet"), "wb") as f:
        f.write(b"crashed writer leftovers")
    rep = catalog_fsck(d)
    assert not rep["clean"]
    assert rep["missing"] == [f"data/{victim}"]
    assert rep["orphans"] == ["data/part-orphan.parquet"]


def test_fsck_detects_corrupt_stats_and_bloom(tmp_path):
    d = _tbl(tmp_path, bucketed=False)
    mdir = os.path.join(d, "_manifest")
    mpath = os.path.join(mdir, sorted(os.listdir(mdir))[0])
    if mpath.endswith("_LATEST"):
        mpath = os.path.join(mdir, sorted(os.listdir(mdir))[-1])
    m = json.load(open(mpath))
    m["files"][0]["stats"]["v"] = {"min": 99, "max": 1}
    m["files"][1]["stats"]["k"]["bloom"]["b64"] = "AAAA"   # 3 bytes
    json.dump(m, open(mpath, "w"))
    rep = catalog_fsck(d)
    reasons = {e["reason"] for e in rep["stats_invalid"]}
    assert reasons == {"min > max", "bloom bitmap/n_bits mismatch"}


def test_fsck_deep_detects_rowcount_and_placement(tmp_path):
    d = _tbl(tmp_path, bucketed=True)
    mdir = os.path.join(d, "_manifest")
    mpath = os.path.join(
        mdir, [n for n in sorted(os.listdir(mdir)) if n.startswith("v")][-1])
    m = json.load(open(mpath))
    m["files"][0]["rows"] += 5                    # lie about row count
    m["files"][1]["bucket"] = (m["files"][1]["bucket"] + 1) % 8
    json.dump(m, open(mpath, "w"))
    rep = catalog_fsck(d, deep=True)
    assert len(rep["rowcount_mismatch"]) == 1
    assert rep["placement_errors"][0]["misplaced_rows"] > 0
    # manifest-only pass does NOT see deep faults
    shallow = catalog_fsck(d)
    assert shallow["rowcount_mismatch"] == [] \
        and shallow["placement_errors"] == []


def test_cli_fsck_exit_codes(tmp_path, capsys):
    from fasta_windows_ray.__main__ import main
    d = _tbl(tmp_path, bucketed=False)
    assert main(["fsck", d]) == 0
    os.remove(os.path.join(d, "data",
                           sorted(os.listdir(os.path.join(d, "data")))[0]))
    assert main(["fsck", d]) == 1
