"""Deterministic epoch shuffle (stages/sampling.py epoch_shuffle)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.sampling import epoch_shuffle

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(n=2_000):
    return pd.DataFrame({"doc_id": [f"d{i:05d}" for i in range(n)],
                         "v": np.arange(n, dtype=np.int64)})


def _order(df):
    return df["v"].to_numpy()


def test_reproducible_across_runs_and_partitionings():
    df = _docs()
    a = epoch_shuffle(rd.from_pandas(df).repartition(7), "doc_id",
                      epoch=3).to_pandas()
    b = epoch_shuffle(rd.from_pandas(df).repartition(2), "doc_id",
                      epoch=3).to_pandas()
    assert (_order(a) == _order(b)).all()
    assert "_shuffle_key" not in a.columns


def test_epochs_decorrelated_and_multiset_preserved():
    df = _docs()
    e0 = epoch_shuffle(rd.from_pandas(df), "doc_id", epoch=0).to_pandas()
    e1 = epoch_shuffle(rd.from_pandas(df), "doc_id", epoch=1).to_pandas()
    assert sorted(_order(e0)) == sorted(_order(e1)) == list(range(len(df)))
    assert (_order(e0) != _order(e1)).mean() > 0.99
    # decorrelated from input order AND between epochs (rank corr ~ 0)
    n = len(df)
    for seq in (_order(e0), _order(e1)):
        rho = np.corrcoef(np.arange(n), seq)[0, 1]
        assert abs(rho) < 0.08
    rho01 = np.corrcoef(np.argsort(_order(e0)),
                        np.argsort(_order(e1)))[0, 1]
    assert abs(rho01) < 0.08


def test_keep_key_exposes_resume_position():
    df = _docs(300)
    out = epoch_shuffle(rd.from_pandas(df), "doc_id",
                        keep_key=True).to_pandas()
    assert "_shuffle_key" in out.columns
    assert (np.diff(out["_shuffle_key"].to_numpy()) >= 0).all()
