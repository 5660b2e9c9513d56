"""Anomaly-detection gates: planted spike flagged, steady series never
flags, baseline excludes the current row, short-history rows never flag,
pandas ground-truth parity, rolling_std window function vs pandas."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.cep import detect_anomalies
from fasta_windows_ray.stages.window_funcs import window_functions

pytestmark = pytest.mark.usefixtures("ray_session")


def mk(series: dict) -> pd.DataFrame:
    rows = []
    for key, vals in series.items():
        for i, v in enumerate(vals):
            rows.append({"conv_id": key, "w": i, "x": float(v)})
    return pd.DataFrame(rows)


def run(pdf, **kw):
    out = detect_anomalies(rd.from_pandas(pdf).repartition(3),
                           "conv_id", "w", "x", **kw).to_pandas()
    return out.sort_values(["conv_id", "w"]).reset_index(drop=True)


def test_planted_spike_flagged():
    vals = [10, 11, 9, 10, 10, 11, 9, 10, 100, 10]
    out = run(mk({"a": vals}), trailing=8, k_sigma=3.0)
    assert list(out.loc[out["is_anomaly"], "w"]) == [8]
    z = out.loc[out["w"] == 8, "zscore"].iloc[0]
    assert z > 50            # huge spike vs tight baseline


def test_steady_series_never_flags():
    out = run(mk({"a": [5] * 20}))
    assert not out["is_anomaly"].any()       # std 0 -> no flag
    rng = np.random.default_rng(3)
    out2 = run(mk({"b": rng.normal(0, 1, 200)}), k_sigma=6.0)
    assert not out2["is_anomaly"].any()


def test_baseline_excludes_current_row():
    # if the current row leaked into its own baseline, z would shrink;
    # with 4 prior 10s, mean=10, std=0 -> excluded-std path uses prior
    # rows only: [10,10,10,12] then 30
    vals = [10, 10, 10, 12, 30]
    out = run(mk({"a": vals}), trailing=4, k_sigma=3.0)
    row = out[out["w"] == 4].iloc[0]
    assert row["baseline_mean"] == pytest.approx(10.5)
    assert row["baseline_std"] == pytest.approx(np.std([10, 10, 10, 12],
                                                       ddof=1))
    assert bool(row["is_anomaly"])


def test_short_history_never_flags():
    out = run(mk({"a": [1, 1000]}))          # only 1 prior value
    assert not out["is_anomaly"].any()
    assert np.isnan(out.loc[out["w"] == 0, "zscore"].iloc[0])


def test_pandas_ground_truth_parity():
    rng = np.random.default_rng(7)
    series = {f"c{i}": rng.normal(50, 5, rng.integers(5, 30))
              for i in range(6)}
    out = run(mk(series), trailing=6, k_sigma=2.5)
    for key, vals in series.items():
        s = pd.Series(vals)
        roll = s.shift(1).rolling(6, min_periods=1)
        mean, std = roll.mean(), roll.std(ddof=1)
        z = (s - mean) / std
        sub = out[out["conv_id"] == key].reset_index(drop=True)
        np.testing.assert_allclose(sub["baseline_mean"], mean, atol=1e-9)
        got_flag = sub["is_anomaly"].to_numpy()
        want_flag = ((z.abs() > 2.5) & std.gt(0).fillna(False)
                     & s.index.to_series().ge(2)).to_numpy()
        np.testing.assert_array_equal(got_flag, want_flag)


def test_rolling_std_window_function():
    pdf = mk({"a": [1, 2, 4, 8, 16, 32], "b": [5, 5, 5]})
    out = window_functions(rd.from_pandas(pdf).repartition(2),
                           ["conv_id"], ["w"],
                           [("rolling_std", "x", 3, "sd")]).to_pandas()
    out = out.sort_values(["conv_id", "w"]).reset_index(drop=True)
    for key in ("a", "b"):
        sub = out[out["conv_id"] == key]
        want = (mk({key: sub["x"].tolist()})["x"]
                .rolling(3, min_periods=1).std(ddof=1))
        np.testing.assert_allclose(sub["sd"].to_numpy(),
                                   np.round(want.to_numpy(), 6),
                                   atol=1e-9, equal_nan=True)
