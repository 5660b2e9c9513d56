"""Frozen golden outputs (FIXTURES.md §Golden outputs): the full sliding
stats profile over the seeded synthetic table must stay bit-identical
across refactors (tolerance 1e-12: results are bit-deterministic within
a process, but np.log2 shows last-ulp variation across processes).
Regenerate ONLY with an explicit semantic-change justification."""

import pandas as pd
import pyarrow.parquet as pq

from fasta_windows_ray.synth import make_transcripts

S = 1_000_000


def test_sliding_stats_matches_golden(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.window_stats import window_stats

    t = make_transcripts(n_convs=12, mean_turns=40, seed=20240817)
    out = window_stats(rd.from_arrow(t), 30 * S, step_us=10 * S,
                       num_buckets=4, ctw_text=True).to_pandas()
    out = out.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    golden = pq.read_table(
        "tests/goldens/sliding_stats_golden.parquet").to_pandas()
    pd.testing.assert_frame_equal(out, golden, check_dtype=False,
                                  rtol=1e-12, atol=1e-12)


def test_stateful_matches_golden(ray_session):
    """The stateful engine reproduces the same frozen rows."""
    import ray.data as rd

    from fasta_windows_ray.state.engine import WindowConfig
    from fasta_windows_ray.state.runner import stateful_window_run

    t = make_transcripts(n_convs=12, mean_turns=40, seed=20240817)
    cfg = WindowConfig(kind="sliding", size_us=30 * S, step_us=10 * S,
                       ctw_text=True)
    out = stateful_window_run(rd.from_arrow(t), cfg,
                              num_buckets=4).to_pandas()
    out = out.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    golden = pq.read_table(
        "tests/goldens/sliding_stats_golden.parquet").to_pandas()
    cols = [c for c in golden.columns if c != "last_ts"]
    pd.testing.assert_frame_equal(out[cols], golden[cols],
                                  check_dtype=False, rtol=1e-12, atol=1e-12)
