"""F23: salted pre-aggregation on a hot-key corpus must be bit-equal to
the unsalted groupby path; turn-window boundary semantics."""

import pandas as pd

from fasta_windows_ray.synth import make_transcripts

S = 1_000_000


def canon(df):
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_f23_salted_equals_unsalted(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.salted import salted_window_counts
    from fasta_windows_ray.stages.window_stats import window_stats

    # one 20k-turn hot conversation + many small ones
    t = make_transcripts(n_convs=30, mean_turns=30, seed=17,
                         hot_conv_turns=20_000)
    cols = ["conv_id", "window_start", "n_turns", "n_user", "n_assistant",
            "n_system", "n_tool", "n_other", "sys_asst_share",
            "masked_share", "role_entropy"]
    salted = canon(salted_window_counts(
        rd.from_arrow(t), 60 * S, num_merge_buckets=8).to_pandas()[cols])
    plain = canon(window_stats(rd.from_arrow(t), 60 * S, profile="counts",
                               num_buckets=8).to_pandas()[cols])
    pd.testing.assert_frame_equal(salted, plain, check_dtype=False,
                                  check_exact=True)


def test_turn_window_clamped_ends(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fasta_windows_ray.stages.window_stats import turn_window_counts
    from fasta_windows_ray.synth import conv_from_string

    t = pa.concat_tables([
        conv_from_string("c16", "ACGTACG"),            # 7 turns  (F16)
        conv_from_string("c17", "ACGTACGTAC" * 2),     # 20 turns (F17)
        conv_from_string("c18", "ACGTACGTAC" * 2 + "ACGTA"),  # 25 (F18)
    ])
    out = turn_window_counts(rd.from_arrow(t), w_turns=10,
                             num_buckets=4).to_pandas()
    out = out.sort_values(["conv_id", "win_start"]).reset_index(drop=True)
    got = {(r.conv_id, int(r.win_start), int(r.win_end), int(r.n_turns))
           for r in out.itertuples()}
    assert got == {
        ("c16", 0, 7, 7),                       # shorter than window
        ("c17", 0, 10, 10), ("c17", 10, 20, 10),  # exact multiple
        ("c18", 0, 10, 10), ("c18", 10, 20, 10), ("c18", 20, 25, 5),
    }


def test_salted_sessions_equal_plain(ray_session):
    """Salted interval-stitched sessions == direct per-conv session pass,
    on a hot-key corpus whose hot conversation spans many blocks."""
    import ray.data as rd

    from fasta_windows_ray.stages.salted import salted_session_counts
    from fasta_windows_ray.stages.sessions import session_stats

    t = make_transcripts(n_convs=20, mean_turns=25, seed=37,
                         hot_conv_turns=5_000, turn_gap_us=40 * S)
    ds = rd.from_arrow(t).repartition(16)   # force the hot conv across blocks
    a = canon(salted_session_counts(ds, 60 * S, num_merge_buckets=8).to_pandas())
    b = canon(session_stats(rd.from_arrow(t), 60 * S,
                            num_buckets=8).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_salted_session_full_stats_equal_engine(ray_session):
    """Round-2 VERDICT #4: the interval-stitch of full _WindowAcc
    partials must reproduce the stateful engine's session rows exactly
    on a hot-key corpus split across many blocks."""
    import numpy as np
    import ray.data as rd

    from fasta_windows_ray.state.engine import StreamEngine, WindowConfig
    from fasta_windows_ray.stages.salted import salted_session_stats

    t = make_transcripts(n_convs=12, mean_turns=20, seed=41,
                         hot_conv_turns=2_000, turn_gap_us=40 * S)
    ds = rd.from_arrow(t).repartition(16)   # hot conv spans many blocks
    a = canon(salted_session_stats(ds, 60 * S, num_merge_buckets=8,
                                   ctw_depth=3).to_pandas())

    # reference: single engine fed time-ordered rows (the engine's
    # streaming contract — conv-major order would advance the watermark
    # past earlier convs and late-drop them)
    eng = StreamEngine(WindowConfig(kind="session", gap_us=60 * S,
                                    profile="full", ctw_depth=3))
    pdf = t.to_pandas().sort_values(["ts", "turn_idx"])
    rows = eng.process_rows(pdf)
    rows += eng.flush()
    from fasta_windows_ray.state.engine import emitted_to_frame
    b = canon(emitted_to_frame(rows, "session"))
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # non-vacuous: the hot conv produced multiple sessions with text stats
    assert len(a) > 10 and (a["char_entropy"] > 0).any()
    assert (a["ctw_roles_bpb"] > 0).any()
