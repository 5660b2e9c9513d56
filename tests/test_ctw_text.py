"""Char-class CTW over window text: kernel sanity + engine/vectorized
agreement."""

import pandas as pd

from fasta_windows_ray import kernels as K
from fasta_windows_ray.state.engine import StreamEngine, WindowConfig, \
    emitted_to_frame
from fasta_windows_ray.synth import make_transcripts

S = 1_000_000


def test_text_class_symbols():
    assert list(K.text_class_symbols("aB3 ?")) == [0, 0, 1, 2, 3]


def test_ctw_text_kernel_ranges():
    # repetitive class stream compresses; diverse stream near 2 bits
    low = K.ctw_text_classes(["aaaaaaaaaaaaaaaa"] * 4, 6)
    assert low < 0.5
    mixed = K.ctw_text_classes(["a1 ?b2\t!c3 d4,"] * 4, 6)
    assert 0.0 < mixed < 2.2
    assert K.ctw_text_classes([], 6) == 0.0


def canon(df):
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_ctw_text_engine_matches_vectorized(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.window_stats import window_stats
    from fasta_windows_ray.state.runner import stateful_window_run

    t = make_transcripts(n_convs=6, mean_turns=30, seed=41)
    vec = canon(window_stats(rd.from_arrow(t), 20 * S, num_buckets=4,
                             ctw_text=True).to_pandas())
    cfg = WindowConfig(kind="tumbling", size_us=20 * S, ctw_text=True)
    st = canon(stateful_window_run(rd.from_arrow(t), cfg,
                                   num_buckets=4).to_pandas())
    assert (vec["ctw_text_bpb"] > 0).any()
    pd.testing.assert_frame_equal(vec.drop(columns=["last_ts"]),
                                  st.drop(columns=["last_ts"]),
                                  check_dtype=False)
