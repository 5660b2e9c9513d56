"""Script-profile gates: exact planted fractions, dominant-script
resolution (common never wins outright), null/empty handling, fraction
sum == 1 for covered text, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.text_analysis import SCRIPTS, script_profile

pytestmark = pytest.mark.usefixtures("ray_session")


def run(texts, blocks=3):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = script_profile(rd.from_pandas(df).repartition(blocks)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out


def test_planted_scripts():
    out = run(["hello", "Привет", "你好世界", "مرحبا", "안녕하세요", "🙂🙂"])
    assert list(out["dominant_script"]) == \
        ["latin", "cyrillic", "han", "arabic", "hangul", "emoji"]
    assert out.loc[0, "frac_latin"] == 1.0
    assert out.loc[2, "frac_han"] == 1.0
    assert out.loc[5, "frac_emoji"] == 1.0


def test_mixed_text_fractions_exact():
    out = run(["ab гд 你"])          # 2 latin, 2 cyrillic, 1 han, 2 spaces
    r = out.iloc[0]
    assert r["n_codepoints"] == 7
    assert r["frac_latin"] == pytest.approx(2 / 7)
    assert r["frac_cyrillic"] == pytest.approx(2 / 7)
    assert r["frac_han"] == pytest.approx(1 / 7)
    assert r["frac_common"] == pytest.approx(2 / 7)
    # fractions over known scripts sum to 1 (everything covered here)
    fracs = [r[f"frac_{s}"] for s in SCRIPTS]
    assert sum(fracs) == pytest.approx(1.0)


def test_common_only_and_empty():
    out = run(["123 456!", "", None])
    assert out.loc[0, "dominant_script"] == "common"
    assert out.loc[1, "n_codepoints"] == 0
    assert out.loc[1, "dominant_script"] == "common"
    assert out.loc[2, "n_codepoints"] == 0


def test_common_never_beats_real_script():
    # 10 digits + 2 han chars: han dominates despite fewer codepoints
    out = run(["0123456789 你好"])
    assert out.loc[0, "dominant_script"] == "han"


def test_partition_invariance():
    texts = ["hello", "Привет мир", "你好", "abc 123", "مرحبا"] * 10
    a = run(texts, blocks=1)
    b = run(texts, blocks=7)
    pd.testing.assert_frame_equal(a, b)
