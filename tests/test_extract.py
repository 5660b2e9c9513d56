"""HTML extraction gates: planted pages produce exactly the expected
prose, script/style content vanishes, entities decode, block boundaries
become newlines, idempotence, markup_ratio sanity, null handling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fasta_windows_ray.stages.extract import extract_text

pytestmark = pytest.mark.usefixtures("ray_session")


def run(texts, **kw):
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    return extract_text(ds, **kw).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def test_planted_page():
    html = ("<html><head><title>T</title>"
            "<style>body { color: red }</style>"
            "<script type='text/js'>var x = '<p>not text</p>';</script>"
            "</head><body>"
            "<h1>Header</h1>"
            "<p>First &amp; second &lt;para&gt;.</p>"
            "<ul><li>one</li><li>two</li></ul>"
            "<!-- a comment with <b>tags</b> -->"
            "<div>Last&nbsp;bit &#65;&#66;</div>"
            "</body></html>")
    out = run([html])
    txt = out["text"].iloc[0]
    assert "Header" in txt and "First & second <para>." in txt
    assert "one\n" in txt and "two" in txt
    assert "Last bit AB" in txt
    assert "color" not in txt and "var x" not in txt    # style/script gone
    assert "comment" not in txt                          # comments gone
    assert "<" not in txt.replace("<para>", "")          # no tags left
    assert 0.4 < out["markup_ratio"].iloc[0] < 1.0


def test_block_tags_become_newlines():
    out = run(["<p>alpha</p><p>beta</p>gamma<br>delta"])
    txt = out["text"].iloc[0]
    assert "alpha\nbeta" in txt.replace(" \n", "\n")
    assert "gamma\ndelta" in txt
    # inline tags do NOT split words
    out2 = run(["con<b>cat</b>enated"])
    assert "con cat enated" in out2["text"].iloc[0]


def test_idempotent_on_plain_text():
    plain = "just prose with numbers 1 < 2 is math-free and no markup"
    once = run([plain])["text"].iloc[0]
    twice = run([once])["text"].iloc[0]
    assert once == twice
    out = run(["clean text"])
    assert out["markup_ratio"].iloc[0] == pytest.approx(0.0)


def test_nulls_and_empty():
    out = run([None, "", "<p>x</p>"])
    assert out["text"].iloc[0] == "" and out["markup_ratio"].iloc[0] == 0.0
    assert out["text"].iloc[1] == ""
    assert out["text"].iloc[2] == "x"


def test_keep_raw_column():
    out = run(["<p>hi</p>"], out_col="clean")
    assert out["text"].iloc[0] == "<p>hi</p>"
    assert out["clean"].iloc[0] == "hi"


def test_whitespace_canonicalization():
    # runs of spaces/tabs collapse; 3+ newlines cap at one blank line
    out = run(["<p>a   b</p>\n\n\n\n<p>c\t\td</p>"])
    assert out["text"].iloc[0] == "a b\n\nc d"
