"""HTML → text extraction: the "turn crawled markup into training
text" curation step (the CCNet/C4 pipelines run exactly this before any
quality filter). Shuffle-free Arrow stage on ``pyarrow.compute``'s RE2
kernels — the same engine and discipline as ``stages/pii.py``: one
vectorized map over batches, no Python per-row work, no state.

Pipeline per document (order is part of the contract):

1. drop ``<script>``/``<style>``/``<!-- -->`` blocks WITH their content
   (non-greedy ``(?is)`` RE2 spans),
2. convert structural breaks (``<br>``, ``</p>``, ``</div>``,
   ``</h1..6>``, ``</li>``, ``</tr>``) to newlines so words from
   adjacent blocks don't fuse,
3. strip every remaining tag,
4. decode the common entities (&amp; &lt; &gt; &quot; &#39; &nbsp; and
   numeric ``&#NNN;`` for ASCII codes),
5. canonicalize whitespace (runs of spaces/tabs → one space, 3+
   newlines → two, trim).

Also emits ``markup_ratio`` — the fraction of bytes removed — a quality
signal (a page that was 95% markup is rarely prose; compose with the
C4/Gopher filters in curation_filters.py).

Idempotence gate: extracting already-extracted text is a no-op (pytest).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement), applied in order; RE2 syntax ((?is) = case-
# insensitive dot-all; non-greedy spans; no backrefs — RE2 has none)
_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<br\s*/?>", "\n"),
    (r"(?i)</(?:p|div|h[1-6]|li|tr|ul|ol|table|blockquote)>", "\n"),
    (r"(?s)<[^>]*>", " "),
]

_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),      # &amp; LAST (double-escapes)
]

_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t\r\f\v]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^\s+|\s+$", ""),
]


def extract_text_array(txt: pa.Array) -> pa.Array:
    """The whole extraction as chained Arrow kernels over one column."""
    for pat, rep in _STRIP_STEPS:
        txt = pc.replace_substring_regex(txt, pat, rep)
    for ent, ch in _ENTITIES:
        txt = pc.replace_substring(txt, ent, ch)
    # numeric character references, printable ASCII: decoded exactly.
    # 95 memchr-fast literal passes, but only when a batch contains
    # "&#" at all (most clean corpora skip this entirely)
    if (pc.sum(pc.count_substring(txt, "&#")).as_py() or 0) > 0:
        for code in range(32, 127):
            txt = pc.replace_substring(txt, f"&#{code};", chr(code))
    for pat, rep in _WS_STEPS:
        txt = pc.replace_substring_regex(txt, pat, rep)
    return txt


def extract_text(ds, text_col: str = "text", out_col: str | None = None):
    """documents → extracted text + ``markup_ratio``. ``out_col=None``
    replaces ``text_col`` in place (the usual pipeline composition);
    pass a name to keep the raw markup column alongside."""

    def run(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = txt.fill_null("")
        before = pc.binary_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        clean = extract_text_array(txt)
        after = pc.binary_length(clean).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ratio = np.where(before > 0, 1.0 - after / np.maximum(before, 1),
                         0.0)
        if out_col:
            t = t.append_column(out_col, clean)
        else:
            t = t.set_column(t.schema.get_field_index(text_col),
                             text_col, clean)
        return t.append_column("markup_ratio",
                               pa.array(ratio, pa.float64()))

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
