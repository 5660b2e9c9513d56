"""Flagship pipeline: the full-profile windowed-stats run the driver's
``entry()`` smoke-checks — read → project → window-assign →
hash-bucket shuffle → vectorized window stats (entropy, diversity, CTW).

Mirrors the reference's default mode (fw.rs fasta_windows()) end-to-end,
Ray-Data-first (SURVEY.md §3.1 "Ray Data shape").
"""

from __future__ import annotations

from ..transcripts import read_transcripts
from .queries import BIGRAM, SIZE_US
from ..stages.window_stats import window_stats


def flagship(sf_dir: str = "/root/testdata/sf0.001", profile: str = "full",
             size_us: int = SIZE_US, step_us: int | None = None,
             num_buckets: int = 64):
    ds = read_transcripts(sf_dir)
    return window_stats(ds, size_us, step_us=step_us, profile=profile,
                        num_buckets=num_buckets, bigram=BIGRAM)
