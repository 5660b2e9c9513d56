"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship full-profile windowed-stats pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
(SURVEY.md §2) with DuckDB oracles where SQL can express the semantics.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in fasta_windows_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _quiet():
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    _quiet()
    from fasta_windows_ray.pipelines.flagship import flagship
    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    _quiet()
    from fasta_windows_ray.pipelines.queries import build_queries
    return build_queries()


def oracle_sql() -> dict[str, str]:
    from fasta_windows_ray.pipelines.queries import build_oracle_sql
    return build_oracle_sql()
