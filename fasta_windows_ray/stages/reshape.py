"""Reshaping operators: pivot (long -> wide conditional aggregate) and
unpivot/melt (wide -> long), the SQL PIVOT/UNPIVOT pair.

``pivot`` is a grouped conditional aggregate, NOT a full transpose:
the pivot column's value set becomes output columns, so it must be
BOUNDED (caller-supplied ``values=...``, or discovered with one cheap
distinct pass that refuses past ``max_values`` instead of silently
making a million-column table).  Execution is the engine's standard
partial-aggregate shape: each batch folds to at most (groups x 1) rows
with one column per pivot value (vectorized pandas pivot_table per
batch), then ONE ``groupby(index).sum()`` merges partials — the
exchange carries group-cardinality rows, never the input.

``unpivot`` is a pure per-batch Arrow transform (zero shuffles, zero
per-row Python): value columns are concatenated with an interleaving
take, the id columns repeat positionally.

SQL twins (the pytest oracles)::

    PIVOT t ON <pivot_col> USING sum(<value_col>) GROUP BY <index>
    UNPIVOT t ON <c1>, <c2>, ... INTO NAME variable VALUE value
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_AGGS = {"sum", "count", "min", "max"}


def pivot(ds, index: list[str], pivot_col: str, value_col: str,
          agg: str = "sum", values: list | None = None,
          max_values: int = 256):
    """Wide conditional aggregate: one output row per ``index`` group,
    one output column per pivot value (named ``{pivot_col}_{value}``),
    cells = ``agg(value_col)`` over the matching rows (0 for absent
    sum/count cells, null for min/max — SQL PIVOT semantics).

    ``values`` pins the output column set (order preserved); omitted,
    it is discovered with a distinct pass and sorted — refusing past
    ``max_values`` columns rather than exploding the schema.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg={agg!r} (one of {sorted(_AGGS)})")
    if values is None:
        found = ds.unique(pivot_col)
        if len(found) > max_values:
            raise ValueError(
                f"pivot: {len(found)} distinct {pivot_col!r} values "
                f"exceed max_values={max_values} — pass values=[...] "
                "to pin the output columns")
        values = sorted(found, key=str)
    values = list(values)
    out_cols = [f"{pivot_col}_{v}" for v in values]
    mergeable = "sum" if agg in ("sum", "count") else agg

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(index + [pivot_col, value_col]).to_pandas()
        df = df[df[pivot_col].isin(values)]
        if df.empty:
            empty = {c: pd.Series(dtype=np.float64) for c in out_cols}
            for c in index:
                empty[c] = pd.Series(dtype=object)
            return pd.DataFrame(empty)[index + out_cols]
        pt = pd.pivot_table(df, index=index, columns=pivot_col,
                            values=value_col, aggfunc=agg,
                            dropna=False)
        pt = pt.reindex(columns=values)
        pt.columns = [f"{pivot_col}_{v}" for v in pt.columns]
        return pt.reset_index()[index + out_cols]

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(index, dropna=False, sort=False)[out_cols]
        out = getattr(g, mergeable)(min_count=1).reset_index() \
            if mergeable == "sum" else g.agg(mergeable).reset_index()
        if agg in ("sum", "count"):
            out[out_cols] = out[out_cols].fillna(0)
            if agg == "count":
                out[out_cols] = out[out_cols].astype(np.int64)
        return out

    return parts.groupby(index[0]).map_groups(finish,
                                              batch_format="pandas")


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """Melt: one output row per (input row, value column) — a pure
    per-batch transform. Value columns are cast to a common float64
    (mixed int/float sources) unless they are all strings."""

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        all_str = all(pa.types.is_string(t[c].type) or
                      pa.types.is_large_string(t[c].type)
                      for c in value_cols)
        typ = pa.string() if all_str else pa.float64()
        blocks = []
        for c in value_cols:
            blk = t.select(id_cols)
            blk = blk.append_column(
                var_name, pa.array([c] * n, pa.string()))
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            blocks.append(blk.append_column(value_name, col.cast(typ)))
        return pa.concat_tables(blocks)

    return ds.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)
