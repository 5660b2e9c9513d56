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
import pyarrow.compute as pc

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

    _UFUNC = {"sum": np.add, "min": np.minimum, "max": np.maximum}
    _INIT = {"sum": 0.0, "min": np.inf, "max": -np.inf}

    def partial(t: pa.Table) -> pd.DataFrame:
        # dict.fromkeys dedupes value_col == pivot_col (count-of-self)
        df = t.select(list(dict.fromkeys(
            index + [pivot_col, value_col]))).to_pandas()
        if df.empty:
            empty = {c: pd.Series(dtype=np.float64) for c in out_cols}
            for c in index:
                empty[c] = pd.Series(dtype=object)
            return pd.DataFrame(empty)[index + out_cols]
        # vectorized scatter-fold (pd.pivot_table was ~10x slower at
        # high group counts): factorize the composite group key, map
        # pivot values to fixed column slots, one ufunc.at per batch
        if len(index) == 1:
            kcodes, kuniq = pd.factorize(df[index[0]],
                                         use_na_sentinel=False)
            key_frame = {index[0]: kuniq}
        else:
            mi = pd.MultiIndex.from_frame(df[index])
            kcodes, kuniq = pd.factorize(mi, use_na_sentinel=False)
            key_frame = {c: [u[i] for u in kuniq]
                         for i, c in enumerate(index)}
        vcat = pd.Categorical(df[pivot_col], categories=values)
        vcodes = vcat.codes
        vals = df[value_col].to_numpy()
        ok = vcodes >= 0
        if agg == "count":
            ok &= pd.notna(vals)
        else:
            fv = pd.to_numeric(df[value_col], errors="coerce").to_numpy(
                np.float64, na_value=np.nan)
            ok &= ~np.isnan(fv)
        G, K = len(kuniq), len(values)
        cnt = np.zeros((G, K), dtype=np.int64)
        np.add.at(cnt, (kcodes[ok], vcodes[ok]), 1)
        if agg == "count":
            mat = cnt.astype(np.float64)
        else:
            mat = np.full((G, K), _INIT[agg], dtype=np.float64)
            _UFUNC[agg].at(mat, (kcodes[ok], vcodes[ok]), fv[ok])
            if agg != "sum":
                mat[cnt == 0] = np.nan      # empty min/max cell = null
        out = pd.DataFrame(key_frame)
        for j, c in enumerate(out_cols):
            out[c] = mat[:, j]
        return out[index + out_cols]

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    # merge per HASH BUCKET of the first index column, not per group —
    # map_groups calls its fn once per group, which at high group
    # cardinality (24k groups) costs 10x the whole scatter-fold
    from .window_stats import stable_bucket_of

    def bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_of(
            t[index[0]].to_numpy(zero_copy_only=False), 256)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        g = df.groupby(index, dropna=False, sort=False)[out_cols]
        out = g.sum(min_count=1).reset_index() \
            if mergeable == "sum" else g.agg(mergeable).reset_index()
        if agg in ("sum", "count"):
            out[out_cols] = out[out_cols].fillna(0)
            if agg == "count":
                out[out_cols] = out[out_cols].astype(np.int64)
        return out

    return (parts.map_batches(bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby("bucket")
                 .map_groups(finish, batch_format="pandas"))


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


def explode(ds, list_col: str, pos_col: str | None = None):
    """One output row per list element (SQL UNNEST): values via
    ``list_flatten``, the other columns repeated by element count —
    a pure per-batch Arrow transform, zero shuffles, no per-row
    Python.  Null and empty lists produce no rows (SQL UNNEST);
    ``pos_col`` adds the 0-based element index."""

    def flat(t: pa.Table) -> pa.Table:
        col = t[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):      # all-null block: no rows;
            # the element type is unknowable here, so emit the Arrow
            # null type — it promotes to ANY sibling block's element
            # type at schema unification (a hardcoded string() broke
            # datasets whose other blocks carry list<int64> etc.)
            out = t.drop_columns([list_col]).slice(0, 0)
            out = out.append_column(list_col,
                                    pa.array([], pa.null()))
            if pos_col is not None:
                out = out.append_column(pos_col,
                                        pa.array([], pa.int64()))
            return out
        lens = pc.list_value_length(col).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        others = t.drop_columns([list_col]).take(pa.array(idx))
        vals = pc.list_flatten(col)
        out = others.append_column(list_col, vals)
        if pos_col is not None:
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            pos = np.arange(int(lens.sum()), dtype=np.int64) - starts
            out = out.append_column(pos_col, pa.array(pos, pa.int64()))
        return out

    return ds.map_batches(flat, batch_format="pyarrow",
                          zero_copy_batch=True)
