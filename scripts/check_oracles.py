"""Local stand-in for the driver's correctness gate: runs every queries()
entry and its oracle_sql() side-by-side at a given sf, compares row count,
sorted-column-name schema, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver's compare: sort columns by name, sort rows, but do
    NOT coerce dtypes — the driver's value-hash is dtype-sensitive (round-1
    lesson: 9 queries were value-equal but int64-vs-float64 amber)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            oracle = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle raised {ex}")
            failures += 1
            continue
        ok_rows = len(mine) == len(oracle)
        ok_schema = list(mine.columns) == list(oracle.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            # dtype-exact first (the driver's hash is dtype-sensitive)
            dt_bad = [(c, str(mine[c].dtype), str(oracle[c].dtype))
                      for c in mine.columns
                      if str(mine[c].dtype) != str(oracle[c].dtype)]
            for c, a, b in dt_bad:
                print(f"       dtype diff {name}.{c}: mine={a} oracle={b}")
            try:
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=True,
                                              check_exact=True)
                ok_vals = not dt_bad
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
                print(f"       value diff: {msg}")
            # byte-level per-column check (catches -0.0 vs +0.0, which
            # compares equal under == but hashes differently)
            if ok_vals:
                for c in mine.columns:
                    a, b = mine[c].to_numpy(), oracle[c].to_numpy()
                    if a.dtype.kind in "fiu" and a.tobytes() != b.tobytes():
                        print(f"       byte diff {name}.{c} "
                              f"(values equal but bytes differ, e.g. -0.0)")
                        ok_vals = False
        status = "OK  " if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"[{status}] {name}: rows {len(mine)}/{len(oracle)} "
                  f"schema_ok={ok_schema} mine={list(mine.columns)} "
                  f"oracle={list(oracle.columns)}")
        else:
            print(f"[{status}] {name}: {len(mine)} rows")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
