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
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
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
            try:
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=False,
                                              check_exact=False, atol=2e-6, rtol=0)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
                print(f"       value diff: {msg}")
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
