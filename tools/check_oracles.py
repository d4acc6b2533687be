"""Local mimic of the driver's correctness gate: run every queries()
entry and its oracle SQL side-by-side, compare row count, column names
and order-insensitive values. Usage:
    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = canon(to_df(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: engine error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(ours)} rows, cols={list(ours.columns)}")
            n_rowsonly += 1
            continue
        try:
            ref = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        ok_rows = len(ours) == len(ref)
        ok_cols = list(ours.columns) == list(ref.columns)
        ok_vals = ok_rows and ok_cols and ours.equals(ref)
        if not ok_vals and ok_rows and ok_cols:
            # localized diff report
            for c in ours.columns:
                if not ours[c].equals(ref[c]):
                    neq = (ours[c] != ref[c]) & ~(ours[c].isna() & ref[c].isna())
                    i = int(np.argmax(neq.to_numpy())) if neq.any() else -1
                    print(f"  col {c}: first diff at row {i}: ours={ours[c].iloc[i]!r} ref={ref[c].iloc[i]!r}")
        status = "PASS" if ok_vals else "FAIL"
        print(f"{status} {name}: rows ours={len(ours)} ref={len(ref)} cols_ok={ok_cols}")
        n_pass += ok_vals
        n_fail += not ok_vals
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")


if __name__ == "__main__":
    main()
