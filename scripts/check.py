#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet
tables, and compares: schema (sorted column names), row count, and a
hash over sorted rows/columns with float tolerance handled by the
queries themselves (they round).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon_val(v):
    """Lists/arrays -> tuples so values are hashable and printable."""
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(v.tolist())
    except ImportError:
        pass
    if isinstance(v, list):
        return tuple(v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical stringified form: copy (never mutate the caller's
    frame), stringify every value, THEN sort — sorting typed object
    columns that mix tuples and None/NaN raises TypeError in pandas."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_val)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            # keep going: queries over the missing table then FAIL by
            # name below instead of the whole gate dying at setup
            print(f"WARN no view for {t}: {e}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        g_s = g.astype(str)
        w_s = w.astype(str)
        if not g_s.equals(w_s):
            diff = (g_s != w_s).any(axis=1)
            idx = diff[diff].index[:5]
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
            for i in idx:
                print(f"  spark:  {g.iloc[i].to_dict()}")
                print(f"  duckdb: {w.iloc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
