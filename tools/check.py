#!/usr/bin/env python3
"""Local parity checker mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Registers each parquet table from sfDir as a DuckDB view, runs each oracle
SQL from <verifyOutDir>/oracle_sql.json, reads our Spark result parquet,
sorts columns by name (like the driver) plus rows, and diffs values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _norm_val(v):
    if isinstance(v, dict):
        return tuple((k, _norm_val(x)) for k, x in sorted(v.items()))
    if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray':
        return tuple(_norm_val(x) for x in v)
    return v


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(_norm_val)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            oracle = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs oracle {list(oracle.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(oracle)}")
            n_fail += 1
            continue
        # row-order-insensitive compare (sorted), exact values
        ms = mine.sort_values(by=list(mine.columns), kind="mergesort").reset_index(drop=True)
        os_ = oracle.sort_values(by=list(oracle.columns), kind="mergesort").reset_index(drop=True)
        diffs = []
        for c in mine.columns:
            a, b = ms[c], os_[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"{c}[row {i}]: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
