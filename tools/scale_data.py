#!/usr/bin/env python3
"""Stage a xK replicated copy of an sf dir with offset keys (driver-side
tooling, not engine code).

Each replica k shifts every join key by k*(max_key+1), so join selectivity
and cluster structure are preserved exactly: a customer still owns the same
orders, an order the same lineitems. Dimension tables with engine-fixed
cardinality (nation, region) and the already-timestamp-keyed events table
are copied as-is; documents/embeddings replicate with offset ids, which
gives every document K exact copies (a crawl-like duplication factor — the
pair-producing dedup ops are EXPECTED to emit ~C(K,2) more pairs per
cluster; see SURVEY.md §6).

Usage: python3 tools/scale_data.py <baseDir> <outDir> <K>
"""
import os
import shutil
import sys

import duckdb

base, out, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# strides derived from the data (max key + 1) so sparse or 1-based key
# spaces never collide across replicas — same contract as
# graft.tools.ScaleUp, which computes its strides the same way
def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{base}/{table}.parquet')"
    ).fetchone()[0]

OFF = {
    "c": stride("customer", "c_custkey"),
    "o": stride("orders", "o_orderkey"),
    "s": stride("supplier", "s_suppkey"),
    "p": stride("part", "p_partkey"),
    "d": stride("documents", "doc_id"),
    "e": stride("embeddings", "vec_id"),
}
REPL = {
    "customer": "c_custkey + k*{c} AS c_custkey",
    "orders": "o_orderkey + k*{o} AS o_orderkey, o_custkey + k*{c} AS o_custkey",
    "lineitem": ("l_orderkey + k*{o} AS l_orderkey, "
                 "l_partkey + k*{p} AS l_partkey, l_suppkey + k*{s} AS l_suppkey"),
    "supplier": "s_suppkey + k*{s} AS s_suppkey",
    "part": "p_partkey + k*{p} AS p_partkey",
    "documents": "doc_id + k*{d} AS doc_id",
    "embeddings": "vec_id + k*{e} AS vec_id",
}
ASIS = ["nation", "region", "events"]

for t, repl in REPL.items():
    src = f"{base}/{t}.parquet"
    dst = f"{out}/{t}.parquet"
    con.execute(
        f"COPY (SELECT t.* REPLACE ({repl.format(**OFF)}) "
        f"FROM read_parquet('{src}') t CROSS JOIN range({K}) r(k)) "
        f"TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    print(f"{t}: {n} rows")

for t in ASIS:
    shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"{t}: copied as-is")
