#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each parquet table under its bare name, runs every oracle SQL
from oracle_sql.json, loads the Spark result parquet, sorts columns by
name and rows by all values, and compares cell-by-cell (exact for
strings/ints/decimals; tiny epsilon report for floats so mismatch causes
are visible). Exit code 1 if any query mismatches.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell (the driver hashes values; strings
    # make mismatches printable)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        return str(v)
    out = df.map(cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            bad += 1
            continue
        try:
            got = norm(pq.read_table(f"{out_dir}/{name}").to_pandas())
        except Exception as e:
            print(f"FAIL {name}: spark result missing {e}")
            bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            bad += 1
            continue
        if not got.equals(want):
            diff = (got != want)
            n = int(diff.values.sum())
            print(f"FAIL {name}: {n} differing cells")
            idx = diff.any(axis=1)
            print("  spark:", got[idx].head(3).to_dict("records"))
            print("  duck :", want[idx].head(3).to_dict("records"))
            bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'PASS' if bad == 0 else 'FAIL'}: {len(oracle) - bad}/{len(oracle)} oracle queries match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
