#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executions of oracle_sql.json over the same parquet tables.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Compares, per query: row count, column names/dtypes, and exact values after
sorting columns by name and rows by all columns (mirrors the described driver
behavior; exact match — no epsilon — so queries must be engine-deterministic).
"""
import sys, json, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        status = []
        if list(g.columns) != list(w.columns):
            status.append(f"cols spark={list(g.columns)} duck={list(w.columns)}")
        elif len(g) != len(w):
            status.append(f"rows spark={len(g)} duck={len(w)}")
        else:
            for c in g.columns:
                a, b = g[c], w[c]
                if str(a.dtype) != str(b.dtype):
                    status.append(f"dtype[{c}] spark={a.dtype} duck={b.dtype}")
                    continue
                if a.dtype == object:
                    eq = (a.isna() & b.isna()) | (a.fillna("\0") == b.fillna("\0"))
                elif np.issubdtype(a.dtype, np.floating):
                    eq = (a.isna() & b.isna()) | (a == b)  # exact, by design
                else:
                    eq = (a.isna() & b.isna()) | (a == b)
                if not bool(eq.all()):
                    bad = np.where(~eq)[0][:3]
                    status.append(
                        f"val[{c}] rows {list(bad)} spark={list(a.iloc[bad])} duck={list(b.iloc[bad])}")
        if status:
            print(f"FAIL {name}: " + "; ".join(status[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
