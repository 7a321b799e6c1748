#!/usr/bin/env python3
"""Local dev harness: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares (column-name-sorted, row-sorted) values against the Spark parquet
dumps written by graft.Verify. Not part of the engine — dev tooling only.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize for compare: sort rows by all columns, reset index
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        pass
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_dirs = {os.path.basename(d): d for d in glob.glob(f"{out_dir}/*")
                  if os.path.isdir(d)}
    failures = 0
    for name, d in sorted(spark_dirs.items()):
        spark_df = pq.read_table(d).to_pandas()
        if name not in oracle_sql:
            status = f"rows-only ({len(spark_df)} rows)"
            ok = len(spark_df) > 0
        else:
            try:
                ora = con.execute(oracle_sql[name]).fetchdf()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                failures += 1
                continue
            a, b = norm(spark_df), norm(ora)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
                failures += 1
                continue
            ok = a.equals(b)
            if not ok and a.shape == b.shape:
                # show first mismatch
                neq = (a != b) & ~(a.isna() & b.isna())
                cells = neq.to_numpy().nonzero()
                if len(cells[0]):
                    r, c = cells[0][0], cells[1][0]
                    col = a.columns[c]
                    print(f"  first diff at row {r} col {col}: "
                          f"spark={a.iloc[r, c]!r} oracle={b.iloc[r, c]!r}")
            status = "match" if ok else f"MISMATCH shapes {a.shape} vs {b.shape}"
        print(("OK   " if ok else "FAIL ") + f"{name}: {status}")
        if not ok:
            failures += 1
    print(f"\n{len(spark_dirs) - failures}/{len(spark_dirs)} queries pass")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
