#!/usr/bin/env python3
"""Local dev harness: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json out.json]
Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares (column-name-sorted, row-sorted) values against the Spark parquet
dumps written by graft.Verify. Not part of the engine — dev tooling only.

--json writes a per-query CORRECTNESS-style artifact (the committed
cross-scale sweep record, e.g. CORRECTNESS_sf01_r05.json).

Approximate-family queries are gated EXACT-OR-BOUNDED: when the exact
hash compare fails, a query listed in BOUNDED is re-checked by joining
Spark vs oracle rows on its key columns and asserting every approx
column lands within its published relative error (Datasketches HLL at
the engine's lgK: ±2%), all other columns exact. A bounded pass is
reported as `bounded_match` with the observed max relative error, so
the artifact records HOW approximate the estimate actually was.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# exact-or-bounded criteria for the approximate family: key columns to
# join on, and per-column relative-error tolerance (sketch contract)
BOUNDED = {
    "q108_sketch_ivm": {"keys": ["day"], "approx": {"n_distinct": 0.02}},
}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize for compare: sort rows by all columns, reset index
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        pass
    return df.reset_index(drop=True)

def bounded_check(name, spark_df, ora):
    """(ok, max_rel_err, why) under the BOUNDED criteria for `name`."""
    spec = BOUNDED[name]
    keys, approx = spec["keys"], spec["approx"]
    if sorted(spark_df.columns) != sorted(ora.columns):
        return False, None, "columns differ"
    m = spark_df.merge(ora, on=keys, how="outer", suffixes=("_s", "_o"),
                       indicator=True)
    if (m["_merge"] != "both").any():
        return False, None, "key sets differ"
    max_err = 0.0
    for c in spark_df.columns:
        if c in keys:
            continue
        s, o = m[f"{c}_s"], m[f"{c}_o"]
        if c in approx:
            denom = o.abs().clip(lower=1)
            err = ((s - o).abs() / denom).max()
            max_err = max(max_err, float(err))
            if err > approx[c]:
                return False, float(err), f"{c} rel err {err:.4f} > {approx[c]}"
        else:
            if not (s.reset_index(drop=True)).equals(o.reset_index(drop=True)):
                return False, None, f"exact column {c} differs"
    return True, max_err, None

def main(argv) -> int:
    sf_dir, out_dir = argv[0], argv[1]
    json_out = None
    if "--json" in argv:
        json_out = argv[argv.index("--json") + 1]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_dirs = {os.path.basename(d): d for d in glob.glob(f"{out_dir}/*")
                  if os.path.isdir(d)}
    failures = 0
    report = {}
    for name, d in sorted(spark_dirs.items()):
        spark_df = pq.read_table(d).to_pandas()
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "bounded_match": None, "max_rel_err": None,
               "spark_rows": len(spark_df), "oracle_rows": None, "err": None}
        if name not in oracle_sql:
            status = f"rows-only ({len(spark_df)} rows)"
            ok = len(spark_df) > 0
            rec["rows_match"] = ok
            rec["err"] = None if ok else "no_rows"
            if not ok:
                rec["err"] = "no_rows"
        else:
            try:
                ora = con.execute(oracle_sql[name]).fetchdf()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                rec["err"] = f"oracle_sql_error: {e}"
                report[name] = rec
                failures += 1
                continue
            rec["oracle_rows"] = len(ora)
            rec["rows_match"] = len(spark_df) == len(ora)
            a, b = norm(spark_df), norm(ora)
            rec["schema_match"] = list(a.columns) == list(b.columns)
            if not rec["schema_match"]:
                print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
                rec["err"] = "schema_mismatch"
                report[name] = rec
                failures += 1
                continue
            ok = a.equals(b)
            rec["hash_match"] = ok
            status = "match" if ok else f"MISMATCH shapes {a.shape} vs {b.shape}"
            if not ok and name in BOUNDED:
                bok, err, why = bounded_check(name, spark_df, ora)
                rec["bounded_match"] = bok
                rec["max_rel_err"] = err
                if bok:
                    ok = True
                    status = f"bounded (max rel err {err:.4f})"
                else:
                    status = f"BOUNDED FAIL: {why}"
                    rec["err"] = f"bounded_fail: {why}"
            elif not ok:
                if a.shape == b.shape:
                    # show first mismatch
                    neq = (a != b) & ~(a.isna() & b.isna())
                    cells = neq.to_numpy().nonzero()
                    if len(cells[0]):
                        r, c = cells[0][0], cells[1][0]
                        col = a.columns[c]
                        print(f"  first diff at row {r} col {col}: "
                              f"spark={a.iloc[r, c]!r} oracle={b.iloc[r, c]!r}")
                rec["err"] = "hash_mismatch"
        print(("OK   " if ok else "FAIL ") + f"{name}: {status}")
        report[name] = rec
        if not ok:
            failures += 1
    print(f"\n{len(spark_dirs) - failures}/{len(spark_dirs)} queries pass")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "pass": len(spark_dirs) - failures,
                       "total": len(spark_dirs), "queries": report}, f, indent=1)
        print(f"artifact written to {json_out}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
