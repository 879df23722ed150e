#!/usr/bin/env python3
"""Dev-side oracle checker (mirrors the driver's DuckDB compare).

Usage:
  python3 tools/check.py <verifyOutDir> <sfDir> [query ...]

Reads <verifyOutDir>/<q>/ parquet (written by graft.Verify), replays
<verifyOutDir>/oracle_sql.json in DuckDB over the sfDir tables, and
compares row counts, sorted-by-name schemas, and the full sorted row
multiset. Driver-side tooling only — the Scala library never imports
any of this.
"""
import json, sys, glob, os
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    fails = 0
    for q in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, q)
        if not os.path.isdir(path) or (only and q not in only):
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchdf()
        if q not in oracle:
            print(f"{q:34s} rows={len(spark)} (no oracle)")
            continue
        ora = con.execute(oracle[q]).fetchdf()
        cols_s, cols_o = sorted(spark.columns), sorted(ora.columns)
        if cols_s != cols_o:
            print(f"{q:34s} SCHEMA MISMATCH {cols_s} vs {cols_o}")
            fails += 1
            continue
        if len(spark) != len(ora):
            print(f"{q:34s} ROWS MISMATCH {len(spark)} vs {len(ora)}")
            fails += 1
            continue
        a = spark[cols_s].sort_values(cols_s).reset_index(drop=True)
        b = ora[cols_s].sort_values(cols_s).reset_index(drop=True)
        ok = a.equals(b)
        if not ok:
            # tolerate dtype-only differences (e.g. int32 vs int64)
            try:
                ok = a.astype(str).equals(b.astype(str))
            except Exception:
                ok = False
        print(f"{q:34s} rows={len(spark)} {'OK' if ok else 'VALUE MISMATCH'}")
        if not ok:
            fails += 1
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
