#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's t2 oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sf
tables, sorts columns by name and rows by all values, and compares.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # sort on null-sentinel keys so NaN rows align deterministically
    keyed = df.copy()
    for c in keyed.columns:
        if keyed[c].dtype.kind == "f":
            keyed[c] = keyed[c].fillna(float("inf"))
        else:
            keyed[c] = keyed[c].astype(object).where(~keyed[c].isna(), "\x00null")
            keyed[c] = keyed[c].astype(str)
    order = keyed.sort_values(by=list(keyed.columns)).index
    return df.loc[order].reset_index(drop=True)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            duck_df = con.execute(sql).fetchdf()
            s, d = canon(spark_df), canon(duck_df)
            if list(s.columns) != list(d.columns):
                print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
                n_fail += 1
                continue
            if len(s) != len(d):
                print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
                n_fail += 1
                continue
            # exact compare (driver hashes values); report first diff
            ok = True
            for c in s.columns:
                a, b = s[c], d[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    eq = (a.isna() & b.isna()) | (a == b)
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
                if not eq.all():
                    i = int((~eq).idxmax())
                    print(f"FAIL {name}: col {c} row {i}: "
                          f"spark={a.iloc[i]!r} duck={b.iloc[i]!r} "
                          f"({int((~eq).sum())} diffs)")
                    ok = False
                    break
            if ok:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
