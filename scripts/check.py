#!/usr/bin/env python3
"""Dev-loop oracle check, mimicking the driver's DuckDB compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Runs each SQL in <verifyOutDir>/oracle_sql.json against DuckDB views over
the parquet tables in <sfDir>, reads the Spark result parquet written by
graft.Verify, sorts columns by name and rows by all values, and compares
cell-by-cell (exact, including float bits). NOT part of the shipped
library — driver-side python (duckdb/pandas) is allowed for the dev loop
only.
"""
import numbers
import os, sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make lists/arrays comparable + sortable
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v) if v is not None else None)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # layout-variant dirs (make_layout_variant.py) store each table as
        # a DIRECTORY of part files; glob those, read plain files directly
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1
            continue
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            for i in range(len(a)):
                x, y = a.iloc[i], b.iloc[i]
                if x is None and y is None:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    if x != y:
                        bad = (c, i, x, y, abs(x - y))
                        break
                elif (isinstance(x, numbers.Number) and isinstance(y, numbers.Number)
                      and not isinstance(x, bool) and not isinstance(y, bool)):
                    # a nullable integer column null-promotes to float64 on
                    # ONE side only (pandas) — 191689641.0 vs 191689641 is
                    # the same value; compare numerically, still exact
                    if float(x) != float(y):
                        bad = (c, i, x, y, None)
                        break
                elif str(x) != str(y):
                    bad = (c, i, x, y, None)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r} absdiff={bad[4]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
