#!/usr/bin/env python3
"""Dev-side emulation of the driver's correctness gate: run each oracle SQL
in DuckDB against the sfDir parquet tables, compare to the Spark parquet
dumps written by graft.Verify (column-name-sorted, row-sorted, hashed).
Usage: compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fail = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    pdir = os.path.join(outdir, name)
    if not os.path.isdir(pdir):
        print(f"MISSING spark output: {name}")
        fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in
                          glob.glob(pdir + "/*.parquet")], ignore_index=True)
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE ERROR {name}: {e}")
        fail += 1
        continue

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif str(df[c].dtype).startswith("float"):
                df[c] = df[c].round(6)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"SCHEMA MISMATCH {name}: spark={list(a.columns)} duck={list(b.columns)}")
        fail += 1
    elif len(a) != len(b):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(a)} duck={len(b)}")
        fail += 1
    elif not a.astype(str).equals(b.astype(str)):
        neq = (a.astype(str) != b.astype(str)).any(axis=1)
        print(f"VALUE MISMATCH {name}: {neq.sum()}/{len(a)} rows differ")
        print("spark:", a[neq].head(3).to_dict("records"))
        print("duck :", b[neq].head(3).to_dict("records"))
        fail += 1
    else:
        print(f"OK {name}: {len(a)} rows")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
