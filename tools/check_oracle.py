#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate: run each
oracle SQL in DuckDB over the sf tables, compare (sorted columns, sorted
rows, rounded floats) against the Spark result parquet written by
graft.Verify. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Floats are compared EXACTLY (no rounding): the driver hashes the
    # emitted doubles at full precision, and the engines already
    # display-round — a laxer local canon (this file used round(4) until
    # round 12) let three 6th-decimal divergences ship as local-green /
    # driver-red (VERDICT r12 "What's wrong" #2).
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype(float)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    try:
        expected = canon(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails.append(name)
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result")
        fails.append(name)
        continue
    got = canon(pd.concat([pd.read_parquet(f) for f in files]))
    if list(expected.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(expected.columns)}")
        fails.append(name)
        continue
    if len(expected) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(expected)}")
        fails.append(name)
        continue
    if not expected.equals(got):
        diff = (expected != got) & ~(expected.isna() & got.isna())
        bad = diff.any(axis=1)
        print(f"FAIL {name}: {bad.sum()} mismatched rows; (row, col, oracle, spark):")
        shown = 0
        for idx in bad[bad].index:
            for c in expected.columns:
                if diff.at[idx, c]:
                    print(f"  row {idx} col {c}: oracle={expected.at[idx, c]!r} "
                          f"spark={got.at[idx, c]!r}")
                    shown += 1
            if shown >= 10:
                break
        fails.append(name)
        continue
    print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
