#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate: run each
oracle SQL in DuckDB over the sf tables, compare (sorted columns, sorted
rows) against the Spark result parquet written by graft.Verify.

REPRESENTATION-FAITHFUL (round 14, VERDICT r13 #2): the driver hashes
emitted representations, not values — IEEE `-0.0` vs `+0.0` (and any
NaN-payload divergence) hash-differ while every numeric comparator calls
them equal. Two rounds of local-green/driver-red (q139/q144) shipped
through exactly that blind spot. Float64 columns are therefore compared
as BIT PATTERNS (numpy `.view('u8')`, NaNs canonicalized to one quiet
pattern), and any sign-bit-set zero on either side is flagged loudly
even when both sides agree — a `round()` of a tiny-negative expression
can reproduce the class at any new fixture/SF.

Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
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

CANON_NAN = np.uint64(0x7FF8000000000000)
NEG_ZERO = np.uint64(0x8000000000000000)

def bits(s: pd.Series) -> np.ndarray:
    """Float64 column as uint64 bit patterns, NaNs canonicalized.
    Non-float input (e.g. Int64 when one engine materialized ints where
    the other made doubles) is coerced through float64 first so a
    mixed-dtype column pair still compares at bit fidelity."""
    a = s.astype("float64").to_numpy(dtype="f8")
    b = a.view("u8").copy()
    b[np.isnan(a)] = CANON_NAN
    return b

def is_float(s: pd.Series) -> bool:
    return "float" in str(s.dtype)

def negzero_cells(df: pd.DataFrame):
    out = []
    for c in df.columns:
        if is_float(df[c]):
            for idx in np.nonzero(bits(df[c]) == NEG_ZERO)[0]:
                out.append((int(idx), c))
    return out

fails = []
warns = 0
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
    # Cell compare: float64 as bit patterns, everything else by value.
    # If EITHER side is float the pair is compared as bits — a silent
    # fallback to value equality on an int64-vs-float64 pair would
    # reopen the representation blind spot (ADVICE r14).
    mismatch = []
    for c in expected.columns:
        try:
            if is_float(expected[c]) or is_float(got[c]):
                # NULL-mask compare first (ADVICE r15): a nullable-Int64 NA
                # coerces to NaN in bits(), canonicalizing equal to a true
                # float NaN — the mask catches the NA-vs-value half; the
                # NA-vs-NaN half is indistinguishable once pandas maps
                # parquet/duckdb float NULLs to NaN, accepted residual.
                neq = (expected[c].isna().to_numpy() != got[c].isna().to_numpy()) \
                    | (bits(expected[c]) != bits(got[c]))
                mismatch += [(int(i), c) for i in np.nonzero(neq)[0]]
            else:
                e, g = expected[c], got[c]
                neq = ~((e == g) | (e.isna() & g.isna()))
                mismatch += [(int(i), c) for i in neq[neq].index]
        except (ValueError, TypeError) as exc:
            # Incomparable dtype pair (e.g. float vs string): a mismatch
            # for this query, not a checker crash (ADVICE r15).
            print(f"  {name}.{c}: incomparable dtypes "
                  f"({expected[c].dtype} vs {got[c].dtype}): {exc}")
            mismatch += [(i, c) for i in range(len(expected))]
    if mismatch:
        rows = len({r for r, _ in mismatch})
        print(f"FAIL {name}: {rows} mismatched rows; (row, col, oracle, spark [bytes]):")
        for r, c in mismatch[:10]:
            ev, gv = expected.at[r, c], got.at[r, c]
            hexes = ""
            if is_float(expected[c]) or is_float(got[c]):
                # an incomparable pair (e.g. float vs string) reaches here
                # too — bits() would re-raise the very error the compare
                # loop contained, so the report must not crash (ADVICE r16)
                try:
                    hexes = (f"  [oracle 0x{int(bits(expected[c])[r]):016x}"
                             f" spark 0x{int(bits(got[c])[r]):016x}]")
                except (ValueError, TypeError):
                    hexes = "  [bits unavailable: incomparable dtypes]"
            print(f"  row {r} col {c}: oracle={ev!r} spark={gv!r}{hexes}")
        fails.append(name)
        continue
    # Signed-zero scan: even when both sides agree, -0.0 in any output is
    # one engine quirk away from a driver-red — surface it.
    nz = negzero_cells(expected) + negzero_cells(got)
    if nz:
        warns += 1
        print(f"WARN {name}: {len(nz)} signed-zero cell(s), e.g. {nz[:3]} — "
              f"normalize the display (round(...) + 0)")
    print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass"
      + (f", {warns} signed-zero warning(s)" if warns else ""))
sys.exit(1 if fails else 0)
