#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <outDir> <sfDir>

Reads <outDir>/oracle_sql.json, runs each SQL in DuckDB with views over
<sfDir>/*.parquet, loads the Spark result from <outDir>/<name>/, sorts
columns by name and rows by all columns, and compares values exactly
(reporting max abs diff for float columns when they mismatch).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sqls = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
            duck_types = dict(
                (r[0], r[1]) for r in con.execute("DESCRIBE " + sql).fetchall()
            )
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(duck_df)
        # Oracle output convention: numeric columns must stay inside the
        # pandas int/float families the driver compare hashes. Standard
        # int widths (TINYINT..BIGINT) and FLOAT/DOUBLE are fine; HUGEINT /
        # unsigned types leave the family (q23's uncast SUM came back as
        # HUGEINT and hash-mismatched despite equal values) and must FAIL.
        # DECIMAL coerces to float64 — allowed but warned, since it can
        # silently round differently from the Spark double.
        bad_types = {
            c: t for c, t in duck_types.items()
            if t in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                     "USMALLINT", "UTINYINT")
        }
        if bad_types:
            print(f"FAIL {name}: oracle column types outside int64/float64 families: {bad_types}")
            n_fail += 1
            continue
        for c, t in duck_types.items():
            if t.startswith("DECIMAL"):
                print(f"WARN {name}: col {c} is {t} in the oracle (coerces to float64); prefer an explicit CAST AS DOUBLE")
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(o)}")
            n_fail += 1
            continue
        ok = True
        for c in s.columns:
            sv, ov = s[c], o[c]
            if (sv.dtype.kind in "if" or ov.dtype.kind in "if") \
                    and sv.dtype.kind != ov.dtype.kind:
                print(f"FAIL {name}: col {c} dtype family spark={sv.dtype} duck={ov.dtype}")
                ok = False
                continue
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                a = sv.to_numpy(dtype=float)
                b = ov.to_numpy(dtype=float)
                both_nan = np.isnan(a) & np.isnan(b)
                eq = (a == b) | both_nan
                if not eq.all():
                    print(f"FAIL {name}: col {c} max|diff|={np.nanmax(np.abs(a - b))} ({int((~eq).sum())}/{len(a)} rows)")
                    ok = False
            else:
                if not sv.astype(str).equals(ov.astype(str)):
                    bad = (sv.astype(str) != ov.astype(str))
                    i = int(np.argmax(bad.to_numpy()))
                    print(f"FAIL {name}: col {c} differs, first at row {i}: spark={sv.iloc[i]!r} duck={ov.iloc[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
