#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), row counts, and values (rows sorted, exact
match; tiny float tolerance report for diagnostics).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # decimal.Decimal objects -> float for uniform compare
        if df[c].dtype == object and len(df) and type(df[c].iloc[0]).__name__ == "Decimal":
            df[c] = df[c].astype(float)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    produced = {os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)}
    for name in sorted(produced | set(oracle)):
        if name not in produced:
            print(f"FAIL {name}: oracle SQL declared but no spark output")
            n_fail += 1
            continue
        spark_df = pd.read_parquet(f"{outdir}/{name}")
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "EMPTY!"
            print(f"{status} {name}: {len(spark_df)} rows (no oracle)")
            n_fail += (0 if len(spark_df) > 0 else 1)
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        diffs = []
        for c in s.columns:
            a, b = s[c].values, d[c].values
            if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(d[c]):
                a = a.astype(float); b = b.astype(float)
                neq = ~(np.isclose(a, b, rtol=0, atol=0, equal_nan=True))
                exact_neq = neq.sum()
                close_neq = (~np.isclose(a, b, rtol=1e-12, atol=1e-12, equal_nan=True)).sum()
                if exact_neq:
                    diffs.append(f"{c}: {exact_neq} bit-diffs ({close_neq} beyond 1e-12)")
            else:
                av = pd.Series(a).astype(str).values
                bv = pd.Series(b).astype(str).values
                neq = (av != bv).sum()
                if neq:
                    i = int(np.argmax(av != bv))
                    diffs.append(f"{c}: {neq} diffs, first at row {i}: spark={av[i]!r} duck={bv[i]!r}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s)} rows x {len(s.columns)} cols")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
