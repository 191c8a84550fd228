#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's dumped
parquet against the DuckDB oracle SQL on the same tables and compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load(sfdir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def norm(df):
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af = pd.to_numeric(a[c]).astype(float).values
            bf = pd.to_numeric(b[c]).astype(float).values
            exact = np.array_equal(af, bf, equal_nan=True)
            if not exact:
                close = np.allclose(af, bf, rtol=0, atol=1e-9, equal_nan=True)
                bad = np.where(~np.isclose(af, bf, rtol=0, atol=1e-9, equal_nan=True))[0][:3]
                tag = "FLOAT-NEAR" if close else "VALUES"
                return f"{tag} col={c} e.g. idx={bad.tolist() if len(bad) else 'rounding'} " + \
                    (f"spark={af[bad[0]]} oracle={bf[bad[0]]}" if len(bad) else "")
        else:
            if not (pd.Series(av).astype(object).where(pd.notna(av), None).tolist() ==
                    pd.Series(bv).astype(object).where(pd.notna(bv), None).tolist()):
                mism = [i for i in range(len(av)) if (av[i] != bv[i]) and not (pd.isna(av[i]) and pd.isna(bv[i]))][:3]
                return f"VALUES col={c} idx={mism} spark={[av[i] for i in mism]} oracle={[bv[i] for i in mism]}"
        # dtype check (loose: int64 vs int32 counts as mismatch -> driver may too)
        if a[c].dtype != b[c].dtype:
            print(f"  [warn] {name}.{c}: dtype spark={a[c].dtype} oracle={b[c].dtype}")
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = load(sfdir)
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok = fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output parquet")
            fail += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            fail += 1
            continue
        spark_df = duckdb.sql(f"SELECT * FROM read_parquet({pq!r})").df()
        diff = compare(name, spark_df, oracle_df)
        if diff:
            print(f"FAIL {name}: {diff}")
            fail += 1
        else:
            print(f"OK   {name} rows={len(oracle_df)}")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

main()
