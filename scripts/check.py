#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify.scala parquet dump against its DuckDB oracle (sort columns by
name, sort rows, compare cell-by-cell with small float tolerance).

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_oracle(con, sf_dir, sql):
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create or replace view {t} as select * from '{p}'")
    return con.execute(sql).df()

def dtype_class(dt):
    """Coarse class used for the driver-parity dtype check: int-vs-float is a
    real divergence ("123" vs "123.0" under the driver's string hashing);
    int32-vs-int64 is not (both format as "123")."""
    k = getattr(dt, "kind", None)
    if k in ("i", "u") or str(dt).startswith(("Int", "UInt")):
        return "int"
    if k == "f" or str(dt).startswith("Float"):
        return "float"
    if k == "b" or str(dt) == "boolean":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "object"

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    if not os.path.exists(f"{out_dir}/oracle_sql.json"):
        out_dir, sf_dir = sf_dir, out_dir  # accept either arg order
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(p) for p in sorted(pq)]))
            duck_df = canon(load_oracle(con, sf_dir, sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1; continue
        bad_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c].reset_index(drop=True), duck_df[c].reset_index(drop=True)
            # Driver parity: the driver hashes string-formatted cells, so an
            # int64 "123" vs float64 "123.0" is a hash mismatch even when the
            # values compare equal. Fail on dtype-class divergence.
            if dtype_class(a.dtype) != dtype_class(b.dtype):
                bad_cols.append(f"{c} [dtype spark={a.dtype} duck={b.dtype}]")
                continue
            try:
                pd.testing.assert_series_equal(a, b, check_dtype=False,
                                               check_exact=False, rtol=1e-9, atol=1e-9)
            except AssertionError:
                bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
