#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB against the testdata parquet, load the Spark result parquet
written by graft.Verify, and compare values (columns sorted by name,
rows sorted, exact equality). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        o = sorted(tuple(norm(v) for v in row) for row in odf[ocols].itertuples(index=False))
        s = sorted(tuple(norm(v) for v in row) for row in sdf[ocols].itertuples(index=False))
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
        elif o != s:
            diffs = [(a, b) for a, b in zip(o, s) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
