#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, compare row-count / schema / value-hash
against the Verify parquet dumps. Usage:
  python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def norm(df):
    df = df[sorted(df.columns)]
    # canonical row order: sort by all columns
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracles:
        print(f"[rows-only] {name}: {len(got)} rows")
        continue
    want = con.execute(oracles[name]).fetchdf()
    g, w = norm(got), norm(want)
    ok_schema = list(g.columns) == list(w.columns)
    ok_rows = len(g) == len(w)
    ok_vals = False
    if ok_schema and ok_rows:
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            ok_vals = False
            err = str(e).split("\n")[:6]
    status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"[{status}] {name}: rows {len(g)}/{len(w)} schema_ok={ok_schema} cols got={list(g.columns)} want={list(w.columns)}")
        if ok_schema and ok_rows:
            print("   " + " | ".join(err))
    else:
        print(f"[OK] {name}: {len(g)} rows")
sys.exit(1 if fails else 0)
