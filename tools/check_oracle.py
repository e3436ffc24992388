#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, compare row-count / schema / value-hash
against the Verify parquet dumps. The driver's hash is dtype-sensitive
(DuckDB HUGEINT -> pandas float64 broke q_sessionize for two rounds
while a dtype-insensitive compare passed), so this replica fails on
int-vs-float kind mismatches too.

Usage:
  python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
  python3 tools/check_oracle.py --time 5 /root/testdata/sf0.1   # DuckDB-only timing mode
"""
import sys, os, json, glob, time, statistics
import duckdb
import pandas as pd


def connect(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def norm(df):
    df = df[sorted(df.columns)]
    # canonical row order: sort by all columns
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def kind(dtype):
    """Collapse dtypes to comparison kinds: the driver's value hash sees
    1.0 (float) != 1 (int) but is indifferent to int32 vs int64."""
    k = dtype.kind  # i/u -> int, f -> float, O/b/M -> themselves
    return {"u": "i"}.get(k, k)


def time_oracles(n, sf_dir, oracle_json):
    """Per-query DuckDB wall times (median of n runs), for BASELINE.md."""
    oracles = json.load(open(oracle_json))
    con = connect(sf_dir)
    out = {}
    for name in sorted(oracles):
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 4)
        print(f"{name}: {out[name]:.3f}s  (runs: {', '.join(f'{r:.3f}' for r in runs)})", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "n_runs": n, "duckdb_sec": out,
                      "total_sec": round(sum(out.values()), 3)}))
    return out


def main():
    if sys.argv[1] == "--time":
        n, sf_dir = int(sys.argv[2]), sys.argv[3]
        oracle_json = sys.argv[4] if len(sys.argv) > 4 else "/tmp/verify_out/oracle_sql.json"
        time_oracles(n, sf_dir, oracle_json)
        return

    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = connect(sf_dir)

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
        ok_kinds = ok_schema and all(kind(g[c].dtype) == kind(w[c].dtype) for c in g.columns)
        ok_vals, err = False, []
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                err = str(e).split("\n")[:6]
        ok = ok_schema and ok_rows and ok_vals and ok_kinds
        if not ok:
            fails += 1
            print(f"[FAIL] {name}: rows {len(g)}/{len(w)} schema_ok={ok_schema} kinds_ok={ok_kinds}")
            if not ok_kinds and ok_schema:
                diffs = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                         if kind(g[c].dtype) != kind(w[c].dtype)]
                print(f"   dtype-kind mismatches (spark vs duckdb): {diffs}")
            if not ok_schema:
                print(f"   cols got={list(g.columns)} want={list(w.columns)}")
            if err:
                print("   " + " | ".join(err))
        else:
            print(f"[OK] {name}: {len(g)} rows")
    sys.exit(1 if fails else 0)


main()
