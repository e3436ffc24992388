#!/usr/bin/env python3
"""Regenerate the BASELINE.md numbers table + class totals from
tools/baseline_duckdb.json (DuckDB medians) and a bench JSON (Spark
medians). Prints the markdown table to stdout; the prose sections of
BASELINE.md are maintained by hand.

Usage: python3 tools/gen_baseline_md.py /tmp/bench_r5.json
"""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_bench import CLS, load_bench

here = os.path.dirname(os.path.abspath(__file__))
duck = json.load(open(os.path.join(here, 'baseline_duckdb.json')))['duckdb_sec']
spark = load_bench(sys.argv[1])['queries']

missing = sorted(set(spark) ^ set(duck))
if missing:
    print(f"WARNING: asymmetric coverage: {missing}", file=sys.stderr)
failed = sorted(q for q, v in spark.items() if v < 0)
if failed:
    sys.exit(f"FAILED queries in bench json (sentinel -1.0) — not committing "
             f"a corrupted table: {failed}")

print('| query | class | spark s | duckdb s | spark/duckdb |')
print('|---|---|---|---|---|')
tot = {}
for q in sorted(set(spark) & set(duck)):
    c = CLS.get(q, '?')
    s, d = spark[q], duck[q]
    tot.setdefault(c, [0.0, 0.0])
    tot[c][0] += s
    tot[c][1] += d
    print(f'| {q} | {c} | {s:.3f} | {d:.3f} | {s / d:.2f} |')
for c in sorted(tot):
    s, d = tot[c]
    print(f'| **total {c}** |  | **{s:.2f}** | **{d:.2f}** | **{s / d:.2f}** |')
