#!/usr/bin/env python3
"""Emit the sf10/sf1 ratio table from two Bench maps (min floors)."""
import json, sys
sf10 = json.load(open(sys.argv[1]))['queries']
sf1 = json.load(open(sys.argv[2]))['queries']
def m(v): return v['min'] if isinstance(v, dict) else v
rows = []
for n in sorted(sf10):
    t10 = m(sf10[n]); t1 = m(sf1.get(n, {'min': -1}))
    ratio = (t10 / t1) if t1 and t1 > 0 and t10 > 0 else float('nan')
    rows.append((n, t1, t10, ratio))
for n, t1, t10, r in rows:
    print(f"{n:32s} sf1={t1:8.2f}  sf10={t10:9.2f}  ratio={r:6.1f}x")
