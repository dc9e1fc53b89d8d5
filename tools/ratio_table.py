#!/usr/bin/env python3
"""Decade ratio table with cross-artifact min merge.

Usage:
    tools/ratio_table.py SF1_FILES SF10_FILES [--md]

Each side is a comma-separated list of Bench artifacts (full or
partial maps). Per query, the side's floor is the MIN over all clean
stored mins across the artifacts (a -1.0 sentinel = failed run, never
a floor), and the winning artifact + its git provenance ride along so
"best measured" stays distinguishable from "measured on current code".
This is the consolidation the r10 verdict asked for: a better number
recorded in an earlier round's artifact (e.g. q_a31's 34 s in
BENCH_SF10.json r9) must survive a later partial merge that never
re-ran it.
"""
import json, os, sys


def load_side(paths):
    best = {}  # name -> (min, at, src)
    for path in paths:
        with open(path) as f:
            doc = json.load(f)
        src = os.path.basename(path)
        for name, v in doc.get('queries', {}).items():
            m = v['min'] if isinstance(v, dict) else v
            at = v.get('at', '?') if isinstance(v, dict) else '?'
            if m is None or m <= 0:
                continue  # -1.0 = failed run; zero/neg = malformed
            if name not in best or m < best[name][0]:
                best[name] = (m, at, src)
    return best


def main():
    args = [a for a in sys.argv[1:] if a != '--md']
    md = '--md' in sys.argv
    sf1 = load_side(args[0].split(','))
    sf10 = load_side(args[1].split(','))
    rows = []
    for n in sorted(sf10):
        t10, at10, src10 = sf10[n]
        t1, at1, _ = sf1.get(n, (None, None, None))
        ratio = (t10 / t1) if t1 else float('nan')
        rows.append((n, t1, t10, ratio, at1, at10, src10))
    if md:
        print('| query | sf1 (s) | sf10 (s) | ratio | sf10 at | sf10 source |')
        print('|---|---|---|---|---|---|')
        for n, t1, t10, r, at1, at10, src10 in rows:
            t1s = f'{t1:.2f}' if t1 else '—'
            rs = f'{r:.1f}×' if r == r else '—'
            print(f'| {n} | {t1s} | {t10:.2f} | {rs} | {at10} | {src10} |')
    else:
        for n, t1, t10, r, at1, at10, src10 in rows:
            t1s = f'{t1:8.2f}' if t1 else '       —'
            print(f'{n:32s} sf1={t1s}  sf10={t10:9.2f}  '
                  f'ratio={r:6.1f}x  at={at10} ({src10})')


if __name__ == '__main__':
    main()
