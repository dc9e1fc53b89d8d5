#!/usr/bin/env python3
"""Assemble the canonical BENCH_SF10.json from this round's clean runs.

Usage: tools/assemble_sf10.py RUN_FILES_CSV OUT [HEAD]

Per query: min over the clean (>0) stored mins across the run files,
with the winning run's git provenance. `first` keeps the winning run's
first. Failed sentinels (-1.0) survive ONLY if a query never succeeded
in any run. Headline total = sum of non-cache mins (failures excluded,
counted in "failed"), matching Bench's own accounting.
"""
import json, sys


def main():
    paths = sys.argv[1].split(',')
    out = sys.argv[2]
    best = {}
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        for name, v in doc.get('queries', {}).items():
            m = v['min'] if isinstance(v, dict) else v
            first = v.get('first', m) if isinstance(v, dict) else v
            at = v.get('at', '?') if isinstance(v, dict) else '?'
            if m is None or m <= 0:
                if name not in best:
                    best[name] = {'first': -1.0, 'min': -1.0, 'at': at}
                continue
            cur = best.get(name)
            if cur is None or cur['min'] <= 0 or m < cur['min']:
                best[name] = {'first': first, 'min': m, 'at': at}
    gate = {k: v for k, v in best.items() if not k.startswith('cache:')}
    measured = [v['min'] for v in gate.values() if v['min'] > 0]
    doc = {
        'metric': 'total', 'value': round(sum(measured), 3), 'unit': 'sec',
        'failed': sum(1 for v in gate.values() if v['min'] <= 0),
        'queries': dict(sorted(best.items())),
        'sf': '/tmp/sf10', 'passes': 1, 'partial': True,
        'head': sys.argv[3] if len(sys.argv) > 3 else '?',
        'note': 'min over fresh-session clean runs; per-entry at = git HEAD of the winning run',
    }
    with open(out, 'w') as f:
        json.dump(doc, f, indent=1)
        f.write('\n')
    for k, v in sorted(best.items()):
        print(f"{k:32s} min={v['min']:9.2f} at={v['at']}")


if __name__ == '__main__':
    main()
