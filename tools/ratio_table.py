#!/usr/bin/env python3
"""Decade ratio table with cross-artifact min merge and (optionally)
input-normalized verdicts.

Usage:
    tools/ratio_table.py SF1_FILES SF10_FILES [--md] \
        [--datacheck SF1_DC,SF10_DC] [--map tools/gate_inputs.json]

Each side is a comma-separated list of Bench artifacts (full or
partial maps). Per query, the side's floor is the MIN over all clean
stored mins across the artifacts (a -1.0 sentinel = failed run, never
a floor), and the winning artifact + its git provenance ride along so
"best measured" stays distinguishable from "measured on current code".

With --datacheck (two graft.DataCheck JSON lines) and the gate->input
map, each row also shows the gate's measured INPUT ratio and the
work-normalized verdict norm = runtime_ratio / input_ratio^exponent
(exponent defaults to 1.0 = expected linear in the measure; ~1.0 means
the plan scales as designed, >1 super-linear in its own input) — the
round-11 meta-lesson (ScaleGen's decade is not uniformly 10x of any
one gate's work) as a column instead of prose.
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


def parse_args(argv):
    pos, opts, flags, i = [], {}, set(), 0
    while i < len(argv):
        if argv[i] == '--md':
            flags.add('md')
            i += 1
        elif argv[i].startswith('--'):
            opts[argv[i][2:]] = argv[i + 1]
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    return pos, opts, flags


def main():
    pos, opts, flags = parse_args(sys.argv[1:])
    md = 'md' in flags
    sf1 = load_side(pos[0].split(','))
    sf10 = load_side(pos[1].split(','))
    gmap, dc1, dc10 = {}, {}, {}
    if 'datacheck' in opts:
        p1, p10 = opts['datacheck'].split(',')
        with open(p1) as f:
            dc1 = json.load(f)
        with open(p10) as f:
            dc10 = json.load(f)
        with open(opts.get('map', 'tools/gate_inputs.json')) as f:
            gmap = json.load(f)
    rows = []
    for n in sorted(sf10):
        t10, at10, src10 = sf10[n]
        t1, at1, _ = sf1.get(n, (None, None, None))
        ratio = (t10 / t1) if t1 else float('nan')
        inr, norm, meas = None, None, None
        g = gmap.get(n)
        if g and dc1 and dc10:
            meas = g['measure']
            b, t = dc1.get(meas), dc10.get(meas)
            if b and t:
                inr = t / b
                norm = ratio / (inr ** g.get('exponent', 1.0))
        rows.append((n, t1, t10, ratio, at10, src10, meas, inr, norm))
    if md:
        print('| query | sf1 (s) | sf10 (s) | ratio | input | input ratio |'
              ' norm | sf10 at |')
        print('|---|---|---|---|---|---|---|---|')
        for n, t1, t10, r, at10, src10, meas, inr, norm in rows:
            t1s = f'{t1:.2f}' if t1 else '—'
            rs = f'{r:.1f}×' if r == r else '—'
            ins = f'{inr:.1f}×' if inr else '—'
            ns = f'{norm:.2f}' if norm else '—'
            print(f'| {n} | {t1s} | {t10:.2f} | {rs} | {meas or "—"} |'
                  f' {ins} | {ns} | {at10} |')
    else:
        for n, t1, t10, r, at10, src10, meas, inr, norm in rows:
            t1s = f'{t1:8.2f}' if t1 else '       —'
            extra = ''
            if inr:
                extra = f'  in={meas}:{inr:7.1f}x  norm={norm:5.2f}'
            print(f'{n:32s} sf1={t1s}  sf10={t10:9.2f}  '
                  f'ratio={r:6.1f}x{extra}  at={at10} ({src10})')


if __name__ == '__main__':
    main()
