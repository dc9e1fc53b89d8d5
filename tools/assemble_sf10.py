#!/usr/bin/env python3
"""Assemble a canonical decade artifact (BENCH_SF10.json / BENCH_SF100.json)
from this round's clean runs.

Usage: tools/assemble_sf10.py RUN_FILES_CSV OUT \
           [--datacheck BASE_DC,THIS_DC --map tools/gate_inputs.json] \
           [--regime LABEL]

Per query: min over the clean (>0) stored mins across the run files,
with the winning run's git provenance. `first` keeps the winning run's
first. Failed sentinels (-1.0) survive ONLY if a query never succeeded
in any run. Headline total = sum of non-cache mins (failures excluded,
counted in "failed"), matching Bench's own accounting.

Provenance is self-describing (round-11 advice): `sf` is derived from
the input run files (they must agree), `partial` is the OR of the
inputs', and the top-level `heads` lists every contributing per-entry
git HEAD — there is no single top-level `head` to misread as uniform.

With --datacheck (two graft.DataCheck JSON lines: the base scale's and
this scale's) and --map (tools/gate_inputs.json), every query row
additionally carries its measured input driver: `input_measure`,
`input_ratio` (this/base), and the optional designed `exponent` — the
round-11 meta-lesson (ScaleGen's decade is not uniformly 10x) made a
column instead of prose. --regime labels the generator regime the runs
were measured under (e.g. constant-density vs fixed-vocab).
"""
import json, sys


def parse_args(argv):
    pos, opts, i = [], {}, 0
    while i < len(argv):
        if argv[i].startswith('--'):
            opts[argv[i][2:]] = argv[i + 1]
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    return pos, opts


def main():
    pos, opts = parse_args(sys.argv[1:])
    paths = pos[0].split(',')
    out = pos[1]
    best, sfs, partials = {}, set(), set()
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        sfs.add(doc.get('sf', '?'))
        partials.add(bool(doc.get('partial', False)))
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
    if len(sfs) != 1:
        sys.exit(f'input run files disagree on sf: {sorted(sfs)}')

    if 'datacheck' in opts:
        base_p, this_p = opts['datacheck'].split(',')
        with open(base_p) as f:
            base_dc = json.load(f)
        with open(this_p) as f:
            this_dc = json.load(f)
        with open(opts.get('map', 'tools/gate_inputs.json')) as f:
            gmap = json.load(f)
        for name, row in best.items():
            g = gmap.get(name)
            if not g:
                continue
            meas = g['measure']
            b, t = base_dc.get(meas), this_dc.get(meas)
            row['input_measure'] = meas
            if b and t:
                row['input_ratio'] = round(t / b, 2)
            if 'exponent' in g:
                row['exponent'] = g['exponent']
    if 'regime' in opts:
        for row in best.values():
            row['regime'] = opts['regime']

    gate = {k: v for k, v in best.items() if not k.startswith('cache:')}
    measured = [v['min'] for v in gate.values() if v['min'] > 0]
    doc = {
        'metric': 'total', 'value': round(sum(measured), 3), 'unit': 'sec',
        'failed': sum(1 for v in gate.values() if v['min'] <= 0),
        'queries': dict(sorted(best.items())),
        'sf': sfs.pop(), 'passes': 1, 'partial': any(partials),
        'heads': sorted({v['at'] for v in best.values()}),
        'regime': opts.get('regime', 'unspecified'),
        'note': 'min over fresh-session clean runs; per-entry at = git HEAD'
                ' of the winning run; input_ratio = this-scale/base-scale of'
                ' input_measure per tools/gate_inputs.json',
    }
    with open(out, 'w') as f:
        json.dump(doc, f, indent=1)
        f.write('\n')
    for k, v in sorted(best.items()):
        extra = ''
        if 'input_ratio' in v:
            extra = f" in={v['input_measure']}x{v['input_ratio']}"
        print(f"{k:32s} min={v['min']:9.2f} at={v['at']}{extra}")


if __name__ == '__main__':
    main()
