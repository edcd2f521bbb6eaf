#!/usr/bin/env python3
"""Regenerate bench_history/QUIET_REF.json — the per-query quiet-host
records that Bench's `suspect` flags compare against.

Takes the per-query MIN across calib-quiet committed records in
bench_history/ from the most recent THREE round prefixes only
(records without a calib block are skipped: pre-r8 methodology).
The window exists because a ratchet-forever min outlives deliberate
algorithm changes: dd6's r10-era block-cross join measured 0.95 s at
sf0.1 before the r11 prefix-filter rewire traded that for the sf1
237→6 s win — its 2.4-3.7 s post-rewire steady state was then flagged
"suspect" by the stale floor every round (the r12 verdict burned a
finding adjudicating it). Three rounds keeps the reference honest
across one algorithm generation while still ratcheting within it.

Run after committing a new quiet bench record so the reference
ratchets alongside bench_history.

Usage: python3 tools/quietref.py  (from the repo root)
"""
import json, glob, re, sys

files = sorted(glob.glob('bench_history/BENCH_LOCAL_*.json'))
rounds = sorted({int(m.group(1)) for f in files
                 if (m := re.search(r'BENCH_LOCAL_r(\d+)', f))})
keep = set(rounds[-3:])

ref = {}
sources = []
for f in files:
    m = re.search(r'BENCH_LOCAL_r(\d+)', f)
    if not m or int(m.group(1)) not in keep:
        continue
    d = json.load(open(f))
    c = d.get('calib')
    if c is None or c.get('class') != 'quiet':
        continue
    sources.append(f)
    for k, v in d.get('queries', {}).items():
        if isinstance(v, (int, float)) and v < 900:  # 1000 = error sentinel
            ref[k] = min(ref.get(k, 1e9), v)

if not ref:
    sys.exit('no calib-quiet records found under bench_history/')

out = {'_source': 'min across calib-quiet bench_history records (last 3 rounds): ' + ', '.join(sources),
       'queries': {k: round(v, 4) for k, v in sorted(ref.items())}}
json.dump(out, open('bench_history/QUIET_REF.json', 'w'), indent=1)
print(f'wrote bench_history/QUIET_REF.json ({len(ref)} queries from {len(sources)} records)')
