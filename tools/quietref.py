#!/usr/bin/env python3
"""Regenerate bench_history/QUIET_REF.json — the per-query quiet-host
records that Bench's `suspect` flags compare against.

Takes the per-query MIN across every calib-quiet committed record in
bench_history/ (records without a calib block are skipped: pre-r8
methodology). Run after committing a new quiet bench record so the
reference ratchets alongside bench_history.

Usage: python3 tools/quietref.py  (from the repo root)
"""
import json, glob, sys

ref = {}
sources = []
for f in sorted(glob.glob('bench_history/BENCH_LOCAL_*.json')):
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

out = {'_source': 'min across calib-quiet bench_history records: ' + ', '.join(sources),
       'queries': {k: round(v, 4) for k, v in sorted(ref.items())}}
json.dump(out, open('bench_history/QUIET_REF.json', 'w'), indent=1)
print(f'wrote bench_history/QUIET_REF.json ({len(ref)} queries from {len(sources)} records)')
