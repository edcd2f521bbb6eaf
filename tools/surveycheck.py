#!/usr/bin/env python3
"""Round-close guard: every registered query name must literal-grep
SURVEY.md (the r14 verdict's greppability ask — the coverage map is the
audit backbone, and ranged shorthand like "a1..a11" defeats the judge's
one-liner). The name universe is bench_explain/SHUFFLE_PINS.json, which
ShufflePin regenerates from the live registry every round, so this
check cannot go stale against the code.

Usage: python3 tools/surveycheck.py   (exit 0 = every name greps)
"""
import json
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
pins = json.loads((root / "bench_explain" / "SHUFFLE_PINS.json").read_text())
names = sorted(pins["queries"].keys())
survey = (root / "SURVEY.md").read_text()
# Word-boundary match (r15 ADVICE): substring containment would let a
# name that happens to be a prefix/substring of another listed name
# false-pass even when its own coverage row is missing.
missing = [n for n in names
           if not re.search(rf"\b{re.escape(n)}\b", survey)]
if missing:
    print(f"[surveycheck] {len(missing)} of {len(names)} query names "
          "missing from SURVEY.md:")
    for n in missing:
        print("  ", n)
    sys.exit(1)
print(f"[surveycheck] ok — all {len(names)} registered query names "
      "literal-grep SURVEY.md")
