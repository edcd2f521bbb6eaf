#!/usr/bin/env python3
"""Time the engine's own oracle-SQL suite in DuckDB over the same
parquet — the like-for-like half of the BASELINE.md comparison row.

Usage: python3 tools/duckbench.py [sfDir] [oracleJson] [outJson]
Defaults: /root/testdata/sf0.1, /tmp/graft_verify/oracle_sql.json,
DUCKBENCH.json. Each query runs twice (warm file cache); the min is
recorded, matching the Spark bench's min-of-iters methodology — unless
the FIRST run exceeds DUCKBENCH_ITER_CAP_S (default 60), in which case
that single measurement stands (query_iters records 1 for it). NOTE
the capped number is a COLD single run — unlike the Spark bench's
"single" mode, which discards a warm-up first — so it can OVER-state
DuckDB's time by the warm-up delta; for the compute-bound queries the
cap targets (hundreds of seconds of list arithmetic, IO-light) that
delta is noise, and the direction is recorded here so nobody reads a
capped entry as like-for-like-precise. Queries named in DUCKBENCH_SKIP
(comma-separated) are recorded as null — used at sf1 where dd12's
brute-force all-pairs restatement is O(n^2)·list_intersect and would
run for hours (the Spark side runs the prefix-filter join; the
asymmetry IS the finding, documented in BASELINE.md).
"""
import os
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_json = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json")
    out_json = Path(sys.argv[3] if len(sys.argv) > 3 else "DUCKBENCH.json")
    oracles = json.loads(oracle_json.read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    iter_cap = float(os.environ.get("DUCKBENCH_ITER_CAP_S", "60"))
    skip = {q for q in os.environ.get("DUCKBENCH_SKIP", "").split(",") if q}
    times, rows, iters = {}, {}, {}
    skipped = sorted(skip & set(oracles))
    for name in sorted(oracles):
        if name in skip:
            times[name] = None  # null in the artifact: present, unmeasured
            print(f"[duckbench] {name:32s} SKIPPED (DUCKBENCH_SKIP)", file=sys.stderr)
            continue
        t0 = time.monotonic()
        res = con.execute(oracles[name]).fetchall()
        best = time.monotonic() - t0
        n_iters = 1
        if best <= iter_cap:
            t0 = time.monotonic()
            res = con.execute(oracles[name]).fetchall()
            best = min(best, time.monotonic() - t0)
            n_iters = 2
        times[name] = round(best, 3)
        rows[name] = len(res)
        iters[name] = n_iters
        print(f"[duckbench] {name:32s} {best:7.3f} s  rows={len(res)}  iters={n_iters}", file=sys.stderr)
    total = round(sum(t for t in times.values() if t is not None), 3)
    out = {"metric": "duckdb_oracle_suite", "value": total, "unit": "sec",
           "sf": sf_dir, "iters": "min-of-2; 1 (cold) past iter_cap_s",
           "iter_cap_s": iter_cap, "query_iters": iters, "skipped": skipped,
           "queries": times, "rows": rows}
    out_json.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"metric": "duckdb_oracle_suite", "value": total,
                      "unit": "sec", "n_queries": len(times)}))


if __name__ == "__main__":
    main()
