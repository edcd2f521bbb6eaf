#!/usr/bin/env python3
"""Time the engine's own oracle-SQL suite in DuckDB over the same
parquet — the like-for-like half of the BASELINE.md comparison row.

Usage: python3 tools/duckbench.py [sfDir] [oracleJson] [outJson]
Defaults: /root/testdata/sf0.1, /tmp/graft_verify/oracle_sql.json,
DUCKBENCH.json. Each query runs twice (warm file cache); the min is
recorded, matching the Spark bench's min-of-iters methodology.
"""
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
    times, rows = {}, {}
    for name in sorted(oracles):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            res = con.execute(oracles[name]).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        rows[name] = len(res)
        print(f"[duckbench] {name:32s} {best:7.3f} s  rows={len(res)}", file=sys.stderr)
    total = round(sum(times.values()), 3)
    out = {"metric": "duckdb_oracle_suite", "value": total, "unit": "sec",
           "sf": sf_dir, "iters": 2, "queries": times, "rows": rows}
    out_json.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"metric": "duckdb_oracle_suite", "value": total,
                      "unit": "sec", "n_queries": len(times)}))


if __name__ == "__main__":
    main()
