#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library has no Python dependency).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered under their bare names, and compares
against the Spark parquet output in <verifyOutDir>/<name>/ after
sorting columns by name and rows by all columns.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0  # normalize -0.0
            vals.append((str(type(v).__name__) if v is not None else "none",
                         str(v)))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            ocur = con.sql(sql)
            ocols, orows = [c.lower() for c in ocur.columns], ocur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scur = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols, srows = [c.lower() for c in scur.columns], scur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ  oracle={oc}  spark={sc}")
            n_fail += 1
            continue
        if orr != srr:
            diffs = [(a, b) for a, b in zip(orr, srr) if a != b]
            print(f"FAIL {name}: {len(orr)} vs {len(srr)} rows, "
                  f"{len(diffs)} mismatched (first: "
                  f"{diffs[0] if diffs else (orr[len(srr):] or srr[len(orr):])[:1]})")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(orr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
