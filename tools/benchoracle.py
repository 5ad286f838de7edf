#!/usr/bin/env python3
"""Time the DuckDB oracle queries at a given sf directory (driver-side
harness tooling) — the baseline side of the scaling measurement.

Usage: python3 tools/benchoracle.py <sfDir> <oracleSqlJson> [runs]

Prints one JSON line: {"sf": ..., "queries": {name: minSeconds}, "total": ...}.
DuckDB runs with its defaults (all cores) — the strongest baseline this
box can produce; min-of-N to match graft.Bench's min-of-two convention.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, runs=2):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    out = {}
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    print(json.dumps({"sf": sf_dir, "queries": out,
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
