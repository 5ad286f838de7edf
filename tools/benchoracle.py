#!/usr/bin/env python3
"""Time the DuckDB oracle queries at a given sf directory (driver-side
harness tooling) — the baseline side of the scaling measurement.

Usage: python3 tools/benchoracle.py <sfDir> <oracleSqlJson> [runs] [timeoutSec]

Prints one JSON line: {"sf": ..., "queries": {name: minSeconds}, "total": ...,
"failed": {name: reason}}.
DuckDB runs with its defaults (all cores) — the strongest baseline this
box can produce; min-of-N to match graft.Bench's min-of-two convention.

Failure tolerance (sf3+): a query that OOMs (q108's set-similarity join
dies at 93 GiB at sf3) or exceeds the per-query timeout is recorded in
`failed` with its elapsed-at-kill, excluded from `total`, and the sweep
continues — one pathological oracle must not sink the whole baseline.
Each query runs in a SUBPROCESS so an OOM kill can't take the sweep down.
"""
import json
import os
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = r"""
import json, sys, time
import duckdb
# SQL arrives via a file: the q173-class oracles (one graph chain per
# HNSW layer) overflow the kernel argv limit as a literal argument
sf_dir, sql_path, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
sql = open(sql_path).read()
con = duckdb.connect()
for t in %s:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
best = None
for _ in range(runs):
    t0 = time.perf_counter()
    con.sql(sql).fetchall()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps(best))
""" % repr(TABLES)


def main(sf_dir, oracle_json, runs=2, timeout=900):
    import tempfile
    oracle = json.load(open(oracle_json))
    out, failed = {}, {}
    for name in sorted(oracle):
        t0 = time.perf_counter()
        with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
            f.write(oracle[name]); sql_path = f.name
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, sf_dir, sql_path, str(runs)],
                capture_output=True, text=True, timeout=timeout)
            if r.returncode == 0:
                out[name] = round(json.loads(r.stdout.strip().splitlines()[-1]), 4)
            else:
                tail = (r.stderr or "").strip().splitlines()[-1:]
                failed[name] = f"rc={r.returncode} after " \
                    f"{round(time.perf_counter()-t0,1)}s: {' '.join(tail)[:200]}"
        except subprocess.TimeoutExpired:
            failed[name] = f"timeout>{timeout}s"
        finally:
            try:
                os.unlink(sql_path)  # delete=False + no cleanup leaked one
            except OSError:         # temp file per query per sweep
                pass
        print(f"  {name}: {out.get(name, failed.get(name))}", file=sys.stderr)
    print(json.dumps({"sf": sf_dir, "queries": out,
                      "total": round(sum(out.values()), 3),
                      "failed": failed}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 2,
         int(sys.argv[4]) if len(sys.argv) > 4 else 900)
