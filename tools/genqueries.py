#!/usr/bin/env python3
"""Regenerate QUERIES.md from a Verify dump and a Bench JSON line.

Usage: python3 tools/genqueries.py <verifyOutDir> <benchJsonFile> <roundLabel>
"""
import glob
import json
import os
import sys

import duckdb


def main(out_dir, bench_file, label):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    line = open(bench_file).read()
    bench = json.loads(line[line.index('{"metric"'):])["queries"]
    con = duckdb.connect()
    rows = {}
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        try:
            rows[name] = con.sql(f"SELECT COUNT(*) FROM '{qdir}/*.parquet'").fetchone()[0]
        except Exception:
            rows[name] = None
    names = sorted(set(rows) | set(bench))
    with open("QUERIES.md", "w") as f:
        f.write(f"# QUERIES — generated inventory ({label})\n\n")
        f.write("Oracle-checked = driver DuckDB hash-compare; rows measured at sf0.01; "
                "seconds = min-of-two noop-sink runs at sf0.1 on local[32]. "
                "Scaling curve vs DuckDB at sf0.001–sf1: BENCH_SCALING.json / BASELINE.md.\n\n")
        f.write("| query | rows @sf0.01 | oracle | sec @sf0.1 |\n|---|---|---|---|\n")
        for n in names:
            r = rows.get(n)
            b = bench.get(n)
            # Bench publishes -1 as its failed-query sentinel
            sec = "FAIL" if b is not None and b < 0 else (f"{b:.2f}" if b is not None else "—")
            f.write(f"| {n} | {r if r is not None else '—'} | "
                    f"{'yes' if n in oracle else 'rows-only'} | {sec} |\n")
        f.write(f"\nTotal: {len(names)} queries, {len(oracle)} oracle-checked.\n")
        f.write("\nANN quality (OpsSpec, sf0.01): recall@5 vs brute-force cosine = "
                "0.12 single-probe / 0.46 multi-probe at bits=4 (HD-1 probe set); "
                "KMeans-trained 16-cell IVF quantizer curve: 0.24 / 0.52 / 0.74 "
                "at nprobe = 1 / 2 / 4 (nprobe/16 of the corpus scanned per query).\n")
    print(f"QUERIES.md: {len(names)} queries, {len(oracle)} oracle-checked")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
