#!/usr/bin/env python3
"""Compose the round's full-suite like-for-like record: min-of-two-runs
engine map vs the benchoracle map, per-query ratios, and the weak-row
disposition list (driver-side harness tooling, like check.py).

Usage: python3 tools/suitestats.py <benchA.json> <benchB.json> <oracle.json>
Prints one JSON object: {"engine_total", "oracle_total", "ratio",
"per_query": {name: {"eng", "ora", "ratio"}}, "weak": [...]}.
"""
import json
import sys


def bench_map(path):
    line = open(path).read()
    d = json.loads(line[line.index('{"metric"'):line.index("\n", line.index('{"metric"'))]
                   if "\n" in line[line.index('{"metric"'):] else line[line.index('{"metric"'):])
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main(a, b, ora):
    ma, mb = bench_map(a), bench_map(b)
    eng = {k: min(ma[k], mb[k]) for k in ma if k in mb}
    od = json.load(open(ora))
    oracle = od["queries"] if "queries" in od else od
    common = sorted(set(eng) & set(oracle))
    et = sum(eng[k] for k in common)
    ot = sum(oracle[k] for k in common)
    per = {k: {"eng": round(eng[k], 3), "ora": round(oracle[k], 3),
               "ratio": round(eng[k] / oracle[k], 3) if oracle[k] > 0 else None}
           for k in common}
    weak = sorted([k for k in common if oracle[k] >= 0.15 and eng[k] > 2 * oracle[k]],
                  key=lambda k: -per[k]["ratio"])
    out = {"n_common": len(common), "engine_total": round(et, 2),
           "oracle_total": round(ot, 2), "ratio": round(et / ot, 4),
           "weak_over2x": {k: per[k] for k in weak}, "per_query": per}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:4])
