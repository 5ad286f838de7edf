#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Mimics the driver: for each query, read the Spark parquet output and run
the oracle SQL in DuckDB against views over the fixture tables; sort
columns by name; compare row-by-row.  Driver-side python (duckdb/pandas)
is allowed for this kind of harness tooling; the engine itself is Scala.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, timeout=None):
    # timeout (seconds, optional 3rd argv): at sf3+ a handful of DuckDB
    # oracles are pathological (q114 >900s, q108 OOM) — interrupt the
    # oracle run and record ORACLE_TIMEOUT instead of hanging the sweep.
    # An oracle timeout is an ORACLE limitation, counted separately from
    # engine failures.
    import threading
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    n_timeout = []
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        timer = None
        timed_out = [False]
        if timeout:
            def kick(c=con, flag=timed_out):
                flag[0] = True
                c.interrupt()
            timer = threading.Timer(timeout, kick)
            timer.start()
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            if timer: timer.cancel()
            if timed_out[0]:
                print(f"ORACLE_TIMEOUT {name} (>{timeout}s)"); n_timeout.append(name)
            else:
                print(f"FAIL {name}: {e}"); n_fail += 1
            continue
        if timer: timer.cancel()
        # Oracle result-type lint (round 7): DuckDB promotes SUM(BIGINT) to
        # HUGEINT (INT128); the driver's typed hash then diverges from the
        # engine's BIGINT even when every value matches (q131 in round 6
        # passed this row-compare for three waves while failing the driver).
        # DESCRIBE is plan-only, so this costs nothing. House rule: every
        # oracle SUM over integers must be CAST(... AS BIGINT).
        try:
            otypes = con.sql(f"DESCRIBE ({sql.rstrip().rstrip(';')})").df()
            huge = [r["column_name"] for _, r in otypes.iterrows()
                    if "HUGEINT" in str(r["column_type"]).upper()]
            if huge:
                print(f"FAIL {name}: oracle columns {huge} are HUGEINT — "
                      f"driver typed-hash will diverge; CAST(... AS BIGINT)")
                n_fail += 1; continue
        except Exception:
            pass  # DESCRIBE quirk must not mask the value compare below
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # dtype-normalized compare: numeric columns compare as values
        # (int64 1 == float64 1.0), everything else as strings.
        # pd.to_numeric(errors="ignore") is deprecated and the plain
        # astype(str) compare yields spurious FAILs on dtype repr drift.
        import numpy as np
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b):
                if pd.api.types.is_integer_dtype(a) and pd.api.types.is_integer_dtype(b):
                    eq = (a.values == b.values)
                else:
                    av, bv = a.astype("float64").values, b.astype("float64").values
                    # mixed int/float dtypes whose VALUES are all integral:
                    # compare exactly via int64 — the float64 cast collapses
                    # distinct integers above 2^53 (key domains are shifted
                    # by i*1e8 in scaled data, so this is reachable)
                    fin = np.isfinite(av) & np.isfinite(bv)
                    if fin.all() and (av == np.floor(av)).all() and (bv == np.floor(bv)).all() \
                       and (np.abs(av) < 2**62).all() and (np.abs(bv) < 2**62).all():
                        eq = (a.astype("int64").values == b.astype("int64").values)
                    else:
                        eq = np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)
            else:
                eq = (a.astype(str).values == b.astype(str).values)
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i])
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    missing_oracle = []  # queries without oracle: listed for awareness
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        qn = os.path.basename(qdir)
        if qn not in oracle:
            missing_oracle.append(qn)
    if missing_oracle:
        print(f"NOTE rows-only (no oracle): {missing_oracle}")
    if n_timeout:
        print(f"NOTE oracle timeouts (not engine failures): {n_timeout}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

def main_isolated(sf_dir, out_dir, timeout):
    """Per-query subprocess isolation for sf3+ sweeps: the in-process
    loop accumulates DuckDB buffer-pool + pandas memory across 116
    corpus-scale queries and eventually OOMs on queries that pass
    easily in a fresh process. Each subprocess runs exactly one
    query's compare via main() with a single-entry oracle file."""
    import subprocess, tempfile
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    timeouts, failures = [], []
    for name in sorted(oracle):
        with tempfile.TemporaryDirectory() as td:
            os.symlink(os.path.abspath(f"{out_dir}/{name}"), f"{td}/{name}")
            json.dump({name: oracle[name]}, open(f"{td}/oracle_sql.json", "w"))
            cmd = [sys.executable, os.path.abspath(__file__), sf_dir, td]
            if timeout:
                cmd.append(str(timeout))
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=(timeout * 2 if timeout else None))
                out = (r.stdout or "").strip().splitlines()
                line = next((l for l in out if l.startswith(("PASS", "FAIL", "ORACLE_TIMEOUT"))),
                            f"FAIL {name}: no output rc={r.returncode}")
            except subprocess.TimeoutExpired:
                line = f"ORACLE_TIMEOUT {name} (hard kill >{timeout * 2}s)"
            print(line, flush=True)
            if line.startswith("PASS"):
                n_pass += 1
            elif line.startswith("ORACLE_TIMEOUT"):
                timeouts.append(name)
            else:
                n_fail += 1
                failures.append(line)
    if timeouts:
        print(f"NOTE oracle timeouts (not engine failures): {timeouts}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    if "--isolate" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--isolate"]
        sys.exit(main_isolated(args[0], args[1],
                               float(args[2]) if len(args) > 2 else None))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else None))
