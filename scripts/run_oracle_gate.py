#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Usage:
    python scripts/run_oracle_gate.py [sf_dir] [query_name ...]

Runs every catalog query (or the named subset) on Spark AND its DuckDB
oracle over the same parquet tables, comparing row count + column names +
exact values (stricter than the driver's hash).  Default sf_dir is the
driver's gate scale, /root/testdata/sf0.01.
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from ayeaye_spark.catalog import ORACLES, QUERIES
from tests.oracle_harness import compare, duck_connection


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("oracle_gate")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf)
    # Per-query watchdog: a handful of oracles are deliberately
    # quadratic (NOT-EXISTS dominance, editdist cross joins) — exact
    # twins of approximate scale paths.  Fine at the sf0.01 gate
    # scale; at bigger sf_dirs they can run for hours, wedging an
    # unattended sweep.  The watchdog interrupts DuckDB and cancels
    # the attempt's Spark job group after $GATE_QUERY_TIMEOUT seconds
    # (default 600) and reports TIMEOUT instead of hanging; 0
    # disables.  A timed-out worker thread cannot be killed, so the
    # shared DuckDB connection is REPLACED (the zombie keeps the old
    # one; DuckDB serializes per connection, so reusing it would make
    # every later oracle queue behind the stuck statement and cascade
    # false TIMEOUTs) and the attempt's job group is cancelled with
    # interruptOnCancel so executor threads actually stop.
    import threading

    budget = float(os.environ.get("GATE_QUERY_TIMEOUT", "600"))
    fails = 0
    for qi, name in enumerate(only or QUERIES):
        t0 = time.time()
        result: dict = {}
        group = f"gate-{qi}-{name}"

        def attempt(q=name, g=group):
            try:
                spark.sparkContext.setJobGroup(g, q, interruptOnCancel=True)
                if q not in ORACLES:
                    n = QUERIES[q](spark, sf).count()
                    result["v"] = (
                        n >= 0,
                        f"rows-only ({n} rows, no oracle: approx-by-design)",
                    )
                else:
                    result["v"] = compare(q, spark, result["con"], sf)
            except Exception as e:  # surface, keep going
                result["v"] = (
                    False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
                )

        result["con"] = con
        worker = threading.Thread(target=attempt, daemon=True)
        worker.start()
        worker.join(budget if budget > 0 else None)
        if worker.is_alive():
            try:
                con.interrupt()
            except Exception:
                pass
            try:
                spark.sparkContext.cancelJobGroup(group)
            except Exception:
                pass
            worker.join(30)
            ok, msg = False, f"TIMEOUT after {budget:.0f}s (watchdog)"
            # abandon the (possibly busy) connection to the zombie
            # thread; later queries get a fresh one
            con = duck_connection(sf)
        else:
            ok, msg = result["v"]
        print(f"{'PASS' if ok else 'FAIL'} {name:34s} {time.time() - t0:6.1f}s {msg}")
        fails += 0 if ok else 1
    print("FAILURES:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
