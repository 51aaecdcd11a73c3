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
    fails = 0
    for name in only or QUERIES:
        t0 = time.time()
        try:
            if name not in ORACLES:
                n = QUERIES[name](spark, sf).count()
                ok, msg = n >= 0, f"rows-only ({n} rows, no oracle: approx-by-design)"
            else:
                ok, msg = compare(name, spark, con, sf)
        except Exception as e:  # surface, keep going
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'} {name:34s} {time.time() - t0:6.1f}s {msg}")
        fails += 0 if ok else 1
    print("FAILURES:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
