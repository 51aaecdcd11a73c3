#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced to full materialization with the noop datasource
(no driver collect, no output IO) — measures the engine, not the sink.

Per-query time is the MIN of 2 consecutive runs (steady state): the
first run of a plan pays one-off JVM JIT/codegen + Python-worker spinup
that vary run-to-run by several seconds on this box and say nothing
about throughput; the min is reproducible.  ``"runs_per_query": 2`` in
the JSON records the methodology.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ayeaye_spark.catalog import QUERIES  # noqa: E402
from ayeaye_spark.core.session import get_spark  # noqa: E402

# Every catalog query except the deliberately-quadratic exact variant
# (emb_near_dup_pairs exists as the small-scale oracle twin of the LSH
# path; ann_topk_lsh / dedup_minhash_lsh_pairs are the scale paths).
EXCLUDE = {"emb_near_dup_pairs"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("ayeaye_spark_bench")

    # warm the JVM/codegen/file-index paths so the first timed query
    # measures the engine, not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    # A failing query must cost its own timing only, never the whole
    # bench (round 2 lost every number to one loader bug): per-query
    # try/except, failures reported in "errors", JSON always emitted.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    names = [n for n in QUERIES if n not in EXCLUDE]
    for name in names:
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.monotonic()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
        except Exception as exc:  # noqa: BLE001 - survive any query failure
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "catalog_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs_per_query": 2,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
