#!/usr/bin/env python
"""Capture `.explain("formatted")` for catalog queries into
plans/<round>/<query>_<tag>.txt (the per-round before/after evidence
files; round defaults to r13, override with AYEAYE_PLANS_ROUND).

Usage: python scripts/capture_plan.py <tag> q1 [q2 ...]

NOTE: building a catalog query EXECUTES its checkpoints — under Spark
4.1 AQE even ``localCheckpoint(eager=False)`` materializes its plan at
build time — so "plan capture" runs real jobs for checkpointed queries
and the captured (final) plan shows ExistingRDD scans where the
checkpoint already ran.  A capture taken on code whose fan-point
checkpoint executed during the build therefore cannot show the
pre-checkpoint duplication; capture "before" plans from the pre-change
code (e.g. a git worktree at the old commit).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from ayeaye_spark.catalog import QUERIES  # noqa: E402
from ayeaye_spark.core.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(
            "usage: python scripts/capture_plan.py <tag> <query> [query ...]\n"
            "  tag    suffix for plans/<round>/<query>_<tag>.txt "
            "(e.g. before, after, audit)\n"
            "  query  a catalog query name (ayeaye_spark.catalog.QUERIES)",
            file=sys.stderr,
        )
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(
            f"unknown quer{'y' if len(unknown) == 1 else 'ies'}: "
            f"{', '.join(unknown)}\n"
            f"(pick from the {len(QUERIES)} names in "
            "ayeaye_spark.catalog.QUERIES, e.g. "
            f"{', '.join(list(QUERIES)[:3])}, ...)",
            file=sys.stderr,
        )
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("AYEAYE_PLANS_ROUND", "r13")
    spark = get_spark("capture_plan")
    out_dir = os.path.join(HERE, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
