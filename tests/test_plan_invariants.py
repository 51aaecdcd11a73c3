"""Catalog-wide physical-plan invariants.

Every batch query in the catalog must satisfy, at ANY scale:

1. **No CartesianProduct.**  A cross join where neither side broadcasts
   is quadratic row movement; every intentional small-side cross join in
   this engine plans as BroadcastNestedLoopJoin (tiny side broadcast —
   probe sets, one-row totals, anchor frames), which Spark only selects
   when one side IS a broadcast.
2. **Single-partition exchanges carry aggregates only.**  An ``Exchange
   SinglePartition`` is allowed exclusively on top of an
   aggregate/window/limit/sort over an already-reduced frame (bucket
   totals, histograms, medians) — never on a full row stream.  This is
   the invariant that keeps the two-phase prefix sums and histogram
   ranks 100 TB-safe.

These are the repo-wide versions of the per-query assertions in
``test_scale_plans.py`` — a new catalog entry cannot silently introduce
either shape.
"""

import pytest

from ayeaye_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"

# streaming drains execute through a different (incremental) planner
_BATCH_QUERIES = sorted(n for n in QUERIES if "stream" not in n)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_cartesian_and_no_full_row_single_partition(name, spark):
    plan = _plan(QUERIES[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    for seg in plan.split("Exchange SinglePartition")[1:]:
        head = seg[:500]
        assert any(
            k in head for k in ("HashAggregate", "Window", "Limit", "Sort")
        ), f"{name}: SinglePartition exchange over a full row stream:\n{head}"
