"""Physical-plan introspection: machine-readable facts from .explain.

Used by the scale tests and available to models that want to assert plan
shape before an expensive run ("did my join broadcast?", "did the filter
reach the scan?") — the programmatic version of eyeballing
``df.explain("formatted")``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed plan, FINAL section only: an AdaptiveSparkPlan's
    toString prints the current/final plan followed by a full copy of
    the initial plan — counting nodes across both double-counts every
    scan/join/exchange (and hides ReusedExchange wins).  Everything
    after the Initial Plan marker is dropped."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def plan_summary(df: DataFrame) -> dict:
    """Summarize the executed plan: join strategies, exchanges, scans
    (with pushed/partition filters and read schemas)."""
    plan = physical_plan(df)
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    exchanges = re.findall(r"Exchange (\w+)", plan)
    scans = []
    for m in re.finditer(r"FileScan (\w+) \[([^\]]*)\]", plan):
        fmt, cols = m.group(1), m.group(2)
        tail = plan[m.end(): m.end() + 2000]
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", tail)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", tail)
        scans.append(
            {
                "format": fmt,
                "columns": [c.split("#")[0].strip() for c in cols.split(",") if c.strip()],
                "pushed_filters": pushed.group(1) if pushed else "",
                "partition_filters": part.group(1) if part else "",
            }
        )
    return {
        "joins": joins,
        "n_exchanges": len(exchanges),
        "exchange_kinds": exchanges,
        "n_reused_exchanges": plan.count("ReusedExchange"),
        "scans": scans,
        "whole_stage_codegen": _has_codegen(df, plan),
    }


def _has_codegen(df: DataFrame, plan: str) -> bool | None:
    """True when codegen markers are visible ("*(n)" / "codegen id").
    Returns None for a not-yet-finalized AQE plan — execute the frame
    (any action) first if you need a definite answer."""
    if "WholeStageCodegen" in plan or "*(" in plan:
        return True
    try:
        jvm = df.sparkSession._jvm
        formatted = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if "codegen id" in formatted:
            return True
        if "isFinalPlan=false" in formatted:
            return None
        return False
    except Exception:
        return None
