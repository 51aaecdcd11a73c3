"""Scale-adaptive fan-out for compute-heavy narrow stages.

Heavy per-row compute (Arrow/pandas text passes, shingle-hash HOF
chains) inherits the parallelism of the SCAN feeding it.  A small input
— one parquet file, one row group — arrives as a single split, so the
expensive stage runs on ONE task while the rest of the cluster idles
(guide §2.6 stragglers / §6 input split size).  A production corpus has
thousands of splits and no such problem.

:func:`fan_out_small` closes that gap without hurting the scale path:
it inserts one round-robin ``repartition(defaultParallelism)`` ONLY
when the input is a narrow single-scan chain over fewer files than the
session's parallelism.  Anything already wide (more files than cores),
anything downstream of a shuffle/aggregate/join (already
shuffle-partitioned), any checkpointed lineage, and any streaming frame
is returned untouched — at 100 TB this helper is a no-op by
construction, mirroring the gate ``pca_embeddings`` has used since
round 8 (`similarity.py`: "at scale the input already has many
partitions and this branch never fires").

The probe reads only the scan's file listing (``DataFrame.inputFiles``)
and the ``DataFrame.explain`` plan text — public API only (round 13,
VERDICT r12 item 8: the previous probe read the unanalyzed logical
plan through the DataFrame's private JVM handle, which is
Spark-version-brittle).  Neither
runs a job: ``explain`` plans (analyzer + optimizer + physical
planning, the AQE *initial* plan) but never executes, and the explain
cost is only paid by frames that already passed the small-file gate.
Round-robin repartition is retry-deterministic (Spark sorts before
repartition by default, SPARK-23207) and every downstream consumer in
this engine is partitioning-invariant by the repo's exactness design
(integer/decimal arithmetic, sorted collects), so results are
bit-identical with and without the fan-out.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

#: Plan node names that mark the input as NOT a narrow single-scan
#: chain.  "Sort"/"Limit" are conservative (a repartition would destroy
#: an ordering contract); "LogicalRDD"/"ExistingRDD" are checkpoint
#: boundaries whose width we cannot see; "Generate" fans out rows
#: itself.  Matched against ``explain(extended=True)`` output (logical
#: AND physical sections), so the physical spellings are included —
#: matching MORE text than the old logical-only probe is conservative
#: in exactly the right direction (a false "wide" just skips a local
#: optimization that is a no-op at scale anyway).
_WIDE_MARKERS = (
    "Join",
    "Aggregate",
    "Repartition",
    "Window",
    "Sort",
    "Limit",
    "LogicalRDD",
    "ExistingRDD",
    "Union",
    "Generate",
    "Deduplicate",
    "Exchange",
)


def _plan_text(df: DataFrame) -> str:
    """``explain(extended=True)`` output via the public API —
    ``DataFrame.explain`` prints from Python, so redirecting stdout
    captures the parsed/analyzed/optimized logical plans plus the
    (initial, unexecuted) physical plan."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(extended=True)
    return buf.getvalue()


def fan_out_small(df: DataFrame, *, target: int | None = None) -> DataFrame:
    """Round-robin repartition a SMALL narrow input to session
    parallelism; identity for wide, composed, checkpointed or streaming
    inputs (see module docstring).  Safe to call unconditionally in
    front of compute-heavy narrow stages."""
    try:
        if df.isStreaming:
            return df
        spark = df.sparkSession
        par = target or spark.sparkContext.defaultParallelism
        if par <= 1:
            return df
        # cheap gate first: the file listing needs only analysis.  A
        # checkpointed frame lists no files; a wide scan lists >= par.
        files = df.inputFiles()
        if not files or len(files) >= par:
            return df
        if any(m in _plan_text(df) for m in _WIDE_MARKERS):
            return df
    except Exception:  # probing must never break the query path
        return df
    return df.repartition(par)
