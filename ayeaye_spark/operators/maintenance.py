"""Table-maintenance operators: the housekeeping a long-lived lake
needs around the query engine (small-file compaction here; clustered
writes live on the Parquet connector's ``partition_by/sort_by``, layout
keys in ``functions.portable.zorder_key2``).

Reference parity: maintenance is "new capability" (SURVEY §2.5) —
the reference's single-file connectors never fragment.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Small-file compaction: rewrite a fragmented parquet directory
    into ``ceil(bytes / target)`` files, optionally range-sorted so the
    rewrite also restores clustering (pair with a z-order key for
    multi-dimensional locality).

    Returns the compacted DataFrame reading the REWRITTEN location; the
    rewrite goes through a sibling staging directory then an atomic-ish
    rename (never read-overwrite the same path in one job — Spark
    deletes the target before the read plan executes).

    Scale notes: file count from actual on-disk bytes, not row counts;
    ``repartitionByRange`` on the sort key gives non-overlapping file
    envelopes (data-skipping survives compaction); plain ``repartition``
    (round-robin) otherwise.
    """
    n_files = max(1, math.ceil(dir_bytes(path) / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    staging = path.rstrip("/") + "._compact_staging"
    out.write.mode("overwrite").parquet(staging)
    backup = path.rstrip("/") + "._compact_old"
    os.rename(path, backup)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(backup)
    return spark.read.parquet(path)
