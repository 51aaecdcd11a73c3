"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``
after failures: a micro-batch may be REPLAYED with the same ``batch_id``.
Exactly-once therefore means *idempotent per batch_id* — the canonical
pattern for sinks without transactional support (parquet directories,
JDBC upserts keyed by batch, …).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to
    ``out_dir/batch_id=N`` exactly once: a replayed batch_id is detected
    via the directory's ``_SUCCESS`` marker and skipped.

    >>> q = (stream.writeStream.foreachBatch(idempotent_parquet_sink(path))
    ...      .option("checkpointLocation", ckpt).start())
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replay of a committed batch — exactly-once by skip
        df.write.mode("overwrite").parquet(target)

    return write_batch


def read_all_batches(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of every committed batch directory (hive-partitioned on
    batch_id, so readers can also filter/prune by it)."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch_id=*")
