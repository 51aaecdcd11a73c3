"""Naive-window vs histogram-plan crossover evidence.

The departitioned rewrites (``relational.with_ntile`` /
``grouped_rank_exact``) cost 2-3x more PLAN than the single-task
per-group window at sf0.1 — this script measures where the histogram
plan overtakes the naive window as the per-group row count grows, by
scaling the sf0.1 events table m-fold (union of id-shifted copies, so
value/type distributions are preserved) and timing both plans on the
same parquet input.

Usage:  python scripts/crossover_bench.py [multipliers ...]
Writes scratch parquet under .scratch/ (removed afterwards) and prints
one line per (multiplier, variant): rows, wall seconds.  The committed
numbers live in ARCHITECTURE.md ("Departitioned windows: crossover").
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ayeaye_spark.operators import relational  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = Path(__file__).resolve().parent.parent / ".scratch" / "crossover"


def build_scaled(spark: SparkSession, m: int) -> str:
    """m id-shifted copies of sf0.1 events -> one scratch parquet dir."""
    out = SCRATCH / f"events_x{m}"
    if not (out / "_SUCCESS").exists():
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_type", "event_id", "value"
        )
        parts = [
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10**12)
            )
            for i in range(m)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(str(out))
    return str(out)


def naive_deciles(df):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return df.withColumn("decile", F.ntile(10).over(w))


def histogram_deciles(df):
    return relational.with_ntile(
        df, "event_type", "value", "event_id",
        n_tiles=10, out_col="decile",
        bucket_expr=F.floor(F.col("value")).cast("long"),
    )


def time_plan(df, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 3, 10, 30]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("mult\trows\tnaive_s\thistogram_s\tratio")
    try:
        for m in mults:
            path = build_scaled(spark, m)
            df = spark.read.parquet(path)
            n = df.count()
            t_naive = time_plan(naive_deciles(df))
            t_hist = time_plan(histogram_deciles(df))
            print(
                f"{m}\t{n}\t{t_naive:.2f}\t{t_hist:.2f}"
                f"\t{t_naive / t_hist:.2f}",
                flush=True,
            )
    finally:
        shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
