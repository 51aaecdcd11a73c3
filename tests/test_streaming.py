"""Structured Streaming: the batch-declared plans run as real streams."""

from pyspark.sql import functions as F

from ayeaye_spark.catalog import load
from ayeaye_spark.streaming import events as streamops

SF = "/root/testdata/sf0.001"


def _events_parquet(spark, tmp_path):
    """events table re-written with micro-precision timestamps (the raw
    table is TIMESTAMP(NANOS), which neither Spark batch nor streaming
    reads natively — catalog.load handles the conversion)."""
    path = str(tmp_path / "events_us.parquet")
    load(spark, SF, "events").write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    path = _events_parquet(spark, tmp_path)
    batch_df = spark.read.parquet(path)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streamops.windowed_counts(batch_df, group_cols=["event_type"]).collect()
    }

    stream_df = streamops.stream_from_parquet(spark, path)
    assert stream_df.isStreaming
    agg = streamops.windowed_counts(stream_df, group_cols=["event_type"])
    result = streamops.run_to_memory(agg, "windowed_counts_test", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in result.collect()
    }
    assert got == expected


def test_session_aggregate_stream_runs(spark, tmp_path):
    path = _events_parquet(spark, tmp_path)
    stream_df = streamops.stream_from_parquet(spark, path)
    agg = streamops.session_aggregate(stream_df, gap="30 minutes", by=["user_id"])
    result = streamops.run_to_memory(agg, "session_agg_test", output_mode="complete")
    rows = result.collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)
    # sessions per user cover all events
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(path).count()


def test_stateful_stream_dedup(spark, tmp_path):
    """Streaming exact-dedup: dropDuplicates on a stream keeps state."""
    path = _events_parquet(spark, tmp_path)
    stream_df = streamops.stream_from_parquet(spark, path)
    deduped = stream_df.select("user_id").dropDuplicates(["user_id"])
    result = streamops.run_to_memory(deduped, "stream_dedup_test", output_mode="append")
    assert result.count() == spark.read.parquet(path).select("user_id").distinct().count()
