

class TestSessionConfHygiene:
    def test_nanos_flag_restored_after_events_load(self, spark):
        from ayeaye_spark import catalog

        catalog._LOAD_CACHE.clear()
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")
        df = catalog.load(spark, "/root/testdata/sf0.001", "events")
        # flag restored immediately after plan creation...
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")
        # ...and the plan still executes with timestamps rebuilt
        assert df.select("ts").first()[0] is not None

    def test_scoped_session_conf_restores(self, spark):
        from ayeaye_spark.catalog import scoped_session_conf

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with scoped_session_conf(spark, **{"spark.sql.shuffle.partitions": "7"}):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


class TestStreamingCatalogEntry:
    def test_stream_matches_batch_twin(self, spark):
        from ayeaye_spark.catalog import QUERIES

        sf = "/root/testdata/sf0.001"
        batch = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in QUERIES["events_hourly_window"](spark, sf).collect()
        }
        stream = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in QUERIES["events_stream_hourly_counts"](spark, sf).collect()
        }
        assert stream == batch
