import pytest



class TestSessionConfHygiene:
    def test_nanos_flag_restored_after_events_load(self, spark):
        from ayeaye_spark import catalog

        catalog._LOAD_CACHE.clear()
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")
        df = catalog.load(spark, "/root/testdata/sf0.001", "events")
        # flag untouched by the load path...
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")
        # ...and the plan executes with ts as a real timestamp
        assert df.select("ts").first()[0] is not None

    def test_scoped_session_conf_restores(self, spark):
        from ayeaye_spark.catalog import scoped_session_conf

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with scoped_session_conf(spark, **{"spark.sql.shuffle.partitions": "7"}):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


class TestTestdataSchemaDrift:
    """Guard against the round-2 failure class: load() assumptions about
    the parquet physical types drifting from the actual testdata.  Reads
    the footers directly with pyarrow (no Spark) so a mismatch fails in
    ~1s rather than wiping out every downstream query."""

    EXPECTED = {
        "events": {
            "event_id": "int64",
            # NOT timestamp[ns]: Spark rejects TIMESTAMP(NANOS) parquet
            # outright (PARQUET_TYPE_ILLEGAL) unless the session-wide
            # nanosAsLong flag is pre-set — load() handles the resulting
            # long column but cannot read a nanos file unaided, so a
            # nanos regeneration must fail THIS test loudly.
            "ts": ("timestamp[us]", "timestamp[us, tz=UTC]"),
            "user_id": "int64",
            "event_type": "string",
            "value": "double",
        },
        "lineitem": {"l_orderkey": "int64", "l_extendedprice": "double"},
        "orders": {"o_orderkey": "int64", "o_orderdate": ("date32[day]", "timestamp[us]")},
        "documents": {"doc_id": "int64", "text": "string"},
        "embeddings": {"vec_id": "int64", "embedding": "list<element: float>"},
    }

    def test_parquet_physical_types_match_loader_assumptions(self):
        import pyarrow.parquet as pq

        for table, cols in self.EXPECTED.items():
            schema = pq.read_schema(f"/root/testdata/sf0.001/{table}.parquet")
            for col, want in cols.items():
                got = str(schema.field(col).type)
                allowed = (want,) if isinstance(want, str) else want
                assert got in allowed, (
                    f"{table}.{col}: parquet stores {got}, loader expects one "
                    f"of {allowed} — update ayeaye_spark/catalog.py:load()"
                )

    def test_events_ts_loads_as_timestamp(self, spark):
        from ayeaye_spark import catalog
        from pyspark.sql.types import TimestampNTZType, TimestampType

        df = catalog.load(spark, "/root/testdata/sf0.001", "events")
        assert isinstance(df.schema["ts"].dataType, (TimestampType, TimestampNTZType))


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

    def test_stream_sessions_match_batch_sessionize(self, spark):
        """The session_window streaming drain must agree with the batch
        lag+cumsum sessionization on sessions-per-user and total events
        (same 30-minute gap)."""
        from collections import Counter

        from ayeaye_spark.catalog import QUERIES

        sf = "/root/testdata/sf0.001"
        stream_rows = QUERIES["events_stream_sessions"](spark, sf).collect()
        n_sessions = Counter(r["user_id"] for r in stream_rows)
        n_events = Counter()
        for r in stream_rows:
            n_events[r["user_id"]] += r["n_events"]
        batch = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in QUERIES["events_sessionize"](spark, sf).collect()
        }
        assert {u: (n_sessions[u], n_events[u]) for u in n_sessions} == batch


class TestCorrectnessWindow:
    """The acceptance driver hard-verifies exactly the first 50
    insertion-order entries of catalog.QUERIES.  Pin that window's
    composition so a refactor can't silently push an operator family
    back out of the hard signal (the round-1..3 failure mode)."""

    def test_window_is_window_order(self):
        from ayeaye_spark.catalog import _WINDOW_ORDER, QUERIES

        assert len(_WINDOW_ORDER) == 50
        assert list(QUERIES)[:50] == list(_WINDOW_ORDER)

    def test_every_window_entry_has_oracle(self):
        from ayeaye_spark.catalog import _WINDOW_ORDER, ORACLES

        assert all(n in ORACLES for n in _WINDOW_ORDER)

    def test_window_spans_operator_families(self):
        from ayeaye_spark.catalog import _WINDOW_ORDER

        window = set(_WINDOW_ORDER)
        # ROUND-10 REBASELINE: the r10 rotation (per the r9 verdict's
        # driver-coverage-convergence ask) retired a number of
        # single-representative families from the window — set ops,
        # variant access, exact quantile twins, pandas UDAF,
        # departitioned windows, heavy hitters, triangles, Pareto,
        # recursive CTE, pivot.  Every retired representative has 1+
        # green driver samples on record (CORRECTNESS_r1..r9) and stays
        # value-exact in scripts/run_oracle_gate.py each round; the
        # pins below are the families with CURRENT in-window
        # representatives.
        families = {
            # q9_product_profit rotated to the oracle gate in round
            # 10 (driver-green in CORRECTNESS_r09) for the web-corpus
            # URL-dedup flagship
            "tpch": {"q1_pricing_summary"},
            # events_running_sum rotated to the oracle gate in round 6
            # (running windows stay covered by events_sessionize + the
            # departitioned family)
            "window_fns": {"events_sessionize"},
            "grouping": {"orders_rollup"},
            # events_range_join_purchases rotated to the oracle gate
            # in round 10 session 2 (driver-green in CORRECTNESS_r09);
            # the as-of join carries the family in-window
            "join_shapes": {
                "events_asof_view_before_click",
            },
            "classifier_calibration": {"docs_classifier_calibration"},
            # doc_quality (r7) and doc_lang_id (r8) rotated to the
            # oracle gate — lang/quality scoring stays in-window via
            # docs_gopher_filter + the grouped-agg UDAF — for BM25 and
            # the corpus-bigram-LM coherence families
            "lm_coherence": {"docs_bigram_coherence"},
            # docs_token_budget (1-row output) rotated to the oracle
            # gate in round 6 for the substring-surgery flagship
            "curation": {
                "docs_pack_sequences",
                "decontaminate_splits",
            },
            # dedup_incremental_survivors (r6),
            # dedup_prefix_jaccard_pairs (r8) and
            # dedup_transitive_components (r9 s2 — the star closure
            # replaces it on the identical oracle) rotated to the
            # oracle gate; 4 representatives stay under the hard signal
            "dedup": {
                "dedup_exact",
                "dedup_minhash_lsh_pairs",
                "dedup_components_star",
                "dedup_simhash_near_pairs",
            },
            "layout": {"orders_zorder_cells"},
            # docs_remove_repeated_spans rotated to the oracle gate in
            # round 11 (driver-green in CORRECTNESS_r10); the repeated-
            # span PROFILE keeps the family in-window
            # substring_surgery GRADUATED in round 12: both members
            # driver-green (docs_remove_repeated_spans r10,
            # docs_repeated_spans r11); the family stays value-exact in
            # the oracle gate every round
            "interval_analytics": {"events_peak_concurrency_daily"},
            # round-12 family: oracle-backed media decode over the
            # committed binary fixture (binaryFile -> real pixel decode
            # -> integer mean + dHash dup grouping)
            "multimodal": {"media_decode_report"},
            # ann_topk_lsh rotated to the oracle gate in round 7,
            # ann_topk_ivf in round 9 session 2; SQ8 + the Matryoshka
            # prefix-dimension path carry the family in-window
            "ann": {"ann_topk_matryoshka", "ann_topk_sq8"},
            "scd2": {"customer_segment_scd2"},
            "salted_agg": {"events_salted_type_counts"},
            "quality_rules": {"docs_gopher_filter"},
            "semantic_dedup": {"dedup_semantic_survivors"},
            # iterative_graph GRADUATED in round 12:
            # docs_domain_pagerank's DISTRIBUTED per-iteration loop was
            # certified by the r11 driver record (small_graph_edges=0);
            # docs_source_lang_pagerank graduated r10 s2
            # round-7 families
            "bm25_retrieval": {"docs_bm25_topk"},
            # round-10 family: web-corpus curation.  The whole r11
            # rotation cohort (url_canonicalize/robots/crawl_delta/...)
            # graduated driver-green in CORRECTNESS_r11; the committed-
            # archive END-TO-END acceptance entry carries the family
            # in-window (it exercises parse -> robots -> extract ->
            # dedup in one record)
            "web_corpus": {"warc_crawl_curation"},
        }
        for family, members in families.items():
            assert members <= window, f"{family}: {members - window} outside window"

    def test_unverifiable_entries_outside_window(self):
        """Approximate sketches (no oracle possible) and streaming drains
        (rows-only by nature) must NOT consume hard-signal slots."""
        from ayeaye_spark.catalog import _WINDOW_ORDER, QUERIES

        tail = set(list(QUERIES)[50:])
        for name in (
            "events_approx_distinct_users",
            "lineitem_price_quantiles",
            "events_stream_hourly_counts",
            "events_stream_sessions",
        ):
            assert name in tail and name not in set(_WINDOW_ORDER)


class TestStreamExactlyOnceDedup:
    def test_doubled_stream_dedups_to_batch_twin(self, spark):
        """The events stream unioned with itself (every event delivered
        twice) must, after dropDuplicatesWithinWatermark on event_id,
        aggregate to EXACTLY the single-delivery batch result — i.e.
        the dedup state really suppressed the second copies."""
        from ayeaye_spark.catalog import QUERIES

        sf = "/root/testdata/sf0.001"
        batch = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in QUERIES["events_hourly_window"](spark, sf).collect()
        }
        stream = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in QUERIES["events_stream_exactly_once_dedup"](spark, sf).collect()
        }
        assert stream == batch

    def test_batch_degradation_is_plain_dropduplicates(self, spark):
        from ayeaye_spark.streaming.events import dedup_within_watermark

        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b")], ["event_id", "event_type"]
        )
        out = dedup_within_watermark(df, key_cols=["event_id"])
        assert out.count() == 2


class TestCurationV3EmbeddingCoverage:
    def test_docs_without_embeddings_survive_semantic_stage(self, spark):
        """Regression (caught by the sf0.1 oracle sweep): the semantic
        stage must anti-join the DROPPED set — a document with no
        embedding row cannot be a semantic duplicate and must pass
        through, not be discarded by an inner join with survivors."""
        from unittest import mock

        from ayeaye_spark import catalog as cat

        # fixture text chosen to pass BOTH upstream filters (Gopher
        # rules and the hashed classifier's keep decision) so the test
        # isolates the semantic stage's join semantics
        words = ("the quick brown fox jumps over lazy dog and runs through "
                 "green fields with great speed while birds sing songs")
        text = words + " the" * 40
        docs = spark.createDataFrame(
            [(i, text, "en", "s", len(text)) for i in range(4)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        # embeddings cover only docs 0 and 1; 0/1 are near-identical
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.0001])], ["vec_id", "embedding"]
        )

        def fake_load(spark_, sf_dir, name):
            return {"documents": docs, "embeddings": emb}[name]

        with mock.patch.object(cat, "load", side_effect=fake_load):
            out = cat.QUERIES["pipeline_curation_v3"](spark, "unused")
            n_docs = sum(r["n_docs"] for r in out.collect())
        # doc 1 drops (semantic dup of 0); docs 2 and 3 have no
        # embedding and MUST survive alongside doc 0
        assert n_docs == 3


class TestHllRollupReaggregate:
    """Re-aggregatable HLL rollup (``events_hll_rollup_reaggregate``):
    daily sketches union to any coarser slice without a fact rescan."""

    SF = "/root/testdata/sf0.001"

    def test_estimate_close_and_merge_lossless(self, spark):
        from pyspark.sql import functions as F

        from ayeaye_spark import catalog as cat

        out = {
            r["event_type"]: (r["approx_users"], r["exact_users"])
            for r in cat.QUERIES["events_hll_rollup_reaggregate"](
                spark, self.SF
            ).collect()
        }
        assert out  # at least one event type
        events = cat.load(spark, self.SF, "events")
        direct = {
            r["event_type"]: r["direct"]
            for r in events.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", 12)
                ).cast("long").alias("direct")
            )
            .collect()
        }
        for et, (approx, exact) in out.items():
            # 2% relative tolerance (lgConfigK=12 => ~1.6% RSE)
            assert abs(approx - exact) <= max(1, int(0.02 * exact)), et
            # union of daily sketches == one sketch over everything
            assert approx == direct[et], et


class TestThetaAudienceOverlap:
    """Theta-sketch set algebra (``events_theta_audience_overlap``):
    intersection/difference estimates equal the exact audience overlap
    counts at this cardinality (theta is exact below nominal entries)."""

    SF = "/root/testdata/sf0.001"

    def test_sketch_set_ops_exact_in_small_regime(self, spark):
        from ayeaye_spark import catalog as cat

        r = cat.QUERIES["events_theta_audience_overlap"](
            spark, self.SF
        ).collect()[0]
        assert r["view_users"] == r["exact_view"]
        assert r["purchase_users"] == r["exact_purchase"]
        assert r["both_users"] == r["exact_both"]
        assert r["view_only_users"] == r["exact_view_only"]
        # set algebra consistency: |A| == |A∩B| + |A\\B|
        assert r["view_users"] == r["both_users"] + r["view_only_users"]


class TestTopkSketchRollup:
    """Mergeable heavy-hitters rollup (``events_topk_sketch_rollup``):
    daily accumulate states combined at month grain equal the exact
    per-month top-5 while distinct users fit the sketch capacity."""

    SF = "/root/testdata/sf0.001"

    def test_rolled_topk_equals_exact(self, spark):
        from pyspark.sql import functions as F

        from ayeaye_spark import catalog as cat

        got = [
            (r["month"], r["user_id"], r["n_events"])
            for r in cat.QUERIES["events_topk_sketch_rollup"](spark, self.SF)
            .orderBy("month", F.desc("n_events"), "user_id")
            .collect()
        ]
        assert got, "rollup must produce rows"
        events = cat.load(spark, self.SF, "events")
        exact_counts = (
            events.groupBy(
                F.date_trunc("month", "ts").alias("month"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_month: dict = {}
        for r in exact_counts:
            by_month.setdefault(r["month"], []).append((r["user_id"], r["n"]))
        for month, items in by_month.items():
            top5 = sorted(items, key=lambda t: (-t[1], t[0]))[:5]
            got_month = [(u, n) for m, u, n in got if m == month]
            # counts must match exactly; user order can differ only on
            # count ties, so compare as count-sorted multisets of counts
            # plus set-equality of users at each count level
            assert sorted(n for _, n in got_month) == sorted(
                n for _, n in top5
            ), month
            exact_at = {}
            for u, n in items:
                exact_at.setdefault(n, set()).add(u)
            for u, n in got_month:
                assert u in exact_at[n], (month, u, n)


class TestQuantileSketchRollup:
    """Deterministic log2-linear quantile rollup
    (``events_value_quantile_sketch_rollup``): the reported bucket
    upper bound brackets the exact quantile from above within the
    documented 12.5% relative slack, and the daily cells are mergeable
    (monthly answer == cells built directly at month grain)."""

    SF = "/root/testdata/sf0.001"

    def test_bounds_bracket_exact_quantiles(self, spark):
        from pyspark.sql import functions as F

        from ayeaye_spark import catalog as cat

        rows = cat.QUERIES["events_value_quantile_sketch_rollup"](
            spark, self.SF
        ).collect()
        assert rows
        events = cat.load(spark, self.SF, "events").where(
            F.col("value").isNotNull()
        )
        cents = events.selectExpr(
            "trunc(CAST(ts AS DATE), 'month') AS month",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
        )
        for r in rows:
            month_cents = sorted(
                x["c"] for x in cents.where(F.col("month") == r["month"]).collect()
            )
            n = len(month_cents)
            assert r["n_events"] == n
            for q, col in ((0.5, "p50_ub_cents"), (0.9, "p90_ub_cents"),
                           (0.99, "p99_ub_cents")):
                # exact type-1 quantile: the ceil(q*n)-th smallest
                import math

                exact = month_cents[math.ceil(q * n) - 1]
                ub = r[col]
                assert ub >= exact, (col, ub, exact)
                if exact >= 16:
                    assert (ub - exact) / exact < 0.125, (col, ub, exact)

    def test_cells_merge_losslessly(self, spark):
        """Summing daily cells to month == bucketing directly at month
        grain — the mergeability claim, pinned."""
        from pyspark.sql import functions as F

        from ayeaye_spark import catalog as cat
        from ayeaye_spark.functions import portable as P

        events = cat.load(spark, self.SF, "events").where(
            F.col("value").isNotNull()
        )
        cents = events.selectExpr(
            "CAST(ts AS DATE) AS day",
            f"{P.money_cents('value', P.SPARK)} AS cents",
        )
        bucketed = cents.selectExpr(
            "day", f"{P.log2_linear_bucket('cents', P.SPARK)} AS bucket"
        )
        via_daily = {
            (str(r["month"]), r["bucket"]): r["cnt"]
            for r in bucketed.groupBy("day", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy(F.trunc("day", "month").alias("month"), "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        direct = {
            (str(r["month"]), r["bucket"]): r["cnt"]
            for r in bucketed.groupBy(
                F.trunc("day", "month").alias("month"), "bucket"
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert via_daily == direct and direct


class TestKllQuantileRollup:
    """KLL mergeable quantile rollup (``events_kll_quantile_rollup``):
    merged monthly estimates stay inside the exact-rank error envelope,
    and merging daily sketches loses nothing vs a direct monthly
    sketch."""

    SF = "/root/testdata/sf0.001"

    def test_estimates_within_rank_error_and_merge_lossless(self, spark):
        from pyspark.sql import functions as F

        from ayeaye_spark import catalog as cat

        rows = cat.QUERIES["events_kll_quantile_rollup"](spark, self.SF).collect()
        assert rows
        events = cat.load(spark, self.SF, "events").where(
            F.col("value").isNotNull()
        )
        vals = {}
        for r in events.select(
            F.date_trunc("month", "ts").alias("month"), "value"
        ).collect():
            vals.setdefault(r["month"], []).append(r["value"])
        for r in rows:
            month_vals = sorted(vals[r["month"]])
            n = len(month_vals)
            assert r["n_events"] == n
            # k=200 => normalized rank error ~1.65%; allow 3% two-sided
            eps = 0.03
            for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
                lo = month_vals[max(0, int((q - eps) * n) - 1)]
                hi = month_vals[min(n - 1, int((q + eps) * n))]
                assert lo <= r[col] <= hi, (r["month"], col, r[col], lo, hi)

        # merge-losslessness: merged daily sketches == direct monthly sketch
        events.createOrReplaceTempView("_kll_t")
        merged = spark.sql("""
          WITH daily AS (
            SELECT date_trunc('month', ts) AS month, CAST(ts AS DATE) AS day,
                   kll_sketch_agg_double(value, 200) AS sk
            FROM _kll_t GROUP BY 1, 2)
          SELECT month, kll_sketch_get_quantile_double(
                   kll_merge_agg_double(sk), array(0.5D, 0.9D)) AS q
          FROM daily GROUP BY month
        """).collect()
        direct = spark.sql("""
          SELECT date_trunc('month', ts) AS month,
                 kll_sketch_get_quantile_double(
                   kll_sketch_agg_double(value, 200), array(0.5D, 0.9D)) AS q
          FROM _kll_t GROUP BY 1
        """).collect()
        dm = {r["month"]: list(r["q"]) for r in merged}
        dd = {r["month"]: list(r["q"]) for r in direct}
        for m in dd:
            # same sketch parameter, same data: estimates agree to
            # within the rank-error envelope of one another
            for a, b in zip(dm[m], dd[m]):
                assert abs(a - b) <= max(abs(b) * 0.05, 1e-9), (m, a, b)


class TestBrandItemsGate:
    """The size-gated `items` materialization behind the two brand
    basket queries (round 13, VERDICT r12 item 3): results must be
    identical with the gate forced on and off, and the sf-scale default
    must stay on the inlined (ungated) plan."""

    @pytest.mark.parametrize(
        "name", ["brand_market_basket", "brand_association_rules"]
    )
    def test_gated_equals_inlined(self, spark, monkeypatch, name):
        import ayeaye_spark.catalog as cat

        sf = "/root/testdata/sf0.001"
        monkeypatch.setenv("AYEAYE_BRAND_MATERIALIZE", "0")
        inlined = [tuple(r) for r in cat.QUERIES[name](spark, sf).collect()]
        monkeypatch.setenv("AYEAYE_BRAND_MATERIALIZE", "1")
        gated = [tuple(r) for r in cat.QUERIES[name](spark, sf).collect()]
        assert inlined == gated and len(inlined) > 0

    def test_default_gate_is_off_at_sf_scale(self, monkeypatch):
        import ayeaye_spark.catalog as cat

        monkeypatch.delenv("AYEAYE_BRAND_MATERIALIZE", raising=False)
        assert (
            cat._input_table_bytes("/root/testdata/sf0.1", "lineitem")
            <= cat._BRAND_ITEMS_MAT_BYTES
        )
        # unknown/remote paths count as huge -> scale path
        assert (
            cat._input_table_bytes("/no/such/dir", "lineitem")
            > cat._BRAND_ITEMS_MAT_BYTES
        )
