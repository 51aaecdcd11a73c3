"""Scale-mechanics tests: the plans, not just the results.

These assert the physical-plan properties that make operators survive a
100 TB scale-up — partition pruning, bucketed shuffle-free joins, salted
aggregation equivalence, pushdown — by reading `.explain` output.
"""

import pytest

from pyspark.sql import functions as F

from ayeaye_spark import AccessMode, connector_for
from ayeaye_spark.catalog import load
from ayeaye_spark.operators.relational import salted_aggregate

SF = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPartitionPruning:
    def test_partitioned_write_prunes_on_read(self, spark, tmp_path):
        orders = load(spark, SF, "orders").withColumn(
            "status", F.col("o_orderstatus")
        )
        out = connector_for(
            f"parquet://{tmp_path}/orders_part", access=AccessMode.WRITE,
            partition_by=["status"],
        )
        out.write(orders)

        back = spark.read.parquet(f"{tmp_path}/orders_part").where(F.col("status") == "O")
        plan = physical_plan(back)
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1][:200]
        assert "status" in pf and "= O" in pf  # pruned to the O directory
        assert back.count() == orders.where(F.col("status") == "O").count()


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        orders = load(spark, SF, "orders")
        customer = load(spark, SF, "customer")
        connector_for(
            f"parquet://{tmp_path}/orders_b;table=orders_bucketed",
            access=AccessMode.WRITE, bucket_by=(4, ["o_custkey"]),
        ).write(orders)
        connector_for(
            f"parquet://{tmp_path}/cust_b;table=customer_bucketed",
            access=AccessMode.WRITE, bucket_by=(4, ["c_custkey"]),
        ).write(customer.withColumn("c_custkey", F.col("c_custkey").cast("long")))

        o = spark.table("orders_bucketed")
        c = spark.table("customer_bucketed")
        # disable broadcast so the join strategy itself is under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
            plan = physical_plan(joined)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        # both sides bucketed on the join key → no Exchange below the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert join_section  # smoke: we did find the join


    def test_orc_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        """The ORC connector shares the parquet layout path — bucketed
        co-location must eliminate the join shuffle identically."""
        orders = load(spark, SF, "orders")
        customer = load(spark, SF, "customer")
        connector_for(
            f"orc://{tmp_path}/orders_ob;table=orders_orc_bucketed",
            access=AccessMode.WRITE, bucket_by=(4, ["o_custkey"]),
        ).write(orders)
        connector_for(
            f"orc://{tmp_path}/cust_ob;table=customer_orc_bucketed",
            access=AccessMode.WRITE, bucket_by=(4, ["c_custkey"]),
        ).write(customer.withColumn("c_custkey", F.col("c_custkey").cast("long")))

        o = spark.table("orders_orc_bucketed")
        c = spark.table("customer_orc_bucketed")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
            plan = physical_plan(joined)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        assert "FileScan orc" in plan


class TestAqeSkewJoin:
    def test_skewed_partition_is_split(self, spark):
        """The session's AQE skew-join config must actually engage: a
        join with one hot key (95% of rows) should show
        SortMergeJoin(skew=true) with a skew-aware AQEShuffleRead —
        the runtime re-plan that replaces manual salting for joins at
        100 TB.  Thresholds are lowered so local-scale data trips it."""
        from pyspark.sql import functions as F

        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            left = spark.range(200_000).select(
                F.lit(0).alias("k"), F.col("id").alias("v")
            ).union(
                spark.range(10_000).select(
                    (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
                )
            )
            right = spark.range(101).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
            j = left.join(right, on="k")
            j.collect()  # finalize the AQE plan on the frame itself
            plan = physical_plan(j)
        finally:
            for k, old in saved.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
        assert "skew=true" in plan
        assert "AQEShuffleRead" in plan and "skewed" in plan


class TestSaltedAggregate:
    def test_matches_plain_aggregate(self, spark):
        events = load(spark, SF, "events")
        plain = {
            (r["event_type"],): (r["n"], round(r["s"], 6))
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        salted = {
            (r["event_type"],): (r["n_rows"], round(r["sum_value"], 6))
            for r in salted_aggregate(
                events, ["event_type"], sum_cols=["value"], buckets=8
            ).collect()
        }
        assert salted == plain

    def test_two_shuffle_stages(self, spark):
        events = load(spark, SF, "events")
        plan = physical_plan(
            salted_aggregate(events, ["event_type"], sum_cols=["value"])
        )
        assert plan.count("Exchange hashpartitioning") == 2  # (key,salt) then (key)


class TestPushdown:
    def test_filter_and_projection_reach_scan(self, spark):
        li = load(spark, SF, "lineitem")
        q = li.where(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
        plan = physical_plan(q)
        scan = plan.split("FileScan parquet")[1]
        assert "l_shipdate" in scan.split("ReadSchema")[0]  # filter col scanned
        assert "PushedFilters" in scan or "LessThan(l_shipdate" in scan or "DataFilters" in scan
        read_schema = scan.split("ReadSchema: ")[1][:200]
        assert "l_extendedprice" not in read_schema  # pruned


class TestExactDistinctPlan:
    def test_two_stage_distinct_with_partial_agg(self, spark):
        """events_distinct_users_exact must expand to Spark's two-shuffle
        distinct-aggregate (partial agg on (event_type, user_id), then on
        event_type) with the scan pruned to the two needed columns — the
        shape that holds at 100 TB (first shuffle is distinct-pair
        cardinality, not row count)."""
        from ayeaye_spark.catalog import QUERIES

        q = QUERIES["events_distinct_users_exact"](spark, SF)
        plan = physical_plan(q)
        assert plan.count("Exchange") <= 2
        assert "HashAggregate" in plan
        read_schema = plan.split("ReadSchema: ")[1][:200]
        assert "user_id" in read_schema and "event_type" in read_schema
        assert "props" not in read_schema and "value" not in read_schema


class TestPlanSummary:
    def test_summary_facts(self, spark):
        from ayeaye_spark.plans.introspect import plan_summary

        nation = load(spark, SF, "nation")
        customer = load(spark, SF, "customer")
        q = (
            customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .where(F.col("c_acctbal") > 0)
            .select("n_name", "c_acctbal")
        )
        q.collect()  # actions on the frame itself finalize its AQE plan
        facts = plan_summary(q)
        assert "BroadcastHashJoin" in facts["joins"]
        assert any(
            "c_acctbal" in s["columns"] and len(s["columns"]) <= 3 for s in facts["scans"]
        )  # projection pruned to join+filter+output columns
        assert facts["whole_stage_codegen"] is True


class TestVectorizedOperatorPlans:
    def test_profile_scans_only_needed_columns(self, spark):
        from ayeaye_spark.operators import text as textops

        docs = load(spark, SF, "documents")
        q = textops.profile_vectorized(docs, "doc_id", "text")
        plan = physical_plan(q)
        read_schema = plan.split("ReadSchema: ")[1][:300]
        assert "doc_id" in read_schema and "text" in read_schema
        assert "n_chars" not in read_schema and "source" not in read_schema  # pruned

    def test_contamination_broadcasts_eval_side(self, spark):
        from ayeaye_spark.operators import dedup, sampling

        docs = sampling.with_bucket(load(spark, SF, "documents"), "doc_id")
        ev = docs.where(F.col("bucket") >= 950)
        tr = docs.where(F.col("bucket") < 900)
        q = dedup.contamination_pairs(ev, tr, "doc_id", "text")
        plan = physical_plan(q)
        assert "BroadcastHashJoin" in plan  # eval side broadcast, no SMJ
        assert "SortMergeJoin" not in plan

    def test_vectorized_topk_shuffles_only_candidates(self, spark):
        from ayeaye_spark.operators import similarity

        emb = load(spark, SF, "embeddings")
        q = similarity.cosine_topk_vectorized(emb, emb.where(F.col("vec_id") < 5), k=5)
        plan = physical_plan(q)
        # one hash shuffle of the narrow candidate rows for the window,
        # never an all-pairs join
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        assert plan.count("Exchange hashpartitioning") == 1


class TestDistributedCumsum:
    """The curation prefix sums must NOT funnel all rows through one
    partition: the only SinglePartition exchange allowed is the one over
    the tiny per-bucket totals aggregate."""

    def _assert_no_full_row_single_partition(self, plan: str):
        assert "hashpartitioning(_cb" in plan  # the parallel window shuffle
        for seg in plan.split("Exchange SinglePartition")[1:]:
            # a SinglePartition exchange must sit on top of the bucket-
            # totals aggregate, never on the full row stream
            assert "HashAggregate" in seg[:400], seg[:400]

    def test_pack_sequences_plan(self, spark):
        from ayeaye_spark.operators import sampling

        docs = load(spark, SF, "documents").select("doc_id", F.col("n_chars").alias("ntok"))
        q = sampling.pack_sequences(docs, id_col="doc_id", token_col="ntok", budget=2048)
        self._assert_no_full_row_single_partition(physical_plan(q))

    def test_token_budget_plan(self, spark):
        from ayeaye_spark.operators import sampling

        docs = load(spark, SF, "documents").select(
            "doc_id", F.col("n_chars").alias("ntok"), F.col("n_chars").alias("score")
        )
        q = sampling.token_budget_filter(
            docs, id_col="doc_id", token_col="ntok", score_col="score", budget=10_000
        )
        self._assert_no_full_row_single_partition(physical_plan(q))

    def test_budget_prunes_buckets_before_shuffle(self, spark):
        from ayeaye_spark.operators import sampling

        rows = [(i, 10, float(1000 - i)) for i in range(1000)]
        df = spark.createDataFrame(rows, ["id", "ntok", "score"])
        kept = sampling.token_budget_filter(
            df, id_col="id", token_col="ntok", score_col="score", budget=205
        ).collect()
        # top-20 scores fit (200 tokens); 21st would reach 210 > 205
        assert sorted(r["id"] for r in kept) == list(range(20))

    def test_cumsum_matches_global_window(self, spark):
        from pyspark.sql import Window

        from ayeaye_spark.operators import sampling

        rows = [(i * 7 % 500, (i % 13) + 1) for i in range(500)]
        df = spark.createDataFrame(rows, ["id", "ntok"])
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        want = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("ntok").over(w)).collect()}
        got = {
            r["id"]: r["pack_id"]
            for r in sampling.pack_sequences(
                df, id_col="id", token_col="ntok", budget=10, id_bucket_width=64
            ).collect()
        }
        # pack_id = (cum - ntok) div 10 derived from the SAME cumsum
        for (i, n) in rows:
            assert got[i] == (want[i] - n) // 10


class TestSortedWriteDataSkipping:
    def test_sort_by_produces_tight_row_group_stats(self, spark, tmp_path):
        import pyarrow.parquet as pq

        events = load(spark, SF, "events").select("event_id", "user_id", "value")
        out = connector_for(
            f"parquet://{tmp_path}/ev_sorted", access=AccessMode.WRITE,
            sort_by=(4, ["user_id"]),  # explicit file count beats AQE coalesce
        )
        out.write(events)

        import glob

        ranges = []
        for f in glob.glob(f"{tmp_path}/ev_sorted/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = [
                md.row_group(rg).column(i)
                for rg in range(md.num_row_groups)
                for i in range(md.row_group(rg).num_columns)
            ]
            stats = [c.statistics for c in cols if c.path_in_schema == "user_id"]
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
        assert len(ranges) > 1  # multiple files, each a key range
        # clustered layout: file ranges are pairwise non-overlapping
        # (boundary keys may touch), so a point/range filter can skip
        # every other file on min/max stats alone
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2
        # and reading back with a point filter still matches
        back = spark.read.parquet(f"{tmp_path}/ev_sorted")
        uid = events.select("user_id").first()[0]
        assert back.where(F.col("user_id") == uid).count() == \
            events.where(F.col("user_id") == uid).count()


class TestRoundFourOperatorPlans:
    def test_range_search_broadcasts_probes_one_scan(self, spark):
        from ayeaye_spark.operators import similarity

        emb = load(spark, SF, "embeddings")
        q = similarity.cosine_range_search(
            emb, emb.where(F.col("vec_id") < 10), threshold=0.3
        )
        plan = physical_plan(q)
        # probes broadcast into a nested-loop over ONE corpus scan; no
        # shuffle at all (no window/top-k), no per-query repartition
        assert "BroadcastNestedLoopJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert plan.count("Scan parquet") <= 2  # corpus once + probe subset

    def test_repeated_spans_no_quadratic_stage(self, spark):
        from ayeaye_spark.operators.dedup import repeated_span_profile

        docs = load(spark, SF, "documents")
        q = repeated_span_profile(docs, "doc_id", "text", n=5)
        plan = physical_plan(q)
        # candidate volume is #duplicated-window occurrences joined on
        # the shingle hash — never an all-pairs product
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        # the per-doc interval union runs as a doc-partitioned window,
        # not a global single-partition sort
        assert "Exchange SinglePartition" not in plan

    def test_remove_repeated_spans_no_window_no_selfjoin(self, spark):
        from ayeaye_spark.operators.dedup import remove_repeated_spans

        docs = load(spark, SF, "documents")
        q = remove_repeated_spans(docs, "doc_id", "text", n=5)
        plan = physical_plan(q)
        # canonical occurrence + interval merge are AGGREGATES and a
        # per-row HOF fold — no window anywhere, no pair join, no
        # single-partition stage
        assert "WindowExec" not in plan and "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "Exchange SinglePartition" not in plan

    def test_prefix_jaccard_no_cross_join_and_bounded_scans(self, spark):
        from ayeaye_spark.operators.dedup import ngram_jaccard_pairs

        docs = load(spark, SF, "documents")
        q = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5,
                                method="prefix")
        plan = physical_plan(q)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        # prefixes and the set store are checkpointed: the Arrow shingle
        # stage must not be re-derived per self-join alias
        assert plan.count("mapInPandas") <= 1

    def test_correlation_matrix_single_aggregate_no_join(self, spark):
        from ayeaye_spark.operators.relational import correlation_matrix

        li = load(spark, SF, "lineitem")
        q = correlation_matrix(
            li, ["l_quantity", "l_extendedprice", "l_discount"], scale=100
        )
        plan = physical_plan(q)
        # ONE scan, one partial+final aggregate pair, pair explosion on
        # the 1-row result — no join, no window, no extra shuffle
        assert "Join" not in plan and "Window" not in plan
        assert plan.count("Scan parquet") == 1
        assert "Exchange hashpartitioning" not in plan

    def test_source_quality_filter_broadcasts_stats(self, spark):
        from ayeaye_spark.operators import text as textops

        docs = load(spark, SF, "documents")
        q = textops.source_quality_filter(
            docs, "text", "source", min_mean_ppm=645_000
        )
        plan = physical_plan(q)
        # the per-source aggregate (tiny) broadcasts back; the corpus is
        # never shuffled for the join
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestIvfPqPersistedSearchPlan:
    def test_search_reads_codes_not_corpus_vectors(self, spark, tmp_path):
        """ivfpq_search over a PERSISTED code table: the corpus-side
        parquet scan must read only (id, cell, block, code) — the
        embedding column appears exclusively in the tiny query/centroid
        scans.  This is the whole point of PQ at scale."""
        from ayeaye_spark.operators import similarity

        emb = load(spark, SF, "embeddings")
        coarse = emb.where("vec_id % 50 = 0")
        codebook = emb.where(F.col("vec_id") < 16)
        codes_path = str(tmp_path / "codes")
        similarity.ivfpq_encode(
            emb, coarse=coarse, codebook=codebook
        ).write.parquet(codes_path)

        q = similarity.ivfpq_search(
            spark.read.parquet(codes_path),
            emb.where(F.col("vec_id") < 10),
            coarse=coarse, codebook=codebook,
        )
        plan = physical_plan(q)
        codes_scans = [
            seg.split("ReadSchema: ")[1][:200]
            for seg in plan.split("Scan parquet")[1:]
            if "codes" in seg[:400]
        ]
        assert codes_scans, "expected a scan of the persisted codes table"
        for schema in codes_scans:
            assert "embedding" not in schema  # codes-only corpus side


class TestSessionFourOperatorPlans:
    """Plan shapes of the newest curation operators: distributed prefix
    sums stay multi-partition, bucket joins stay non-cartesian, scans
    stay single-pass."""

    def _no_full_row_single_partition(self, plan: str):
        for seg in plan.split("Exchange SinglePartition")[1:]:
            assert "HashAggregate" in seg[:400], seg[:400]

    def test_seeded_shuffle_no_global_window(self, spark):
        from ayeaye_spark.operators import sampling

        docs = load(spark, SF, "documents").select("doc_id")
        plan = physical_plan(sampling.seeded_shuffle(docs, "doc_id", seed="s"))
        assert "hashpartitioning(_cb" in plan  # parallel per-bucket window
        self._no_full_row_single_partition(plan)

    def test_domain_mix_no_per_source_partition_funnel(self, spark):
        from ayeaye_spark.operators import sampling

        docs = load(spark, SF, "documents").select(
            "doc_id", "source", F.col("n_chars").alias("toks")
        )
        plan = physical_plan(
            sampling.domain_mix_budget(
                docs, group_col="source", id_col="doc_id", token_col="toks",
                weights={"src0": 500, "src1": 500},
            )
        )
        # the big window is keyed on (source, bucket), never source alone
        assert "hashpartitioning(source" in plan
        assert "_cb" in plan
        self._no_full_row_single_partition(plan)

    def test_semantic_dedup_is_bucket_join_not_cartesian(self, spark):
        from ayeaye_spark.operators import similarity

        emb = load(spark, SF, "embeddings")
        plan = physical_plan(
            similarity.semantic_dedup_pairs(
                emb, emb.where(F.col("vec_id") % 50 == 0), threshold=0.4
            )
        )
        assert "CartesianProduct" not in plan
        assert "centroid_id" in plan  # equi-join key is the cell

    def test_merge_upsert_no_cartesian_one_anti_join(self, spark):
        from ayeaye_spark.operators.scd import merge_upsert

        cust = load(spark, SF, "customer").select("c_custkey", "c_name")
        upd = cust.where(F.col("c_custkey") % 10 == 3)
        plan = physical_plan(merge_upsert(cust, upd, key="c_custkey"))
        assert "CartesianProduct" not in plan
        assert "LeftAnti" in plan

    def test_gopher_flags_single_scan_no_shuffle(self, spark):
        from ayeaye_spark.operators import text as textops

        docs = load(spark, SF, "documents").select("doc_id", "text")
        plan = physical_plan(textops.with_gopher_flags(docs, "text"))
        # r12: a single small-input fan-out (round-robin, no key) is the
        # ONLY allowed exchange — it widens the compute-heavy token/HOF
        # chain past the one-split scan and is a no-op once the input
        # has >= defaultParallelism files (see operators/fanout.py).
        # What must never appear is a KEY shuffle (hashpartitioning) —
        # the profile itself stays aggregation- and join-free.
        assert "hashpartitioning" not in plan
        assert plan.count("Exchange") <= 1
        if "Exchange" in plan:
            assert "RoundRobinPartitioning" in plan
        assert plan.count("FileScan") == 1


class TestDepartitionedWindows:
    """Round-5 rewrites: the low-cardinality window family must not put
    a whole language/segment/corpus into one task."""

    def test_midspread_no_per_language_row_sort(self, spark):
        import re

        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["docs_length_midspread"](spark, SF))
        # no row_number partitioned by lang alone (the value would be
        # the ORDER col, i.e. carry ASC/DESC) ...
        assert not re.search(
            r"row_number\(\) windowspecdefinition\(lang#\d+, ntok#\d+L? (ASC|DESC)",
            plan,
        )
        # ... the tie-rank window is keyed by (lang, bucket) — bucket
        # cardinality, not language cardinality
        assert re.search(
            r"row_number\(\) windowspecdefinition\(lang#\d+, _bkt#\d+L?,",
            plan,
        )

    def test_percentile_no_per_language_row_sort(self, spark):
        import re

        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["docs_quality_percentile_by_lang"](spark, SF))
        assert not re.search(
            r"row_number\(\) windowspecdefinition\(lang#\d+, quality_ppm#\d+L? (ASC|DESC)",
            plan,
        )
        assert re.search(
            r"row_number\(\) windowspecdefinition\(lang#\d+, _bkt#\d+L?,",
            plan,
        )

    def test_activity_deciles_has_no_ntile_window(self, spark):
        import re

        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["events_user_activity_deciles"](spark, SF))
        assert "ntile" not in plan.lower()
        # every window runs over the count HISTOGRAM (ordered by
        # n_events) — never over per-user rows
        assert not re.search(r"windowspecdefinition\(user_id", plan)

    def test_deciles_by_type_has_no_per_type_ntile(self, spark):
        import re

        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["events_deciles_by_type"](spark, SF))
        assert "ntile" not in plan.lower()
        # the per-row rank window is keyed by (event_type, floor-bucket),
        # never event_type alone
        assert not re.search(
            r"row_number\(\) windowspecdefinition\(event_type#\d+, value#\d+ (ASC|DESC)",
            plan,
        )
        assert re.search(
            r"row_number\(\) windowspecdefinition\(event_type#\d+, _bkt#\d+L?,",
            plan,
        )

    def test_vocab_top50_merges_partial_survivors(self, spark):
        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["doc_vocabulary_top50"](spark, SF))
        # global top-k must go partial-per-partition first: the merge
        # window only ever sees <= k*P survivors
        assert "_pid" in plan

    def test_top3_partial_limit_before_shuffle(self, spark):
        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["top3_orders_per_segment"](spark, SF))
        # partial stage ranks within (segment, input partition) ...
        assert "_pid" in plan
        # ... and Spark 4's rank-limit pushdown caps rows BEFORE each
        # exchange, so the merge never sorts a whole segment
        assert "WindowGroupLimit" in plan and "Partial" in plan

    def test_sq8_candidate_shuffle_is_rank_limited(self, spark):
        """SQ8 ANN: the candidate frame is corpus x queries — only a
        WindowGroupLimit(Partial) BEFORE the query_id exchange keeps
        the shuffle bounded at n_queries * partitions * (k*rerank)
        instead of corpus-sized.  Bounds + query set must broadcast."""
        from ayeaye_spark.catalog import QUERIES

        plan = physical_plan(QUERIES["ann_topk_sq8"](spark, SF))
        assert "WindowGroupLimit" in plan and "Partial" in plan
        assert "BroadcastExchange" in plan
        # exactly one data shuffle: the rank-limited candidate rows
        # (the 1-row bounds aggregate's SinglePartition is metadata)
        assert plan.count("Exchange hashpartitioning") == 1


class TestRuntimeBloomFilter:
    """Spark's native runtime row-level filtering: a selective dim-side
    predicate grows a bloom filter that prunes the fact scan BEFORE the
    join shuffle — the built-in version of the classic 100 TB
    'semi-join reduction' pattern (no hand-rolled bloom needed)."""

    def test_bloom_filter_injected_for_selective_join(self, spark):
        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            li = load(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
            o = load(spark, SF, "orders").where("o_totalprice > 400000").select("o_orderkey")
            j = li.join(o, li.l_orderkey == o.o_orderkey)
            plan = physical_plan(j)
            assert "bloom_filter_agg" in plan      # built on the selective side
            assert "BloomFilterMightContain" in plan or "might_contain" in plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestZOrderLayout:
    """Morton-key clustered writes tighten per-file min/max envelopes on
    BOTH interleaved dimensions — the data-skipping property a
    single-column sort only delivers for its one column."""

    def _file_spreads(self, path, col):
        import glob

        import pyarrow.parquet as pq

        spreads = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats = [
                md.row_group(rg).column(i).statistics
                for rg in range(md.num_row_groups)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            ]
            spreads.append(max(s.max for s in stats) - min(s.min for s in stats))
        return spreads

    def test_zorder_write_clusters_both_dims(self, spark, tmp_path):
        from ayeaye_spark.catalog import QUERIES

        keyed = QUERIES["lineitem_zorder_keys"](spark, SF)
        (keyed.repartitionByRange(8, "zkey")
              .sortWithinPartitions("zkey")
              .write.parquet(f"{tmp_path}/z"))
        # single-dim baseline: range-sorted by orderkey only
        (keyed.repartitionByRange(8, "l_orderkey")
              .sortWithinPartitions("l_orderkey")
              .write.parquet(f"{tmp_path}/o"))

        stats = keyed.agg(
            F.max("l_orderkey"), F.min("l_orderkey"),
            F.max("l_suppkey"), F.min("l_suppkey"),
        ).first()
        ospread = stats[0] - stats[1]
        sspread = stats[2] - stats[3]

        z_o = self._file_spreads(f"{tmp_path}/z", "l_orderkey")
        z_s = self._file_spreads(f"{tmp_path}/z", "l_suppkey")
        base_s = self._file_spreads(f"{tmp_path}/o", "l_suppkey")
        # both dims cluster under the z-key...
        assert sum(z_o) / len(z_o) <= 0.6 * ospread
        assert sum(z_s) / len(z_s) <= 0.6 * sspread
        # ...while the single-column sort leaves the second dim unclustered
        assert sum(base_s) / len(base_s) > 0.9 * sspread
