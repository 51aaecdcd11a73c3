#!/usr/bin/env python
"""Regenerate PLANS.md: executed-plan evidence for the headline queries.

For each query: run it (so AQE finalizes), then record the
machine-extracted plan facts (join strategies, exchange count, scans
with pushed filters + read schemas, codegen) and a one-line read on why
that shape survives a 100 TB scale-up.  The facts come from the live
``executedPlan`` — this document cannot drift from the code without
being regenerated.

Usage: python scripts/dump_plans.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ayeaye_spark.catalog import QUERIES  # noqa: E402
from ayeaye_spark.core.session import get_spark  # noqa: E402
from ayeaye_spark.plans.introspect import plan_summary  # noqa: E402

# query -> why this plan shape is the one you want at 100 TB
HEADLINE = {
    "q1_pricing_summary": (
        "single scan -> partial agg -> one exchange on the group key -> final agg; "
        "scan reads only the 7 needed columns and the shipdate filter is pushed."
    ),
    "q5_region_nation_revenue": (
        "dimension chain (region/nation/supplier/customer) broadcasts; only the "
        "lineitem-orders join shuffles, keyed on orderkey."
    ),
    "q18_large_orders": (
        "semi-join from the having-clause aggregate routes through a shuffle once; "
        "AQE picks broadcast for the small filtered side."
    ),
    "q21_waiting_supplier": (
        "anti+semi joins on the same key reuse one exchange; nation broadcast."
    ),
    "top3_orders_per_segment": (
        "partial+merge top-k: rank within (segment, input partition), then "
        "merge <= k*P survivors per segment; WindowGroupLimit caps rows "
        "before every exchange — no whole-segment single-task sort."
    ),
    "events_trailing_hour_counts": (
        "RANGE interval frame over (user_id, ts) — one shuffle on user_id, "
        "scan pruned to 3 columns."
    ),
    "events_distinct_users_exact": (
        "two-stage distinct aggregate: first shuffle carries distinct "
        "(event_type, user_id) pairs, not rows."
    ),
    "dedup_minhash_lsh_pairs": (
        "one Arrow signature pass, banded bucket shuffle on uniform hash keys, "
        "bucket-size cap routes mega-buckets to a streamed self-join."
    ),
    "ann_topk_brute": (
        "queries broadcast; corpus scanned once; only (query, candidate) rows "
        "shuffle for the final top-k."
    ),
    "docs_token_budget": (
        "two-phase distributed prefix sum (no single-partition window); budget "
        "cut drops whole buckets before the shuffle."
    ),
    "decontaminate_splits": ("eval-side (small by contract) broadcasts; corpus scans once."),
    "docs_weighted_quality_by_lang": (
        "grouped-agg pandas UDF: one shuffle on lang; quality computed in the "
        "same scan-side projection."
    ),
    "events_salted_type_counts": (
        "two-stage salted aggregate: stage 1 shuffles on (key, salt) — uniform "
        "even when the key is hot; stage 2 combines 16 partials per key."
    ),
    "customer_segment_scd2": (
        "SCD2 merge without Delta: anti-join + union + one lead() window — a "
        "single shuffle on the dimension key, linear in |current|+|updates|."
    ),
    "dedup_minhash_blocked_pairs": (
        "language folds into the band key, so cross-language candidates never "
        "co-shuffle; bucket sizes stay uniform on multilingual corpora."
    ),
    "ann_topk_ivfpq": (
        "IVF-PQ: one scan assigns cells + encodes residuals; search joins "
        "the probed cells' code rows to the broadcast query table — "
        "nprobe/n_cells of the corpus touched, codes only."
    ),
    "events_hourly_gapfill_lerp": (
        "per-group spine explode (bounded per group), two ignore-nulls "
        "windows over one (group, ts) shuffle, fixed-order IEEE lerp."
    ),
    "events_value_mad_outliers": (
        "both medians picked as elements via the (type, value-bucket) "
        "histogram rank — no per-type single-task sort; the tiny median "
        "frames broadcast back onto one deviation scan."
    ),
    "orders_median_price": (
        "exact middle-element median per priority on the histogram rank "
        "plan — the per-priority window would sort the whole orders table "
        "in ~5 tasks at 100x."
    ),
    "ann_topk_pq": (
        "PQ: broadcast codebook, one corpus scan to m code rows, per-(vec, "
        "block) argmax window over ks rows; ADC joins codes to the broadcast "
        "query table — original vectors never read at search time."
    ),
    "dedup_containment_pairs": (
        "inverted-index equi-join on the shingle hash; pair-keyed count = "
        "exact intersection; no cross join."
    ),
    "dedup_prefix_jaccard_pairs": (
        "lossless prefix-filter join: df-ordered prefixes (checkpointed "
        "once, both aliases) equi-join with a length predicate, positional "
        "filter via one pair-keyed min aggregate, exact verify against the "
        "full sets; no window, no cross join."
    ),
    "docs_remove_repeated_spans": (
        "codegen token/shingle projection checkpointed once; hash-keyed "
        "duplicate + canonical-occurrence aggregates (per-key linear); "
        "per-doc interval fold + higher-order filter rewrite — no corpus "
        "window, no self-join."
    ),
    "docs_tfidf_cosine_pairs": (
        "inverted-index dot product on shared term hashes (exact decimal "
        "sums), squared-norm joins; final correctly-rounded double expr "
        "only — no log, no float aggregation."
    ),
    "pipeline_curation_v2": (
        "source cut (broadcast per-source agg) -> span trim over survivors "
        "(hash-keyed shingle agg + semi-join) -> per-language rank windows."
    ),
    "docs_repeated_spans": (
        "positional shingle pass (Arrow, checkpointed once), hash-keyed "
        "duplicate-shingle aggregate + semi-join back (candidate volume = "
        "duplicated-window occurrences, never pairs), per-doc window for the "
        "interval union."
    ),
    "ann_range_search": (
        "probes broadcast into a nested-loop over ONE corpus scan; no window, "
        "no hash shuffle at all — matches emit straight from the filter."
    ),
    "dedup_simhash60_near_pairs": (
        "60-bit fingerprint, 4 x 15-bit pigeonhole bands: 32768 chunk keys per "
        "band keep bucket occupancy n/32768 where the 32-bit variant's 8-bit "
        "chunks would go quadratic; exact bit_count(xor) verify after the "
        "chunk-key join."
    ),
    "docs_source_quality_filter": (
        "per-source aggregate (#sources rows) broadcasts back onto a second "
        "scoring scan; the corpus is never shuffled."
    ),
    "docs_tfidf_top_terms": (
        "explode -> map-side-combined (doc, term) counts, term-df aggregate "
        "hash-joined back (vocabulary not force-broadcast), per-doc top-k "
        "window."
    ),
    "orders_monthly_gapless": (
        "recursive CTE generates the month spine (depth = #months, tiny); the "
        "stop bound rides in the recursion row so no per-iteration re-scan of "
        "orders; the count join/aggregate are ordinary distributed ops."
    ),
    "dedup_semantic_pairs": (
        "one vectorized cell-assignment scan (centroids broadcast), then a "
        "hash-shuffled self-join keyed on the cell id — candidate volume is "
        "sum(|cell|^2), never |corpus|^2."
    ),
    "customer_upsert_merge": (
        "MERGE INTO shape: one anti-join shuffle on the key + union; the "
        "update side is the small one and AQE broadcasts it."
    ),
    "docs_seeded_shuffle": (
        "md5 shuffle key computed in the scan projection; exact positions via "
        "the two-phase prefix sum over 65536 contiguous key-prefix buckets — "
        "no single-partition window anywhere."
    ),
    "docs_domain_mix": (
        "per-domain running sums keyed on (source, id-bucket) — a plain "
        "PARTITION BY source window would funnel each domain through one "
        "partition; the per-(source,bucket) totals frame is tiny."
    ),
    "docs_gopher_filter": (
        "pure scan + project: every rule is an integer-ppm expression over "
        "one materialized token array; no shuffle, no second tokenization."
    ),
    "docs_url_dedup": (
        "canonicalization is one chained regex projection in the scan; the "
        "only shuffle is the hash aggregate keyed on the canonical URL — "
        "uniform, high-cardinality keys at any corpus size."
    ),
    "docs_html_extract": (
        "whole extraction (comment/script strip, tag rule, entity decode, "
        "link density) is ONE codegen'd scan projection; zero exchanges."
    ),
    "docs_source_overlap": (
        "inverted-index shape: distinct (source, gram-hash) then a gram-keyed "
        "self-join — never doc-all-pairs; the ubiquity cap filters grams "
        "BEFORE the pair join so boilerplate can't fan out quadratically."
    ),
    "docs_domain_link_edges": (
        "href harvest + host resolution in the scan projection; explode is "
        "output-sized (one row per link) and self-edges drop before the "
        "only shuffle, the (src,dst)-keyed count."
    ),
    "docs_crawl_delta": (
        "each snapshot collapses to one row per canonical URL (map-side "
        "combined min-fingerprint), then ONE full outer join on the URL "
        "key; both inputs are scan+project before their aggregates."
    ),
    "docs_crawl_plan": (
        "host-keyed page count + one small per-host delay join; the robots "
        "parse window is bounded by file size (a robots.txt is ~100 lines), "
        "never corpus cardinality."
    ),
    "media_decode_report": (
        "one file per task (binaryFile), Arrow-batched mapInPandas pixel "
        "decode (integer-exact kernel), one window over the 64-bit dHash "
        "key for dup grouping — the identical plan at 10^9 images; no "
        "driver funnel, no per-row Python UDF."
    ),
    "media_audio_quality": (
        "one file per task (binaryFile), Arrow-batched mapInPandas integer "
        "PCM decode, then a narrow all-integer projection — NO shuffle at "
        "all; at 10^8 clips the cost is one decode pass, embarrassingly "
        "parallel."
    ),
    "media_scene_cuts": (
        "one clip per task (binaryFile), Arrow-batched demux+hash, then a "
        "window partitioned BY CLIP (per-clip frame counts bound the state "
        "— never a global sort); hamming is two JVM bit ops in the "
        "projection."
    ),
    "warc_crawl_curation": (
        "archives parse one-per-task (binaryFile), the robots gate joins "
        "pages to per-host rules on the host key (rules bounded by file "
        "size), the dedup is one hash aggregate on the canonical URL — at "
        "100 TB the scan parallelism is the archive count and nothing "
        "funnels to a single task."
    ),
    "docs_robots_compliance": (
        "robots parse windows are per-host and bounded by FILE size, never "
        "corpus size; pages join the small per-host rule set on the host "
        "key and the per-row anchored regex match runs in the join "
        "projection; the winner pick is one integer max aggregate."
    ),
    "events_trailing_7d": (
        "RANGE interval frame (value-based, tie-deterministic) over "
        "(user_id, ts) — one shuffle on user_id; decimal-cast running sum "
        "stays exact."
    ),
    "events_funnel_conversion": (
        "ordered view→click→purchase funnel as three chained map-side-"
        "combined MIN aggregates — no per-user sequence materialization, "
        "each stage shrinks the carried row set."
    ),
    "events_top_paths": (
        "sorted-struct path aggregation (partition-order-independent), then "
        "a map-side-combined path count; two hash shuffles total."
    ),
    "ann_ivf_recall": (
        "both sides reuse the library operators (one corpus scan each, "
        "queries broadcast); the recall join touches 50 candidate rows."
    ),
    "lineitem_zorder_keys": (
        "max-bounds frame is one broadcast row; the Morton key is pure "
        "projection arithmetic — the expensive part (clustered write) is a "
        "range partition on the key, tested in TestZOrderLayout."
    ),
    "docs_bm25_topk": (
        "one tokenization scan into a narrow (id, dl, tf*) frame; dfs and "
        "corpus totals are single-row broadcasts, scoring is per-row integer "
        "math, and the top-k is TakeOrderedAndProject — no wide shuffle "
        "anywhere."
    ),
    "parts_copurchase_triangles": (
        "degree-ordered orientation bounds wedge fan-out at O(sqrt(E)) per "
        "vertex on any degree skew; every join keys on a vertex id, the "
        "closing check is a semi-join."
    ),
    "orders_pareto_frontier": (
        "per-date max collapses the corpus before the only ordered window, "
        "which therefore sees one row per distinct date (attribute-bounded, "
        "never corpus-bounded); frontier joins back by hash."
    ),
    "docs_chunk_sequences": (
        "scan → one tokenization → explode of the chunk-index sequence; "
        "fan-out ≈ n/step with data in place, no shuffle at all."
    ),
    "events_kanonymity_audit": (
        "two map-side-combined aggregates; the distinct stage shuffles "
        "(cell, user) pairs, never raw events."
    ),
    "orders_table_profile": (
        "single aggregate row computes every column's nulls/distincts/min/max "
        "in ONE scan (the oracle's per-column UNION is the shape avoided); "
        "stack() explodes the tiny row."
    ),
    "orders_expectations": (
        "all rule predicates fold into one map-side-combined aggregate over "
        "one scan; adding a rule adds a column, not a pass."
    ),
    "customer_merge_diff": (
        "null-safe full outer join on the key — output proportional to the "
        "churn; unchanged keys drop in the same stage."
    ),
    "events_user_skew_report": (
        "the only real shuffle carries one row per distinct key; the report "
        "reductions run over that count frame."
    ),
    "events_incremental_daily_value": (
        "history is the persisted aggregate, never rescanned; the merge "
        "re-aggregates prev ∪ increment-partial — shuffle proportional to "
        "churn, decimal sums keep it exact."
    ),
    "docs_hashed_classifier_score": (
        "fastText-style hashed linear classifier: the weight table (~dim "
        "rows, trained offline) broadcast-joins the exploded feature stream; "
        "one tokenization, one map-side-combined per-doc aggregate."
    ),
    "pipeline_curation_v3": (
        "Gopher rules + hashed classifier + semantic dedup survivor chained "
        "as ONE lazy plan — three filters and a dedup with no intermediate "
        "materialization."
    ),
    "dedup_method_agreement": (
        "two banded candidate generators feed one full outer join; the "
        "report is 3 rows."
    ),
    "docs_gopher_vectorized": (
        "one Arrow pass per document computes every rule from a single "
        "tokenization; bit-equal to the expression path (shared oracle)."
    ),
    "docs_weighted_sample": (
        "systematic PPS over cumulative integer weights via the distributed "
        "prefix sum — float-free, so the selection is engine- and "
        "partitioning-exact."
    ),
    "events_burst_detection": (
        "trailing RANGE frame over the hourly aggregate (types × hours "
        "rows), never raw events; BIGINT product before the double divide."
    ),
    "customer_rfm_segments": (
        "fixed-band RFM: one group-by shuffle on the customer key; the "
        "anchor date is a one-row broadcast."
    ),
    "brand_market_basket": (
        "basket self-join keyed on the ORDER — pair fan-out bounded by "
        "basket size squared, never table size."
    ),
    "customer_pareto_80": (
        "per-customer cents aggregate, running total via the bucketed "
        "two-phase prefix sum (bucket = revenue magnitude) — never a "
        "single-partition window over 1e9 customers; totals broadcast."
    ),
    "customer_spend_quartiles_exact": (
        "histogram locate-then-sort quantiles over the DERIVED per-customer "
        "aggregate; the only sort touches the located bucket, and the "
        "integer cents cast back to BIGINT losslessly (< 2^53)."
    ),
    "dedup_degree_histogram": (
        "pair degrees from the banded candidate pass, then two map-side-"
        "combined aggregates — the report never rejoins the corpus."
    ),
    "docs_lang_confusion": (
        "declared-vs-detected confusion matrix: one scoring scan, one "
        "map-side-combined (declared, detected) count — #langs^2 rows out."
    ),
    "docs_token_counts_arrow": (
        "mapInArrow token counting: constant-width columns cross the Python "
        "boundary, scan pruned to (doc_id, text), no shuffle."
    ),
    "docs_vocab_growth": (
        "token->first-doc via one hash-keyed MIN aggregate, first-appearance "
        "counts per doc, then the distributed two-phase prefix sum — "
        "'distinct so far' with no corpus-wide single-partition window."
    ),
    "emb_label_cohesion": (
        "per-label anchor frame (#labels rows) broadcasts; one corpus scan "
        "computes the fold-order-exact cosine; integer ppm out."
    ),
    "events_conversion_time_stats": (
        "two map-side-combined MIN aggregates chained by one join on "
        "user_id; integer-microsecond gaps, one row out."
    ),
    "events_diurnal_profile": (
        "hour-of-day extraction in the scan projection feeding one "
        "map-side-combined aggregate — 24 x #types rows out."
    ),
    "events_rolling_active_users": (
        "day-level distinct pairs first (shuffle carries (day, user), not "
        "events), then the 7-day window runs over the tiny day frame."
    ),
    "events_user_activity_deciles": (
        "NTILE eliminated: per-decile aggregates computed from the "
        "activity-count histogram (ties interchangeable) — the only ordered "
        "window runs over one row per DISTINCT count, no per-user window."
    ),
    "events_deciles_by_type": (
        "per-row NTILE without the per-type window: exact rank on the "
        "(type, floor(value)) histogram plan, then NTILE's closed form on "
        "(rank, n) — ~5 types never become 5 single-task sorts."
    ),
    "doc_vocabulary_top50": (
        "global top-k via partial+merge: rank within each input partition "
        "first, merge <= k*P survivors — the vocabulary count frame (huge "
        "at 100 TB) never funnels through one task."
    ),
    "docs_length_midspread": (
        "rank = histogram prefix (window over distinct (lang, ntok) rows) + "
        "tie position keyed by (lang, ntok) — no per-language single-task "
        "sort; band filter is integer rank arithmetic."
    ),
    "docs_quality_percentile_by_lang": (
        "same histogram-rank plan keyed on (lang, quality_ppm); the "
        "per-language totals broadcast back — percentile is exact integer "
        "ppm with no per-language sort."
    ),
    "orders_basket_size_histogram": (
        "per-order count then count-of-counts — both map-side-combined; "
        "the second aggregate's input is one row per order."
    ),
    "part_type_rollup": (
        "ROLLUP over derived split_part dimensions — partial aggregates "
        "per grouping set, one exchange, no re-scan per level."
    ),
    "supplier_region_balance_rollup": (
        "supplier->nation->region dimension chain broadcasts; ROLLUP "
        "aggregates ride one exchange over the fact side."
    ),
    "emb_kmeans_clusters": (
        "Lloyd's with k*d driver state: per iteration one vectorized "
        "assignment scan (centroids shipped) + one k*d-row exact-decimal "
        "mean aggregate — the corpus is scanned, never shuffled wide."
    ),
    "emb_cluster_balanced_sample": (
        "k-means assignment, then per-cluster cap via the histogram rank "
        "over an md5 hash prefix — deterministic draw, no per-cluster "
        "single-task sort."
    ),
    "events_stream_cdc_upsert": (
        "foreachBatch CDC-apply: per-batch last-writer dedupe + "
        "max-order merge against the serving table, staging write + "
        "guarded rename swap; the returned frame is the served table."
    ),
    "docs_repetition_flags": (
        "duplicate-line / duplicate-5-gram ratios from one explode per "
        "granularity, each re-aggregated by doc_id — shuffle keys are "
        "(doc, line-hash) pairs, never a cross-document join."
    ),
    "docs_dsir_importance": (
        "hashed-unigram DSIR: token stream keyed into 1024 buckets "
        "(map-side combined), the 1024-row weight table broadcasts back "
        "onto the stream; corpus totals are one-row broadcasts."
    ),
    "docs_rare_token_stats": (
        "token->corpus-count frame shuffles once on the token hash, then "
        "broadcast-tags the rare set; per-doc stats are one map-side-"
        "combined aggregate."
    ),
    "docs_quality_retention_curve": (
        "threshold sweep without rescans: one per-score-bucket aggregate "
        "(<=1e6 integer ppm buckets), a reversed cumsum over that tiny "
        "frame, thresholds joined against it — corpus scanned exactly once."
    ),
    "docs_shared_ngram_ppm": (
        "eval-side 8-gram fingerprints broadcast (eval slice is small by "
        "construction); the train side streams once through the hash join "
        "— no train-x-train pair generation anywhere."
    ),
    "docs_heavy_hitter_tokens": (
        "two-pass Misra-Gries: bounded-state candidate generation per "
        "partition (no shuffle), then ONE verification scan where "
        "non-candidates fold into a single count bucket — the full "
        "vocabulary never shuffles, unlike the oracle's global GROUP BY."
    ),
    "events_salted_segment_join": (
        "hot fact keys (distributed heavy-hitter tag, never collected) "
        "spread over 8 salt buckets; dim hot rows replicated per salt — "
        "one scan per side, no single reducer owns a hot key."
    ),
    "events_cohort_retention": (
        "first-dates via one MIN aggregate keyed on user; the join back "
        "reuses the user partitioning; the distinct stage shuffles "
        "(cohort, offset, user) triples, never raw events."
    ),
    "docs_source_curation_funnel": (
        "three funnel stages (counts, Gopher passes, dedup survivors) as "
        "two map-side-combined aggregates plus one fingerprint-keyed "
        "survivor aggregate — no per-pair work, nothing collected."
    ),
    "docs_source_lang_pagerank": (
        "five unrolled iterations, each one rank-edge join (shuffle on "
        "src) + one map-side-combined SUM by dst; integer fixed-point "
        "makes the result partitioning-independent; lineage truncated "
        "per round."
    ),
    "events_hll_rollup_reaggregate": (
        "daily HLL sketches built once (constant size per cell), any "
        "coarser slice answered by sketch union — the fact table is "
        "never rescanned; exact twin joined for the audit."
    ),
    "ann_topk_random_projection": (
        "64->16 JL reduction as one per-row JVM expression pass (literal "
        "sign matrix, no Python, no shuffle); the reduced-space search "
        "reuses the broadcast-queries single-corpus-scan plan."
    ),
    "customer_name_typo_pairs": (
        "deletion-variant inverted index: len+1 variants per string, "
        "candidates from the variant equi-join (bucket-occupancy-bounded "
        "fan-out), exact levenshtein verify — never an all-pairs join."
    ),
    "lineitem_benford_audit": (
        "one 9-row map-side-combined digit aggregate over one pruned "
        "scan; the ppm window runs on the 9-row frame."
    ),
    "events_value_trend_by_type": (
        "regression as one aggregate: the normal-equation sums are "
        "map-side-combined per type; points never materialize, the "
        "slope math runs on #types rows."
    ),
    "ann_topk_sq8": (
        "one bounds scan collapses to a broadcast 1-row frame; the "
        "corpus-x-queries candidate frame is WindowGroupLimit(Partial)-"
        "capped BEFORE its only hashpartitioning exchange, so the "
        "shuffle carries k*rerank survivors per query, never the corpus."
    ),
    "docs_bigram_coherence": (
        "one tokenization into rolling hashes; per-(doc,bigram) counts "
        "collapse map-side, the two count frames join back on their "
        "hash keys — inverted-index equi-joins, no window anywhere."
    ),
    "docs_vocab_coverage": (
        "corpus -> token counts -> COUNT CLASSES; the only ordered "
        "window runs over the class histogram (bounded by distinct "
        "frequencies, never vocab or corpus) and the per-pct crossing "
        "is closed-form arithmetic on that frame."
    ),
    "docs_top_collocations": (
        "bigram counts collapse map-side; margins join back on their "
        "word keys; top-k is TakeOrderedAndProject (per-partition heap "
        "+ driver merge) — no global sort."
    ),
    "docs_bpe_apply_fixed": (
        "pure per-row string expressions (separator-join + one replace "
        "per merge rule): one scan, zero shuffle, whole-stage codegen."
    ),
    "docs_hash_collision_audit": (
        "explode -> token-keyed distinct (map-side combined) -> per-"
        "token hashes -> ONE global multi-distinct aggregate (Expand "
        "x3, partial/final); output is a single summary row."
    ),
    "dedup_minhash_estimate_quality": (
        "one checkpointed Arrow signature pass feeds the LSH pair "
        "generation AND both pair-side joins; the estimate/exact "
        "comparison is per-pair expressions + one global aggregate."
    ),
    "docs_crosscorpus_novelty": (
        "reference corpus collapses to its DISTINCT shingle vocabulary "
        "(vocabulary-sized, map-side combined); probe side equi-joins "
        "on the shingle hash; per-doc rollup — no document pairs."
    ),
    "docs_corpus_drift": (
        "both halves counted in ONE token-keyed aggregate (conditional "
        "sums); single-row totals broadcast back; DECIMAL(38,0) "
        "cross-multiplied L1 in one global sum."
    ),
    "docs_token_diversity": (
        "explode -> (doc, token-hash)-keyed count -> per-doc rollup; "
        "key cardinality grows with the corpus, never a window."
    ),
    "events_cusum_changepoints": (
        "daily rollup (map-side combined); running window over "
        "calendar-bounded per-type DAY partitions; top-1 via "
        "WindowGroupLimit before the exchange."
    ),
    "emb_norm_profile": (
        "per-row fold dot in whole-stage codegen; one partial/final "
        "summary aggregate — no shuffle wider than one row."
    ),
    "docs_tokenize_pack_shards": (
        "token ids + EOS in the scan projection; pack assignment via "
        "the two-phase bucketed prefix sum (no global window); one "
        "pack-keyed groupBy whose payload is budget-bounded."
    ),
    "docs_cluster_aware_split": (
        "fingerprint groups -> min-id keep set joined back; the LCG "
        "bucket split is a pure projection; leak check is a tiny "
        "broadcast cross join."
    ),
    "events_user_active_time": (
        "per-user interval union: both window passes (running max end, "
        "run-id prefix sum) share ONE exchange+sort on (user, s, e); "
        "partitions are per-user, never corpus-wide."
    ),
    "ann_ivf_recall": (
        "both sides reuse verified operators: one Arrow cell "
        "assignment feeds the IVF cell join; brute force is the "
        "broadcast-query corpus scan; recall is one pair-keyed left "
        "join + per-query rollup."
    ),
    "docs_readability": (
        "three counting expressions (sentences, words, vowel-run "
        "syllables) in ONE scan projection; per-row integer math, "
        "zero shuffles."
    ),
    "dedup_components_star": (
        "label-free CC: each half-round is one groupBy + one re-join "
        "on the SAME key over the edge list only (exchange reuse), no "
        "vertex-label table; convergence is a one-row fingerprint "
        "aggregate per round."
    ),
    "parts_copurchase_kcore": (
        "per peel round ONE vertex-keyed degree aggregate (map-side "
        "combined over the doubled edge list) + two anti-joins on a "
        "shrinking edge list; only the small frontier materializes."
    ),
    "ann_topk_matryoshka": (
        "broadcast queries x one corpus scan; candidate cosine reads "
        "only the first 16 coordinates (prefix slice — 4x less "
        "bandwidth); top-k windows run over candidate rows only, then "
        "the k*rerank shortlist pays the full-dim cosine."
    ),
    "docs_classifier_calibration": (
        "scorer = explode + broadcast weight join + per-doc rollup; "
        "NTILE bins come from the histogram-decomposed rank (ordered "
        "pass over one row per DISTINCT integer score); final frame is "
        "n_bins rows."
    ),
    "events_theta_audience_overlap": (
        "two-group sketch aggregate -> one-row wide frame; "
        "intersection/difference/estimates are scalar sketch ops on "
        "that single row; exact twin is one user-keyed rollup."
    ),
    "events_topk_sketch_rollup": (
        "daily accumulate states (map-side combined) -> month-keyed "
        "combine -> explode of 5-row estimates; the fact table is "
        "scanned once."
    ),
    "docs_temperature_mixture": (
        "one map-side-combined supply aggregate to #sources rows; "
        "isqrt weights + shares/allocations are arithmetic on that "
        "tiny frame with a single-row total broadcast back."
    ),
    "docs_heaps_curve": (
        "a type's first occurrence = one token-keyed min aggregate "
        "(map-side combined, no sort); per-prefix token totals a "
        "second map-side aggregate; the only window is the 10-row "
        "bucket grid."
    ),
    "emb_kmeans_quality": (
        "Lloyd loop (one scan + kxd aggregate per iteration) then ONE "
        "Arrow pass emitting (cluster, own-cos) per row — no corpus "
        "join; the kxk separation matrix is driver-side numpy."
    ),
    "docs_hybrid_rrf": (
        "two verified top-20 rankings (BM25 + dense cosine) full-outer "
        "joined on <=40 rows; integer-ppm RRF arithmetic; final top-10 "
        "is a TakeOrdered over the fused frame."
    ),
    "docs_langid_confusion": (
        "one scan into a (lang, lang_pred) cell aggregate (map-side "
        "combined, <= langs^2 cells); margins are joins on that tiny "
        "frame."
    ),
    "events_kll_quantile_rollup": (
        "daily KLL states (map-side combined) merge at month grain; "
        "any quantile answered from the stored state — fact table "
        "scanned once."
    ),
    "events_seasonal_naive_error": (
        "daily rollup (map-side combined) self-joined on (type, "
        "day-7) — <= days*types rows; integer sMAPE arithmetic."
    ),
    "dedup_threshold_sweep": (
        "one banded-LSH candidate pass verified once; the sweep is a "
        "single conditional aggregation (Expand) over the pair frame, "
        "unpivoted with stack."
    ),
    "brand_association_rules": (
        "basket self-join keyed on the ORDER (fan-out bounded by "
        "basket size^2); margins + order total are tiny joins after "
        "the pair count; lift is floor-compounded integer ppm."
    ),
    "docs_code_switch": (
        "one explode scan with per-sentence lang expressions in "
        "codegen; ONE (doc, lang) aggregate; dominant pick is a "
        "window over <= #langs rows per doc."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump_plans")
    lines = [
        "# PLANS — executed-plan evidence for the headline queries",
        "",
        f"Auto-generated by `scripts/dump_plans.py` at `{sf_dir}` "
        "(facts extracted from the live `executedPlan` AFTER an action, so "
        "AQE decisions are final). Regenerate after plan-affecting changes.",
        "",
    ]
    for name, why in HEADLINE.items():
        df = QUERIES[name](spark, sf_dir)
        # an action on the frame ITSELF finalizes its AQE plan (a sink
        # write executes a different queryExecution); headline results
        # are small at gate scale, so collect is safe
        df.collect()
        s = plan_summary(df)
        scans = "; ".join(
            f"{sc['format']}[{', '.join(sc['columns'][:8])}]"
            + (f" pushed=[{sc['pushed_filters'][:90]}]" if sc["pushed_filters"] else "")
            for sc in s["scans"]
        )
        lines += [
            f"## {name}",
            "",
            f"*100 TB shape:* {why}",
            "",
            f"- joins: {', '.join(s['joins']) or 'none'}",
            f"- exchanges: {s['n_exchanges']} ({', '.join(sorted(set(s['exchange_kinds']))) or '-'})"
            + (f", {s['n_reused_exchanges']} reused" if s["n_reused_exchanges"] else ""),
            f"- scans: {scans or 'none (derived frames)'}",
            f"- whole-stage codegen: {s['whole_stage_codegen']}",
            "",
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
