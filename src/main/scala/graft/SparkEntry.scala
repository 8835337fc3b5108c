package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Events, Extensions, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2; the
  * matching `oracleSql` is ANSI SQL DuckDB runs over the same parquet
  * tables. Column names and types are aligned on both sides (the driver
  * sorts columns by name and hash-compares values; DuckDB's wider default
  * types — BIGINT row_number, HUGEINT sum(int) — are cast down to Spark's
  * in the SQL).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg,
    "q2_filter_project" -> Relational.q2FilterProject,
    "q3_join_agg" -> Relational.q3JoinAgg,
    "q4_semi_join" -> Relational.q4SemiJoin,
    "q5_anti_join" -> Relational.q5AntiJoin,
    "q6_selective_agg" -> Relational.q6SelectiveAgg,
    "q7_topk_per_group" -> Relational.q7TopKPerGroup,
    "q8_window_analytic" -> Relational.q8WindowAnalytic,
    "q9_top_n" -> Relational.q9TopN,
    "q10_set_ops" -> Relational.q10SetOps,
    "q11_distinct_agg" -> Relational.q11DistinctAgg,
    "q12_rollup" -> Relational.q12Rollup,
    "q13_cube" -> Relational.q13Cube,
    "q14_scalar_funcs" -> Relational.q14ScalarFuncs,
    "q15_having" -> Relational.q15Having,
    "q16_conditional_agg" -> Relational.q16ConditionalAgg,
    "q17_avg_compare_join" -> Relational.q17AvgCompareJoin,
    "q18_star_join" -> Relational.q18StarJoin,
    "q19_union_all" -> Relational.q19UnionAll,
    "q20_grouping_sets" -> Relational.q20GroupingSets,
    "q21_asof_join" -> Events.q21AsOfJoin,
    "q22_range_join" -> Events.q22RangeJoin,
    "q23_hourly_agg" -> Events.q23HourlyAgg,
    "q24_json_extract" -> Events.q24JsonExtract,
    "q25_sessionize" -> Events.q25Sessionize,
    "q26_scalar_subquery" -> Relational.q26ScalarSubquery,
    "q27_string_agg" -> Relational.q27StringAgg,
    "q28_pivot" -> Relational.q28Pivot,
    "q29_explode_tokens" -> Relational.q29ExplodeTokens,
    "q30_left_outer" -> Relational.q30LeftOuter,
    "q31_in_subquery" -> Relational.q31InSubquery,
    "q32_percentiles" -> Relational.q32Percentiles,
    "q33_cross_join" -> Relational.q33CrossJoin,
    "q34_full_outer" -> Relational.q34FullOuter,
    "q35_except_all" -> Relational.q35ExceptAll,
    "q36_date_arith" -> Relational.q36DateArith,
    "q37_regexp" -> Relational.q37Regexp,
    "q38_range_frame" -> Relational.q38RangeFrame,
    "q39_lateral" -> Relational.q39Lateral,
    "q40_recursive_spine" -> Relational.q40RecursiveSpine,
    "q41_recursive_tree" -> Relational.q41RecursiveTree,
    "x1_dedup_exact" -> Extensions.x1DedupExact,
    "x2_dedup_fingerprint" -> Extensions.x2DedupFingerprint,
    "x3_jaccard_pairs" -> Extensions.x3JaccardPairs,
    "x4_minhash_pairs" -> Extensions.x4MinHashPairs,
    "x5_simhash_pairs" -> Extensions.x5SimHashPairs,
    "x6_embedding_neardup" -> Extensions.x6EmbeddingNearDup,
    "x7_knn_bruteforce" -> Extensions.x7KnnBruteForce,
    "x8_knn_lsh" -> Extensions.x8KnnLsh,
    "x9_text_stats" -> Extensions.x9TextStats,
    "x10_langid" -> Extensions.x10LangId,
    "x11_quality" -> Extensions.x11Quality,
    "x12_fingerprint" -> Extensions.x12Fingerprint,
    "x13_multimodal" -> Extensions.x13Multimodal,
    "x14_neardup_lsh" -> Extensions.x14NearDupLsh,
    "x15_approx_distinct" -> Extensions.x15ApproxDistinct,
    "x16_frequent_tokens" -> Extensions.x16FrequentTokens,
    "x17_knn_ivf" -> Extensions.x17KnnIvf,
    "x18_winnow_pairs" -> Extensions.x18WinnowPairs,
    "x19_pipeline_stats" -> Extensions.x19PipelineStats,
    "x20_dedup_clusters" -> Extensions.x20DedupClusters,
    "x21_hash_split" -> Extensions.x21HashSplit,
    "x22_shard_assign" -> Extensions.x22ShardAssign,
    "x23_label_centroids" -> Extensions.x23LabelCentroids,
    "x24_tfidf" -> Extensions.x24TfIdf,
    "x25_bm25" -> Extensions.x25Bm25,
    "x26_stratified_sample" -> Extensions.x26StratifiedSample,
    "x27_inverted_index" -> Extensions.x27InvertedIndex,
    "x28_length_histogram" -> Extensions.x28LengthHistogram,
    "x29_contamination" -> Extensions.x29Contamination,
    "x30_topk_agg" -> Extensions.x30TopKAgg,
    "x31_approx_percentiles" -> Extensions.x31ApproxPercentiles,
    "x32_token_entropy" -> Extensions.x32TokenEntropy,
    "x33_quantization_error" -> Extensions.x33QuantizationError,
    "x34_knn_rerank" -> Extensions.x34KnnRerank,
    "x35_unigram_surprisal" -> Extensions.x35UnigramSurprisal,
    "x36_asof_forward" -> Events.x36AsOfForward,
    "x37_hash_sample" -> Extensions.x37HashSample,
    "x38_repetition" -> Extensions.x38RepetitionStats,
    "x39_pack_sequences" -> Extensions.x39PackSequences,
    "x40_pii_redact" -> Extensions.x40PiiRedact,
    "x41_source_mix" -> Extensions.x41SourceMix,
    "x42_chunk_windows" -> Extensions.x42ChunkWindows,
    "x43_segment_dedup" -> Extensions.x43SegmentDedup,
    "x44_bigram_surprisal" -> Extensions.x44BigramSurprisal,
    "x45_lang_kl_drift" -> Extensions.x45LangKlDrift,
    "x46_dedup_representatives" -> Extensions.x46DedupRepresentatives,
    "x47_mask_tokens" -> Extensions.x47MaskTokens,
    "x48_quality_budget" -> Extensions.x48QualityBudget,
    "x49_cdc_dedup" -> Extensions.x49CdcDedup,
    "x50_bloom_semi_join" -> Extensions.x50BloomSemiJoin,
    "x51_contamination_bloom" -> Extensions.x51ContaminationBloom,
    "x52_weighted_sample" -> Extensions.x52WeightedSample,
    "x53_skew_salted" -> Extensions.x53SkewSalted,
    "x54_skew_aqe" -> Extensions.x54SkewAqe,
    "x55_semantic_dedup" -> Extensions.x55SemanticDedup,
    "x56_dedup_clusters_star" -> Extensions.x56DedupClustersStar,
    "x57_dup_ngram_coverage" -> Extensions.x57DupNgramCoverage,
    "x58_remove_dup_ngrams" -> Extensions.x58RemoveDupNgrams,
    "x59_incremental_jaccard" -> Extensions.x59IncrementalJaccard,
    "x60_incremental_lsh" -> Extensions.x60IncrementalLsh,
    "x61_knn_pq" -> Extensions.x61KnnPq,
    "x62_indexed_incremental" -> Extensions.x62IndexedIncremental,
    "x63_knn_pq_indexed" -> Extensions.x63KnnPqIndexed,
    "x64_skew_heavy_salted" -> Extensions.x64SkewHeavySalted,
    "x65_skew_heavy_aqe" -> Extensions.x65SkewHeavyAqe,
    "x66_image_hash_pairs" -> Extensions.x66ImageHashPairs,
    "x67_seed_distance" -> Extensions.x67SeedDistance,
    "x68_incremental_clusters" -> Extensions.x68IncrementalClusters,
    "x69_warc_stats" -> Extensions.x69WarcStats,
    "x70_html_extract" -> Extensions.x70HtmlExtract,
    "x71_audio_features" -> Extensions.x71AudioFeatures,
    "x72_url_curation" -> Extensions.x72UrlCuration,
    "x73_shuffle_shards" -> Extensions.x73ShuffleShards,
    "x74_zorder_layout" -> Extensions.x74ZorderLayout,
    "x75_bpe_train" -> Extensions.x75BpeTrain,
    "x76_bpe_encode" -> Extensions.x76BpeEncode,
    "x77_domain_quota" -> Extensions.x77DomainQuota,
    "x78_crawl_pipeline" -> Extensions.x78CrawlPipeline,
    "x79_pca_project" -> Extensions.x79PcaProject,
    "x80_video_meta" -> Extensions.x80VideoMeta,
    "x81_quality_score" -> Extensions.x81QualityScore,
    "x82_quality_train" -> Extensions.x82QualityTrain,
    "x83_psl_domains" -> Extensions.x83PslDomains,
    "x84_video_frames" -> Extensions.x84VideoFrames,
    "x85_source_epochs" -> Extensions.x85SourceEpochs,
    "x86_quality_calibration" -> Extensions.x86QualityCalibration,
    "x87_latest_per_url" -> Extensions.x87LatestPerUrl,
    "x88_crawl_diff" -> Extensions.x88CrawlDiff,
    "x89_unicode_nfc" -> Extensions.x89UnicodeNfc,
    "x90_idn_domains" -> Extensions.x90IdnDomains,
    "x91_bpe_bytes_train" -> Extensions.x91BpeBytesTrain,
    "x92_bpe_bytes_roundtrip" -> Extensions.x92BpeBytesRoundtrip,
    "x93_bpe_full_fidelity" -> Extensions.x93BpeBytesFullFidelity,
    "x94_bpe_mapside" -> Extensions.x94BpeMapSide,
    "x95_pack_token_budget" -> Extensions.x95PackTokenBudget,
    "x96_materialize_sequences" -> Extensions.x96MaterializeSequences,
    "x97_sequence_contamination" -> Extensions.x97SequenceContamination,
    "x98_separator_sequences" -> Extensions.x98SeparatorSequences,
    "x99_token_frequency" -> Extensions.x99TokenFrequency,
    "x100_fim_transform" -> Extensions.x100FimTransform,
    "x101_pack_no_straddle" -> Extensions.x101PackNoStraddle,
    "x102_materialize_no_straddle" -> Extensions.x102MaterializeNoStraddle,
    "x103_sft_loss_mask" -> Extensions.x103SftLossMask,
    "x104_packed_sft" -> Extensions.x104PackedSft,
    "x105_preference_pairs" -> Extensions.x105PreferencePairs,
    "x106_tokenizer_fertility" -> Extensions.x106TokenizerFertility,
    "x107_length_batches" -> Extensions.x107LengthBatches,
    "x108_temperature_sample" -> Extensions.x108TemperatureSample,
    "x109_best_of_n" -> Extensions.x109BestOfN,
    "x110_resume_shuffle" -> Extensions.x110ResumeShuffle,
    "x111_dsir_weights" -> Extensions.x111DsirWeights,
    "x112_token_windows_bpe" -> Extensions.x112TokenWindowsBpe,
    "x113_knn_ivfpq_indexed" -> Extensions.x113KnnIvfPqIndexed,
    "x114_trainer_shards" -> Extensions.x114TrainerShards,
    "x115_temperature_approx" -> Extensions.x115TemperatureApprox,
    "x116_shard_readback" -> Extensions.x116ShardReadback,
    "x117_epoch_order" -> Extensions.x117EpochOrder,
    "x118_blend_schedule" -> Extensions.x118BlendSchedule,
    "x119_blend_epochs" -> Extensions.x119BlendEpochs,
    "x120_run_resume" -> Extensions.x120RunResume,
    "x121_unigram_encode" -> Extensions.x121UnigramEncode,
    "x122_wordpiece_encode" -> Extensions.x122WordPieceEncode,
    "x123_unigram_roundtrip" -> Extensions.x123UnigramRoundtrip,
    "x124_wordpiece_roundtrip" -> Extensions.x124WordPieceRoundtrip,
    "x125_wordpiece_train_roundtrip" ->
      Extensions.x125WordPieceTrainRoundtrip,
    "x126_unigram_train_roundtrip" ->
      Extensions.x126UnigramTrainRoundtrip,
    "x127_wordpiece_pair_roundtrip" ->
      Extensions.x127WordPiecePairRoundtrip,
    "x128_wordpiece_truncation" -> Extensions.x128WordPieceTruncPad,
    "x129_wordpiece_offsets" -> Extensions.x129WordPieceOffsets,
    "x130_unigram_offsets" -> Extensions.x130UnigramOffsets,
    "x131_unigram_pair_truncation" ->
      Extensions.x131UnigramPairTruncPad,
    "x132_chunk_spans" -> Extensions.x132ChunkSpans,
    "x133_bpe_pair_truncation" -> Extensions.x133BpePairTruncPad,
    "x134_bpe_offsets" -> Extensions.x134BpeOffsets,
    "x135_bpe_chunk_spans" -> Extensions.x135BpeChunkSpans,
    "x136_llama3_shape" -> Extensions.x136Llama3Shape,
    "x137_batch_longest_pad" -> Extensions.x137BatchLongestPad,
    "x138_wordpiece_cleanup" -> Extensions.x138WordPieceCleanup,
  )

  // the planted-hot-key join aggregated to 10 buckets — all integer
  // arithmetic, so the oracle is engine-exact
  private val skewJoinOracle =
    """WITH li AS (
      |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0
      |              ELSE l_orderkey % 997 END AS k,
      |         CAST(l_linenumber AS BIGINT) AS v
      |  FROM lineitem),
      |sup AS (
      |  SELECT s_suppkey % 997 AS k, CAST(s_nationkey AS BIGINT) AS w
      |  FROM supplier)
      |SELECT li.k % 10 AS kb, COUNT(*) AS cnt,
      |       CAST(SUM(v + w) AS BIGINT) AS sv
      |FROM li JOIN sup ON li.k = sup.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // the x64/x65 heavy pair: 99 % of the 16×-replicated fact side on one
  // key, md5-derived flag summed per bucket — md5 hex is engine-identical
  // and everything else is integer arithmetic, so one exact oracle
  // checks both physical variants
  private val heavySkewOracle =
    """WITH li AS (
      |  SELECT CASE WHEN l_orderkey % 100 <> 7 THEN 0
      |              ELSE l_orderkey % 997 END AS k,
      |         CAST(l_linenumber + r.rep AS BIGINT) AS v
      |  FROM lineitem CROSS JOIN (SELECT unnest(range(16)) AS rep) r),
      |sup AS (
      |  SELECT s_suppkey % 997 AS k, CAST(s_nationkey AS BIGINT) AS w
      |  FROM supplier)
      |SELECT li.k % 10 AS kb, COUNT(*) AS cnt,
      |       CAST(SUM(v + w) AS BIGINT) AS sv,
      |       CAST(SUM(CASE WHEN substr(md5(
      |         CAST(li.k AS VARCHAR) || '-' || CAST(v AS VARCHAR) ||
      |         '-' || CAST(w AS VARCHAR)), 1, 1) = 'a'
      |         THEN 1 ELSE 0 END) AS BIGINT) AS na
      |FROM li JOIN sup ON li.k = sup.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val sumQty = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)"
  private val sumDiscPrice =
    "CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $sumQty AS sum_qty,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
         |  $sumDiscPrice AS sum_disc_price,
         |  $sumQty/COUNT(l_quantity) AS avg_qty,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
         |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_quantity >= 0
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      s"""SELECT l_orderkey, o_orderdate, $sumDiscPrice AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // x50 computes q4's exact semantics through the Bloom-pruned join —
    // same oracle, different (shuffle-reducing) physical plan
    "x50_bloom_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_selective_agg" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 24""".stripMargin,
    "q7_topk_per_group" ->
      """SELECT l_suppkey, CAST(rk AS INTEGER) AS rk, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |        ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |      FROM lineitem) ranked
        |WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,
    // x30 computes q7's exact semantics through the bounded-state TopK
    // aggregator — same oracle, different (scale-safe) physical plan
    "x30_topk_agg" ->
      """SELECT l_suppkey, CAST(rk AS INTEGER) AS rk, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |        ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |      FROM lineitem) ranked
        |WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,
    "q8_window_analytic" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_rev,
        |  LAG(l_extendedprice, 1) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_price,
        |  CAST(ROW_NUMBER() OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS INTEGER) AS rn
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q9_top_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q10_set_ops" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,
    "q11_distinct_agg" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers,
        |  COUNT(DISTINCT c_mktsegment) AS n_segments,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q12_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, $sumQty AS sum_qty, COUNT(*) AS n_rows
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q13_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q14_scalar_funcs" ->
      """SELECT o_orderkey,
        |  UPPER(o_orderpriority) AS pri_upper,
        |  CAST(LENGTH(o_orderpriority) AS INTEGER) AS pri_len,
        |  SUBSTRING(o_orderpriority, 1, 1) AS pri_code,
        |  CONCAT_WS('#', o_orderstatus, o_orderpriority) AS status_tag,
        |  CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
        |  CAST(DAY(o_orderdate) AS INTEGER) AS o_day,
        |  DATE_TRUNC('month', o_orderdate) AS month_start,
        |  ROUND(o_totalprice / 1000, 2) AS price_k,
        |  CAST(o_totalprice > 150000 AS INTEGER) AS is_big
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,
    "q15_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
    "q16_conditional_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q17_avg_compare_join" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_small
        |FROM lineitem
        |JOIN (SELECT l_partkey AS pk,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)/COUNT(l_quantity) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) pa
        |  ON l_partkey = pk
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    "q18_star_join" ->
      s"""SELECT r_name, $sumDiscPrice AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q19_union_all" ->
      """SELECT bucket, COUNT(*) AS n FROM (
        |  SELECT o_orderkey, 'cheap' AS bucket FROM orders WHERE o_totalprice < 50000
        |  UNION ALL
        |  SELECT o_orderkey, 'pricey' AS bucket FROM orders WHERE o_totalprice >= 150000) u
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q20_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, $sumQty AS sum_qty, COUNT(*) AS n_rows
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q21_asof_join" ->
      // Right side deduped to one row per (user_id, ts) — max event_id —
      // mirroring the Spark side: ASOF JOIN alone picks an arbitrary row
      // among equal rightTimes.
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |       v.event_id AS view_id, v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY event_id DESC) AS vrn
        |    FROM events WHERE event_type = 'view') t
        |  WHERE vrn = 1) v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY click_id""".stripMargin,
    // forward as-of with tolerance: ASOF on c.ts <= v.ts gives the next
    // view; the 30-minute attribution window nulls out farther matches
    "x36_asof_forward" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |  CASE WHEN v.ts <= c.ts + INTERVAL 30 MINUTE THEN v.event_id END AS view_id,
        |  CASE WHEN v.ts <= c.ts + INTERVAL 30 MINUTE THEN v.value END AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY event_id DESC) AS vrn
        |    FROM events WHERE event_type = 'view') t
        |  WHERE vrn = 1) v
        |  ON c.user_id = v.user_id AND c.ts <= v.ts
        |ORDER BY click_id""".stripMargin,
    "q22_range_join" ->
      """SELECT band, COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events
        |JOIN (VALUES ('b0_50',0.0,50.0),('b50_100',50.0,100.0),
        |             ('b100_150',100.0,150.0),('b150_200',150.0,200.0),
        |             ('b200_inf',200.0,1e18)) bands(band,lo,hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q23_hourly_agg" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q24_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q25_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |sess AS (
        |  SELECT user_id,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM m),
        |per AS (
        |  SELECT user_id, session_id, COUNT(*) AS session_events
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(session_events) AS BIGINT) AS n_events,
        |  CAST(MAX(session_events) AS BIGINT) AS longest_session
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q26_scalar_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n_above,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_above
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)/COUNT(o_totalprice)
        |  FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q27_string_agg" ->
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |  COUNT(*) AS n_customers
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q28_pivot" ->
      """SELECT c_nationkey,
        |  CAST(SUM(CASE WHEN c_mktsegment='AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
        |  CAST(SUM(CASE WHEN c_mktsegment='BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
        |  CAST(SUM(CASE WHEN c_mktsegment='FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
        |  CAST(SUM(CASE WHEN c_mktsegment='HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
        |  CAST(SUM(CASE WHEN c_mktsegment='MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q29_explode_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents) u
        |WHERE LENGTH(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    // exact because the sketch capacity (4096) exceeds the corpus
    // vocabulary — so the Space-Saving error term is identically 0
    "x16_frequent_tokens" ->
      """SELECT token, COUNT(*) AS n, CAST(0 AS BIGINT) AS err FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents) u
        |WHERE LENGTH(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "x1_dedup_exact" ->
      """SELECT doc_id, fingerprint FROM (
        |  SELECT doc_id, md5(text) AS fingerprint,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "x2_dedup_fingerprint" ->
      """SELECT doc_id, fingerprint FROM (
        |  SELECT doc_id,
        |    md5(substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 200)) AS fingerprint,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 200))
        |      ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q30_left_outer" ->
      """SELECT n_orders, COUNT(*) AS n_customers FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey) per_cust
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q31_in_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q32_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
        |  ROUND(quantile_cont(l_discount, 0.25), 6) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q33_cross_join" ->
      """SELECT r1.r_name AS name1, r2.r_name AS name2
        |FROM region r1 CROSS JOIN region r2
        |ORDER BY name1, name2""".stripMargin,
    "q34_full_outer" ->
      """SELECT COALESCE(ck, sk) AS nationkey, n_cust, n_supp
        |FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS sk, COUNT(*) AS n_supp
        |           FROM supplier GROUP BY s_nationkey) s ON ck = sk
        |ORDER BY nationkey""".stripMargin,
    "q35_except_all" ->
      """SELECT custkey, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT') d
        |GROUP BY custkey ORDER BY custkey""".stripMargin,
    "q36_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS INTEGER) AS days_since,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  DATE_TRUNC('week', o_orderdate) AS week_start
        |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin,
    "q37_regexp" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
        |  SUBSTRING(regexp_replace(lower(text), '[aeiou]', '', 'g'), 1, 30)
        |    AS devoweled_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q38_range_frame" ->
      """SELECT o_orderkey, o_totalprice,
        |  COUNT(*) OVER (ORDER BY o_totalprice
        |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |    AS n_within_1k
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    // x4_minhash_pairs / x5_simhash_pairs / x8_knn_lsh / x14_neardup_lsh /
    // x15_approx_distinct / x60_incremental_lsh / x61_knn_pq /
    // x63_knn_pq_indexed are probabilistic / engine-hash
    // operators: no SQL oracle (the driver records a rows-only check);
    // recall/accuracy against the exact counterparts (x3 / x6 / x7 /
    // x59 / countDistinct / the x61 inline path) is asserted in the
    // spec suite.
    // x75_bpe_train / x76_bpe_encode are iterative: every merge's pair
    // counts depend on the previous merge's argmax rewrite, so a SQL
    // restatement would be a second trainer, not an oracle; BpeSpec
    // gates both against an independent driver-side reference BPE on
    // the full fixture corpus plus closed-form hand-computed corpora.
    // x79_pca_project is float eigenanalysis (the x61 argument);
    // SimilaritySpec gates it with exact invariants — orthonormality,
    // variance ordering, compiled projection ≡ driver matmul,
    // full-rank rotation preserving distances.
    // x82_quality_train is iterative: each gradient depends on the
    // previous weights through the transcendental σ link (the x75
    // argument), so no SQL restatement exists; QualityClassifierSpec
    // gates the trained weights EXACTLY (quantized-long gradient sums
    // make them partitioning-independent) against an independent
    // driver-side reference trainer, plus learnability on a separable
    // corpus. The frozen-weights INFERENCE pass is x81, oracle-checked.
    "x3_jaccard_pairs" -> jaccardPairsSql,
    // x55: seeded-quantizer SemDeDup — the cell partition (id-order
    // seed centroids, double-precision squared-L2 argmin, lowest-seed
    // tie-break) is restated exactly, so the oracle reproduces the
    // pairs the partition misses, i.e. the REAL SemDeDup
    // approximation, then closes clusters recursively like x20
    "x55_semantic_dedup" -> semanticDedupSql,
    // x18: the winnow screen only decides which pairs get VERIFIED;
    // the emitted jaccard is the exact char-20-gram Jaccard, stated
    // here with x3's postings-join construction on 20-grams
    "x18_winnow_pairs" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 18),
        |    i -> substring(text, CAST(i AS INTEGER), 20)))) AS s
        |  FROM documents WHERE length(text) >= 20),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
        |  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id1, id2, ROUND(c*1.0/(s1.n + s2.n - c), 6) AS jaccard
        |  FROM inter JOIN sizes s1 ON id1 = s1.doc_id
        |             JOIN sizes s2 ON id2 = s2.doc_id
        |  WHERE ROUND(c*1.0/(s1.n + s2.n - c), 6) >= 0.5)
        |SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2""".stripMargin,
    "x20_dedup_clusters" -> dedupClustersSql,
    // same output contract, different engine path (star contraction) —
    // one oracle checks both
    "x56_dedup_clusters_star" -> dedupClustersSql,
    // x68 maintains the assignment incrementally (corpus clustered
    // once, delta pairs merged via quotient CC) but provably equals
    // re-clustering the merged pair set — x20's oracle verbatim
    "x68_incremental_clusters" -> dedupClustersSql,
    // x69: WARC round trip — fidelity is provable in SQL because the
    // fixture serializes `documents` itself: per doc, the recovered
    // body bytes must carry the original text's exact length and md5
    "x69_warc_stats" ->
      """SELECT doc_id, 200 AS http_status,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS body_md5
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x70: the oracle states what extraction MUST recover from the
    // in-query HTML wrapping — heading + whitespace-normalized text —
    // not the regex chain that recovers it (a semantic oracle: leaked
    // markup, lost prose, or a mis-decoded entity all hash-mismatch)
    "x70_html_extract" ->
      """SELECT doc_id,
        |  trim('Doc ' || doc_id || ' ' ||
        |       trim(regexp_replace(text, '\s+', ' ', 'g')))
        |    AS extracted_text
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x71: every decoded statistic is closed-form in doc_id (square
    // wave: RMS = amplitude exactly, lengths divide evenly) — the
    // oracle states the WAV round trip's truth from first principles
    "x71_audio_features" ->
      """SELECT doc_id, 16000 AS sample_rate,
        |  CAST(1600 + (doc_id % 7) * 800 AS BIGINT) AS n_samples,
        |  CAST((1600 + (doc_id % 7) * 800) // 16 AS BIGINT) AS duration_ms,
        |  CAST((doc_id % 1000) * 16 AS INTEGER) AS peak,
        |  CAST((doc_id % 1000) * 16 AS DOUBLE) AS rms,
        |  CAST(CASE WHEN doc_id % 1000 = 0 THEN 1 ELSE 0 END AS DOUBLE)
        |    AS silence_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    // x72: the synthesized crawl URLs are pure functions of doc_id, so
    // the oracle states every parse/normalize/blocklist output from
    // first principles — never mirroring the regexp chain that computes
    // them (wrong capture, kept fragment, dropped port, mis-joined
    // query all hash-mismatch)
    "x72_url_curation" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'www.example.com'
        |                  WHEN 1 THEN 'news.example.co.uk'
        |                  WHEN 2 THEN 'cdn.mirror.org'
        |                  ELSE 'blog.example.com' END AS host,
        |  CASE doc_id % 4 WHEN 0 THEN 'example.com'
        |                  WHEN 1 THEN 'example.co.uk'
        |                  WHEN 2 THEN 'mirror.org'
        |                  ELSE 'example.com' END AS registered_domain,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'https://www.example.com/Articles/' || doc_id
        |                || '?page=' || (doc_id % 7)
        |    WHEN 1 THEN 'http://news.example.co.uk/' || doc_id
        |                || '/story?id=' || doc_id
        |    WHEN 2 THEN 'https://cdn.mirror.org:8443/assets/' || doc_id
        |    ELSE 'http://blog.example.com/' END AS url_normalized,
        |  doc_id % 4 IN (0, 3) AS kept
        |FROM documents ORDER BY doc_id""".stripMargin,
    // x73: md5 hex is engine-identical and the 16-bit shard scaling is
    // integer-exact, so the oracle recomputes the whole deterministic
    // shuffle assignment (hex nibbles via strpos arithmetic)
    "x73_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5('r9:' || doc_id) AS hk FROM documents),
        |s AS (
        |  SELECT doc_id, hk,
        |    CAST((( (strpos('0123456789abcdef', substr(hk,1,1))-1)*4096
        |          + (strpos('0123456789abcdef', substr(hk,2,1))-1)*256
        |          + (strpos('0123456789abcdef', substr(hk,3,1))-1)*16
        |          + (strpos('0123456789abcdef', substr(hk,4,1))-1) ) * 32)
        |        // 65536 AS INTEGER) AS shard
        |  FROM h)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |  MIN(hk) AS first_key, MAX(hk) AS last_key
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin,
    // x77: md5 hex order is engine-identical, so the oracle recomputes
    // the exact per-domain kept set (both planted regimes: the
    // mega-domain thins to the quota, the long tail passes whole)
    "x77_domain_quota" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 5 THEN 'megafarm.com'
        |         ELSE 'site' || (doc_id % 97) END AS domain
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, domain,
        |    ROW_NUMBER() OVER (PARTITION BY domain
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM d)
        |SELECT doc_id, domain FROM r WHERE rk <= 20
        |ORDER BY doc_id""".stripMargin,
    // x78: the end-to-end composition stated from the source table —
    // extraction recovers the ws-normalized text (the x70 guarantee),
    // fingerprint = md5 of exactly that, dedup keeps min doc_id per
    // fingerprint, quota keeps the md5-order top 20 per domain
    "x78_crawl_pipeline" ->
      """WITH ext AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS extracted
        |  FROM documents WHERE text IS NOT NULL),
        |fp AS (
        |  SELECT doc_id, md5(extracted) AS fingerprint,
        |    ROW_NUMBER() OVER (PARTITION BY md5(extracted)
        |      ORDER BY doc_id) AS rn
        |  FROM ext),
        |dom AS (
        |  SELECT doc_id, fingerprint,
        |    CASE WHEN doc_id % 10 < 5 THEN 'megafarm.com'
        |         ELSE 'site' || (doc_id % 97) END AS domain
        |  FROM fp WHERE rn = 1),
        |q AS (
        |  SELECT doc_id, domain, fingerprint,
        |    ROW_NUMBER() OVER (PARTITION BY domain
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM dom)
        |SELECT doc_id, domain, fingerprint FROM q WHERE rk <= 20
        |ORDER BY doc_id""".stripMargin,
    // x74: Morton order is pure integer bit arithmetic — the oracle
    // states the interleave's definition (bit j of dim c → bit 2j+c)
    "x74_zorder_layout" -> {
      val zTerms = (0 until 10).flatMap(i => Seq(
        s"(((a >> $i) & 1) << ${2 * i})",
        s"(((b >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH m AS (
         |  SELECT l_orderkey % 1024 AS a, l_partkey % 1024 AS b,
         |         l_linenumber
         |  FROM lineitem),
         |z AS (SELECT ($zTerms) AS zv, l_linenumber FROM m)
         |SELECT CAST(zv >> 12 AS INTEGER) AS zb, COUNT(*) AS n_rows,
         |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
         |FROM z GROUP BY zb ORDER BY zb""".stripMargin
    },
    // x80: every container field is closed-form in doc_id (timescale
    // 1000 makes duration_ms = duration; the optional second track is
    // 0x0 audio so the first track always owns the size)
    "x80_video_meta" ->
      """SELECT doc_id, 'mp4' AS container, 'isom' AS brand,
        |  CAST(1500 + (doc_id % 11) * 250 AS BIGINT) AS duration_ms,
        |  CAST(1 + (doc_id % 2) AS INTEGER) AS n_tracks,
        |  CAST(320 + (doc_id % 5) * 16 AS INTEGER) AS width,
        |  CAST(240 + (doc_id % 3) * 16 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // x81: the frozen quality model's longs re-emitted as SQL literals
    // (the x8/x14 literal-coefficient device, with NO float summation
    // at all — logits are exact integer sums of quantized weights, and
    // the md5 bucket is the x73 strpos-nibble arithmetic)
    "x81_quality_score" -> qualityScoreSql,
    "x86_quality_calibration" -> qualityCalibrationSql,
    // x87: winner per canonical URL = the group's max doc_id (fetch
    // times are monotone in doc_id); the canonical key is closed-form
    "x87_latest_per_url" ->
      """SELECT 'https://site' || (doc_id // 5) || '.example/page'
        |    AS url_canonical,
        |  MAX(doc_id) AS doc_id
        |FROM documents
        |GROUP BY doc_id // 5
        |ORDER BY url_canonical""".stripMargin,
    // x88: the full-outer snapshot diff with x2/x12's md5-normalize
    // fingerprint statement on both sides
    "x88_crawl_diff" ->
      """WITH d AS (
        |  SELECT 'u' || doc_id AS url, doc_id, text
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (
        |  SELECT url,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |      AS prev_fp
        |  FROM d WHERE doc_id % 11 <> 0),
        |n AS (
        |  SELECT url,
        |    md5(trim(regexp_replace(lower(
        |      CASE WHEN doc_id % 7 = 0 THEN text || ' changed marker'
        |           ELSE text END), '[^a-z0-9]+', ' ', 'g'))) AS next_fp
        |  FROM d WHERE doc_id % 13 <> 0)
        |SELECT url, prev_fp, next_fp,
        |  CASE WHEN prev_fp IS NULL THEN 'new'
        |       WHEN next_fp IS NULL THEN 'deleted'
        |       WHEN prev_fp = next_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM p FULL OUTER JOIN n USING (url)
        |ORDER BY url""".stripMargin,
    // x85: the epochs multiset is a pure function of (id, factor) —
    // base copies from CASE arithmetic, the fractional copy from the
    // engine's own 8-hex-digit md5 gate (thresholds chosen as exact
    // binary fractions of 16^8, so the compare is lexicographic-exact)
    "x85_source_epochs" ->
      """WITH p AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 0
        |              WHEN 'es' THEN 0 ELSE 1 END
        |    + CASE WHEN lang = 'en' AND
        |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
        |        THEN 1
        |        WHEN lang = 'fr' AND
        |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        |        THEN 1 ELSE 0 END AS copies
        |  FROM documents)
        |SELECT doc_id, lang, CAST(ci AS BIGINT) AS copy_idx
        |FROM (SELECT doc_id, lang, unnest(range(0, copies)) AS ci
        |      FROM p WHERE copies > 0)
        |ORDER BY doc_id, copy_idx""".stripMargin,
    // x89: DuckDB's ICU nfc_normalize is an INDEPENDENT implementation
    // of the same Unicode standard as Java's Normalizer — the planted
    // forms are stated with chr() codes so no tool can re-normalize
    // the query text itself
    // x95: the packing chain certified end-to-end — zero-merge
    // full-fidelity byte tokens make n_bpe = UTF-8 byte count, so the
    // offsets/cuts/straddles restate as a window prefix sum
    "x95_pack_token_budget" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bpe
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (
        |  SELECT lang, doc_id, n_bpe,
        |    CAST(SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM t)
        |SELECT lang, doc_id, n_bpe,
        |  end_offset - n_bpe AS begin_offset,
        |  CAST((end_offset - n_bpe) // 512 AS BIGINT) AS seq_id,
        |  CAST(CASE WHEN n_bpe > 0 THEN (end_offset - 1) // 512
        |       ELSE (end_offset - n_bpe) // 512 END AS BIGINT)
        |    AS seq_last,
        |  CASE WHEN n_bpe > 0
        |    THEN (end_offset - n_bpe) // 512 <> (end_offset - 1) // 512
        |    ELSE FALSE END AS straddles
        |FROM o ORDER BY lang, doc_id""".stripMargin,
    // x96: materialized training sequences — zero-merge byte tokens
    // make each sequence's width-1 packed binary literally bytes
    // [seq_id*512, (seq_id+1)*512) of the per-lang concatenated
    // document stream, restated with string_agg + substr arithmetic;
    // spans and the complete flag come from the same fragment algebra
    "x96_materialize_sequences" ->
      """WITH t AS (
        |  SELECT lang, doc_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bpe
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (
        |  SELECT lang, doc_id, text, n_bpe,
        |    CAST(SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM t),
        |d AS (
        |  SELECT lang, doc_id, text, n_bpe,
        |    end_offset - n_bpe AS begin_offset, end_offset,
        |    (end_offset - n_bpe) // 512 AS s0,
        |    (end_offset - 1) // 512 AS s1
        |  FROM o WHERE n_bpe > 0),
        |f AS (
        |  SELECT d.lang, d.doc_id, g.s AS seq_id,
        |    GREATEST(d.begin_offset, g.s * 512) AS fb,
        |    LEAST(d.end_offset, (g.s + 1) * 512) AS fe,
        |    d.begin_offset, d.text
        |  FROM d, LATERAL (SELECT unnest(generate_series(d.s0, d.s1))
        |    AS s) g),
        |q AS (
        |  SELECT lang, seq_id,
        |    string_agg(substr(text, CAST(fb - begin_offset + 1 AS INTEGER),
        |      CAST(fe - fb AS INTEGER)), '' ORDER BY fb) AS seq_text,
        |    string_agg(doc_id || ':' || (fb - seq_id*512) || ':' ||
        |      (fe - fb), ',' ORDER BY fb) AS doc_spans,
        |    CAST(SUM(fe - fb) AS BIGINT) AS n_tokens
        |  FROM f GROUP BY lang, seq_id)
        |SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, n_tokens,
        |  n_tokens = 512 AS complete,
        |  md5(seq_text) AS seq_md5, doc_spans
        |FROM q ORDER BY lang, seq_id""".stripMargin,
    // x97: sequence-level decontamination — every sequence's text is
    // rebuilt with the x96 substr arithmetic, then BOTH sides shingle
    // in list SQL (the x29 idiom) and the shared counts + threshold
    // recompute; benchmark split = md5-bucket '0' of doc_id
    "x97_sequence_contamination" ->
      """WITH t AS (
        |  SELECT lang, doc_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bpe
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (
        |  SELECT lang, doc_id, text, n_bpe,
        |    CAST(SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM t),
        |d AS (
        |  SELECT lang, doc_id, text, n_bpe,
        |    end_offset - n_bpe AS begin_offset, end_offset,
        |    (end_offset - n_bpe) // 512 AS s0,
        |    (end_offset - 1) // 512 AS s1
        |  FROM o WHERE n_bpe > 0),
        |f AS (
        |  SELECT d.lang, d.doc_id, g.s AS seq_id,
        |    GREATEST(d.begin_offset, g.s * 512) AS fb,
        |    LEAST(d.end_offset, (g.s + 1) * 512) AS fe,
        |    d.begin_offset, d.text
        |  FROM d, LATERAL (SELECT unnest(generate_series(d.s0, d.s1))
        |    AS s) g),
        |q AS (
        |  SELECT lang, seq_id,
        |    string_agg(substr(text, CAST(fb - begin_offset + 1 AS INTEGER),
        |      CAST(fe - fb AS INTEGER)), '' ORDER BY fb) AS seq_text
        |  FROM f GROUP BY lang, seq_id),
        |stoks AS (
        |  SELECT lang, seq_id, list_filter(string_split_regex(
        |    lower(seq_text), '\s+'), x -> length(x) > 0) AS tk
        |  FROM q),
        |ssh0 AS (
        |  SELECT lang, seq_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk)-1),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |    ELSE [] END) AS shl
        |  FROM stoks),
        |sn AS (SELECT lang, seq_id, len(shl) AS n FROM ssh0),
        |ssh AS (SELECT lang, seq_id, unnest(shl) AS s FROM ssh0),
        |btoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> length(x) > 0) AS tk
        |  FROM documents WHERE text IS NOT NULL
        |    AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk)-1),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |    ELSE [] END)) AS s
        |  FROM btoks),
        |shared AS (
        |  SELECT lang, seq_id, COUNT(*) AS n_shared
        |  FROM ssh JOIN bsh USING (s) GROUP BY 1, 2)
        |SELECT sn.lang, CAST(sn.seq_id AS BIGINT) AS seq_id,
        |  CAST(n AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(n_shared, 0) * 10 >= n * 1 AND n > 0 AS INTEGER)
        |    AS contaminated
        |FROM sn LEFT JOIN shared USING (lang, seq_id)
        |ORDER BY lang, seq_id""".stripMargin,
    // x103: the chat construction is stated in-query (user = first
    // half, assistant = second half), so the mask contract restates
    // as substr arithmetic — token count = bytes + one marker per
    // turn, masked md5 = the assistant half, user md5 = the user half
    "x103_sft_loss_mask" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS n_turns,
        |  CAST(octet_length(encode(text)) + 2 AS BIGINT) AS n_tokens,
        |  CAST(octet_length(encode(substr(text,
        |    CAST(length(text) // 2 + 1 AS INTEGER),
        |    CAST(length(text) AS INTEGER)))) AS BIGINT) AS n_masked,
        |  md5(substr(text, CAST(length(text) // 2 + 1 AS INTEGER),
        |    CAST(length(text) AS INTEGER))) AS masked_md5,
        |  md5(substr(text, 1, CAST(length(text) // 2 AS INTEGER)))
        |    AS user_md5
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x107: descending-length rank → batch id → per-batch max —
    // pure window arithmetic in the zero-merge byte config
    "x107_length_batches" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT lang, doc_id, n_tokens,
        |    CAST((ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY n_tokens DESC, doc_id) - 1) // 8 AS BIGINT)
        |      AS batch_id
        |  FROM t)
        |SELECT lang, doc_id, n_tokens, batch_id,
        |  CAST(MAX(n_tokens) OVER (PARTITION BY lang, batch_id)
        |    AS BIGINT) AS batch_max,
        |  CAST(MAX(n_tokens) OVER (PARTITION BY lang, batch_id)
        |    - n_tokens AS BIGINT) AS padding
        |FROM r ORDER BY lang, doc_id""".stripMargin,
    // x115: x108's apportionment + the window-free hash-rate gate —
    // threshold (16^8·tgt) div n compared against the 8-hex md5
    // prefix as an integer (x73 strpos arithmetic); tgt = n strata
    // keep everything (threshold 16^8 — the rate-1 guard)
    "x115_temperature_approx" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n FROM documents
        |  WHERE text IS NOT NULL GROUP BY lang),
        |w AS (
        |  SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w
        |  FROM c),
        |t AS (
        |  SELECT lang, n, w,
        |    CAST((300 * w) // CAST(SUM(w) OVER () AS BIGINT) AS BIGINT)
        |      AS base,
        |    CAST((300 * w) % CAST(SUM(w) OVER () AS BIGINT) AS BIGINT)
        |      AS rem
        |  FROM w),
        |r AS (
        |  SELECT lang, n, base, rem,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
        |    CAST(SUM(base) OVER () AS BIGINT) AS tb
        |  FROM t),
        |g AS (
        |  SELECT lang, n,
        |    LEAST(n, base + CASE WHEN rk <= 300 - tb THEN 1 ELSE 0 END)
        |      AS tgt
        |  FROM r),
        |q AS (
        |  SELECT lang, n, tgt,
        |    (4294967296 * tgt) // n AS thr
        |  FROM g),
        |s AS (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (
        |  SELECT lang, doc_id,
        |    (strpos('0123456789abcdef', substr(hk,1,1))-1)*268435456::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,2,1))-1)*16777216::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,3,1))-1)*1048576::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,4,1))-1)*65536::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,5,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(hk,6,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(hk,7,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(hk,8,1))-1) AS h8
        |  FROM s)
        |SELECT h.lang, h.doc_id FROM h JOIN q ON h.lang = q.lang
        |WHERE q.thr = 4294967296 OR h.h8 < q.thr
        |ORDER BY h.lang, h.doc_id""".stripMargin,
    // x108: sqrt-temperature apportionment restated verbatim —
    // IEEE sqrt is correctly rounded in both engines, everything
    // after the floor is integer window arithmetic
    "x108_temperature_sample" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n FROM documents
        |  WHERE text IS NOT NULL GROUP BY lang),
        |w AS (
        |  SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w
        |  FROM c),
        |t AS (
        |  SELECT lang, n, w,
        |    CAST((300 * w) // CAST(SUM(w) OVER () AS BIGINT) AS BIGINT)
        |      AS base,
        |    CAST((300 * w) % CAST(SUM(w) OVER () AS BIGINT) AS BIGINT)
        |      AS rem
        |  FROM w),
        |r AS (
        |  SELECT lang, n, base, rem,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
        |    CAST(SUM(base) OVER () AS BIGINT) AS tb
        |  FROM t),
        |g AS (
        |  SELECT lang,
        |    LEAST(n, base + CASE WHEN rk <= 300 - tb THEN 1 ELSE 0 END)
        |      AS tgt
        |  FROM r),
        |s AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT s.lang, s.doc_id FROM s JOIN g ON s.lang = g.lang
        |WHERE s.rn <= g.tgt ORDER BY s.lang, s.doc_id""".stripMargin,
    // x109: planted candidates (prefixes at 1/4, 1/2, 3/4 with reward
    // 4·len + k), arg-extrema as ROW_NUMBER windows
    "x109_best_of_n" ->
      """WITH c AS (
        |  SELECT doc_id, k, doc_id * 4 + k AS cand_id,
        |    substr(text, 1,
        |      greatest(1, (length(text) * k) // 4)) AS cand
        |  FROM documents,
        |    LATERAL (SELECT unnest(generate_series(1, 3)) AS k)
        |  WHERE text IS NOT NULL),
        |r AS (
        |  SELECT doc_id, cand_id, cand,
        |    CAST(length(cand) * 4 + k AS DOUBLE) AS reward
        |  FROM c),
        |x AS (
        |  SELECT doc_id, cand_id, cand, reward,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY reward DESC, cand_id DESC) AS rb,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY reward ASC, cand_id ASC) AS rw,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
        |    MAX(reward) OVER (PARTITION BY doc_id)
        |      - MIN(reward) OVER (PARTITION BY doc_id) AS margin
        |  FROM r)
        |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_candidates,
        |  b.cand_id AS chosen_id, w.cand_id AS rejected_id, b.margin,
        |  md5(b.cand) AS chosen_md5, md5(w.cand) AS rejected_md5
        |FROM x b JOIN x w ON b.doc_id = w.doc_id
        |WHERE b.rb = 1 AND w.rw = 1
        |ORDER BY b.doc_id""".stripMargin,
    // x116: the write→read shard loop — per-sequence byte md5 equals
    // the x96 substr arithmetic from the documents table
    "x116_shard_readback" ->
      """WITH t AS (
        |  SELECT lang, doc_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bpe
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (
        |  SELECT lang, doc_id, text, n_bpe,
        |    CAST(SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_offset
        |  FROM t),
        |d AS (
        |  SELECT lang, doc_id, text, n_bpe,
        |    end_offset - n_bpe AS begin_offset, end_offset,
        |    (end_offset - n_bpe) // 512 AS s0,
        |    (end_offset - 1) // 512 AS s1
        |  FROM o WHERE n_bpe > 0),
        |f AS (
        |  SELECT d.lang, d.doc_id, g.s AS seq_id,
        |    GREATEST(d.begin_offset, g.s * 512) AS fb,
        |    LEAST(d.end_offset, (g.s + 1) * 512) AS fe,
        |    d.begin_offset, d.text
        |  FROM d, LATERAL (SELECT unnest(generate_series(d.s0, d.s1))
        |    AS s) g),
        |q AS (
        |  SELECT lang, seq_id,
        |    string_agg(substr(text, CAST(fb - begin_offset + 1 AS INTEGER),
        |      CAST(fe - fb AS INTEGER)), '' ORDER BY fb) AS seq_text,
        |    CAST(SUM(fe - fb) AS BIGINT) AS n_tokens
        |  FROM f GROUP BY lang, seq_id)
        |SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, n_tokens,
        |  md5(seq_text) AS seq_md5
        |FROM q ORDER BY lang, seq_id""".stripMargin,
    // x117: the epoch-order sidecar's permutation restated from the
    // documents table alone — sequence counts via the x114 packing
    // arithmetic, consumption order via the same md5(seed:epoch:
    // stratum:pos) sort the writer uses (lowercase-hex md5 strings
    // order identically in both engines)
    "x117_epoch_order" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST((sum(octet_length(encode(text))) + 511) // 512
        |      AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |  GROUP BY lang HAVING sum(octet_length(encode(text))) > 0),
        |p AS (
        |  SELECT lang, g.p AS pos
        |  FROM t, LATERAL (SELECT unnest(generate_series(0, t.n - 1))
        |    AS p) g),
        |k AS (
        |  SELECT lang, pos,
        |    md5('ep' || ':' || '1' || ':' || lang || ':' ||
        |      CAST(pos AS VARCHAR)) AS key
        |  FROM p)
        |SELECT lang,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY key, pos) AS BIGINT) AS rank,
        |  CAST(pos AS BIGINT) AS pos
        |FROM k ORDER BY lang, rank""".stripMargin,
    // x118: the cross-stratum blend schedule restated from the
    // documents table alone — counts via the x114 packing arithmetic,
    // weights from the stratum name (1000 + 500·alphabet position of
    // the first letter, the same formula the query uses), the global
    // step via the closed-form weighted-fair-interleave rank (strict
    // cross-multiplied count + the name-ordered tie), and the position
    // via the x117 md5 permutation — ALL integer-exact in both engines
    "x118_blend_schedule" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST((sum(octet_length(encode(text))) + 511) // 512
        |      AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |  GROUP BY lang HAVING sum(octet_length(encode(text))) > 0),
        |w AS (
        |  SELECT lang, n,
        |    CAST(1000 + 500 * strpos('abcdefghijklmnopqrstuvwxyz',
        |      substr(lang, 1, 1)) AS BIGINT) AS w
        |  FROM t),
        |p AS (
        |  SELECT lang, g.k AS k
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, w.n))
        |    AS k) g),
        |g AS (
        |  SELECT p.lang, p.k,
        |    p.k + COALESCE(SUM(
        |      LEAST(wj.n, (p.k * wj.w - 1) // wi.w)
        |      + CASE WHEN (p.k * wj.w) % wi.w = 0
        |             AND (p.k * wj.w) // wi.w <= wj.n
        |             AND wj.lang < p.lang THEN 1 ELSE 0 END), 0)
        |      AS gstep
        |  FROM p JOIN w wi ON p.lang = wi.lang
        |  LEFT JOIN w wj ON wj.lang <> p.lang
        |  GROUP BY p.lang, p.k),
        |o AS (
        |  SELECT lang, pos,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('ep' || ':' || '2' || ':' || lang || ':' ||
        |        CAST(pos AS VARCHAR)), pos) AS rank
        |  FROM (SELECT lang, g.p AS pos
        |        FROM t, LATERAL (SELECT
        |          unnest(generate_series(0, t.n - 1)) AS p) g))
        |SELECT CAST(g.gstep AS BIGINT) AS global_step, g.lang,
        |  CAST(g.k AS BIGINT) AS rank, CAST(o.pos AS BIGINT) AS pos
        |FROM g JOIN o ON g.lang = o.lang AND g.k = o.rank
        |ORDER BY global_step""".stripMargin,
    // x119: x118 composed with the x85 source-epochs arithmetic —
    // m = (n · f_milli) div 1000 consumption steps per stratum, the
    // same closed-form interleave over m, and the wraparound
    // ((k−1) mod n) + 1 resolving every step to its x117 position
    "x119_blend_epochs" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST((sum(octet_length(encode(text))) + 511) // 512
        |      AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |  GROUP BY lang HAVING sum(octet_length(encode(text))) > 0),
        |w AS (
        |  SELECT lang, n,
        |    CAST(1000 + 500 * strpos('abcdefghijklmnopqrstuvwxyz',
        |      substr(lang, 1, 1)) AS BIGINT) AS w,
        |    CAST((n * (500 + 750 *
        |      (strpos('abcdefghijklmnopqrstuvwxyz', substr(lang, 1, 1))
        |        % 3))) // 1000 AS BIGINT) AS m
        |  FROM t),
        |p AS (
        |  SELECT lang, g.k AS k
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, w.m))
        |    AS k) g),
        |g AS (
        |  SELECT p.lang, p.k,
        |    p.k + COALESCE(SUM(
        |      LEAST(wj.m, (p.k * wj.w - 1) // wi.w)
        |      + CASE WHEN (p.k * wj.w) % wi.w = 0
        |             AND (p.k * wj.w) // wi.w <= wj.m
        |             AND wj.lang < p.lang THEN 1 ELSE 0 END), 0)
        |      AS gstep
        |  FROM p JOIN w wi ON p.lang = wi.lang
        |  LEFT JOIN w wj ON wj.lang <> p.lang
        |  GROUP BY p.lang, p.k),
        |o AS (
        |  SELECT lang, pos,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('ep' || ':' || '3' || ':' || lang || ':' ||
        |        CAST(pos AS VARCHAR)), pos) AS rank
        |  FROM (SELECT lang, g.p AS pos
        |        FROM t, LATERAL (SELECT
        |          unnest(generate_series(0, t.n - 1)) AS p) g))
        |SELECT CAST(g.gstep AS BIGINT) AS global_step, g.lang,
        |  CAST(g.k AS BIGINT) AS rank, CAST(o.pos AS BIGINT) AS pos
        |FROM g JOIN w ON g.lang = w.lang
        |JOIN o ON o.lang = g.lang AND o.rank = ((g.k - 1) % w.n) + 1
        |ORDER BY global_step""".stripMargin,
    // x120: the RUN-level resume restated end to end — counts via the
    // x114 packing arithmetic, the x118 closed-form interleave PER
    // EPOCH (same counts and weights, so the totals match), per-epoch
    // md5 permutations (seed "run"), the prefix-sum run offset
    // (epoch-1)*T, and the same floor(2T/3) mid-epoch-1 cutoff the
    // query reads from _RUN.json — integer-exact in both engines
    "x120_run_resume" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST((sum(octet_length(encode(text))) + 511) // 512
        |      AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |  GROUP BY lang HAVING sum(octet_length(encode(text))) > 0),
        |w AS (
        |  SELECT lang, n,
        |    CAST(1000 + 500 * strpos('abcdefghijklmnopqrstuvwxyz',
        |      substr(lang, 1, 1)) AS BIGINT) AS w
        |  FROM t),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM t),
        |p AS (
        |  SELECT lang, g.k AS k
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, w.n))
        |    AS k) g),
        |g AS (
        |  SELECT p.lang, p.k,
        |    p.k + COALESCE(SUM(
        |      LEAST(wj.n, (p.k * wj.w - 1) // wi.w)
        |      + CASE WHEN (p.k * wj.w) % wi.w = 0
        |             AND (p.k * wj.w) // wi.w <= wj.n
        |             AND wj.lang < p.lang THEN 1 ELSE 0 END), 0)
        |      AS gstep
        |  FROM p JOIN w wi ON p.lang = wi.lang
        |  LEFT JOIN w wj ON wj.lang <> p.lang
        |  GROUP BY p.lang, p.k),
        |e AS (SELECT unnest(generate_series(1, 2)) AS epoch),
        |o AS (
        |  SELECT e.epoch, d.lang, d.pos,
        |    ROW_NUMBER() OVER (PARTITION BY e.epoch, d.lang
        |      ORDER BY md5('run' || ':' || CAST(e.epoch AS VARCHAR)
        |        || ':' || d.lang || ':' || CAST(d.pos AS VARCHAR)),
        |        d.pos) AS rank
        |  FROM e CROSS JOIN (SELECT lang, gg.p AS pos
        |    FROM t, LATERAL (SELECT
        |      unnest(generate_series(0, t.n - 1)) AS p) gg) d)
        |SELECT CAST(g.gstep + (e.epoch - 1) * tot.t AS BIGINT)
        |    AS run_step,
        |  CAST(e.epoch AS INTEGER) AS epoch, g.lang,
        |  CAST(g.k AS BIGINT) AS rank, CAST(o.pos AS BIGINT) AS pos
        |FROM g CROSS JOIN e CROSS JOIN tot
        |JOIN o ON o.epoch = e.epoch AND o.lang = g.lang
        |  AND o.rank = g.k
        |WHERE g.gstep + (e.epoch - 1) * tot.t > 2 * tot.t // 3
        |ORDER BY run_step""".stripMargin,
    // x114: the written trainer-shard blob is, under the zero-merge
    // byte config, the stratum's concatenated document bytes in id
    // order (the x96 identity carried to the FILE) — sizes, sequence
    // counts, and the blob md5 all restate from the documents table
    "x114_trainer_shards" ->
      """SELECT lang,
        |  CAST((sum(octet_length(encode(text))) + 511) // 512 AS BIGINT)
        |    AS n_sequences,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_tokens,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS token_bytes,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS blob_bytes,
        |  md5(string_agg(text, '' ORDER BY doc_id)) AS content_md5
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY lang HAVING sum(octet_length(encode(text))) > 0
        |ORDER BY lang""".stripMargin,
    // x112: zero-merge byte windows = plain substring arithmetic
    "x112_token_windows_bpe" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(LEAST(128, length(text) - i * 64) AS BIGINT)
        |    AS chunk_tokens,
        |  md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 128))
        |    AS chunk_md5
        |FROM documents, LATERAL (SELECT
        |  unnest(generate_series(0, (length(text) - 1) // 64)) AS i)
        |WHERE text IS NOT NULL AND length(text) > 0
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // x111: DSIR — bigrams in list SQL, the strpos hex bucket hash,
    // add-one smoothed counts, 1e-10-quantized log terms, term sums
    "x111_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(tk)),
        |      i -> tk[i] || ' ' || tk[i+1])) AS bg
        |  FROM tok WHERE len(tk) >= 2),
        |bk AS (
        |  SELECT doc_id, lang,
        |    (( (strpos('0123456789abcdef', substr(md5(bg),1,1))-1)*4096
        |     + (strpos('0123456789abcdef', substr(md5(bg),2,1))-1)*256
        |     + (strpos('0123456789abcdef', substr(md5(bg),3,1))-1)*16
        |     + (strpos('0123456789abcdef', substr(md5(bg),4,1))-1) )
        |     * 1024) // 65536 AS bucket
        |  FROM bg),
        |ct AS (SELECT bucket, COUNT(*) AS c FROM bk
        |       WHERE lang = 'en' GROUP BY 1),
        |cr AS (SELECT bucket, COUNT(*) AS c FROM bk GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM ct) AS nt,
        |  (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cr) AS nr),
        |terms AS (
        |  SELECT g.range AS bucket,
        |    CAST(floor(ln(CAST(COALESCE(t.c, 0) + 1 AS DOUBLE)
        |      / CAST(tot.nt + 1024 AS DOUBLE)) * 1e10) AS BIGINT)
        |    - CAST(floor(ln(CAST(COALESCE(r.c, 0) + 1 AS DOUBLE)
        |      / CAST(tot.nr + 1024 AS DOUBLE)) * 1e10) AS BIGINT)
        |      AS term
        |  FROM range(0, 1024) g
        |  LEFT JOIN ct t ON g.range = t.bucket
        |  LEFT JOIN cr r ON g.range = r.bucket, tot)
        |SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
        |  CAST(SUM(term) AS BIGINT) AS score_q
        |FROM bk b JOIN terms ON b.bucket = terms.bucket
        |GROUP BY 1 ORDER BY b.doc_id""".stripMargin,
    // x110: x73's strpos hex shard arithmetic + hash-order position,
    // skip as a plain filter
    "x110_resume_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5('r12:' || doc_id) AS hk FROM documents),
        |s AS (
        |  SELECT doc_id, hk,
        |    CAST((( (strpos('0123456789abcdef', substr(hk,1,1))-1)*4096
        |          + (strpos('0123456789abcdef', substr(hk,2,1))-1)*256
        |          + (strpos('0123456789abcdef', substr(hk,3,1))-1)*16
        |          + (strpos('0123456789abcdef', substr(hk,4,1))-1) ) * 32)
        |        // 65536 AS INTEGER) AS shard
        |  FROM h),
        |p AS (
        |  SELECT shard, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY shard
        |      ORDER BY hk, doc_id) AS BIGINT) - 1 AS position
        |  FROM s)
        |SELECT shard, position, doc_id FROM p WHERE position >= 7
        |ORDER BY shard, position""".stripMargin,
    // x106: token total = bytes − non-overlapping "in" count (the
    // planted merge; instances are disjoint and pre-tokenization
    // never splits letter-letter adjacency), words = collapsed
    // non-whitespace runs under the explicit shared class
    "x106_tokenizer_fertility" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS b,
        |    CAST((length(text) - length(replace(text, 'in', ''))) // 2
        |      AS BIGINT) AS m,
        |    CAST(length(regexp_replace(text, '[^ \t\n\f\r]+', 'w',
        |        'g')) -
        |      length(replace(regexp_replace(text, '[^ \t\n\f\r]+',
        |        'w', 'g'), 'w', '')) AS BIGINT) AS w
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(b) AS BIGINT) AS n_bytes,
        |  CAST(SUM(b - m) AS BIGINT) AS n_tokens,
        |  CAST(SUM(w) AS BIGINT) AS n_words,
        |  CAST((SUM(b - m) * 1000) // NULLIF(SUM(w), 0) AS BIGINT)
        |    AS fertility_milli,
        |  CAST((SUM(b) * 1000) // NULLIF(SUM(b - m), 0) AS BIGINT)
        |    AS compression_milli
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    // x105: thirds-of-text construction — stream lengths, clip flags,
    // eos survival, and kept-content md5s all restate as substr
    // arithmetic (prompt+chosen are CONTIGUOUS in text, so that md5
    // is one substr; rejected needs the concat)
    "x105_preference_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, length(text) AS l, length(text) // 3 AS a,
        |    (2 * length(text)) // 3 AS b, text
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(LEAST(a, 256) AS BIGINT) AS n_prompt,
        |  CAST(LEAST(b + 1, 256) AS BIGINT) AS n_chosen,
        |  CAST(LEAST(a + l - b + 1, 256) AS BIGINT) AS n_rejected,
        |  (b + 1 > 256) AS chosen_truncated,
        |  (a + l - b + 1 > 256) AS rejected_truncated,
        |  (b + 1 <= 256) AS chosen_has_eos,
        |  (a + l - b + 1 <= 256) AS rejected_has_eos,
        |  md5(substr(text, 1, CAST(LEAST(b, 256) AS INTEGER)))
        |    AS chosen_md5,
        |  md5(substr(substr(text, 1, CAST(a AS INTEGER)) ||
        |    substr(text, CAST(b + 1 AS INTEGER)), 1,
        |    CAST(LEAST(a + l - b, 256) AS INTEGER))) AS rejected_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    // x104: the x101 first-fit CTE with per-doc count length+2 (the
    // x103 transcript construction), grouped to sequences — masked /
    // user md5s are placement-ordered concats of the truncation-
    // clipped halves, sum(position_ids) is Σ n(n-1)/2 (positions
    // reset per example)
    "x104_packed_sft" ->
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id,
        |    CAST(length(text) // 2 AS BIGINT) AS lu,
        |    CAST(length(text) + 2 AS BIGINT) AS n0, text
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (
        |  SELECT lang, doc_id, lu, n0, LEAST(n0, 512) AS n, text,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM t),
        |r AS (
        |  SELECT lang, doc_id, lu, n0, n, rn, text,
        |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS begin_off,
        |    n AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.lang, d.doc_id, d.lu, d.n0, d.n, d.rn, d.text,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.seq_id
        |         ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.fill
        |         ELSE CAST(0 AS BIGINT) END,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.fill + d.n
        |         ELSE d.n END
        |  FROM r JOIN d ON d.lang = r.lang AND d.rn = r.rn + 1),
        |m AS (
        |  SELECT lang, doc_id, seq_id, begin_off, n, n0, lu,
        |    GREATEST(n - 2 - lu, 0) AS mc, LEAST(lu, n - 1) AS uc, text
        |  FROM r)
        |SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_examples,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(SUM(mc) AS BIGINT) AS n_masked,
        |  CAST(512 - SUM(n) AS BIGINT) AS n_pad,
        |  CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS sum_positions,
        |  CAST(512 - SUM(n) AS BIGINT) AS n_pad_ids,
        |  md5(string_agg(substr(text, CAST(lu + 1 AS INTEGER),
        |    CAST(mc AS INTEGER)), '' ORDER BY begin_off, doc_id))
        |    AS masked_md5,
        |  md5(string_agg(substr(text, 1, CAST(uc AS INTEGER)), ''
        |    ORDER BY begin_off, doc_id)) AS user_md5,
        |  string_agg(doc_id || ':' || begin_off || ':' || n || ':' ||
        |    (n0 > 512), ',' ORDER BY begin_off, doc_id) AS doc_spans
        |FROM m GROUP BY lang, seq_id
        |ORDER BY lang, seq_id""".stripMargin,
    // x102: x101's recursive fold grouped to sequences — content md5
    // is the placement-ordered concat of truncation-clamped substrs,
    // padding is the arithmetic remainder, spans restate verbatim
    "x102_materialize_no_straddle" ->
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n0, text
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (
        |  SELECT lang, doc_id, n0, LEAST(n0, 512) AS n, text,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM t),
        |r AS (
        |  SELECT lang, doc_id, n0, n, rn, text,
        |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS begin_off,
        |    n AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.lang, d.doc_id, d.n0, d.n, d.rn, d.text,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.seq_id
        |         ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.fill
        |         ELSE CAST(0 AS BIGINT) END,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.fill + d.n
        |         ELSE d.n END
        |  FROM r JOIN d ON d.lang = r.lang AND d.rn = r.rn + 1)
        |SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(512 - SUM(n) AS BIGINT) AS n_pad,
        |  CAST(512 AS BIGINT) AS padded_len,
        |  CAST(512 - SUM(n) AS BIGINT) AS n_pad_ids,
        |  md5(string_agg(substr(text, 1, CAST(n AS INTEGER)), ''
        |    ORDER BY begin_off, doc_id)) AS content_md5,
        |  string_agg(doc_id || ':' || begin_off || ':' || n || ':' ||
        |    (n0 > 512), ',' ORDER BY begin_off, doc_id) AS doc_spans
        |FROM r GROUP BY lang, seq_id
        |ORDER BY lang, seq_id""".stripMargin,
    // x101: first-fit is sequential per stratum, so the oracle is a
    // RECURSIVE CTE advancing every stratum one document per
    // iteration — truncation clamp, reset, and offsets restated
    "x101_pack_no_straddle" ->
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n0
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (
        |  SELECT lang, doc_id, n0, LEAST(n0, 512) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM t),
        |r AS (
        |  SELECT lang, doc_id, n0, n, rn,
        |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS begin_off,
        |    n AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.lang, d.doc_id, d.n0, d.n, d.rn,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.seq_id
        |         ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.fill
        |         ELSE CAST(0 AS BIGINT) END,
        |    CASE WHEN r.fill + d.n <= 512 THEN r.fill + d.n
        |         ELSE d.n END
        |  FROM r JOIN d ON d.lang = r.lang AND d.rn = r.rn + 1)
        |SELECT lang, doc_id, n AS n_tokens, n0 > 512 AS truncated,
        |  seq_id, begin_off AS begin
        |FROM r ORDER BY lang, doc_id""".stripMargin,
    // x100: FIM — 16-bit gate slice, 32-bit CUT slices (digits 5-12 /
    // 13-20, the x73 strpos hex arithmetic), reassembly compared by
    // part lengths + joined-parts md5
    "x100_fim_transform" ->
      """WITH h AS (
        |  SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS hk,
        |    CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |v AS (
        |  SELECT doc_id, text, n,
        |    (strpos('0123456789abcdef', substr(hk,1,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(hk,2,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(hk,3,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(hk,4,1))-1) AS h1,
        |    (strpos('0123456789abcdef', substr(hk,5,1))-1)*268435456::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,6,1))-1)*16777216::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,7,1))-1)*1048576::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,8,1))-1)*65536::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,9,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(hk,10,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(hk,11,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(hk,12,1))-1) AS h2,
        |    (strpos('0123456789abcdef', substr(hk,13,1))-1)*268435456::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,14,1))-1)*16777216::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,15,1))-1)*1048576::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,16,1))-1)*65536::BIGINT
        |      + (strpos('0123456789abcdef', substr(hk,17,1))-1)*4096
        |      + (strpos('0123456789abcdef', substr(hk,18,1))-1)*256
        |      + (strpos('0123456789abcdef', substr(hk,19,1))-1)*16
        |      + (strpos('0123456789abcdef', substr(hk,20,1))-1) AS h3
        |  FROM h),
        |c AS (
        |  SELECT doc_id, text, n,
        |    (h1 < 32768 AND n >= 2) AS fim,
        |    CASE WHEN n >= 2 THEN h2 % n ELSE 0 END AS a,
        |    CASE WHEN n >= 2 THEN 1 + (h3 % (n - (h2 % n)))
        |         ELSE 0 END AS lm
        |  FROM v),
        |p AS (
        |  SELECT doc_id, fim,
        |    CASE WHEN fim THEN substr(text, 1, CAST(a AS INTEGER))
        |         ELSE text END AS prefix,
        |    CASE WHEN fim THEN substr(text, CAST(a + 1 AS INTEGER),
        |         CAST(lm AS INTEGER)) ELSE '' END AS middle,
        |    CASE WHEN fim THEN substr(text,
        |         CAST(a + 1 + lm AS INTEGER), CAST(n AS INTEGER))
        |         ELSE '' END AS suffix
        |  FROM c)
        |SELECT doc_id, fim,
        |  CAST(length(prefix) AS BIGINT) AS n_prefix,
        |  CAST(length(middle) AS BIGINT) AS n_middle,
        |  CAST(length(suffix) AS BIGINT) AS n_suffix,
        |  md5(prefix || '|' || middle || '|' || suffix) AS parts_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    // x98: separator-aware materialization — per-document stride is
    // n+1 (content bytes + one <|endoftext|>), content md5 excludes
    // the separator positions, a fragment carries its separator iff
    // it reaches its document interval's end
    "x98_separator_sequences" ->
      """WITH t AS (
        |  SELECT lang, doc_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (
        |  SELECT lang, doc_id, text, n,
        |    CAST(SUM(n + 1) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_all
        |  FROM t),
        |d AS (
        |  SELECT lang, doc_id, text, n,
        |    end_all - (n + 1) AS begin_off, end_all,
        |    (end_all - (n + 1)) // 512 AS s0,
        |    (end_all - 1) // 512 AS s1
        |  FROM o),
        |f AS (
        |  SELECT d.lang, d.doc_id, g.s AS seq_id,
        |    GREATEST(d.begin_off, g.s * 512) AS fb,
        |    LEAST(d.end_all, (g.s + 1) * 512) AS fe,
        |    LEAST(d.end_all - 1, (g.s + 1) * 512) AS fec,
        |    d.begin_off, d.end_all AS de, d.text
        |  FROM d, LATERAL (SELECT unnest(generate_series(d.s0, d.s1))
        |    AS s) g),
        |q AS (
        |  SELECT lang, seq_id,
        |    string_agg(CASE WHEN fec > fb THEN substr(text,
        |      CAST(fb - begin_off + 1 AS INTEGER),
        |      CAST(fec - fb AS INTEGER)) ELSE '' END, ''
        |      ORDER BY fb) AS content_text,
        |    string_agg(doc_id || ':' || (fb - seq_id*512) || ':' ||
        |      (fe - fb), ',' ORDER BY fb) AS doc_spans,
        |    CAST(SUM(fe - fb) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN fe = de THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_sep
        |  FROM f GROUP BY lang, seq_id)
        |SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, n_tokens,
        |  n_tokens = 512 AS complete, n_sep,
        |  md5(content_text) AS content_md5, doc_spans
        |FROM q ORDER BY lang, seq_id""".stripMargin,
    // x99: zero-merge byte tokens make the frequency profile a plain
    // per-character count over whitespace-stripped text (printable
    // ASCII self-maps under the byte alphabet; ascii() is the id)
    "x99_token_frequency" ->
      """WITH ch AS (
        |  SELECT unnest(string_split(regexp_replace(text,
        |    '[ \t\n\x0b\f\r]', '', 'g'), '')) AS token
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT token, CAST(ascii(token) AS BIGINT) AS id,
        |  COUNT(*) AS n
        |FROM ch GROUP BY 1, 2 ORDER BY token""".stripMargin,
    // x94: the map-side kernel encoder through the same identity —
    // any divergence from the join encoder's application order breaks
    // the reconstruction against the untouched text's md5
    "x94_bpe_mapside" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x93: the strongest tokenizer statement — full-fidelity byte-BPE
    // under the GPT-2 space-preserving pre-tokenization reconstructs
    // the ENTIRE document, so the oracle is md5 of the UNTOUCHED text
    "x93_bpe_full_fidelity" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x92: the byte-BPE round trip stated WITHOUT BPE — the
    // pre-tokenization's alternatives jointly cover every
    // non-whitespace char in order, so decoded concatenated tokens =
    // text minus ASCII whitespace. Whitespace is stated as the
    // EXPLICIT class [ \t\n\x0b\f\r] (Java's \s), not RE2's '\s':
    // RE2 excludes U+000B from \s while the engine's Java-regex
    // pre-tokenizer drops it, so the shorthand would hash-mismatch
    // on a document containing a vertical tab
    "x92_bpe_bytes_roundtrip" ->
      """SELECT doc_id,
        |  md5(regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g'))
        |    AS roundtrip_md5,
        |  CAST(octet_length(encode(
        |      regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g')))
        |    AS BIGINT) AS n_bytes
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x123: the Unigram (sentencepiece) round trip stated WITHOUT a
    // tokenizer — under the fixture pipeline (Prepend "▁", Replace
    // " "→"▁", full <0xNN> byte fallback) decode(encode(text)) is
    // exactly the marker rewrite: every "▁" (original or space-
    // rewritten) renders back as a space and the one prepended
    // marker drops, so the oracle is a literal replace
    "x123_unigram_roundtrip" ->
      """SELECT doc_id,
        |  md5(replace(text, '▁', ' ')) AS roundtrip_md5,
        |  CAST(length(replace(text, '▁', ' ')) AS BIGINT) AS n_chars
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x127: the pair encode's SEGMENT STRUCTURE stated without a
    // tokenizer — A/B are planted substr halves, the type-0 and
    // type-1 content slices must decode back to each cleaned half,
    // and the full decode to their space-join (the x124 cleaning
    // chain + x103 substr arithmetic)
    "x127_wordpiece_pair_roundtrip" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(regexp_replace(
        |      substr(text, 1, CAST(length(text) // 2 AS INTEGER)),
        |      '[^A-Za-z0-9 ]', ' ', 'g')), ' +', ' ', 'g')) AS ca,
        |    trim(regexp_replace(lower(regexp_replace(
        |      substr(text, CAST(length(text) // 2 + 1 AS INTEGER),
        |        CAST(length(text) AS INTEGER)),
        |      '[^A-Za-z0-9 ]', ' ', 'g')), ' +', ' ', 'g')) AS cb
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  md5(trim(ca || ' ' || cb)) AS pair_md5,
        |  md5(ca) AS a_md5, md5(cb) AS b_md5,
        |  CAST(length(trim(ca || ' ' || cb)) AS BIGINT) AS n_chars
        |FROM s ORDER BY doc_id""".stripMargin,
    // x128: the truncation + padding blocks restated WITHOUT a
    // tokenizer — under a single-character vocab the pair arithmetic
    // is positional: kept lengths follow the longest-first closed
    // form (spec-pinned equal to the published iterative rule), the
    // kept content decodes to substr of each planted half, and the
    // pad count / first-pad position / type-id sum are arithmetic
    // over those lengths (content budget 21 = max_length 24 minus
    // the 3 pair-template ids; ceil(21/2) = 11)
    "x128_wordpiece_truncation" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substr(l, 1, least(CAST(length(l)//2 AS INTEGER),
        |      CAST(2 + doc_id % 23 AS INTEGER))) AS a,
        |    substr(l, CAST(length(l)//2 + 1 AS INTEGER),
        |      CAST(1 + doc_id % 17 AS INTEGER)) AS b
        |  FROM (SELECT doc_id,
        |          lower(regexp_replace(text, '[^A-Za-z0-9]', '',
        |            'g')) AS l
        |        FROM documents WHERE text IS NOT NULL)),
        |f AS (
        |  SELECT doc_id, a, b, length(a) AS la, length(b) AS lb,
        |    CASE WHEN length(a) + length(b) <= 21 THEN length(a)
        |         ELSE least(length(a), greatest(11, 21 - length(b)))
        |    END AS fa
        |  FROM s)
        |SELECT doc_id,
        |  md5(substr(a, 1, fa)) AS a_md5,
        |  md5(substr(b, 1, least(la + lb, 21) - fa)) AS b_md5,
        |  CAST(24 AS BIGINT) AS n_ids,
        |  CAST(21 - fa - (least(la + lb, 21) - fa) AS BIGINT)
        |    AS n_pad,
        |  CAST(CASE WHEN fa + (least(la + lb, 21) - fa) < 21
        |       THEN 4 + fa + (least(la + lb, 21) - fa) ELSE 0 END
        |    AS BIGINT) AS first_pad,
        |  CAST((least(la + lb, 21) - fa) + 1 AS BIGINT) AS type_sum,
        |  CAST(3 + fa + (least(la + lb, 21) - fa) AS BIGINT)
        |    AS mask_sum,
        |  CAST(CASE WHEN fa + (least(la + lb, 21) - fa) < 21
        |       THEN 4 + fa + (least(la + lb, 21) - fa) ELSE 0 END
        |    AS BIGINT) AS mask_first_zero
        |FROM f ORDER BY doc_id""".stripMargin,
    // x129: the offsets stream restated WITHOUT a tokenizer — under
    // a single-character vocab each non-space character of the
    // normalized text is one token: id = bare (preceded by a space
    // or start) vs ## continuation, span = (pos-1, pos) in code
    // points; the whole id:start:end stream aggregates per doc in
    // position order (vocab layout: a-z 1..26, ##a-z 27..52,
    // 0-9 53..62, ##0-9 63..72)
    "x129_wordpiece_offsets" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g'))
        |      AS t
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (
        |  SELECT doc_id, i, substr(t, CAST(i AS INTEGER), 1) AS c,
        |    CASE WHEN i = 1 THEN ' '
        |         ELSE substr(t, CAST(i - 1 AS INTEGER), 1) END AS p
        |  FROM n, LATERAL (SELECT
        |    unnest(generate_series(1, length(t))) AS i) g),
        |ids AS (
        |  SELECT doc_id, i,
        |    CASE WHEN c BETWEEN 'a' AND 'z' THEN
        |           CASE WHEN p = ' ' THEN 1 + ascii(c) - 97
        |                ELSE 27 + ascii(c) - 97 END
        |         ELSE
        |           CASE WHEN p = ' ' THEN 53 + ascii(c) - 48
        |                ELSE 63 + ascii(c) - 48 END
        |    END AS id
        |  FROM u WHERE c <> ' ')
        |SELECT n.doc_id,
        |  CAST(coalesce(g.cnt, 0) AS BIGINT) AS n_tokens,
        |  md5(coalesce(g.s, '')) AS offsets_md5
        |FROM n LEFT JOIN (
        |  SELECT doc_id, count(*) AS cnt,
        |    string_agg(id || ':' || (i - 1) || ':' || i, ','
        |      ORDER BY i) AS s
        |  FROM ids GROUP BY doc_id) g ON n.doc_id = g.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // x130: the Unigram offsets stream restated WITHOUT a tokenizer
    // — spans index the lattice string '▁' || replace(clean,' ','▁')
    // (the Prepend empty-input no-op stated as a CASE); under the
    // single-character fixture vocab every character is one token
    // (vocab layout: <unk> 0, ▁ 1, a-z 2..27, 0-9 28..37)
    "x130_unigram_offsets" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    CASE WHEN c = '' THEN ''
        |         ELSE '▁' || replace(c, ' ', '▁') END AS t
        |  FROM (SELECT doc_id,
        |          lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ',
        |            'g')) AS c
        |        FROM documents WHERE text IS NOT NULL)),
        |u AS (
        |  SELECT doc_id, i, substr(t, CAST(i AS INTEGER), 1) AS ch
        |  FROM n, LATERAL (SELECT
        |    unnest(generate_series(1, length(t))) AS i) g),
        |ids AS (
        |  SELECT doc_id, i,
        |    CASE WHEN ch = '▁' THEN 1
        |         WHEN ch BETWEEN 'a' AND 'z' THEN 2 + ascii(ch) - 97
        |         ELSE 28 + ascii(ch) - 48 END AS id
        |  FROM u)
        |SELECT n.doc_id,
        |  CAST(coalesce(g.cnt, 0) AS BIGINT) AS n_tokens,
        |  md5(coalesce(g.s, '')) AS offsets_md5
        |FROM n LEFT JOIN (
        |  SELECT doc_id, count(*) AS cnt,
        |    string_agg(id || ':' || (i - 1) || ':' || i, ','
        |      ORDER BY i) AS s
        |  FROM ids GROUP BY doc_id) g ON n.doc_id = g.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // x132: span-carrying chunks restated WITHOUT a tokenizer —
    // token k = the k-th non-space character of the normalized text
    // (the x129 positional arithmetic), chunk cs covers tokens
    // [cs, cs+16) for cs in steps of 8, span = [min pos − 1, max
    // pos], text = the substr the span delimits
    "x132_chunk_spans" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g'))
        |      AS t
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (
        |  SELECT doc_id, i, substr(t, CAST(i AS INTEGER), 1) AS c,
        |    CASE WHEN i = 1 THEN ' '
        |         ELSE substr(t, CAST(i - 1 AS INTEGER), 1) END AS p
        |  FROM n, LATERAL (SELECT
        |    unnest(generate_series(1, length(t))) AS i) g),
        |tk AS (
        |  SELECT doc_id, i,
        |    CASE WHEN c BETWEEN 'a' AND 'z' THEN
        |           CASE WHEN p = ' ' THEN 1 + ascii(c) - 97
        |                ELSE 27 + ascii(c) - 97 END
        |         ELSE
        |           CASE WHEN p = ' ' THEN 53 + ascii(c) - 48
        |                ELSE 63 + ascii(c) - 48 END
        |    END AS id,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
        |      AS k
        |  FROM u WHERE c <> ' '),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(n - 1 AS BIGINT), 8)) AS cs
        |  FROM cnt),
        |agg AS (
        |  SELECT ch.doc_id, CAST(ch.cs // 8 AS BIGINT) AS chunk_idx,
        |    CAST(count(*) AS BIGINT) AS chunk_tokens,
        |    CAST(min(tk.i) - 1 AS BIGINT) AS char_start,
        |    CAST(max(tk.i) AS BIGINT) AS char_end,
        |    md5(string_agg(CAST(tk.id AS VARCHAR), ','
        |      ORDER BY tk.i)) AS ids_md5
        |  FROM ch JOIN tk ON tk.doc_id = ch.doc_id
        |    AND tk.k >= ch.cs AND tk.k < ch.cs + 16
        |  GROUP BY ch.doc_id, ch.cs)
        |SELECT a.doc_id, a.chunk_idx, a.chunk_tokens, a.char_start,
        |  a.char_end, a.ids_md5,
        |  md5(substr(n.t, CAST(a.char_start + 1 AS INTEGER),
        |    CAST(a.char_end - a.char_start AS INTEGER))) AS text_md5
        |FROM agg a JOIN n ON n.doc_id = a.doc_id
        |ORDER BY a.doc_id, a.chunk_idx""".stripMargin,
    // x131: the Unigram pair surface restated WITHOUT a tokenizer —
    // each letters-only half h lattices to 1 + length(h) tokens
    // (the prepended ▁ then single chars; 0 when empty — the
    // Prepend no-op), the kept content decodes to
    // substr(h, 1, f−1) after the decoder drops the prepended-space
    // marker, and the pad/type/mask books are the x128 arithmetic
    // under the same content budget 21 (= 24 − the 3 pair ids)
    "x131_unigram_pair_truncation" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substr(l, 1, least(CAST(length(l)//2 AS INTEGER),
        |      CAST(2 + doc_id % 23 AS INTEGER))) AS a,
        |    substr(l, CAST(length(l)//2 + 1 AS INTEGER),
        |      CAST(1 + doc_id % 17 AS INTEGER)) AS b
        |  FROM (SELECT doc_id,
        |          lower(regexp_replace(text, '[^A-Za-z0-9]', '',
        |            'g')) AS l
        |        FROM documents WHERE text IS NOT NULL)),
        |t AS (
        |  SELECT doc_id, a, b,
        |    CASE WHEN a = '' THEN 0 ELSE length(a) + 1 END AS la,
        |    CASE WHEN b = '' THEN 0 ELSE length(b) + 1 END AS lb
        |  FROM s),
        |f AS (
        |  SELECT doc_id, a, b, la, lb,
        |    CASE WHEN la + lb <= 21 THEN la
        |         ELSE least(la, greatest(11, 21 - lb)) END AS fa
        |  FROM t)
        |SELECT doc_id,
        |  md5(substr(a, 1, greatest(fa - 1, 0))) AS a_md5,
        |  md5(substr(b, 1, greatest(least(la + lb, 21) - fa - 1, 0)))
        |    AS b_md5,
        |  CAST(24 AS BIGINT) AS n_ids,
        |  CAST(21 - fa - (least(la + lb, 21) - fa) AS BIGINT)
        |    AS n_pad,
        |  CAST(CASE WHEN fa + (least(la + lb, 21) - fa) < 21
        |       THEN 4 + fa + (least(la + lb, 21) - fa) ELSE 0 END
        |    AS BIGINT) AS first_pad,
        |  CAST((least(la + lb, 21) - fa) + 1 AS BIGINT) AS type_sum,
        |  CAST(3 + fa + (least(la + lb, 21) - fa) AS BIGINT)
        |    AS mask_sum,
        |  CAST(CASE WHEN fa + (least(la + lb, 21) - fa) < 21
        |       THEN 4 + fa + (least(la + lb, 21) - fa) ELSE 0 END
        |    AS BIGINT) AS mask_first_zero
        |FROM f ORDER BY doc_id""".stripMargin,
    // x133: the byte-level BPE pair surface restated WITHOUT a
    // tokenizer — the byte-identity vocab makes each ASCII half of k
    // alphanumeric characters encode to exactly its k byte values,
    // so under the Roberta template (4 fixed ids, content budget
    // 20 = 24 − 4, ceil(20/2) = 10) the kept lengths are the
    // longest-first closed form, the content decode is the substr
    // concatenation (Roberta types are all zero — the first </s>
    // position 2 + fa pins the A/B split instead), and the
    // pad/mask books are arithmetic over (fa, fb)
    "x133_bpe_pair_truncation" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substr(l, 1, least(CAST(length(l)//2 AS INTEGER),
        |      CAST(2 + doc_id % 23 AS INTEGER))) AS a,
        |    substr(l, CAST(length(l)//2 + 1 AS INTEGER),
        |      CAST(1 + doc_id % 17 AS INTEGER)) AS b
        |  FROM (SELECT doc_id,
        |          regexp_replace(text, '[^A-Za-z0-9]', '', 'g') AS l
        |        FROM documents WHERE text IS NOT NULL)),
        |f AS (
        |  SELECT doc_id, a, b, length(a) AS la, length(b) AS lb,
        |    CASE WHEN length(a) + length(b) <= 20 THEN length(a)
        |         ELSE least(length(a), greatest(10, 20 - length(b)))
        |    END AS fa
        |  FROM s),
        |g AS (
        |  SELECT doc_id, a, b, fa, least(la + lb, 20) - fa AS fb
        |  FROM f)
        |SELECT doc_id,
        |  md5(substr(a, 1, fa) || substr(b, 1, fb)) AS content_md5,
        |  CAST(2 + fa AS BIGINT) AS first_sep,
        |  CAST(24 AS BIGINT) AS n_ids,
        |  CAST(20 - fa - fb AS BIGINT) AS n_pad,
        |  CAST(CASE WHEN fa + fb < 20 THEN 5 + fa + fb ELSE 0 END
        |    AS BIGINT) AS first_pad,
        |  CAST(0 AS BIGINT) AS type_sum,
        |  CAST(4 + fa + fb AS BIGINT) AS mask_sum,
        |  CAST(CASE WHEN fa + fb < 20 THEN 5 + fa + fb ELSE 0 END
        |    AS BIGINT) AS mask_first_zero
        |FROM g ORDER BY doc_id""".stripMargin,
    // x134: the byte-level BPE offsets stream restated WITHOUT a
    // tokenizer — under the byte-identity vocab over cleaned
    // [A-Za-z0-9 ] text EVERY character (spaces included — the
    // ByteLevel full-fidelity convention) is one token: id = its
    // ASCII byte, span = (i−1, i) in code points
    "x134_bpe_offsets" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (
        |  SELECT doc_id, i,
        |    ascii(substr(t, CAST(i AS INTEGER), 1)) AS id
        |  FROM n, LATERAL (SELECT
        |    unnest(generate_series(1, length(t))) AS i) g)
        |SELECT n.doc_id,
        |  CAST(coalesce(g.cnt, 0) AS BIGINT) AS n_tokens,
        |  md5(coalesce(g.s, '')) AS offsets_md5
        |FROM n LEFT JOIN (
        |  SELECT doc_id, count(*) AS cnt,
        |    string_agg(id || ':' || (i - 1) || ':' || i, ','
        |      ORDER BY i) AS s
        |  FROM u GROUP BY doc_id) g ON n.doc_id = g.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // x135: byte-level provenance chunks restated WITHOUT a
    // tokenizer — token k IS the (k+1)-th character of the cleaned
    // text (spaces included), so chunk ci covers characters
    // [ci·8, ci·8 + len), its ids are their ASCII bytes and its
    // text the substr the span delimits
    "x135_bpe_chunk_spans" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (
        |  SELECT doc_id, i,
        |    ascii(substr(t, CAST(i AS INTEGER), 1)) AS id
        |  FROM n, LATERAL (SELECT
        |    unnest(generate_series(1, length(t))) AS i) g),
        |d AS (SELECT doc_id, length(t) AS n
        |      FROM n WHERE length(t) > 0),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST((n - 1) // 8 AS BIGINT)))
        |      AS ci
        |  FROM d),
        |agg AS (
        |  SELECT ch.doc_id, CAST(ch.ci AS BIGINT) AS chunk_idx,
        |    CAST(count(*) AS BIGINT) AS chunk_tokens,
        |    CAST(ch.ci * 8 AS BIGINT) AS char_start,
        |    CAST(ch.ci * 8 + count(*) AS BIGINT) AS char_end,
        |    md5(string_agg(CAST(u.id AS VARCHAR), ','
        |      ORDER BY u.i)) AS ids_md5
        |  FROM ch JOIN u ON u.doc_id = ch.doc_id
        |    AND u.i > ch.ci * 8 AND u.i <= ch.ci * 8 + 16
        |  GROUP BY ch.doc_id, ch.ci)
        |SELECT a.doc_id, a.chunk_idx, a.chunk_tokens, a.char_start,
        |  a.char_end, a.ids_md5,
        |  md5(substr(n.t, CAST(a.char_start + 1 AS INTEGER),
        |    CAST(a.chunk_tokens AS INTEGER))) AS text_md5
        |FROM agg a JOIN n ON n.doc_id = a.doc_id
        |ORDER BY a.doc_id, a.chunk_idx""".stripMargin,
    // x136: the Llama-3 shape restated WITHOUT a tokenizer — the
    // x134 statement (every character one token at its ASCII byte,
    // spans (i−1, i)) with the template's BOS `256:0:0` prepended;
    // the Split regex's alternatives jointly cover [A-Za-z0-9 ]
    // text, so the honored pattern changes nothing the oracle can
    // see (the discriminating fixtures live in BpeSpec) — what this
    // certifies is the loaded pipeline: Split honored without
    // dropping a character (the cover guard), ignore_merges and the
    // Sequence post-processor parsed, the template assembled
    "x136_llama3_shape" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (
        |  SELECT doc_id, i,
        |    ascii(substr(t, CAST(i AS INTEGER), 1)) AS id
        |  FROM n, LATERAL (SELECT
        |    unnest(generate_series(1, length(t))) AS i) g)
        |SELECT n.doc_id,
        |  CAST(coalesce(g.cnt, 0) + 1 AS BIGINT) AS n_tokens,
        |  md5(CASE WHEN g.s IS NULL THEN '256:0:0'
        |       ELSE '256:0:0,' || g.s END) AS offsets_md5
        |FROM n LEFT JOIN (
        |  SELECT doc_id, count(*) AS cnt,
        |    string_agg(id || ':' || (i - 1) || ':' || i, ','
        |      ORDER BY i) AS s
        |  FROM u GROUP BY doc_id) g ON n.doc_id = g.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // x137: batch-longest padding restated WITHOUT a tokenizer —
    // each planted sequence is la = length(a) tokens (byte-identity
    // vocab), the pad width is the corpus max as a scalar subquery,
    // and every book is arithmetic over (la, gmax)
    "x137_batch_longest_pad" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substr(l, 1, CAST(1 + doc_id % 29 AS INTEGER)) AS a
        |  FROM (SELECT doc_id,
        |          regexp_replace(text, '[^A-Za-z0-9]', '', 'g') AS l
        |        FROM documents WHERE text IS NOT NULL)),
        |m AS (SELECT max(length(a)) AS gmax FROM s)
        |SELECT doc_id,
        |  md5(a) AS content_md5,
        |  CAST(gmax AS BIGINT) AS n_ids,
        |  CAST(gmax - length(a) AS BIGINT) AS n_pad,
        |  CAST(CASE WHEN length(a) < gmax THEN length(a) + 1
        |       ELSE 0 END AS BIGINT) AS first_pad,
        |  CAST(length(a) AS BIGINT) AS mask_sum,
        |  CAST(CASE WHEN length(a) < gmax THEN length(a) + 1
        |       ELSE 0 END AS BIGINT) AS mask_first_zero
        |FROM s, m ORDER BY doc_id""".stripMargin,
    // x138: the cleanup decode restated WITHOUT a tokenizer — the
    // pre-cleanup join is alnum runs + isolated punctuation marks
    // space-joined (per-char replaces + whitespace collapse), then
    // the SAME eleven cleanup replaces in the SAME order
    "x138_wordpiece_cleanup" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(text, '[^A-Za-z0-9.,?!'' ]', ' ',
        |      'g')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(t,
        |        '.', ' . '), ',', ' , '), '?', ' ? '), '!', ' ! '),
        |        '''', ' '' '),
        |      ' +', ' ', 'g')) AS j
        |  FROM c),
        |f AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(replace(
        |    replace(replace(replace(replace(j,
        |      ' .', '.'), ' ?', '?'), ' !', '!'), ' ,', ','),
        |      ' '' ', ''''), ' n''t', 'n''t'), ' ''m', '''m'),
        |      ' do not', ' don''t'), ' ''s', '''s'),
        |      ' ''ve', '''ve'), ' ''re', '''re') AS d
        |  FROM r)
        |SELECT doc_id, md5(d) AS cleanup_md5,
        |  CAST(length(d) AS BIGINT) AS n_chars
        |FROM f ORDER BY doc_id""".stripMargin,
    // x126: the x123 identity certifying the TRAINED Unigram
    // artifact — the trainer's byte alphabet + required singles make
    // the same trainer-free statement hold for a fitted vocabulary
    "x126_unigram_train_roundtrip" ->
      """SELECT doc_id,
        |  md5(replace(text, '▁', ' ')) AS roundtrip_md5,
        |  CAST(length(replace(text, '▁', ' ')) AS BIGINT) AS n_chars
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x124: the WordPiece round trip stated WITHOUT a tokenizer — on
    // input pre-cleaned to [A-Za-z0-9 ] the Bert pipeline is lower +
    // whitespace-split and the decoder is a space-join, so
    // decode(encode(clean(text))) = trim + collapse-runs of
    // lower(clean(text)) — four functions both engines share
    "x124_wordpiece_roundtrip" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(
        |      lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
        |      ' +', ' ', 'g'))) AS roundtrip_md5,
        |  CAST(length(trim(regexp_replace(
        |      lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
        |      ' +', ' ', 'g'))) AS BIGINT) AS n_chars
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x125: the x124 identity certifying the TRAINED WordPiece
    // artifact — training guarantees corpus alphabet coverage, so
    // the roundtrip statement is the same trainer-free SQL
    "x125_wordpiece_train_roundtrip" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(
        |      lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
        |      ' +', ' ', 'g'))) AS roundtrip_md5,
        |  CAST(length(trim(regexp_replace(
        |      lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')),
        |      ' +', ' ', 'g'))) AS BIGINT) AS n_chars
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // x90: the oracle states each registered domain from first
    // principles — the RFC 3492 punycode of every fixed IDN label
    // computed independently of the engine's java.net.IDN bridge, so
    // a skipped bridge or a wrong punycode form hash-mismatches
    "x90_idn_domains" ->
      """SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'xn--mnchen-3ya.de'
        |    WHEN 1 THEN 'xn--e1afmkfd.xn--p1ai'
        |    WHEN 2 THEN 'ex' || doc_id || '.com'
        |    WHEN 3 THEN 'xn--caf-dma.github.io'
        |    ELSE 'plain' || doc_id || '.de'
        |  END AS registered_domain
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x89_unicode_nfc" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    nfc_normalize(COALESCE(text, '') || ' e' || chr(769) ||
        |      ' ' || chr(233) || ' A' || chr(778) || ' ' || chr(197) ||
        |      ' ' || chr(8486)) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS nfc_md5,
        |  CAST(length(norm) AS BIGINT) AS n_chars_nfc
        |FROM p ORDER BY doc_id""".stripMargin,
    // x84: every decoded MJPEG frame's index, time, and dimensions are
    // closed-form in doc_id (deterministic AVI fixture) — the oracle
    // states the full container→RIFF-walk→JPEG-decode chain's truth
    "x84_video_frames" ->
      """SELECT doc_id,
        |  CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f * (20 + (doc_id % 4) * 10) AS INTEGER) AS frame_ms,
        |  CAST(32 + (doc_id % 5) * 16 AS INTEGER) AS width,
        |  CAST(24 + (doc_id % 3) * 16 AS INTEGER) AS height,
        |  TRUE AS decodable
        |FROM (SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS f
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // x83: the full publicsuffix.org algorithm restated relationally —
    // suffix explode, rule join (exact / wildcard-tail / exception),
    // exception-beats-longest-match precedence, label reassembly —
    // over the same literal rule list the engine's kernel carries
    "x83_psl_domains" ->
      """WITH hosts AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'news' || doc_id || '.example.co.uk'
        |      WHEN 1 THEN 'blog.user' || doc_id || '.github.io'
        |      WHEN 2 THEN 'deep.a.shop' || doc_id || '.ck'
        |      WHEN 3 THEN 'sub' || doc_id || '.www.ck'
        |      WHEN 4 THEN 'www.ex' || doc_id || '.com'
        |      WHEN 5 THEN 'c.a' || doc_id || '.zz'
        |      WHEN 6 THEN 'github.io'
        |      ELSE 'localhost' || doc_id
        |    END AS host
        |  FROM documents),
        |lab AS (
        |  SELECT doc_id, host, string_split(host, '.') AS ls,
        |         len(string_split(host, '.')) AS n
        |  FROM hosts),
        |suf AS (
        |  SELECT doc_id, i,
        |    array_to_string(list_slice(ls, i, n), '.') AS s,
        |    CASE WHEN i < n
        |      THEN array_to_string(list_slice(ls, i + 1, n), '.') END AS tl
        |  FROM (SELECT doc_id, ls, n, unnest(range(1, n + 1)) AS i
        |        FROM lab)),
        |exact_rules(rule) AS (
        |  VALUES ('com'), ('uk'), ('co.uk'), ('io'), ('github.io')),
        |wild_rules(rule) AS (VALUES ('ck')),
        |exc_rules(rule) AS (VALUES ('www.ck')),
        |m AS (
        |  SELECT doc_id,
        |    MIN(CASE WHEN kind = 'x' THEN i END) AS exc_i,
        |    MIN(CASE WHEN kind = 'n' THEN i END) AS norm_i
        |  FROM (
        |    SELECT s.doc_id, s.i, 'x' AS kind
        |    FROM suf s JOIN exc_rules r ON s.s = r.rule
        |    UNION ALL
        |    SELECT s.doc_id, s.i, 'n'
        |    FROM suf s JOIN exact_rules r ON s.s = r.rule
        |    UNION ALL
        |    SELECT s.doc_id, s.i, 'n'
        |    FROM suf s JOIN wild_rules r ON s.tl = r.rule)
        |  GROUP BY 1)
        |SELECT l.doc_id, l.host,
        |  CASE WHEN COALESCE(m.exc_i + 1, m.norm_i, l.n) - 1 < 1
        |    THEN l.host
        |    ELSE array_to_string(list_slice(l.ls,
        |      CAST(COALESCE(m.exc_i + 1, m.norm_i, l.n) - 1 AS BIGINT),
        |      l.n), '.') END AS registered_domain
        |FROM lab l LEFT JOIN m ON l.doc_id = m.doc_id
        |ORDER BY l.doc_id""".stripMargin,
    "x57_dup_ngram_coverage" -> dupNgramCoverageSql,
    "x58_remove_dup_ngrams" -> removeDupNgramsSql,
    "x59_incremental_jaccard" -> incrementalJaccardSql,
    // x62 answers the same question as x59 through the persisted index,
    // so the quadratic-way oracle applies verbatim
    "x62_indexed_incremental" -> incrementalJaccardSql,
    "x67_seed_distance" -> seedDistanceSql,
    "x46_dedup_representatives" -> dedupRepresentativesSql,
    "x21_hash_split" ->
      """SELECT lang,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' THEN 'test'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '1' THEN 'val'
        |       ELSE 'train' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "x22_shard_assign" ->
      """WITH r AS (
        |  SELECT lang, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
        |      AS prior_chars
        |  FROM documents)
        |SELECT lang, CAST(FLOOR(prior_chars / 65536) AS INTEGER) AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS shard_chars
        |FROM r GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,
    // parallel unnest zips the two lists pairwise in DuckDB; range(n) is
    // 0-based like Spark's posexplode pos
    "x23_label_centroids" ->
      """WITH e AS (
        |  SELECT label, unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS val
        |  FROM embeddings)
        |SELECT label, CAST(pos AS INTEGER) AS pos,
        |  CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 100000000) AS BIGINT)) AS DOUBLE)
        |    / (COUNT(*) * 100000000.0) AS m
        |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "x6_embedding_neardup" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${normSqSql("embedding")} AS nsq FROM embeddings)
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  ROUND(CASE WHEN sqrt(a.nsq)*sqrt(b.nsq) = 0 THEN 0
         |    ELSE ${dotSql("a.embedding", "b.embedding")}/(sqrt(a.nsq)*sqrt(b.nsq)) END, 6) AS cos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE ROUND(CASE WHEN sqrt(a.nsq)*sqrt(b.nsq) = 0 THEN 0
         |    ELSE ${dotSql("a.embedding", "b.embedding")}/(sqrt(a.nsq)*sqrt(b.nsq)) END, 6) >= 0.45
         |ORDER BY id1, id2""".stripMargin,
    "x7_knn_bruteforce" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${normSqSql("embedding")} AS nsq FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    CASE WHEN sqrt(q.nsq)*sqrt(e.nsq) = 0 THEN 0
         |      ELSE ${dotSql("q.embedding", "e.embedding")}/(sqrt(q.nsq)*sqrt(e.nsq)) END AS cos_raw
         |  FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos_raw,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_raw DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id,
         |  ROUND(cos_raw, 6) AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // x8: the x34-style flip the r8 verdict's audit asked to attempt —
    // hyperplane LSH has NO iterated float means (the x17 blocker), so
    // with the engine's deterministic coefficients as literals the
    // whole pipeline is exactly statable: 6 sign-bit buckets, radius-2
    // multiprobe ≡ Hamming(qbucket, cbucket) <= 2, exact-cosine rerank
    // ranked on the RAW cosine (rounding only in the output projection,
    // matching the Spark window's ordering)
    "x8_knn_lsh" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${normSqSql("embedding")} AS nsq,
         |    ${hyperplaneBucketSql("embedding")} AS bucket
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    CASE WHEN sqrt(q.nsq)*sqrt(e.nsq) = 0 THEN 0
         |      ELSE ${dotSql("q.embedding", "e.embedding")}/(sqrt(q.nsq)*sqrt(e.nsq)) END AS cos_raw
         |  FROM n q JOIN n e
         |    ON q.vec_id < 10 AND e.vec_id <> q.vec_id
         |   AND bit_count(xor(q.bucket, e.bucket)) <= 2),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos_raw,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_raw DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id,
         |  ROUND(cos_raw, 6) AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // x14: the same flip — banding over FIXED hyperplanes is
    // deterministic, not probabilistic, once the coefficients are
    // literals: candidates = pairs sharing >= 1 of the 24 five-bit
    // band buckets (the cap never engages below 4096-member buckets —
    // orders of magnitude above these corpora — and pairs are
    // distinct()), verified at ROUNDED cosine >= 0.45 exactly as the
    // operator filters
    "x14_neardup_lsh" -> {
      val bucketCols = (0 until 24)
        .map(b => s"${bandBucketSql("embedding", b)} AS b$b")
        .mkString(",\n    ")
      val shareBand = (0 until 24).map(b => s"a.b$b = e.b$b")
        .mkString(" OR ")
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${normSqSql("embedding")} AS nsq,
         |    $bucketCols
         |  FROM embeddings),
         |cand AS (
         |  SELECT a.vec_id AS id1, e.vec_id AS id2,
         |    ROUND(CASE WHEN sqrt(a.nsq)*sqrt(e.nsq) = 0 THEN 0
         |      ELSE ${dotSql("a.embedding", "e.embedding")}/(sqrt(a.nsq)*sqrt(e.nsq)) END, 6) AS cos
         |  FROM n a JOIN n e
         |    ON a.vec_id < e.vec_id AND ($shareBand))
         |SELECT id1, id2, cos FROM cand WHERE cos >= 0.45
         |ORDER BY id1, id2""".stripMargin
    },
    "x9_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(LENGTH(text) AS INTEGER) AS n_chars,
         |  CAST(len($tokSql) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct($tokSql)) AS INTEGER) AS n_distinct_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x10_langid" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($tokSql) AS dtk FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_intersect(dtk, ['the','a','and','of','to','in','is','it','that','for'])) AS s_en,
         |  len(list_intersect(dtk, ['der','die','das','und','ist','nicht','mit','ein','zu','den'])) AS s_de,
         |  len(list_intersect(dtk, ['le','la','les','et','un','une','est','que','pour','dans'])) AS s_fr,
         |  len(list_intersect(dtk, ['el','los','y','de','un','una','es','por','con','para'])) AS s_es
         |  FROM t),
         |l AS (SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS lang_id
         |  FROM s)
         |SELECT lang_id, COUNT(*) AS n_docs FROM l GROUP BY lang_id
         |ORDER BY lang_id""".stripMargin,
    "x11_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $tokSql AS tk FROM documents),
         |c AS (SELECT doc_id,
         |  CAST(len(tk) AS DOUBLE) AS n_tok,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(tk, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE) AS stop_cnt,
         |  CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) AS sum_len
         |  FROM t)
         |SELECT doc_id, ROUND(
         |  LEAST(n_tok/50, 1.0)*0.25 +
         |  (1.0 - CASE WHEN n_chars > 0 THEN punct/n_chars ELSE 0 END)*0.25 +
         |  LEAST(CASE WHEN n_tok > 0 THEN stop_cnt/n_tok ELSE 0 END*5, 1.0)*0.25 +
         |  LEAST(CASE WHEN n_tok > 0 THEN sum_len/n_tok ELSE 0 END/8, 1.0)*0.25, 6) AS quality
         |FROM c ORDER BY doc_id""".stripMargin,
    "x12_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x19_pipeline_stats" ->
      s"""WITH dedup AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM documents) d WHERE rn = 1),
         |t AS (SELECT doc_id, text, $tokSql AS tk FROM dedup),
         |c AS (SELECT doc_id, text, tk,
         |  CAST(len(tk) AS DOUBLE) AS n_tok,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(tk, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE) AS stop_cnt,
         |  CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) AS sum_len
         |  FROM t),
         |q AS (SELECT doc_id, text, tk, ROUND(
         |  LEAST(n_tok/50, 1.0)*0.25 +
         |  (1.0 - CASE WHEN n_chars > 0 THEN punct/n_chars ELSE 0 END)*0.25 +
         |  LEAST(CASE WHEN n_tok > 0 THEN stop_cnt/n_tok ELSE 0 END*5, 1.0)*0.25 +
         |  LEAST(CASE WHEN n_tok > 0 THEN sum_len/n_tok ELSE 0 END/8, 1.0)*0.25, 6) AS quality
         |  FROM c),
         |f AS (SELECT * FROM q WHERE quality >= 0.5),
         |s AS (SELECT doc_id, text, quality,
         |  len(list_intersect(list_distinct(tk), ['the','a','and','of','to','in','is','it','that','for'])) AS s_en,
         |  len(list_intersect(list_distinct(tk), ['der','die','das','und','ist','nicht','mit','ein','zu','den'])) AS s_de,
         |  len(list_intersect(list_distinct(tk), ['le','la','les','et','un','une','est','que','pour','dans'])) AS s_fr,
         |  len(list_intersect(list_distinct(tk), ['el','los','y','de','un','una','es','por','con','para'])) AS s_es
         |  FROM f),
         |l AS (SELECT doc_id, quality,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS lang_id,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
         |  FROM s)
         |SELECT lang_id, COUNT(*) AS n_docs,
         |  CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
         |  CAST(CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_quality
         |FROM l GROUP BY lang_id ORDER BY lang_id""".stripMargin,
    // x24/x25: IDF-bearing scores quantized to 1e-8 longs before any
    // ranking/summing — ln() may differ by an ulp across engines, but a
    // 1-ulp idf error lands on a floor() boundary with probability
    // ~1e-8 per distinct (N, df[, tf, dl]) combination; rankings and
    // sums are then exact integer arithmetic.
    "x24_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_total FROM documents),
        |scored AS (
        |  SELECT doc_id, token, tf,
        |    CAST(tf * CAST(FLOOR(ln((CAST(n_total AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) * 100000000) AS BIGINT) AS BIGINT) AS score_q
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, token, tf, score_q,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score_q DESC, token) AS rk
        |  FROM scored)
        |SELECT doc_id, token, tf,
        |  CAST(score_q AS DOUBLE) / 100000000 AS score
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, score DESC, token""".stripMargin,
    "x25_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS dl
        |  FROM documents),
        |st AS (SELECT COUNT(*) AS n_total, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        |       WHERE token IN ('dup', 'join', 'fast') GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(FLOOR(
        |      ln(1.0 + (CAST(n_total AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * 2.2) /
        |         (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_total AS DOUBLE))))))
        |      * 100000000) AS BIGINT) AS contrib_q
        |  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN st)
        |SELECT doc_id, COUNT(*) AS n_hit,
        |  CAST(SUM(contrib_q) AS DOUBLE) / 100000000 AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY SUM(contrib_q) DESC, doc_id LIMIT 20""".stripMargin,
    "x26_stratified_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS cnt
        |  FROM documents)
        |SELECT lang, doc_id, n_chars FROM r
        |WHERE rn <= (cnt * 1 + 9) // 10
        |ORDER BY lang, doc_id""".stripMargin,
    // Efraimidis-Spirakis keys: u from the first 12 md5 hex digits
    // (digit-wise — exact in doubles below 2^53), e = -ln(u)·wmax/w
    // (scale-free relative weights) quantized to 1e-9 longs before
    // ranking (the x24/x32 pattern); same left-assoc double arithmetic
    // as the Spark side
    "x52_weighted_sample" ->
      """WITH wm AS (
        |  SELECT MAX(CAST(n_chars AS DOUBLE)) AS wmax
        |  FROM documents WHERE doc_id IS NOT NULL AND n_chars > 0),
        |scored AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(FLOOR(
        |      -ln((list_sum(list_transform(range(1, 13), i ->
        |            (strpos('0123456789abcdef',
        |               substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
        |              * (16.0 ** (12 - i)))) + 1)
        |          / 281474976710657.0)
        |      * wmax / CAST(n_chars AS DOUBLE) * 1000000000) AS BIGINT) AS wkey
        |  FROM documents CROSS JOIN wm
        |  WHERE doc_id IS NOT NULL AND n_chars > 0),
        |top AS (
        |  SELECT doc_id, lang, n_chars FROM scored
        |  ORDER BY wkey, doc_id LIMIT 100)
        |SELECT doc_id, lang, n_chars FROM top ORDER BY doc_id""".stripMargin,
    // x53 (salted) and x54 (plain + AQE) share one oracle: salting is
    // semantically transparent — only the physical distribution differs
    "x53_skew_salted" -> skewJoinOracle,
    "x54_skew_aqe" -> skewJoinOracle,
    "x64_skew_heavy_salted" -> heavySkewOracle,
    "x65_skew_heavy_aqe" -> heavySkewOracle,
    // the dHash fallback is a pure 64-bit function of the payload
    // bytes, so pairs ≡ "same normalized 200-char prefix" (the x2
    // fingerprint relation) at Hamming exactly 0 — which DuckDB can
    // state as a self-join on the prefix expression
    "x66_image_hash_pairs" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(0 AS INTEGER) AS hamming
        |FROM documents a JOIN documents b
        |  ON substring(trim(regexp_replace(lower(a.text), '[^a-z0-9]+', ' ', 'g')), 1, 200)
        |   = substring(trim(regexp_replace(lower(b.text), '[^a-z0-9]+', ' ', 'g')), 1, 200)
        | AND a.doc_id < b.doc_id
        |WHERE a.text IS NOT NULL AND b.text IS NOT NULL
        |ORDER BY 1, 2""".stripMargin,
    // 16^8 / 10 = 429496729 = 0x19999999: the same lexicographic hex
    // prefix compare as the engine's map-only filter
    "x37_hash_sample" ->
      """SELECT lang, doc_id, n_chars FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
        |ORDER BY doc_id""".stripMargin,
    // integer-exact per-stratum thresholds: thr = (16^8·cap) div n_g,
    // clamped; rate-1 strata bypass the hex compare (thr = 16^8 is nine
    // hex digits and would compare low lexicographically)
    "x41_source_mix" ->
      """WITH c AS (
        |  SELECT lang, LEAST(4294967296, (4294967296 * 100) // COUNT(*)) AS thr
        |  FROM documents GROUP BY lang)
        |SELECT d.lang, doc_id, n_chars
        |FROM documents d JOIN c USING (lang)
        |WHERE thr = 4294967296
        |   OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      < printf('%08x', CAST(thr AS BIGINT))
        |ORDER BY doc_id""".stripMargin,
    // range(0, (n-1)//48 + 1) = the window starts strictly inside the
    // token list; list_slice's inclusive end mirrors Spark slice(width)
    "x42_chunk_windows" ->
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS tk FROM documents),
         |w AS (
         |  SELECT doc_id, tk,
         |    unnest(range(0, (len(tk)-1)//48 + 1)) AS i
         |  FROM t WHERE len(tk) > 0)
         |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |  CAST(len(list_slice(tk, i*48+1, LEAST(i*48+64, len(tk)))) AS INTEGER)
         |    AS chunk_tokens,
         |  array_to_string(list_slice(tk, i*48+1, LEAST(i*48+64, len(tk))), ' ')
         |    AS chunk_text
         |FROM w ORDER BY doc_id, chunk_idx""".stripMargin,
    // first corpus-wide occurrence per distinct 16-token segment, then
    // documents rebuilt from survivors in segment order
    "x43_segment_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS tk FROM documents),
         |segs AS (
         |  SELECT doc_id, tk, unnest(range(0, (len(tk)-1)//16 + 1)) AS seg_idx
         |  FROM t WHERE len(tk) > 0),
         |st AS (
         |  SELECT doc_id, seg_idx,
         |    array_to_string(list_slice(tk, seg_idx*16+1,
         |      LEAST(seg_idx*16+16, len(tk))), ' ') AS seg_text
         |  FROM segs),
         |rn AS (
         |  SELECT doc_id, seg_idx, seg_text,
         |    ROW_NUMBER() OVER (PARTITION BY md5(seg_text)
         |      ORDER BY doc_id, seg_idx) AS r
         |  FROM st),
         |per AS (
         |  SELECT doc_id, COUNT(*) AS n_segments,
         |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    COALESCE(string_agg(CASE WHEN r = 1 THEN seg_text END,
         |      ' ' ORDER BY seg_idx), '') AS kept_text
         |  FROM rn GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_segments, 0) AS n_segments,
         |  COALESCE(n_kept, 0) AS n_kept,
         |  COALESCE(kept_text, '') AS kept_text
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // same RE2-compatible pattern strings as the engine; DuckDB needs the
    // explicit 'g' flag to match Spark's replace-all semantics
    "x40_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or call +1-555-' ||
        |    lpad(CAST(doc_id AS VARCHAR), 4, '0') AS synth
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(synth,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(synth,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(synth,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones
        |FROM p ORDER BY doc_id""".stripMargin,
    // per-language prefix sums + integer division — offsets and sequence
    // ids are exact in both engines
    "x39_pack_sequences" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
        |  FROM documents),
        |o AS (
        |  SELECT lang, doc_id, n_bpe,
        |    CAST(SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_offset
        |  FROM t)
        |SELECT lang, doc_id, n_bpe,
        |  end_offset - n_bpe AS begin_offset,
        |  (end_offset - n_bpe) // 512 AS seq_id,
        |  CASE WHEN n_bpe > 0 THEN (end_offset - 1) // 512
        |       ELSE (end_offset - n_bpe) // 512 END AS seq_last,
        |  CAST((CASE WHEN n_bpe > 0 THEN (end_offset - 1) // 512
        |             ELSE (end_offset - n_bpe) // 512 END)
        |    <> (end_offset - n_bpe) // 512 AS INTEGER) AS straddles
        |FROM o ORDER BY lang, doc_id""".stripMargin,
    // integer cross-multiplication thresholds (top·5 > n ⇔ >20%,
    // dup·10 > n·3 ⇔ >30%) — the flag is engine-exact, no float division
    "x38_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS t
        |  FROM documents),
        |tc AS (SELECT doc_id, t, COUNT(*) AS n FROM toks GROUP BY 1, 2),
        |td AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |         COUNT(*) AS n_distinct_tokens,
        |         CAST(MAX(n) AS BIGINT) AS top_token_n FROM tc GROUP BY 1),
        |g0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |g1 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE [] END) AS g FROM g0),
        |gc AS (SELECT doc_id, g, COUNT(*) AS n FROM g1 GROUP BY 1, 2),
        |gd AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_2grams,
        |         COUNT(*) AS n_distinct_2grams,
        |         CAST(MAX(n) AS BIGINT) AS top_2gram_n FROM gc GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(n_tokens, 0) AS n_tokens,
        |  COALESCE(n_distinct_tokens, 0) AS n_distinct_tokens,
        |  COALESCE(top_token_n, 0) AS top_token_n,
        |  COALESCE(n_2grams, 0) AS n_2grams,
        |  COALESCE(n_distinct_2grams, 0) AS n_distinct_2grams,
        |  COALESCE(top_2gram_n, 0) AS top_2gram_n,
        |  CAST(COALESCE(top_token_n, 0) * 5 > COALESCE(n_tokens, 0)
        |    OR (COALESCE(n_2grams, 0) - COALESCE(n_distinct_2grams, 0)) * 10
        |       > COALESCE(n_2grams, 0) * 3 AS INTEGER) AS repetitious
        |FROM documents d
        |LEFT JOIN td USING (doc_id) LEFT JOIN gd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "x27_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |ranked AS (
        |  SELECT doc_id, token, tf,
        |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |  FROM tf)
        |SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
        |  string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END,
        |             ',' ORDER BY doc_id) AS postings
        |FROM ranked GROUP BY token ORDER BY token""".stripMargin,
    "x28_length_histogram" ->
      """WITH b AS (
        |  SELECT len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
        |  FROM documents)
        |SELECT CAST(LENGTH(bin(CAST(n_bpe AS BIGINT))) AS INTEGER) AS bucket,
        |  COUNT(*) AS n_docs, CAST(SUM(n_bpe) AS BIGINT) AS total_tokens,
        |  CAST(MIN(n_bpe) AS INTEGER) AS min_tokens,
        |  CAST(MAX(n_bpe) AS INTEGER) AS max_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "x29_contamination" ->
      """WITH split AS (
        |  SELECT doc_id, text, substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
        |  FROM documents),
        |tetoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS tk
        |  FROM split WHERE h = '0'),
        |tesh0 AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |    ELSE [] END) AS shl
        |  FROM tetoks),
        |ten AS (SELECT doc_id, len(shl) AS n FROM tesh0),
        |tesh AS (SELECT doc_id, unnest(shl) AS s FROM tesh0),
        |trtoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS tk
        |  FROM split WHERE h <> '0' AND h <> '1'),
        |trsh AS (
        |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |    ELSE [] END)) AS s
        |  FROM trtoks),
        |shared AS (
        |  SELECT doc_id, COUNT(*) AS n_shared
        |  FROM tesh JOIN trsh USING (s) GROUP BY 1)
        |SELECT ten.doc_id, CAST(n AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(n_shared, 0) * 5 >= n * 4 AND n > 0 AS INTEGER) AS contaminated
        |FROM ten LEFT JOIN shared USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q39_lateral" ->
      """SELECT n_name, t.c_custkey, t.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,
    // q40/q41: DuckDB runs the same recursive shape; date arithmetic and
    // string casts spelled in its dialect (date_trunc→DATE, VARCHAR).
    "q40_recursive_spine" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
        |         date_trunc('month', MAX(o_orderdate)) AS hi
        |  FROM orders),
        |spine(month_start) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT month_start + INTERVAL 1 MONTH FROM spine
        |  WHERE month_start < (SELECT hi FROM bounds)),
        |monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month_start,
        |         COUNT(*) AS n_orders,
        |         COUNT(DISTINCT o_custkey) AS n_customers
        |  FROM orders GROUP BY 1)
        |SELECT s.month_start,
        |  COALESCE(m.n_orders, 0) AS n_orders,
        |  COALESCE(m.n_customers, 0) AS n_customers
        |FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
        |ORDER BY s.month_start""".stripMargin,
    "q41_recursive_tree" ->
      """WITH RECURSIVE tree(n_nationkey, n_name, depth, path) AS (
        |  SELECT n_nationkey, n_name, 0, CAST(n_nationkey AS VARCHAR)
        |  FROM nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT c.n_nationkey, c.n_name, t.depth + 1,
        |         CONCAT(t.path, '/', CAST(c.n_nationkey AS VARCHAR))
        |  FROM nation c JOIN tree t
        |    ON CAST(FLOOR((c.n_nationkey - 1) / 2) AS INTEGER) = t.n_nationkey
        |   AND c.n_nationkey > 0),
        |cust AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust
        |  FROM customer GROUP BY 1)
        |SELECT t.n_nationkey, t.n_name, t.depth, t.path,
        |  COALESCE(c.n_cust, 0) AS n_customers
        |FROM tree t LEFT JOIN cust c ON c.c_nationkey = t.n_nationkey
        |ORDER BY t.n_nationkey""".stripMargin,
    // x31_approx_percentiles: GK sketch is engine-specific → no SQL
    // oracle; relative error vs exact q32 is asserted in the spec suite.
    "x32_token_entropy" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT lang, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY 1),
        |qq AS (
        |  SELECT tf.lang, n,
        |    CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 10000000000) AS BIGINT) AS q
        |  FROM tf JOIN n USING (lang))
        |SELECT lang, n AS n_tokens, COUNT(*) AS vocab,
        |  CAST(SUM(q) AS DOUBLE) / 10000000000 AS entropy
        |FROM qq GROUP BY lang, n ORDER BY lang""".stripMargin,
    // content-defined boundaries: md5 of the last ≤4 tokens under
    // floor(16^8 / 12) = 0x15555555, forced boundary at the end; then
    // the same first-occurrence dedup + rebuild as x43
    "x49_cdc_dedup" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |bt AS (
         |  SELECT doc_id, tk,
         |    list_filter(range(1, len(tk)+1), i ->
         |      i = len(tk) OR
         |      substring(md5(array_to_string(
         |        list_slice(tk, greatest(1, i-3), i), ' ')), 1, 8)
         |        < '15555555') AS b
         |  FROM t WHERE len(tk) > 0),
         |sj AS (
         |  SELECT doc_id, tk, b, unnest(range(1, len(b)+1)) AS j FROM bt),
         |st AS (
         |  SELECT doc_id, CAST(j - 1 AS INTEGER) AS seg_idx,
         |    array_to_string(list_slice(tk,
         |      CASE WHEN j = 1 THEN 1 ELSE b[j-1] + 1 END, b[j]), ' ')
         |      AS seg_text
         |  FROM sj),
         |rn AS (
         |  SELECT doc_id, seg_idx, seg_text,
         |    ROW_NUMBER() OVER (PARTITION BY md5(seg_text)
         |      ORDER BY doc_id, seg_idx) AS r
         |  FROM st),
         |per AS (
         |  SELECT doc_id, COUNT(*) AS n_segments,
         |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    COALESCE(string_agg(CASE WHEN r = 1 THEN seg_text END,
         |      ' ' ORDER BY seg_idx), '') AS kept_text
         |  FROM rn GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_segments, 0) AS n_segments,
         |  COALESCE(n_kept, 0) AS n_kept,
         |  COALESCE(kept_text, '') AS kept_text
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // mask gate: md5(doc_id:i) hex prefix < floor(16^8 · 0.15) = 0x26666666,
    // i 0-based in both engines (DuckDB's range index is shifted by -1)
    "x47_mask_tokens" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |m AS (
         |  SELECT doc_id, tk,
         |    list_transform(range(1, len(tk)+1),
         |      i -> substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
         |             CAST(i-1 AS VARCHAR)), 1, 8) < '26666666') AS msk
         |  FROM t)
         |SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_masked,
         |  array_to_string(list_transform(range(1, len(tk)+1),
         |    i -> CASE WHEN msk[i] THEN '<MASK>' ELSE tk[i] END), ' ')
         |    AS masked_text
         |FROM m ORDER BY doc_id""".stripMargin,
    // the x11 quality chain + BPE counts, then a per-language
    // quality-ordered running token total with an 8192 budget
    "x48_quality_budget" ->
      s"""WITH t AS (SELECT lang, doc_id, text, $tokSql AS tk FROM documents),
         |c AS (SELECT lang, doc_id, text, tk,
         |  CAST(len(tk) AS DOUBLE) AS n_tok,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(tk, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE) AS stop_cnt,
         |  CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) AS sum_len
         |  FROM t),
         |q AS (SELECT lang, doc_id, ROUND(
         |  LEAST(n_tok/50, 1.0)*0.25 +
         |  (1.0 - CASE WHEN n_chars > 0 THEN punct/n_chars ELSE 0 END)*0.25 +
         |  LEAST(CASE WHEN n_tok > 0 THEN stop_cnt/n_tok ELSE 0 END*5, 1.0)*0.25 +
         |  LEAST(CASE WHEN n_tok > 0 THEN sum_len/n_tok ELSE 0 END/8, 1.0)*0.25, 6) AS quality,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe
         |  FROM c),
         |r AS (SELECT lang, doc_id, quality, n_bpe,
         |  CAST(SUM(n_bpe) OVER (PARTITION BY lang
         |    ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS running
         |  FROM q)
         |SELECT lang, doc_id, quality, n_bpe
         |FROM r WHERE running - n_bpe < 8192
         |ORDER BY lang, doc_id""".stripMargin,
    // bigram conditional surprisal: contexts counted over BIGRAM
    // occurrences (last token of a doc is never a context)
    "x44_bigram_surprisal" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS tk
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i+1])) AS bg
        |  FROM t WHERE len(tk) >= 2),
        |w AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM bi),
        |c2 AS (SELECT bg, COUNT(*) AS c2 FROM w GROUP BY 1),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM w GROUP BY 1),
        |qq AS (
        |  SELECT doc_id,
        |    CAST(FLOOR(-ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
        |      * 10000000000) AS BIGINT) AS q
        |  FROM w JOIN c2 USING (bg) JOIN c1 USING (w1))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(q) AS DOUBLE) / 10000000000 / COUNT(*) AS avg_surprisal
        |FROM qq GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-term KL contributions may be negative; FLOOR on negatives is
    // still deterministic and the sum stays in exact integer space
    "x45_lang_kl_drift" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT lang, token, COUNT(*) AS cl FROM toks GROUP BY 1, 2),
        |nl AS (SELECT lang, CAST(SUM(cl) AS BIGINT) AS nl FROM tf GROUP BY 1),
        |cf AS (SELECT token, CAST(SUM(cl) AS BIGINT) AS c FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM cf),
        |qq AS (
        |  SELECT tf.lang,
        |    CAST(FLOOR((CAST(cl AS DOUBLE) / CAST(nl AS DOUBLE))
        |      * ln((CAST(cl AS DOUBLE) / CAST(nl AS DOUBLE))
        |           / (CAST(c AS DOUBLE) / CAST(n_corpus AS DOUBLE)))
        |      * 10000000000) AS BIGINT) AS q
        |  FROM tf JOIN nl USING (lang) JOIN cf USING (token) CROSS JOIN tot)
        |SELECT lang, COUNT(*) AS vocab,
        |  CAST(SUM(q) AS DOUBLE) / 10000000000 AS kl
        |FROM qq GROUP BY lang ORDER BY lang""".stripMargin,
    "x35_unigram_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
        |  FROM documents),
        |counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
        |total AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM counts),
        |qq AS (
        |  SELECT doc_id,
        |    CAST(FLOOR(-ln(CAST(c AS DOUBLE) / CAST(n_corpus AS DOUBLE))
        |      * 10000000000) AS BIGINT) AS q
        |  FROM toks JOIN counts USING (token) CROSS JOIN total)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(q) AS DOUBLE) / 10000000000 / COUNT(*) AS avg_surprisal
        |FROM qq GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // x34_knn_rerank: the entry runs a corpus-covering overfetch, so
    // both rerank stages execute for real while the output provably
    // equals exact brute force — the same relational statement as x7.
    "x34_knn_rerank" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${normSqSql("embedding")} AS nsq FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    CASE WHEN sqrt(q.nsq)*sqrt(e.nsq) = 0 THEN 0
         |      ELSE ${dotSql("q.embedding", "e.embedding")}/(sqrt(q.nsq)*sqrt(e.nsq)) END AS cos_raw
         |  FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos_raw,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_raw DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id,
         |  ROUND(cos_raw, 6) AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "x33_quantization_error" ->
      """WITH e AS (SELECT vec_id, unnest(embedding) AS val FROM embeddings),
        |m AS (SELECT vec_id, MAX(ABS(CAST(val AS DOUBLE))) AS maxabs
        |      FROM e GROUP BY 1),
        |qq AS (
        |  SELECT e.vec_id, maxabs / 127.0 AS scale,
        |    CAST(FLOOR(CAST(val AS DOUBLE) / (maxabs / 127.0) + 0.5) AS BIGINT) AS q,
        |    CAST(val AS DOUBLE) / (maxabs / 127.0) - CAST(FLOOR(CAST(val AS DOUBLE) / (maxabs / 127.0) + 0.5) AS BIGINT) AS r
        |  FROM e JOIN m USING (vec_id) WHERE maxabs > 0)
        |SELECT vec_id, CAST(COUNT(*) AS INTEGER) AS dim,
        |  MAX(q) AS max_q, MIN(q) AS min_q,
        |  CAST(SUM(CAST(FLOOR(r * r * 1000000000000) AS BIGINT)) AS DOUBLE)
        |    / 1000000000000 / COUNT(*) * (scale * scale) AS mse
        |FROM qq GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin,
    "x13_multimodal" ->
      // DuckDB's sha256 only accepts VARCHAR and hashes its UTF-8 bytes —
      // equal to Spark's sha2(encode(text,'UTF-8'), 256).
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS sha,
        |  CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
  )

  /** Whitespace tokens in DuckDB, matching TextFunctions.tokens. */
  private val tokSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)"""

  /** x58: dup-ngram removal — 1-based token j survives iff no
    * duplicated 3-gram start i covers it (i ≤ j ≤ i+2), mirroring the
    * engine's 0-based boolean mask exactly.
    */
  private val removeDupNgramsSql =
    s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
       |p AS (
       |  SELECT doc_id, i, array_to_string(tk[i:i+2], ' ') AS s
       |  FROM t, UNNEST(range(1, len(tk) - 1)) AS u(i)
       |  WHERE len(tk) >= 3),
       |f AS (
       |  SELECT s FROM (
       |    SELECT s, COUNT(DISTINCT doc_id) AS dfreq FROM p GROUP BY s)
       |  WHERE dfreq >= 2),
       |d AS (SELECT doc_id, list(i) AS starts FROM p JOIN f USING (s)
       |      GROUP BY doc_id),
       |r AS (SELECT t.doc_id, tk, COALESCE(d.starts, []) AS st
       |      FROM t LEFT JOIN d USING (doc_id)),
       |kept AS (SELECT doc_id, tk,
       |  list_transform(list_filter(range(1, len(tk) + 1),
       |    j -> len(list_filter(st, i -> i <= j AND j <= i + 2)) = 0),
       |    j -> tk[j]) AS kt
       |  FROM r)
       |SELECT doc_id,
       |  -- array_to_string([]) is NULL in DuckDB; the engine rebuilds
       |  -- a fully-covered doc as the empty string
       |  COALESCE(array_to_string(kt, ' '), '') AS clean_text,
       |  CAST(len(tk) AS BIGINT) AS n_tokens,
       |  CAST(len(kt) AS BIGINT) AS n_kept
       |FROM kept ORDER BY doc_id""".stripMargin

  /** x57: positional 3-gram coverage — occurrence-level duplicated
    * n-gram fraction per doc, all exact integer counts; `//` is DuckDB
    * integer division, matching the engine's `div`.
    */
  private val dupNgramCoverageSql =
    s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
       |p AS (
       |  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
       |  FROM t, UNNEST(range(1, len(tk) - 1)) AS u(i)
       |  WHERE len(tk) >= 3),
       |f AS (
       |  SELECT s FROM (
       |    SELECT s, COUNT(DISTINCT doc_id) AS dfreq FROM p GROUP BY s)
       |  WHERE dfreq >= 2),
       |n AS (SELECT doc_id, COUNT(*) AS n_shingles FROM p GROUP BY doc_id),
       |d AS (SELECT p.doc_id, COUNT(*) AS n_dup FROM p JOIN f USING (s)
       |      GROUP BY p.doc_id)
       |SELECT n.doc_id,
       |  CAST(n.n_shingles AS BIGINT) AS n_shingles,
       |  CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup,
       |  CAST((COALESCE(d.n_dup, 0) * 10000) // n.n_shingles AS BIGINT)
       |    AS dup_bp
       |FROM n LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  /** x8's 6-bit hyperplane bucket restated exactly: the engine's
    * deterministic coefficients ([[graft.expressions.HyperplaneBucket
    * .coef]]) are emitted as double literals (Double.toString
    * round-trips), and each projection is the same fixed-order
    * left-to-right double sum the compiled kernel runs — the same
    * list_sum machinery the x6/x7 oracles already prove engine-exact.
    * nBits = 6 over the 64-dim embeddings.
    */
  private def hyperplaneBucketSql(vecCol: String): String = {
    val bits = (0 until 6).map { b =>
      val coefs = (0 until 64)
        .map(j => graft.expressions.HyperplaneBucket.coef(b, j))
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip($vecCol, $coefs), " +
        s"x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0 THEN ${1L << b} " +
        "ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** One of x14's 24 five-bit band buckets (hyperplane index =
    * band·5 + bit — [[graft.expressions.HyperplaneBands]]'s layout),
    * restated with the same literal-coefficient fixed-order-sum device
    * as [[hyperplaneBucketSql]].
    */
  private def bandBucketSql(vecCol: String, band: Int): String = {
    val bits = (0 until 5).map { bit =>
      val coefs = (0 until 64)
        .map(j => graft.expressions.HyperplaneBucket.coef(band * 5 + bit, j))
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip($vecCol, $coefs), " +
        s"x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0 THEN ${1L << bit} " +
        "ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** x81's frozen linear quality model restated exactly: the engine's
    * quantized-long weights ([[graft.operators.QualityClassifier
    * .refModel]]) are emitted as integer literals, the feature bucket
    * is the first-16-bits md5 scaling x73 already proves
    * engine-identical, and the logit is an exact integer sum — no
    * float arithmetic anywhere, so the statement is bit-for-bit.
    */
  /** The shared logit CTEs (toks/w/s) for x81/x86: the engine's
    * quantized-long weights as SQL literals + the md5-bucket feature
    * hash — the statement that makes every logit an exact integer in
    * both engines.
    */
  private def qualityLogitCtes: String = {
    val m = graft.operators.QualityClassifier.refModel(seed = 9, dim = 64)
    val wlist = m.weightsQ.mkString("[", ", ", "]")
    def nib(i: Int): String =
      s"(strpos('0123456789abcdef', substr(md5(token),$i,1))-1)"
    val bucket =
      s"(((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) " +
        s"* ${m.dim}) // 65536)" // dim from the model, never a literal
    s"""toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(
       |    lower(COALESCE(text, '')), '\\s+'), x -> length(x) > 0)) AS token
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, list_extract($wlist, $bucket + 1) AS wq
       |  FROM toks),
       |s AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(wq) AS BIGINT) AS wsum
       |  FROM w GROUP BY 1)""".stripMargin
  }

  private def qualityScoreSql: String = {
    val m = graft.operators.QualityClassifier.refModel(seed = 9, dim = 64)
    s"""WITH $qualityLogitCtes
       |SELECT d.doc_id,
       |  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(${m.biasQ} + COALESCE(s.wsum, 0) AS BIGINT) AS logit_q,
       |  (${m.biasQ} + COALESCE(s.wsum, 0)) > 0 AS keep
       |FROM documents d LEFT JOIN s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** x86: the calibration sweep restated — the exact-integer logits of
    * the x81 statement, crossed with the same literal threshold list,
    * confusion counts and basis-point ratios all in integer arithmetic.
    */
  private def qualityCalibrationSql: String = {
    val m = graft.operators.QualityClassifier.refModel(seed = 9, dim = 64)
    val thresholds = graft.queries.Extensions.x86Thresholds
      .map(t => s"(CAST($t AS BIGINT))").mkString(", ")
    s"""WITH $qualityLogitCtes,
       |lg AS (
       |  SELECT d.doc_id,
       |    CAST(${m.biasQ} + COALESCE(s.wsum, 0) AS BIGINT) AS logit,
       |    (length(COALESCE(d.text, '')) % 2 = 0) AS y
       |  FROM documents d LEFT JOIN s USING (doc_id)),
       |t(threshold_q) AS (VALUES $thresholds),
       |c AS (
       |  SELECT threshold_q,
       |    CAST(SUM(CASE WHEN y AND logit > threshold_q
       |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN NOT y AND logit > threshold_q
       |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN NOT y AND logit <= threshold_q
       |      THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |    CAST(SUM(CASE WHEN y AND logit <= threshold_q
       |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM lg, t GROUP BY 1)
       |SELECT threshold_q, tp, fp, tn, fn,
       |  CASE WHEN tp + fp > 0 THEN (tp * 10000) // (tp + fp)
       |       ELSE CAST(-1 AS BIGINT) END AS precision_bp,
       |  CASE WHEN tp + fn > 0 THEN (tp * 10000) // (tp + fn)
       |       ELSE CAST(-1 AS BIGINT) END AS recall_bp
       |FROM c ORDER BY threshold_q""".stripMargin
  }

  private def l2SqSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"

  /** x55: the seeded-quantizer SemDeDup pipeline restated — seed
    * centroids are the 8 lowest-vec_id embeddings (the engine's
    * deterministic id-order init at kmeansIters = 0), assignment is the
    * double-precision squared-L2 argmin with lowest-seed tie-break
    * (bit-for-bit the compiled kernel's arithmetic), pairs compare ONLY
    * within a cell (exactly SemDeDup's approximation), verified at
    * exact cosine ≥ 0.8, clusters closed recursively (x20's
    * construction) and collapsed to min-id representatives with
    * cluster size.
    */
  private val semanticDedupSql =
    s"""WITH RECURSIVE seeds AS (
       |  SELECT vec_id AS sid, embedding AS sv
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY vec_id LIMIT 8)),
       |dist AS (
       |  SELECT e.vec_id, s.sid, ${l2SqSql("e.embedding", "s.sv")} AS d2
       |  FROM embeddings e CROSS JOIN seeds s),
       |assign AS (
       |  SELECT vec_id, sid AS cell FROM (
       |    SELECT vec_id, sid, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY d2, sid) AS rk
       |    FROM dist) WHERE rk = 1),
       |nv AS (SELECT vec_id, embedding, ${normSqSql("embedding")} AS nsq
       |       FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2
       |  FROM assign a JOIN assign b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN nv na ON na.vec_id = a.vec_id
       |  JOIN nv nb ON nb.vec_id = b.vec_id
       |  WHERE ROUND(CASE WHEN sqrt(na.nsq)*sqrt(nb.nsq) = 0 THEN 0
       |    ELSE ${dotSql("na.embedding", "nb.embedding")}/(sqrt(na.nsq)*sqrt(nb.nsq)) END, 6) >= 0.45),
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION
       |  SELECT id2 AS a, id1 AS b FROM pairs),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lab AS (
       |  SELECT a AS vec_id, LEAST(a, MIN(b)) AS cid
       |  FROM reach GROUP BY a)
       |SELECT COALESCE(cid, e.vec_id) AS vec_id, COUNT(*) AS cluster_size
       |FROM embeddings e LEFT JOIN lab USING (vec_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private def normSqSql(c: String): String =
    s"list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  /** Exact word-3-gram Jaccard pairs at >= 0.6 — oracle for both the
    * brute-force x3 and (recall 1.0 on this corpus, asserted in specs)
    * the MinHash-LSH x4.
    */
  /** Shared CTE chain computing the exact 3-gram Jaccard pairs (x3); the
    * x20 oracle extends it with a recursive reachability closure.
    */
  /** x59: the incremental answer the quadratic way — all pairs, then
    * keep the delta-touching ones (delta = doc_id multiples of 7).
    */
  private def incrementalJaccardSql =
    s"""WITH $jaccardPairsCtes
       |SELECT id1, id2, jaccard FROM pairs
       |WHERE id1 % 7 = 0 OR id2 % 7 = 0 ORDER BY id1, id2""".stripMargin

  private val jaccardPairsCtes =
    s"""toks AS (
       |  SELECT doc_id, $tokSql AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
       |    ELSE [] END)) AS s
       |  FROM toks),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id1, id2, ROUND(c*1.0/(s1.n + s2.n - c), 6) AS jaccard
       |  FROM inter JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
       |  WHERE ROUND(c*1.0/(s1.n + s2.n - c), 6) >= 0.6)""".stripMargin

  private val jaccardPairsSql =
    s"""WITH $jaccardPairsCtes
       |SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2""".stripMargin

  /** x20: transitive closure over the pair graph (recursive CTE), then
    * cluster id = min reachable node — semantically identical to the
    * engine's min-label-propagation fixpoint.
    */
  private val dedupClustersSql =
    s"""WITH RECURSIVE $jaccardPairsCtes,
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION
       |  SELECT id2 AS a, id1 AS b FROM pairs),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** x67: bounded recursive walk from the seed set over the pair graph,
    * MIN(dist) per node — shortest walk = shortest path, and the
    * dist < maxHops bound keeps the recursion finite on cycles, exactly
    * mirroring the engine's maxHops BFS horizon.
    */
  private val seedDistanceSql =
    s"""WITH RECURSIVE $jaccardPairsCtes,
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION
       |  SELECT id2 AS a, id1 AS b FROM pairs),
       |walk(id, dist) AS (
       |  SELECT doc_id, 0 FROM documents WHERE doc_id < 100
       |  UNION
       |  SELECT e.b, w.dist + 1 FROM walk w JOIN edges e ON e.a = w.id
       |  WHERE w.dist < 8)
       |SELECT id AS doc_id, MIN(dist) AS dist
       |FROM walk GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** x46: clusters collapsed to their min-id representative with the
    * cluster size and char mass as weights; unpaired docs are singleton
    * clusters of themselves.
    */
  private val dedupRepresentativesSql =
    s"""WITH RECURSIVE $jaccardPairsCtes,
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION
       |  SELECT id2 AS a, id1 AS b FROM pairs),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lab AS (
       |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cid
       |  FROM reach GROUP BY a)
       |SELECT COALESCE(cid, d.doc_id) AS doc_id,
       |  COUNT(*) AS cluster_size,
       |  CAST(SUM(n_chars) AS BIGINT) AS cluster_chars
       |FROM documents d LEFT JOIN lab USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
