package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §0.3 and §2.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry;
  * SQL-expressible ones also get a DuckDB 1.0.0 `oracleSql` twin with
  * IDENTICAL output column names and a total row order (the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.multiKeyPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans / sources / sinks
    "q_scan_parquet" -> (ScanOps.scanParquet _),
    "q_scan_schema_projection" -> (ScanOps.scanProjection _),
    "q_scan_csv_roundtrip" -> (ScanOps.scanCsvRoundtrip _),
    "q_scan_json_roundtrip" -> (ScanOps.scanJsonRoundtrip _),
    "q_scan_text_roundtrip" -> (ScanOps.scanTextRoundtrip _),
    "q_scan_orc_roundtrip" -> (ScanOps.scanOrcRoundtrip _),
    "q_scan_partition_pruning" -> (ScanOps.scanPartitionPruning _),
    "q_sink_parquet" -> (ScanOps.sinkParquet _),
    // §2.2 projection / filter
    "q_project_expr" -> (FilterOps.projectExpr _),
    "q_filter_pred" -> (FilterOps.filterPred _),
    "q_filter_null_semantics" -> (FilterOps.filterNullSemantics _),
    // §2.3 joins
    "q_join_broadcast" -> (JoinOps.joinBroadcast _),
    "q_join_shuffle" -> (JoinOps.joinShuffle _),
    "q_join_sortmerge" -> (JoinOps.joinSortMerge _),
    "q_join_outer" -> (JoinOps.joinOuter _),
    "q_join_semi" -> (JoinOps.joinSemi _),
    "q_join_anti" -> (JoinOps.joinAnti _),
    "q_join_theta_range" -> (JoinOps.joinThetaRange _),
    "q_join_self_pairs" -> (JoinOps.joinSelfPairs _),
    "q_join_asof" -> (JoinOps.joinAsof _),
    "q_join_interval" -> (JoinOps.joinInterval _),
    "q_join_bucketed" -> (JoinOps.joinBucketed _),
    "q_join_salted" -> (JoinOps.joinSalted _),
    // SQL-text subquery rewrites (Catalyst decorrelation)
    "q_subquery_scalar" -> (SqlOps.subqueryScalar _),
    "q_subquery_in" -> (SqlOps.subqueryIn _),
    "q_subquery_not_exists" -> (SqlOps.subqueryNotExists _),
    "q_typed_mapgroups" -> (TypedOps.typedMapGroups _),
    // §2.4 aggregations
    "q_agg_global" -> (AggOps.aggGlobal _),
    "q_agg_hash_group" -> (AggOps.aggHashGroup _),
    "q_agg_multi_key_pricing" -> (AggOps.multiKeyPricing _),
    "q_agg_distinct" -> (AggOps.aggDistinct _),
    "q_agg_approx_distinct" -> (AggOps.aggApproxDistinct _),
    "q_agg_approx_percentile" -> (AggOps.aggApproxPercentile _),
    "q_agg_percentile" -> (AggOps.aggPercentile _),
    "q_agg_collect" -> (AggOps.aggCollect _),
    "q_agg_rollup" -> (AggOps.aggRollup _),
    "q_agg_cube" -> (AggOps.aggCube _),
    "q_agg_grouping_sets" -> (AggOps.aggGroupingSets _),
    "q_agg_pivot" -> (AggOps.aggPivot _),
    // §2.5 windows + §2.6 sorts
    "q_win_rank_topn" -> (WindowOps.rankTopN _),
    "q_win_rank_dense" -> (WindowOps.rankDense _),
    "q_win_lag_lead" -> (WindowOps.lagLead _),
    "q_win_frame_rows" -> (WindowOps.frameRows _),
    "q_win_frame_range" -> (WindowOps.frameRange _),
    "q_win_nav_first_last" -> (WindowOps.navFirstLast _),
    "q_sort_multi" -> (WindowOps.sortMulti _),
    "q_limit_topk" -> (WindowOps.limitTopK _),
    "q_sort_within_partitions" -> (WindowOps.sortWithinPartitions _),
    // §2.7 set ops
    "q_set_union_all" -> (SetOps.unionAll _),
    "q_set_union_distinct" -> (SetOps.unionDistinct _),
    "q_set_intersect" -> (SetOps.intersect _),
    "q_set_except" -> (SetOps.except _),
    "q_set_except_all" -> (SetOps.exceptAll _),
    "q_set_intersect_all" -> (SetOps.intersectAll _),
    // §2.8 scalar function families
    "q_fn_string" -> (FnOps.fnString _),
    "q_fn_date" -> (FnOps.fnDate _),
    "q_fn_math" -> (FnOps.fnMath _),
    "q_fn_conditional" -> (FnOps.fnConditional _),
    "q_fn_array" -> (FnOps.fnArray _),
    "q_fn_map" -> (FnOps.fnMap _),
    "q_fn_json" -> (FnOps.fnJson _),
    "q_fn_hash" -> (FnOps.fnHash _),
    "q_fn_bitwise" -> (FnOps.fnBitwise _),
    // §2.10 UDF / UDAF / UDTF
    "q_udf_cosine" -> (UdfOps.udfCosine _),
    "q_udaf_rmse" -> (UdfOps.udafRmse _),
    "q_udtf_tokenize" -> (UdfOps.udtfTokenize _),
    // §2.12 collaborative-filtering recommender
    "q_cf_ratings_derive" -> (CfOps.ratingsDerive _),
    "q_cf_user_means" -> (CfOps.userMeans _),
    "q_cf_item_cosine" -> (CfOps.itemCosine _),
    "q_cf_item_pearson" -> (CfOps.itemPearson _),
    "q_cf_item_jaccard" -> (CfOps.itemJaccard _),
    "q_cf_item_topk_neighbors" -> (CfOps.itemTopkNeighbors _),
    "q_cf_predict_knn" -> (CfOps.predictKnn _),
    "q_cf_eval_rmse" -> (CfOps.evalRmse _),
    "q_cf_als" -> (CfOps.als _),
    // §2.11 LLM-data-pipeline: dedup
    "q_dedup_exact" -> (DedupOps.dedupExact _),
    "q_dedup_near" -> (DedupOps.dedupNear _),
    "q_dedup_minhash_lsh" -> (DedupOps.dedupMinhashLsh _),
    "q_dedup_simhash" -> (DedupOps.dedupSimhash _),
    "q_dedup_embed" -> (DedupOps.dedupEmbed _),
    // §2.11 similarity search + multimodal
    "q_simsearch_topk" -> (SimOps.simsearchTopk _),
    "q_simsearch_ivf" -> (SimOps.simsearchIvf _),
    "q_multimodal_stats" -> (SimOps.multimodalStats _),
    // §2.11 text analysis
    "q_text_stats" -> (TextOps.textStats _),
    "q_text_tfidf" -> (TextOps.textTfidf _),
    "q_text_langid" -> (TextOps.textLangid _),
    "q_text_quality" -> (TextOps.textQuality _),
    "q_text_tokens" -> (TextOps.textTokens _),
    "q_text_fingerprint" -> (TextOps.textFingerprint _),
    // multimodal binary-column plumbing (stubbed decode kernel)
    "q_multimodal_decode" -> (MultimodalOps.multimodalDecode _),
    "q_multimodal_frames" -> (MultimodalOps.multimodalFrames _),
    // §2.9 Structured Streaming (MemoryStream replay of events)
    "q_stream_tumbling" -> (graft.streaming.StreamOps.streamTumbling _),
    "q_stream_sliding" -> (graft.streaming.StreamOps.streamSliding _),
    "q_stream_session" -> (graft.streaming.StreamOps.streamSession _),
    "q_stream_dedup" -> (graft.streaming.StreamOps.streamDedup _),
    "q_stream_stateful" -> (graft.streaming.StreamOps.streamStateful _),
    "q_stream_tws" -> (graft.streaming.StreamOps.streamTws _),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables (table names are bare: `lineitem`, …).
    * Omitted for non-SQL-expressible or approximate ops. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_parquet" -> ScanOps.scanParquetSql,
    "q_scan_schema_projection" -> ScanOps.scanProjectionSql,
    "q_scan_csv_roundtrip" -> ScanOps.scanCsvRoundtripSql,
    "q_scan_json_roundtrip" -> ScanOps.scanJsonRoundtripSql,
    "q_scan_text_roundtrip" -> ScanOps.scanTextRoundtripSql,
    "q_scan_orc_roundtrip" -> ScanOps.scanOrcRoundtripSql,
    "q_scan_partition_pruning" -> ScanOps.scanPartitionPruningSql,
    "q_sink_parquet" -> ScanOps.sinkParquetSql,
    "q_project_expr" -> FilterOps.projectExprSql,
    "q_filter_pred" -> FilterOps.filterPredSql,
    "q_filter_null_semantics" -> FilterOps.filterNullSemanticsSql,
    "q_join_broadcast" -> JoinOps.joinBroadcastSql,
    "q_join_shuffle" -> JoinOps.joinShuffleSql,
    "q_join_sortmerge" -> JoinOps.joinSortMergeSql,
    "q_join_outer" -> JoinOps.joinOuterSql,
    "q_join_semi" -> JoinOps.joinSemiSql,
    "q_join_anti" -> JoinOps.joinAntiSql,
    "q_join_theta_range" -> JoinOps.joinThetaRangeSql,
    "q_join_self_pairs" -> JoinOps.joinSelfPairsSql,
    "q_join_asof" -> JoinOps.joinAsofSql,
    "q_join_interval" -> JoinOps.joinIntervalSql,
    "q_join_bucketed" -> JoinOps.joinBucketedSql,
    "q_join_salted" -> JoinOps.joinSaltedSql,
    "q_subquery_scalar" -> SqlOps.subqueryScalarSql,
    "q_subquery_in" -> SqlOps.subqueryInSql,
    "q_subquery_not_exists" -> SqlOps.subqueryNotExistsSql,
    "q_typed_mapgroups" -> TypedOps.typedMapGroupsSql,
    "q_agg_global" -> AggOps.aggGlobalSql,
    "q_agg_hash_group" -> AggOps.aggHashGroupSql,
    "q_agg_multi_key_pricing" -> AggOps.multiKeyPricingSql,
    "q_agg_distinct" -> AggOps.aggDistinctSql,
    "q_agg_percentile" -> AggOps.aggPercentileSql,
    "q_agg_collect" -> AggOps.aggCollectSql,
    "q_agg_rollup" -> AggOps.aggRollupSql,
    "q_agg_cube" -> AggOps.aggCubeSql,
    "q_agg_grouping_sets" -> AggOps.aggGroupingSetsSql,
    "q_agg_pivot" -> AggOps.aggPivotSql,
    "q_win_rank_topn" -> WindowOps.rankTopNSql,
    "q_win_rank_dense" -> WindowOps.rankDenseSql,
    "q_win_lag_lead" -> WindowOps.lagLeadSql,
    "q_win_frame_rows" -> WindowOps.frameRowsSql,
    "q_win_frame_range" -> WindowOps.frameRangeSql,
    "q_win_nav_first_last" -> WindowOps.navFirstLastSql,
    "q_sort_multi" -> WindowOps.sortMultiSql,
    "q_limit_topk" -> WindowOps.limitTopKSql,
    "q_set_union_all" -> SetOps.unionAllSql,
    "q_set_union_distinct" -> SetOps.unionDistinctSql,
    "q_set_intersect" -> SetOps.intersectSql,
    "q_set_except" -> SetOps.exceptSql,
    "q_set_except_all" -> SetOps.exceptAllSql,
    "q_set_intersect_all" -> SetOps.intersectAllSql,
    "q_fn_string" -> FnOps.fnStringSql,
    "q_fn_date" -> FnOps.fnDateSql,
    "q_fn_math" -> FnOps.fnMathSql,
    "q_fn_conditional" -> FnOps.fnConditionalSql,
    "q_fn_array" -> FnOps.fnArraySql,
    "q_fn_map" -> FnOps.fnMapSql,
    "q_fn_json" -> FnOps.fnJsonSql,
    "q_fn_hash" -> FnOps.fnHashSql,
    "q_fn_bitwise" -> FnOps.fnBitwiseSql,
    "q_udf_cosine" -> UdfOps.udfCosineSql,
    "q_udaf_rmse" -> UdfOps.udafRmseSql,
    "q_udtf_tokenize" -> UdfOps.udtfTokenizeSql,
    "q_cf_ratings_derive" -> CfOps.ratingsDeriveSql,
    "q_cf_user_means" -> CfOps.userMeansSql,
    "q_cf_item_cosine" -> CfOps.itemCosineSql,
    "q_cf_item_pearson" -> CfOps.itemPearsonSql,
    "q_cf_item_jaccard" -> CfOps.itemJaccardSql,
    "q_cf_item_topk_neighbors" -> CfOps.itemTopkNeighborsSql,
    "q_cf_predict_knn" -> CfOps.predictKnnSql,
    "q_cf_eval_rmse" -> CfOps.evalRmseSql,
    // q_cf_als: no oracle — iterative factorization (rows-only check)
    "q_dedup_exact" -> DedupOps.dedupExactSql,
    "q_dedup_near" -> DedupOps.dedupNearSql,
    "q_dedup_minhash_lsh" -> DedupOps.dedupMinhashLshSql,
    "q_dedup_simhash" -> DedupOps.dedupSimhashSql,
    "q_dedup_embed" -> DedupOps.dedupEmbedSql,
    "q_simsearch_topk" -> SimOps.simsearchTopkSql,
    "q_simsearch_ivf" -> SimOps.simsearchIvfSql,
    "q_multimodal_stats" -> SimOps.multimodalStatsSql,
    "q_text_stats" -> TextOps.textStatsSql,
    "q_text_tfidf" -> TextOps.textTfidfSql,
    "q_text_langid" -> TextOps.textLangidSql,
    "q_text_quality" -> TextOps.textQualitySql,
    "q_text_tokens" -> TextOps.textTokensSql,
    "q_text_fingerprint" -> TextOps.textFingerprintSql,
    // multimodal: oracle covers metadata/byte bookkeeping; the stubbed
    // histogram features are asserted in MultimodalSpec instead
    "q_multimodal_decode" -> MultimodalOps.multimodalDecodeSql,
    "q_multimodal_frames" -> MultimodalOps.multimodalFramesSql,
    // streaming: batch-twin oracles (stream result must equal batch SQL)
    "q_stream_tumbling" -> graft.streaming.StreamOps.streamTumblingSql,
    "q_stream_sliding" -> graft.streaming.StreamOps.streamSlidingSql,
    "q_stream_session" -> graft.streaming.StreamOps.streamSessionSql,
    "q_stream_dedup" -> graft.streaming.StreamOps.streamDedupSql,
    "q_stream_stateful" -> graft.streaming.StreamOps.streamStatefulSql,
    "q_stream_tws" -> graft.streaming.StreamOps.streamTwsSql,
  )
}
