package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables(spark, "/root/testdata/sf0.001"))

  private def q(fn: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => fn(Tables(spark, dir))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 2.2 relational / OLAP core
    "q1_pricing_summary"   -> q(Relational.pricingSummary),
    "q2_filter_project"    -> q(Relational.filterProject),
    "q3_shipping_priority" -> q(Relational.shippingPriority),
    "q4_order_priority"    -> q(Relational.orderPriority),
    "q5_local_supplier"    -> q(Relational.localSupplier),
    "q6_forecast_revenue"  -> q(Relational.forecastRevenue),
    "q_groupby_having"     -> q(Relational.groupByHaving),
    "q_distinct_agg"       -> q(Relational.distinctAgg),
    "q_topk_per_group"     -> q(Relational.topkPerGroup),
    "q_running_sum"        -> q(Relational.runningSum),
    "q_lag_lead"           -> q(Relational.lagLead),
    "q_rollup"             -> q(Relational.rollupTotals),
    "q_pivot"              -> q(Relational.pivotEventValues),
    "q_union_dedup"        -> q(Relational.unionDedup),
    "q_anti_join"          -> q(Relational.antiJoin),
    "q_percentile"         -> q(Relational.percentiles),
    "q_stats"              -> q(Relational.stats),
    "q_asof_join"          -> q(Relational.asofJoin),
    "q_sessionize"         -> q(Relational.sessionize),
    "q_tumbling_agg"       -> q(Relational.tumblingAgg),
    "q_json_extract"       -> q(Relational.jsonExtract),
    "q7_volume_shipping"   -> q(Relational4.volumeShipping),
    "q8_market_share"      -> q(Relational4.marketShare),
    "q10_returned_items"   -> q(Relational4.returnedItems),
    "q13_cust_distribution"-> q(Relational4.custDistribution),
    "q14_promo_revenue"    -> q(Relational4.promoRevenue),
    "q17_small_qty"        -> q(Relational4.smallQtyRevenue),
    "q18_large_orders"     -> q(Relational4.largeOrders),
    "q19_disjunctive"      -> q(Relational4.disjunctiveRevenue),
    "q_cube"               -> q(Relational2.cubeTotals),
    "q_intersect"          -> q(Relational2.intersectKeys),
    "q_except"             -> q(Relational2.exceptKeys),
    "q_string_funcs"       -> q(Relational2.stringFuncs),
    "q_date_funcs"         -> q(Relational2.dateFuncs),
    "q_salted_skew_agg"    -> q(Relational2.saltedSkewAgg),
    "q_global_topn"        -> q(Relational2.globalTopN),
    "q_case_when"          -> q(Relational2.caseWhen),
    "q_sliding_agg"        -> q(Relational2.slidingAgg),
    "q_forward_fill"       -> q(TimeSeries.forwardFill),
    "q_histogram"          -> q(TimeSeries.histogram),
    "q_latest_by_key"      -> q(Quality.latestByKey),
    "q_scd2"               -> q(Quality.scd2),
    "q_mode_per_key"       -> q(Quality.modePerKey),
    "dedup_fingerprint_groups" -> q(Quality.fingerprintGroups),
    "q_dq_checks"          -> q(Quality.dqChecks),
    "q_full_outer"         -> q(Quality.fullOuter),
    "q_null_safe_join"     -> q(Quality.nullSafeJoin),
    "q_sql_interface"      -> q(Sql.sqlInterface),
    "q_arg_extremes"       -> q(Relational3.argExtremes),
    "q_array_agg"          -> q(Relational3.arrayAgg),
    "q_regex_extract"      -> q(Relational3.regexExtract),
    "q_range_frame"        -> q(Relational3.rangeFrame),
    "q_rank_funcs"         -> q(Relational3.rankFuncs),
    "q_interval_join"      -> q(Relational3.intervalJoin),
    "q_session_window"     -> q(Relational3.sessionWindow),
    "q_moving_average"     -> q(Analytics.movingAverage),
    "q_cohorts"            -> q(Analytics.cohorts),
    "q_funnel"             -> q(Analytics.funnel),
    "q_window_analytics"   -> q(Relational3.windowAnalytics),
    "q_sketch_aggs"        -> q(Relational3.sketchAggs),
    "embed_normalize"      -> q(Embeddings.normalize),
    "embed_centroids"      -> q(Embeddings.centroids),
    "q_profile"            -> q(Profiler.customerProfile),
    // custom whole-operator plan node (heap top-k; graft.plans.TopKPerKey)
    "q_topk_heap"          -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.plans.TopKPerKey(Tables(s, dir).customer, Seq("c_nationkey"),
          Seq(("c_acctbal", false), ("c_custkey", true)), 3)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
    }),
    // 2.1 ETL surface (reference parity)
    "etl_dim_products"     -> q(Etl.dimProducts),
    "etl_dim_customers"    -> q(Etl.dimCustomers),
    "etl_fact_sales"       -> q(Etl.factSales),
    "etl_fact_inventory"   -> q(Etl.factInventory),
    "etl_normalize"        -> q(Etl.normalize),
    // 2.3 dedup
    "dedup_exact"          -> q(Dedup.exact),
    "dedup_ngram_jaccard"  -> q(Dedup.ngramJaccard),
    "dedup_minhash_lsh"    -> q(Dedup.minhashLsh),
    "dedup_simhash"        -> q(Dedup.simhash),
    "dedup_embedding"      -> q(Dedup.embeddingCosine),
    "dedup_editdistance"   -> q(Dedup.editDistance),
    "dedup_clusters"       -> q(Dedup.clusters),
    "text_keywords"        -> q(TextRank.keywords),
    "text_train_test_split"-> q(TextRank.trainTestSplit),
    // 2.4 similarity search
    "ann_bruteforce_topk"  -> q(Similarity.bruteForceTopK),
    "ann_lsh_topk"         -> q(Similarity.lshTopK),
    "ann_ivf_topk"         -> q(Similarity.ivfTopK),
    // 2.5 text analysis
    "text_token_stats"     -> q(TextAnalysis.tokenStats),
    "text_bpe_tokens"      -> q(TextAnalysis.bpeTokens),
    "text_quality"         -> q(TextAnalysis.quality),
    "text_langid"          -> q(TextAnalysis.langId),
    "text_fingerprint"     -> q(TextAnalysis.fingerprint),
    "text_rolling_hash"    -> q(TextAnalysis.rollingHashFingerprint),
    // 2.6 multimodal
    "mm_binary_pipeline"   -> q(Multimodal.binaryPipeline),
    "mm_batched_decode"    -> q(Multimodal.decodeBatched),
    "mm_decode_images"     -> q(Multimodal.decodeImages),
    "mm_resize"            -> ((s, dir) =>
      Multimodal.resize(Multimodal.decodeImages(Tables(s, dir)), 128)),
    "mm_sample_frames"     -> q(Multimodal.sampleFrames(_, 10)),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Relational.pricingSummarySql,
    "q2_filter_project"    -> Relational.filterProjectSql,
    "q3_shipping_priority" -> Relational.shippingPrioritySql,
    "q4_order_priority"    -> Relational.orderPrioritySql,
    "q5_local_supplier"    -> Relational.localSupplierSql,
    "q6_forecast_revenue"  -> Relational.forecastRevenueSql,
    "q_groupby_having"     -> Relational.groupByHavingSql,
    "q_distinct_agg"       -> Relational.distinctAggSql,
    "q_topk_per_group"     -> Relational.topkPerGroupSql,
    "q_running_sum"        -> Relational.runningSumSql,
    "q_lag_lead"           -> Relational.lagLeadSql,
    "q_rollup"             -> Relational.rollupTotalsSql,
    "q_pivot"              -> Relational.pivotEventValuesSql,
    "q_union_dedup"        -> Relational.unionDedupSql,
    "q_anti_join"          -> Relational.antiJoinSql,
    "q_percentile"         -> Relational.percentilesSql,
    "q_stats"              -> Relational.statsSql,
    "q_asof_join"          -> Relational.asofJoinSql,
    "q_sessionize"         -> Relational.sessionizeSql,
    "q_tumbling_agg"       -> Relational.tumblingAggSql,
    "q_json_extract"       -> Relational.jsonExtractSql,
    "q7_volume_shipping"   -> Relational4.volumeShippingSql,
    "q8_market_share"      -> Relational4.marketShareSql,
    "q10_returned_items"   -> Relational4.returnedItemsSql,
    "q13_cust_distribution"-> Relational4.custDistributionSql,
    "q14_promo_revenue"    -> Relational4.promoRevenueSql,
    "q17_small_qty"        -> Relational4.smallQtyRevenueSql,
    "q18_large_orders"     -> Relational4.largeOrdersSql,
    "q19_disjunctive"      -> Relational4.disjunctiveRevenueSql,
    "q_cube"               -> Relational2.cubeTotalsSql,
    "q_intersect"          -> Relational2.intersectKeysSql,
    "q_except"             -> Relational2.exceptKeysSql,
    "q_string_funcs"       -> Relational2.stringFuncsSql,
    "q_date_funcs"         -> Relational2.dateFuncsSql,
    "q_salted_skew_agg"    -> Relational2.saltedSkewAggSql,
    "q_global_topn"        -> Relational2.globalTopNSql,
    "q_case_when"          -> Relational2.caseWhenSql,
    "q_sliding_agg"        -> Relational2.slidingAggSql,
    "q_forward_fill"       -> TimeSeries.forwardFillSql,
    "q_histogram"          -> TimeSeries.histogramSql,
    "q_latest_by_key"      -> Quality.latestByKeySql,
    "q_scd2"               -> Quality.scd2Sql,
    "q_mode_per_key"       -> Quality.modePerKeySql,
    "dedup_fingerprint_groups" -> Quality.fingerprintGroupsSql,
    "q_dq_checks"          -> Quality.dqChecksSql,
    "q_full_outer"         -> Quality.fullOuterSql,
    "q_null_safe_join"     -> Quality.nullSafeJoinSql,
    "q_sql_interface"      -> Sql.sqlInterfaceSql,
    "q_arg_extremes"       -> Relational3.argExtremesSql,
    "q_array_agg"          -> Relational3.arrayAggSql,
    "q_regex_extract"      -> Relational3.regexExtractSql,
    "q_range_frame"        -> Relational3.rangeFrameSql,
    "q_rank_funcs"         -> Relational3.rankFuncsSql,
    "q_interval_join"      -> Relational3.intervalJoinSql,
    "q_session_window"     -> Relational3.sessionWindowSql,
    "q_moving_average"     -> Analytics.movingAverageSql,
    "q_cohorts"            -> Analytics.cohortsSql,
    "q_funnel"             -> Analytics.funnelSql,
    "q_window_analytics"   -> Relational3.windowAnalyticsSql,
    "embed_normalize"      -> Embeddings.normalizeSql,
    "embed_centroids"      -> Embeddings.centroidsSql,
    "q_profile"            -> Profiler.customerProfileSql,
    "q_topk_heap"          ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
        | SELECT c_nationkey, c_custkey, c_name, c_acctbal,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
        | FROM customer)
        |WHERE rk <= 3
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin,
    "etl_dim_products"     -> Etl.dimProductsSql,
    "etl_dim_customers"    -> Etl.dimCustomersSql,
    "etl_fact_sales"       -> Etl.factSalesSql,
    "etl_fact_inventory"   -> Etl.factInventorySql,
    "etl_normalize"        -> Etl.normalizeSql,
    "dedup_exact"          -> Dedup.exactSql,
    "dedup_ngram_jaccard"  -> Dedup.ngramJaccardSql,
    "dedup_minhash_lsh"    -> Dedup.minhashLshSql,
    "dedup_embedding"      -> Dedup.embeddingCosineSql,
    "dedup_editdistance"   -> Dedup.editDistanceSql,
    "dedup_clusters"       -> Dedup.clustersSql,
    "text_keywords"        -> TextRank.keywordsSql,
    "text_train_test_split"-> TextRank.trainTestSplitSql,
    "ann_bruteforce_topk"  -> Similarity.bruteForceTopKSql,
    "text_token_stats"     -> TextAnalysis.tokenStatsSql,
    "text_bpe_tokens"      -> TextAnalysis.bpeTokensSql,
    "text_quality"         -> TextAnalysis.qualitySql,
    "text_langid"          -> TextAnalysis.langIdSql,
    "text_fingerprint"     -> TextAnalysis.fingerprintSql,
  )
}
