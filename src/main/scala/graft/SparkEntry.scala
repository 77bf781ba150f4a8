package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val R = graft.queries.Relational
    Map(
      "q1_pricing_summary" -> (R.q1PricingSummary _),
      "q2_filter_pushdown" -> (R.q2FilterPushdown _),
      "q3_join_agg" -> (R.q3JoinAgg _),
      "q4_broadcast_join" -> (R.q4BroadcastJoin _),
      "q5_multi_join" -> (R.q5MultiJoin _),
      "q6_selective_filter" -> (R.q6SelectiveFilter _),
      "q7_group_having" -> (R.q7GroupHaving _),
      "q8_distinct_count" -> (R.q8DistinctCount _),
      "q9_topk" -> (R.q9TopK _),
      "q10_window_rank" -> (R.q10WindowRank _),
      "q11_semi_anti" -> (R.q11SemiAnti _),
      "q12_conditional_agg" -> (R.q12ConditionalAgg _),
      "q13_outer_join_agg" -> (R.q13OuterJoinAgg _),
      "q14_union_all" -> (R.q14UnionAll _),
      "q15_cte_view" -> (R.q15CteView _),
      "q16_grouping_sets" -> (R.q16GroupingSets _),
      "q17_subquery_avg" -> (R.q17SubqueryAvg _),
      "q18_in_subquery" -> (R.q18InSubquery _),
      "q19_percentile" -> (R.q19Percentile _),
      "q20_approx_distinct" -> (R.q20ApproxDistinct _),
      "q21_asof_join" -> (T.q21AsOfJoin _),
      "q22_ohlcv_resample" -> (T.q22OhlcvResample _),
      "q23_moving_avg" -> (T.q23MovingAvg _),
      "q24_returns" -> (T.q24Returns _),
      "q25_cum_adjustment" -> (T.q25CumAdjustment _),
      "q26_gap_detect" -> (T.q26GapDetect _),
      "q27_sessionize" -> (T.q27Sessionize _),
      "q28_scd2_intervals" -> (T.q28Scd2Intervals _),
      "q29_pit_latest" -> (T.q29PitLatest _),
      "q30_zscore_outliers" -> (T.q30ZscoreOutliers _),
      "q31_dedup_exact" -> (D.q31DedupExact _),
      "q32_dedup_minhash" -> (D.q32DedupMinhash _),
      "q33_dedup_simhash" -> (D.q33DedupSimhash _),
      "q34_ngram_jaccard" -> (D.q34NgramJaccard _),
      "q35_ann_bruteforce" -> (D.q35AnnBruteforce _),
      "q36_ann_lsh" -> (D.q36AnnLsh _),
      "q37_lang_id" -> (D.q37LangId _),
      "q38_quality_score" -> (D.q38QualityScore _),
      "q39_token_count" -> (D.q39TokenCount _),
      "q40_fingerprint" -> (D.q40Fingerprint _),
      "q41_multimodal_meta" -> (D.q41MultimodalMeta _),
      "q42_embedding_stats" -> (D.q42EmbeddingStats _),
      "q43_cosine_dedup" -> (E.q43CosineDedup _),
      "q44_ann_ivf" -> (E.q44AnnIvf _),
      "q45_pivot" -> (E.q45Pivot _),
      "q46_unpivot" -> (E.q46Unpivot _),
      "q47_range_join" -> (E.q47RangeJoin _),
      "q48_salted_join" -> (E.q48SaltedJoin _),
      "q49_merge_upsert" -> (E.q49MergeUpsert _),
      "q50_quality_audit" -> (E.q50QualityAudit _),
      "q51_rolling_corr" -> (E.q51RollingCorr _),
      "q52_sketch_union" -> (E.q52SketchUnion _),
      "q53_cube" -> (E.q53Cube _),
      "q54_window_range_frame" -> (E.q54RangeFrame _),
    )
  }
  private def T = graft.queries.TimeSeries
  private def D = graft.queries.TrainingData
  private def E = graft.queries.Extended
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val R = graft.queries.Relational
    Map(
      "q1_pricing_summary" -> R.q1Sql,
      "q2_filter_pushdown" -> R.q2Sql,
      "q3_join_agg" -> R.q3Sql,
      "q4_broadcast_join" -> R.q4Sql,
      "q5_multi_join" -> R.q5Sql,
      "q6_selective_filter" -> R.q6Sql,
      "q7_group_having" -> R.q7Sql,
      "q8_distinct_count" -> R.q8Sql,
      "q9_topk" -> R.q9Sql,
      "q10_window_rank" -> R.q10Sql,
      "q11_semi_anti" -> R.q11Sql,
      "q12_conditional_agg" -> R.q12Sql,
      "q13_outer_join_agg" -> R.q13Sql,
      "q14_union_all" -> R.q14Sql,
      "q15_cte_view" -> R.q15Sql,
      "q16_grouping_sets" -> R.q16Sql,
      "q17_subquery_avg" -> R.q17Sql,
      "q18_in_subquery" -> R.q18Sql,
      "q19_percentile" -> R.q19Sql,
      "q21_asof_join" -> T.q21Sql,
      "q22_ohlcv_resample" -> T.q22Sql,
      "q23_moving_avg" -> T.q23Sql,
      "q24_returns" -> T.q24Sql,
      "q25_cum_adjustment" -> T.q25Sql,
      "q26_gap_detect" -> T.q26Sql,
      "q27_sessionize" -> T.q27Sql,
      "q28_scd2_intervals" -> T.q28Sql,
      "q29_pit_latest" -> T.q29Sql,
      "q30_zscore_outliers" -> T.q30Sql,
      "q31_dedup_exact" -> D.q31Sql,
      "q35_ann_bruteforce" -> D.q35Sql,
      "q38_quality_score" -> D.q38Sql,
      "q39_token_count" -> D.q39Sql,
      "q41_multimodal_meta" -> D.q41Sql,
      "q42_embedding_stats" -> D.q42Sql,
      "q43_cosine_dedup" -> E.q43Sql,
      "q45_pivot" -> E.q45Sql,
      "q46_unpivot" -> E.q46Sql,
      "q47_range_join" -> E.q47Sql,
      "q48_salted_join" -> E.q48Sql,
      "q49_merge_upsert" -> E.q49Sql,
      "q50_quality_audit" -> E.q50Sql,
      "q51_rolling_corr" -> E.q51Sql,
      "q53_cube" -> E.q53Sql,
      "q54_window_range_frame" -> E.q54Sql,
    )
  }
}
