package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytic, AsofJoin, Dedup, EventsTime, Funnel, Multimodal, Relational, Similarity, TextOps, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_join_broadcast" -> (Relational.q2JoinBroadcast _),
    "q3_top_orders"     -> (Relational.q3TopOrders _),
    "q4_semi_join"      -> (Relational.q4SemiJoin _),
    "q5_anti_join"      -> (Relational.q5AntiJoin _),
    "q5_multiway"       -> (Relational.q5Multiway _),
    "q6_filter_agg"     -> (Relational.q6FilterAgg _),
    "q10_setops"        -> (Relational.q10SetOps _),
    "q11_distinct"      -> (Relational.q11Distinct _),
    "q12_rollup"        -> (Relational.q12Rollup _),
    "q13_topk"          -> (Relational.q13TopK _),
    "q18_cube"          -> (Relational.q18Cube _),
    "q24_grouping_sets" -> (Relational.q24GroupingSets _),
    "q19_stats"         -> (Relational.q19Stats _),
    "q7_rank_topn"      -> (Windows.q7RankTopN _),
    "q8_running_sum"    -> (Windows.q8RunningSum _),
    "q9_lag_lead"       -> (Windows.q9LagLead _),
    "q15_latest_by_key" -> (Windows.q15LatestByKey _),
    "q16_sessionize"    -> (Windows.q16Sessionize _),
    "q54_range_frame"   -> (Windows.q54RangeFrame _),
    "q20_tumbling"      -> (EventsTime.q20Tumbling _),
    "q21_scalar_funcs"  -> (EventsTime.q21ScalarFuncs _),
    "q23_nullsafe"      -> (EventsTime.q23NullSafe _),
    "q30_text_stats"    -> (TextOps.q30TextStats _),
    "q31_fingerprint"   -> (TextOps.q31Fingerprint _),
    "q32_lang_score"    -> (TextOps.q32LangScore _),
    "q33_exact_dedup"   -> (Dedup.q33ExactDedup _),
    "q38_pii_scrub"     -> (TextOps.q38PiiScrub _),
    "q39_stable_split"  -> (TextOps.q39StableSplit _),
    "q47_seq_pack"      -> ((s, d) => TextOps.q47SeqPack(s, d)),
    "q40_ngram_jaccard" -> (Dedup.q40NgramJaccard _),
    "q45_dup_clusters"  -> (Dedup.q45DupClusters _),
    "q41_minhash_lsh"   -> (Dedup.q41MinhashLsh _),
    "q42_simhash"       -> (Dedup.q42Simhash _),
    "q50_ann_brute"     -> (Similarity.q50AnnBrute _),
    // IVF ANN registers full-probe (provably ≡ q50 exact) so the SQL
    // oracle grades the machinery; the approximate nProbe<C path is the
    // same code, recall-graded in AnnRecallSpec.
    "q51_ann_ivf_fullprobe" -> (Similarity.q51AnnIvfFullProbe _),
    "q52_ann_ivf_indexed_fullprobe" -> (Similarity.q52AnnIvfIndexedFullProbe _),
    "q43_embed_neardup" -> ((s, d) => Similarity.q43EmbedNearDup(s, d)),
    "q14_distinct_agg"  -> (AsofJoin.q14DistinctAgg _),
    "q17_asof"          -> (AsofJoin.q17Asof _),
    "q22_collect"       -> (AsofJoin.q22Collect _),
    "q44_range_join"    -> (AsofJoin.q44RangeJoin _),
    "q60_media_stats"   -> (Multimodal.q60MediaStats _),
    "q25_pivot"         -> (Analytic.q25Pivot _),
    "q26_ntile"         -> (Analytic.q26Ntile _),
    "q27_percentiles"   -> (Analytic.q27Percentiles _),
    "q28_string_funcs"  -> (Analytic.q28StringFuncs _),
    "q29_date_funcs"    -> (Analytic.q29DateFuncs _),
    "q34_json_funcs"    -> (Analytic.q34JsonFuncs _),
    "q35_explode"       -> (Analytic.q35Explode _),
    "q36_hopping"       -> (Analytic.q36Hopping _),
    "q37_salted_agg"    -> (Analytic.q37SaltedAgg _),
    "q46_cdc_apply"     -> (Analytic.q46CdcApply _),
    "q48_funnel"        -> (Funnel.q48Funnel _),
    "q49_retention"     -> (Funnel.q49Retention _),
    "q53_anomaly"       -> (Funnel.q53Anomaly _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"            -> Relational.q1AggSql,
    "q2_join_broadcast" -> Relational.q2JoinBroadcastSql,
    "q3_top_orders"     -> Relational.q3TopOrdersSql,
    "q4_semi_join"      -> Relational.q4SemiJoinSql,
    "q5_anti_join"      -> Relational.q5AntiJoinSql,
    "q5_multiway"       -> Relational.q5MultiwaySql,
    "q6_filter_agg"     -> Relational.q6FilterAggSql,
    "q10_setops"        -> Relational.q10SetOpsSql,
    "q11_distinct"      -> Relational.q11DistinctSql,
    "q12_rollup"        -> Relational.q12RollupSql,
    "q13_topk"          -> Relational.q13TopKSql,
    "q18_cube"          -> Relational.q18CubeSql,
    "q24_grouping_sets" -> Relational.q24GroupingSetsSql,
    "q19_stats"         -> Relational.q19StatsSql,
    "q7_rank_topn"      -> Windows.q7RankTopNSql,
    "q8_running_sum"    -> Windows.q8RunningSumSql,
    "q9_lag_lead"       -> Windows.q9LagLeadSql,
    "q15_latest_by_key" -> Windows.q15LatestByKeySql,
    "q16_sessionize"    -> Windows.q16SessionizeSql,
    "q54_range_frame"   -> Windows.q54RangeFrameSql,
    "q20_tumbling"      -> EventsTime.q20TumblingSql,
    "q21_scalar_funcs"  -> EventsTime.q21ScalarFuncsSql,
    "q23_nullsafe"      -> EventsTime.q23NullSafeSql,
    "q30_text_stats"    -> TextOps.q30TextStatsSql,
    "q31_fingerprint"   -> TextOps.q31FingerprintSql,
    "q32_lang_score"    -> TextOps.q32LangScoreSql,
    "q33_exact_dedup"   -> Dedup.q33ExactDedupSql,
    "q38_pii_scrub"     -> TextOps.q38PiiScrubSql,
    "q39_stable_split"  -> TextOps.q39StableSplitSql,
    "q47_seq_pack"      -> TextOps.q47SeqPackSql(),
    "q40_ngram_jaccard" -> Dedup.nearDupPairsSql,
    "q45_dup_clusters"  -> Dedup.q45DupClustersSql,
    "q41_minhash_lsh"   -> Dedup.nearDupPairsSql,
    "q42_simhash"       -> Dedup.nearDupPairsSql,
    "q50_ann_brute"     -> Similarity.q50AnnBruteSql,
    // Full-probe IVF ≡ brute force by construction (each vector in
    // exactly one probed cell) — the exact oracle applies verbatim.
    "q51_ann_ivf_fullprobe" -> Similarity.q50AnnBruteSql,
    "q52_ann_ivf_indexed_fullprobe" -> Similarity.q50AnnBruteSql,
    "q43_embed_neardup" -> Similarity.q43EmbedNearDupSql,
    "q14_distinct_agg"  -> AsofJoin.q14DistinctAggSql,
    "q17_asof"          -> AsofJoin.q17AsofSql,
    "q22_collect"       -> AsofJoin.q22CollectSql,
    "q44_range_join"    -> AsofJoin.q44RangeJoinSql,
    "q60_media_stats"   -> Multimodal.q60MediaStatsSql,
    "q25_pivot"         -> Analytic.q25PivotSql,
    "q26_ntile"         -> Analytic.q26NtileSql,
    "q27_percentiles"   -> Analytic.q27PercentilesSql,
    "q28_string_funcs"  -> Analytic.q28StringFuncsSql,
    "q29_date_funcs"    -> Analytic.q29DateFuncsSql,
    "q34_json_funcs"    -> Analytic.q34JsonFuncsSql,
    "q35_explode"       -> Analytic.q35ExplodeSql,
    "q36_hopping"       -> Analytic.q36HoppingSql,
    "q37_salted_agg"    -> Analytic.q37SaltedAggSql,
    "q46_cdc_apply"     -> Analytic.q46CdcApplySql,
    "q48_funnel"        -> Funnel.q48FunnelSql,
    "q49_retention"     -> Funnel.q49RetentionSql,
    "q53_anomaly"       -> Funnel.q53AnomalySql,
  )
}
