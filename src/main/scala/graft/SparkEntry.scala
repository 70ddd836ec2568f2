package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds DuckDB-runnable ANSI SQL with IDENTICAL output column
  * names (driver sorts columns by name before hashing values). Queries
  * with no SQL-expressible oracle are present in `queries` only (rows>0
  * check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (CoreQueries.q1Pricing _),
    "q2_filter_project"    -> (RelationalQueries.q2FilterProject _),
    "q3_selector"          -> (RelationalQueries.q3Selector _),
    "q4_dim_enrich"        -> (RelationalQueries.q4DimEnrich _),
    "q5_revenue_by_nation" -> (RelationalQueries.q5RevenueByNation _),
    "q6_union_evolve"      -> (RelationalQueries.q6UnionEvolve _),
    "q7_rollup"            -> (RelationalQueries.q7Rollup _),
    "q8_topk"              -> (RelationalQueries.q8TopK _),
    "q9_window_rank"       -> (FunctionQueries.q9WindowRank _),
    "q10_rolling"          -> (FunctionQueries.q10Rolling _),
    "q11_distinct"         -> (RelationalQueries.q11Distinct _),
    "q12_buckets"          -> (RelationalQueries.q12Buckets _),
    "q13_json_extract"     -> (FunctionQueries.q13JsonExtract _),
    "q14_strings"          -> (FunctionQueries.q14Strings _),
    "q15_hash_key"         -> (FunctionQueries.q15HashKey _),
    "q16_case_route"       -> (FunctionQueries.q16CaseRoute _),
    "q17_source_summary"   -> (RelationalQueries.q17SourceSummary _),
    "q18_anti_join"        -> (RelationalQueries.q18AntiJoin _),
    "q19_intersect"        -> (RelationalQueries.q19Intersect _),
    "q20_except"           -> (RelationalQueries.q20Except _),
    "q21_monthly"          -> (FunctionQueries.q21Monthly _),
    "q22_section_stats"    -> (RelationalQueries.q22SectionStats _),
    "q23_sessionize"       -> (FunctionQueries.q23Sessionize _),
    "q24_token_stats"      -> (ExtensionQueries.q24TokenStats _),
    "q25_quality"          -> (ExtensionQueries.q25Quality _),
    "q26_langid"           -> (ExtensionQueries.q26LangId _),
    "q27_fingerprint"      -> (ExtensionQueries.q27Fingerprint _),
    "q28_exact_dedup"      -> (ExtensionQueries.q28ExactDedup _),
    "q29_minhash_sig"      -> (ExtensionQueries.q29MinhashSig _),
    "q30_lsh_neardup"      -> (ExtensionQueries.q30LshNearDup _),
    "q31_simhash"          -> (ExtensionQueries.q31Simhash _),
    "q32_jaccard_pairs"    -> (ExtensionQueries.q32JaccardPairs _),
    "q33_embed_neardup"    -> (ExtensionQueries.q33EmbedNearDup _),
    "q34_knn_brute"        -> (ExtensionQueries.q34KnnBrute _),
    "q35_knn_ivf"          -> (ExtensionQueries.q35KnnIvf _),
    "q36_struct_text"      -> (SourceQueries.q36StructText _),
    "q37_path_glob"        -> (SourceQueries.q37PathGlob _),
    "q38_line_router"      -> (SourceQueries.q38LineRouter _),
    "q39_stream_window"    -> (PipelineQueries.q39StreamWindow _),
    "q40_pipeline"         -> (PipelineQueries.q40Pipeline _),
    "q41_rolling_fp"       -> (ExtensionQueries.q41RollingFp _),
    "q42_multimodal"       -> (ExtensionQueries.q42Multimodal _),
    "q43_typed_sessionize" -> (PipelineQueries.q43TypedSessionize _),
    "q44_semi_join"        -> (RelationalQueries.q44SemiJoin _),
    "q45_catalog_read"     -> (RelationalQueries.q45CatalogRead _),
    "q46_centroids"        -> (ExtensionQueries.q46Centroids _),
    "q47_dup_clusters"     -> (ExtensionQueries.q47DupClusters _),
    "q48_range_window"     -> (FunctionQueries.q48RangeWindow _),
    "q49_cube"             -> (FunctionQueries.q49Cube _),
    "q50_percentiles"      -> (FunctionQueries.q50Percentiles _),
    "q51_from_json"        -> (FunctionQueries.q51FromJson _),
    "q52_asof_join"        -> (FunctionQueries.q52AsofJoin _),
    "q53_topk_per_key"     -> (FunctionQueries.q53TopKPerKey _),
    "q54_bigram_vocab"     -> (ExtensionQueries.q54BigramVocab _),
    "q55_contamination"    -> (ExtensionQueries.q55Contamination _),
    "q56_repetition"       -> (ExtensionQueries.q56Repetition _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> CoreQueries.q1PricingSql,
    "q2_filter_project"    -> RelationalQueries.q2Sql,
    "q3_selector"          -> RelationalQueries.q3Sql,
    "q4_dim_enrich"        -> RelationalQueries.q4Sql,
    "q5_revenue_by_nation" -> RelationalQueries.q5Sql,
    "q6_union_evolve"      -> RelationalQueries.q6Sql,
    "q7_rollup"            -> RelationalQueries.q7Sql,
    "q8_topk"              -> RelationalQueries.q8Sql,
    "q9_window_rank"       -> FunctionQueries.q9Sql,
    "q10_rolling"          -> FunctionQueries.q10Sql,
    "q11_distinct"         -> RelationalQueries.q11Sql,
    "q12_buckets"          -> RelationalQueries.q12Sql,
    "q13_json_extract"     -> FunctionQueries.q13Sql,
    "q14_strings"          -> FunctionQueries.q14Sql,
    "q15_hash_key"         -> FunctionQueries.q15Sql,
    "q16_case_route"       -> FunctionQueries.q16Sql,
    "q17_source_summary"   -> RelationalQueries.q17Sql,
    "q18_anti_join"        -> RelationalQueries.q18Sql,
    "q19_intersect"        -> RelationalQueries.q19Sql,
    "q20_except"           -> RelationalQueries.q20Sql,
    "q21_monthly"          -> FunctionQueries.q21Sql,
    "q22_section_stats"    -> RelationalQueries.q22Sql,
    "q23_sessionize"       -> FunctionQueries.q23Sql,
    "q24_token_stats"      -> ExtensionQueries.q24Sql,
    "q25_quality"          -> ExtensionQueries.q25Sql,
    "q26_langid"           -> ExtensionQueries.q26Sql,
    "q27_fingerprint"      -> ExtensionQueries.q27Sql,
    "q28_exact_dedup"      -> ExtensionQueries.q28Sql,
    "q29_minhash_sig"      -> ExtensionQueries.q29Sql,
    "q30_lsh_neardup"      -> ExtensionQueries.q30Sql,
    "q31_simhash"          -> ExtensionQueries.q31Sql,
    "q32_jaccard_pairs"    -> ExtensionQueries.q32Sql,
    "q33_embed_neardup"    -> ExtensionQueries.q33Sql,
    "q34_knn_brute"        -> ExtensionQueries.q34Sql,
    "q35_knn_ivf"          -> ExtensionQueries.q35Sql,
    "q36_struct_text"      -> SourceQueries.q36Sql,
    "q37_path_glob"        -> SourceQueries.q37Sql,
    "q38_line_router"      -> SourceQueries.q38Sql,
    "q39_stream_window"    -> PipelineQueries.q39Sql,
    "q40_pipeline"         -> PipelineQueries.q40Sql,
    "q41_rolling_fp"       -> ExtensionQueries.q41Sql,
    "q42_multimodal"       -> ExtensionQueries.q42Sql,
    "q43_typed_sessionize" -> PipelineQueries.q43Sql,
    "q44_semi_join"        -> RelationalQueries.q44Sql,
    "q45_catalog_read"     -> RelationalQueries.q45Sql,
    "q46_centroids"        -> ExtensionQueries.q46Sql,
    "q47_dup_clusters"     -> ExtensionQueries.q47Sql,
    "q48_range_window"     -> FunctionQueries.q48Sql,
    "q49_cube"             -> FunctionQueries.q49Sql,
    "q50_percentiles"      -> FunctionQueries.q50Sql,
    "q51_from_json"        -> FunctionQueries.q51Sql,
    "q52_asof_join"        -> FunctionQueries.q52Sql,
    "q53_topk_per_key"     -> FunctionQueries.q53Sql,
    "q54_bigram_vocab"     -> ExtensionQueries.q54Sql,
    "q55_contamination"    -> ExtensionQueries.q55Sql,
    "q56_repetition"       -> ExtensionQueries.q56Sql
  )
}
