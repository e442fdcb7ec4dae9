package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q05_join_agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01_pricing_summary _),
    "q02_typed_projection" -> (Queries.q02_typed_projection _),
    "q03_watermark_filter" -> (Queries.q03_watermark_filter _),
    "q04_surrogate_key" -> (Queries.q04_surrogate_key _),
    "q05_join_agg" -> (Queries.q05_join_agg _),
    "q06_broadcast_join" -> (Queries.q06_broadcast_join _),
    "q07_anti_join" -> (Queries.q07_anti_join _),
    "q08_semi_join" -> (Queries.q08_semi_join _),
    "q09_upsert_merge" -> (Queries.q09_upsert_merge _),
    "q10_union_all" -> (Queries.q10_union_all _),
    "q11_topk" -> (Queries.q11_topk _),
    "q12_latest_per_key" -> (Queries.q12_latest_per_key _),
    "q13_explode_tokens" -> (Queries.q13_explode_tokens _),
    "q14_clean_text" -> (Queries.q14_clean_text _),
    "q15_term_score" -> (Queries.q15_term_score _),
    "q16_days_ago" -> (Queries.q16_days_ago _),
    "q17_dedup_exact" -> (Queries.q17_dedup_exact _),
    "q18_distinct_count" -> (Queries.q18_distinct_count _),
    "q19_events_day_agg" -> (Queries.q19_events_day_agg _),
    "q20_running_window" -> (Queries.q20_running_window _),
    "q21_lang_id" -> (QueriesText.q21_lang_id _),
    "q22_quality_score" -> (QueriesText.q22_quality_score _),
    "q23_token_count" -> (QueriesText.q23_token_count _),
    "q24_fingerprint" -> (QueriesText.q24_fingerprint _),
    "q25_ngram_jaccard_pairs" -> (QueriesDedup.q25_ngram_jaccard_pairs _),
    "q26_minhash_lsh_pairs" -> (QueriesDedup.q26_minhash_lsh_pairs _),
    "q27_simhash" -> (QueriesDedup.q27_simhash _),
    "q28_simhash_pairs" -> (QueriesDedup.q28_simhash_pairs _),
    "q29_embedding_cosine_pairs" -> (QueriesDedup.q29_embedding_cosine_pairs _),
    "q30_ann_topk" -> (QueriesDedup.q30_ann_topk _),
    "q31_ann_lsh_topk" -> (QueriesDedup.q31_ann_lsh_topk _),
    "q32_rollup" -> (QueriesRel2.q32_rollup _),
    "q33_asof_join" -> (QueriesRel2.q33_asof_join _),
    "q34_json_extract" -> (QueriesRel2.q34_json_extract _),
    "q35_pivot" -> (QueriesRel2.q35_pivot _),
    "q36_sql_revenue" -> (QueriesRel2.q36_sql_revenue _),
    "q37_sessionize" -> (QueriesRel2.q37_sessionize _),
    "q38_dedup_clusters" -> (QueriesDedup.q38_dedup_clusters _),
    "q39_dedup_keep_one" -> (QueriesDedup.q39_dedup_keep_one _),
    "q40_media_stats" -> (QueriesMedia.q40_media_stats _),
    "q41_frame_sample" -> (QueriesMedia.q41_frame_sample _),
    "q42_cube" -> (QueriesRel2.q42_cube _),
    "q43_quantiles" -> (QueriesRel2.q43_quantiles _),
    "q44_order_gaps" -> (QueriesRel2.q44_order_gaps _),
    "q45_intersect" -> (QueriesRel2.q45_intersect _),
    "q46_except" -> (QueriesRel2.q46_except _),
    "q47_dedup_pipeline" -> (QueriesDedup.q47_dedup_pipeline _),
    "q48_incremental_dedup" -> (QueriesDedup.q48_incremental_dedup _),
    "q49_approx_distinct" -> (QueriesSketch.q49_approx_distinct _),
    "q50_sketch_merge" -> (QueriesSketch.q50_sketch_merge _),
    "q51_phash_media" -> (QueriesMedia.q51_phash_media _),
    "q52_phash_pairs" -> (QueriesMedia.q52_phash_pairs _),
    "q53_star_clusters" -> (QueriesDedup.q53_star_clusters _),
    "q54_indexed_dedup" -> (QueriesDedup.q54_indexed_dedup _),
    "q55_sketch_ledger" -> (QueriesSketch.q55_sketch_ledger _),
    "q56_phash_pairs_collapsed" -> (QueriesMedia.q56_phash_pairs_collapsed _),
    "q57_ann_ivf_topk" -> (QueriesDedup.q57_ann_ivf_topk _),
    "q58_repetition" -> (QueriesCorpus.q58_repetition _),
    "q59_stratified_sample" -> (QueriesCorpus.q59_stratified_sample _),
    "q60_tfidf" -> (QueriesCorpus.q60_tfidf _),
    "q61_ann_ivf_indexed" -> (QueriesCorpus.q61_ann_ivf_indexed _),
    "q62_semantic_dedup" -> (QueriesCorpus.q62_semantic_dedup _),
    "q63_curation_pipeline" -> (QueriesCorpus.q63_curation_pipeline _),
    "q64_range_join" -> (QueriesRel2.q64_range_join _),
    "q65_mixture_weights" -> (QueriesCorpus.q65_mixture_weights _),
    "q66_decontamination" -> (QueriesCorpus.q66_decontamination _),
    "q67_chunking" -> (QueriesCorpus.q67_chunking _),
    "q68_packing" -> (QueriesCorpus.q68_packing _),
    "q69_profile" -> (QueriesRel2.q69_profile _),
    "q70_unpivot" -> (QueriesRel2.q70_unpivot _),
    "q71_orc_roundtrip" -> (QueriesRel2.q71_orc_roundtrip _),
    "q72_salted_agg" -> (QueriesRel2.q72_salted_agg _),
    "q73_bucketed_join" -> (QueriesRel2.q73_bucketed_join _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
