package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here as a pure function
  * `(SparkSession, sfDir) => DataFrame` plus (where SQL-expressible) a
  * DuckDB oracle query over the same parquet tables. Determinism rules
  * (FIXTURES.md): total order on a unique key set; aggregated doubles go
  * through DECIMAL(18,4) sums cast back to double (exact in both engines);
  * row-level double arithmetic is left unrounded (IEEE-identical).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Ingest.q01Ingest(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_ingest"         -> (Ingest.q01Ingest _),
    "q02_incremental"    -> (Ingest.q02Incremental _),
    "q03_filter"         -> (Relational.q03Filter _),
    "q04_pipeline"       -> (Pipeline.q04Pipeline _),
    "q10_join_broadcast" -> (Relational.q10JoinBroadcast _),
    "q11_join_sortmerge" -> (Relational.q11JoinSortmerge _),
    "q12_join_star"      -> (Relational.q12JoinStar _),
    "q13_join_outer"     -> (Relational.q13JoinOuter _),
    "q14_join_semi"      -> (Relational.q14JoinSemi _),
    "q15_join_range"     -> (Relational.q15JoinRange _),
    "q17_join_theta"     -> (Relational.q17JoinTheta _),
    "q18_join_bucketed"  -> (sources.Bucketing.q18JoinBucketed _),
    "q19_join_bloom"     -> (BloomJoin.q19JoinBloom _),
    "q20_agg_group"      -> (Aggregates.q20AggGroup _),
    "q21_agg_global"     -> (Aggregates.q21AggGlobal _),
    "q22_agg_distinct"   -> (Aggregates.q22AggDistinct _),
    "q23_agg_hll"        -> (Aggregates.q23AggHll _),
    "q24_agg_rollup"     -> (Aggregates.q24AggRollup _),
    "q25_agg_percentile" -> (Aggregates.q25AggPercentile _),
    "q26_agg_custom"     -> (Aggregates.q26AggCustom _),
    "q27_agg_cube"       -> (Aggregates.q27AggCube _),
    "q28_pivot"          -> (Aggregates.q28Pivot _),
    "q29_agg_gsets"      -> (Aggregates.q29AggGsets _),
    "q90_sql"            -> (SqlFrontend.q90SqlQuery _),
    "q30_win_rank"       -> (Windows.q30WinRank _),
    "q31_win_lag"        -> (Windows.q31WinLag _),
    "q32_win_frame"      -> (Windows.q32WinFrame _),
    "q33_topk"           -> (Relational.q33Topk _),
    "q34_union"          -> (Relational.q34Union _),
    "q35_setops"         -> (Relational.q35Setops _),
    "q37_sample"         -> (Sampling.q37Sample _),
    "q40_string"         -> (Scalars.q40String _),
    "q41_datetime"       -> (Scalars.q41Datetime _),
    "q42_math"           -> (Scalars.q42Math _),
    "q43_null"           -> (Scalars.q43Null _),
    "q44_json"           -> (Scalars.q44Json _),
    "q45_links"          -> (Scalars.q45Links _),
    "q16_asof"           -> (Similarity.q16Asof _),
    "q36_dedup"          -> (Dedup.q36Dedup _),
    "q50_similarity"     -> (Similarity.q50Similarity _),
    "q51_textstats"      -> (Text.q51Textstats _),
    "q52_langid"         -> (Text.q52Langid _),
    "q53_quality"        -> (Text.q53Quality _),
    "q54_tokens"         -> (Text.q54Tokens _),
    "q55_fingerprint"    -> (Text.q55Fingerprint _),
    "q56_tfidf"          -> (Tfidf.q56Tfidf _),
    "q60_window_tumbling" -> (Events.q60WindowTumbling _),
    "q61_window_sliding" -> (Events.q61WindowSliding _),
    "q62_sessionize"     -> (Events.q62Sessionize _),
    "q70_minhash_lsh"    -> (Dedup.q70MinhashLsh _),
    "q71_simhash"        -> (Dedup.q71Simhash _),
    "q72_ngram_jaccard"  -> (Dedup.q72NgramJaccard _),
    "q73_embedding_neardup" -> (Similarity.q73EmbeddingNeardup _),
    "q74_ann_topk"       -> (Similarity.q74AnnTopk _),
    "q75_brute_topk"     -> (Similarity.q75BruteTopk _),
    "q76_ivf_topk"       -> (Similarity.q76IvfTopk _),
    "q77_corpus_clean"   -> (Corpus.q77CorpusClean _),
    "q78_quantized_topk" -> (Quantize.q78QuantizedTopk _),
    "q80_multimodal"     -> (Multimodal.q80Multimodal _),
    "q81_media_features" -> (Multimodal.q81MediaFeatures _),
    "q82_frame_sample"   -> (Multimodal.q82FrameSample _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_ingest"         -> Ingest.q01Sql,
    "q02_incremental"    -> Ingest.q02Sql,
    "q03_filter"         -> Relational.q03Sql,
    "q04_pipeline"       -> Pipeline.q04Sql,
    "q10_join_broadcast" -> Relational.q10Sql,
    "q11_join_sortmerge" -> Relational.q11Sql,
    "q12_join_star"      -> Relational.q12Sql,
    "q13_join_outer"     -> Relational.q13Sql,
    "q14_join_semi"      -> Relational.q14Sql,
    "q15_join_range"     -> Relational.q15Sql,
    "q17_join_theta"     -> Relational.q17Sql,
    "q18_join_bucketed"  -> sources.Bucketing.q18Sql,
    "q19_join_bloom"     -> BloomJoin.q19Sql,
    "q20_agg_group"      -> Aggregates.q20Sql,
    "q21_agg_global"     -> Aggregates.q21Sql,
    "q22_agg_distinct"   -> Aggregates.q22Sql,
    "q23_agg_hll"        -> Aggregates.q23Sql,
    "q24_agg_rollup"     -> Aggregates.q24Sql,
    "q25_agg_percentile" -> Aggregates.q25Sql,
    "q26_agg_custom"     -> Aggregates.q26Sql,
    "q27_agg_cube"       -> Aggregates.q27Sql,
    "q28_pivot"          -> Aggregates.q28Sql,
    "q29_agg_gsets"      -> Aggregates.q29Sql,
    "q90_sql"            -> SqlFrontend.q90Sql,
    "q30_win_rank"       -> Windows.q30Sql,
    "q31_win_lag"        -> Windows.q31Sql,
    "q32_win_frame"      -> Windows.q32Sql,
    "q33_topk"           -> Relational.q33Sql,
    "q34_union"          -> Relational.q34Sql,
    "q35_setops"         -> Relational.q35Sql,
    "q37_sample"         -> Sampling.q37Sql,
    "q40_string"         -> Scalars.q40Sql,
    "q41_datetime"       -> Scalars.q41Sql,
    "q42_math"           -> Scalars.q42Sql,
    "q43_null"           -> Scalars.q43Sql,
    "q44_json"           -> Scalars.q44Sql,
    "q45_links"          -> Scalars.q45Sql,
    "q16_asof"           -> Similarity.q16Sql,
    "q36_dedup"          -> Dedup.q36Sql,
    "q50_similarity"     -> Similarity.q50Sql,
    "q51_textstats"      -> Text.q51Sql,
    "q52_langid"         -> Text.q52Sql,
    "q53_quality"        -> Text.q53Sql,
    "q54_tokens"         -> Text.q54Sql,
    "q55_fingerprint"    -> Text.q55Sql,
    "q56_tfidf"          -> Tfidf.q56Sql,
    "q60_window_tumbling" -> Events.q60Sql,
    "q61_window_sliding" -> Events.q61Sql,
    "q62_sessionize"     -> Events.q62Sql,
    "q72_ngram_jaccard"  -> Dedup.q72Sql,
    "q73_embedding_neardup" -> Similarity.q73Sql,
    "q74_ann_topk"       -> Similarity.q74Sql,
    "q75_brute_topk"     -> Similarity.q75Sql,
    "q76_ivf_topk"       -> Similarity.q76Sql,
    "q77_corpus_clean"   -> Corpus.q77Sql,
    "q78_quantized_topk" -> Quantize.q78Sql,
    "q80_multimodal"     -> Multimodal.q80Sql,
    "q81_media_features" -> Multimodal.q81Sql,
    "q82_frame_sample"   -> Multimodal.q82Sql,
  )
}
