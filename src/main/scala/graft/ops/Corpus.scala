package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The composed training-corpus cleaning pipeline — the operation an LLM
  * data pipeline actually runs, assembled from the tier-X primitives:
  * exact dedup (q36) → language-ID (q52) → quality scoring (q53) →
  * threshold filter. Each stage is individually oracle-checked; q77 proves
  * the COMPOSITION is too (one hash over the surviving corpus manifest).
  *
  * Stage order is the 100 TB design:
  *  1. Dedup FIRST — the only stage that must shuffle the wide `text`
  *     column, and deduping before enrichment means every later stage runs
  *     on unique docs only (on a crawl corpus that is a 2-5× saving).
  *  2. Language scores are pure per-row expressions (zero shuffle, inside
  *     WholeStageCodegen), computed on the deduped representatives.
  *  3. Token metrics explode to (keep_id, tok) — text itself is NOT
  *     carried through the explode, so the aggregation shuffles narrow
  *     rows and map-side partial combine collapses them to one row per
  *     doc per partition before the exchange.
  *  4. The metrics join back on keep_id (narrow ⋈ narrow), the filter is
  *     a residual predicate, and the output is the cleaning manifest
  *     (ids + metrics), not the text — readers join the manifest back to
  *     the corpus by id when materializing the training set.
  */
object Corpus {

  /** Keep docs with at least this many whitespace tokens… */
  val MinTokens = 20
  /** …and at least this composite quality score (fixture median ≈ 0.41,
    * so the gate does real work at every SF). */
  val MinQuality = 0.35

  /** The pipeline core over any `(doc_id, text)` frame — unordered manifest
    * of survivors. q77 wraps it with the fixture read + determinism sort;
    * CorpusSpec drives it with planted duplicates and junk docs. */
  def clean(docs: DataFrame): DataFrame = {
    val rep = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    val scored = Text.withLangScores(rep)
      .select(col("keep_id"), col("n_copies"),
        Text.langPredCol.as("pred_lang"), col("text"))
    val metrics = rep
      .select(col("keep_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("keep_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).as("sum_tok_len"),
        sum(when(col("tok").isin(Text.stopwords: _*), 1L).otherwise(0L))
          .as("n_stop"))
    scored.drop("text")
      .join(metrics, "keep_id")
      .withColumn("quality_score", Text.qualityScoreCol)
      .filter(col("n_tokens") >= MinTokens &&
        col("quality_score") >= MinQuality)
      .select(col("keep_id"), col("pred_lang"), col("n_tokens"),
        col("quality_score"), col("n_copies"))
  }

  /** q77_corpus_clean — dedup → langid → quality → filter; returns the
    * surviving-corpus manifest ordered by representative id. */
  def q77CorpusClean(spark: SparkSession, sfDir: String): DataFrame =
    clean(Tables.documents(spark, sfDir))
      .orderBy(col("keep_id"))

  val q77Sql: String = {
    val stops = Text.stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""WITH rep AS (
       |  SELECT text, min(doc_id) AS keep_id, count(*) AS n_copies
       |  FROM documents GROUP BY text),
       |scored0 AS (
       |  SELECT keep_id, n_copies, text,
       |         ${Text.langScoreSqlExprs}
       |  FROM rep),
       |scored AS (
       |  SELECT keep_id, n_copies, ${Text.langCaseSql} AS pred_lang
       |  FROM scored0),
       |toks AS (
       |  SELECT keep_id, unnest(string_split(text, ' ')) AS tok FROM rep),
       |m AS (
       |  SELECT keep_id, count(*) AS n_tokens,
       |         sum(length(tok)) AS sum_tok_len,
       |         sum(CASE WHEN tok IN $stops THEN 1 ELSE 0 END) AS n_stop
       |  FROM toks WHERE tok <> '' GROUP BY keep_id),
       |q AS (
       |  SELECT s.keep_id, s.pred_lang, m.n_tokens,
       |         ${Text.qualityScoreSql("m.")} AS quality_score,
       |         s.n_copies
       |  FROM scored s JOIN m ON s.keep_id = m.keep_id)
       |SELECT keep_id, pred_lang, n_tokens, quality_score, n_copies
       |FROM q
       |WHERE n_tokens >= $MinTokens AND quality_score >= $MinQuality
       |ORDER BY keep_id""".stripMargin
  }
}
