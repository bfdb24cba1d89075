package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The assembled LLM training-data preprocessing pipeline — this round's
  * flagship composition, built entirely from individually-oracle-checked
  * stages: exact dedup (q36) → PII redaction (q69) → corpus boilerplate
  * removal (q99) → quality gate → overlapping chunking (q100). q110 proves
  * the COMPOSITION with one hash over the emitted chunk set.
  *
  * Stage order is the 100 TB design:
  *  1. Dedup FIRST — the only wide-text shuffle; everything after runs on
  *     unique representatives.
  *  2. Redaction is pure map work on the deduped reps.
  *  3. Boilerplate removal shuffles vocabulary-bounded doc frequencies and
  *     broadcast-anti-joins the (tiny) common-term set. A nice emergent
  *     property the fixture exercises: redaction markers (<EMAIL>, <ID>,
  *     <IP>) land in EVERY document, so the boilerplate stage strips them
  *     automatically — scrub artifacts never reach the training set.
  *  4. The quality gate is a residual predicate on the survivor manifest.
  *  5. Chunking is map-side expansion; output rows carry provenance
  *     (representative id, chunk offset) for audit and joinback.
  *
  * The physical plan re-scans the (doc_id, text)-pruned corpus four times
  * (dedup agg, position explode, term-frequency path, total count) rather
  * than materializing shared intermediates — deliberate: the exploded
  * position frame is larger than the corpus itself, so at scale a pruned
  * parquet re-scan is cheaper than persisting it, and each scan feeds a
  * different aggregation shape Catalyst cannot fuse anyway.
  */
object TrainingPipeline {

  /** Minimum surviving tokens for a doc to be chunked. */
  val MinKeptTokens = 20
  /** Chunk geometry (matches q100). */
  val ChunkSize = 32
  val ChunkStride = 24

  /** The pipeline core over any `(doc_id, text)` frame. */
  def preprocess(docs: DataFrame): DataFrame = {
    // 1. exact dedup: deterministic min-id representative per text
    val rep = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"))
    // 2. plant deterministic PII off the rep id (the fixture corpus is
    //    clean word soup), then redact — THE SAME builder as q69, so the
    //    two oracles cannot drift apart
    val planted = Privacy.plantPii(rep, "keep_id")
    val redacted = planted.select(col("keep_id").as("doc_id"),
      Privacy.redact(col("text")).as("text"))
    // 3. corpus boilerplate removal (includes the redaction markers, which
    //    by construction hit 100% document frequency)
    val cleaned = Text.removeBoilerplate(redacted, Text.boilerplateDocPct)
    // 4. quality gate + 5. chunking with provenance
    Chunking.chunkTokens(
      cleaned.filter(col("n_kept") >= MinKeptTokens)
        .select(col("doc_id").as("keep_id"), col("n_kept"),
          col("clean_text")),
      "clean_text", ChunkSize, ChunkStride)
  }

  /** q110_training_pipeline — the composed path over `documents`. */
  def q110TrainingPipeline(spark: SparkSession, sfDir: String): DataFrame =
    preprocess(Tables.documents(spark, sfDir))
      .orderBy(col("keep_id"), col("chunk_start"))

  val q110Sql: String = {
    val Seq((_, email, _), (_, id, _), (_, ip, _)) = Privacy.piiPatterns
    s"""WITH rep AS (
       |  SELECT text, min(doc_id) AS keep_id FROM documents GROUP BY text),
       |planted AS (
       |  SELECT keep_id,
       |         ${Privacy.plantPiiSql("keep_id")} AS text
       |  FROM rep),
       |red AS (
       |  SELECT keep_id,
       |         regexp_replace(regexp_replace(regexp_replace(text,
       |             '$email', '<EMAIL>', 'g'),
       |             '$id', '<ID>', 'g'),
       |             '$ip', '<IP>', 'g') AS text
       |  FROM planted),
       |pos AS (
       |  SELECT keep_id,
       |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
       |         unnest(string_split(text, ' ')) AS term
       |  FROM red),
       |common AS (
       |  SELECT term FROM pos GROUP BY term
       |  HAVING count(DISTINCT keep_id) * 100 >
       |         ${Text.boilerplateDocPct} * (SELECT count(*) FROM red)),
       |cleaned AS (
       |  SELECT p.keep_id, count(*) AS n_kept,
       |         string_agg(p.term, ' ' ORDER BY p.pos) AS clean_text
       |  FROM pos p ANTI JOIN common c ON p.term = c.term
       |  GROUP BY p.keep_id),
       |gated AS (
       |  SELECT keep_id, n_kept, string_split(clean_text, ' ') AS t
       |  FROM cleaned WHERE n_kept >= $MinKeptTokens)
       |SELECT keep_id, n_kept, s AS chunk_start,
       |       array_to_string(t[s+1: s+$ChunkSize], ' ') AS chunk_text,
       |       least($ChunkSize, n_kept - s) AS n_tokens
       |FROM gated, UNNEST(range(0, n_kept, $ChunkStride)) AS u(s)
       |ORDER BY keep_id, chunk_start""".stripMargin
  }
}
