package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document chunking with overlap — the RAG/pretraining staple: split each
  * document into fixed-size token windows with a stride smaller than the
  * window so consecutive chunks share context.
  *
  * Scale: tokenize + window expansion are per-row map work (`split`,
  * `sequence`, `explode`, `slice` — all codegen'd built-ins); output row
  * count is ~n_tokens/stride per document and no shuffle occurs before the
  * determinism sort. On a real cluster the chunker runs at scan speed and
  * the output partitioning follows the input splits — exactly what a 100 TB
  * corpus needs (contrast a groupBy-based chunker, which would shuffle the
  * full corpus once for no semantic gain).
  */
object Chunking {

  /** Core: one row per (doc, chunk): start offset, text, token count.
    * Chunk starts are 0, stride, 2·stride … < n_tokens; the final chunk may
    * be shorter than `size`. Requires stride ≥ 1; overlap = size - stride
    * tokens when stride < size. */
  def chunkTokens(docs: DataFrame, textCol: String, size: Int,
      stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1, "size and stride must be >= 1")
    docs
      .withColumn("__tokens", split(col(textCol), " "))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__tokens")))
      .withColumn("chunk_start",
        explode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(
        docs.columns.filterNot(_ == textCol).map(col).toSeq ++ Seq(
          col("chunk_start").cast("long").as("chunk_start"),
          concat_ws(" ",
            slice(col("__tokens"), col("chunk_start") + 1, lit(size)))
            .as("chunk_text"),
          least(lit(size), col("__n") - col("chunk_start")).cast("long")
            .as("n_tokens")): _*)
  }

  /** q100_chunks — 32-token windows, stride 24 (8-token overlap) over the
    * documents table. */
  def q100Chunks(spark: SparkSession, sfDir: String): DataFrame =
    chunkTokens(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      "text", size = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_start"))

  val q100Sql: String =
    // range(0, n, 24) excludes n; sequence(0, n-1, 24) includes n-1 — the
    // same start set for every n >= 1 (fixture text is never empty).
    // DuckDB list slices are 1-based inclusive like Spark's slice().
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tokens,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents)
      |SELECT doc_id, s AS chunk_start,
      |       array_to_string(tokens[s+1: s+32], ' ') AS chunk_text,
      |       least(32, n - s) AS n_tokens
      |FROM toks, UNNEST(range(0, n, 24)) AS t(s)
      |ORDER BY doc_id, chunk_start""".stripMargin
}
