package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Feature hashing ("the hashing trick", Weinberger et al. 2009) — the
  * vocabulary-free text vectorizer every large-scale training pipeline
  * uses when a fitted dictionary is impossible: each token maps to
  * `hash(token) mod D` and the document becomes a D-dimensional sparse
  * count vector. No vocabulary broadcast, no dictionary shuffle, no OOV
  * handling — the map side is a pure codegen'd projection, and the only
  * shuffle is the (doc, bucket) count aggregate, which map-side combines.
  *
  * Reference behavior: diogovalentte/nyc_taxi_data_warehouse exposes only
  * fitted string indexing; the hashing form is the scale path this engine
  * adds for 100 TB corpora where the vocabulary itself is TB-sized.
  */
object Vectorize {

  /** Hashed-space dimensionality for q156. Deliberately small (64) so the
    * synthetic vocabulary visibly collides — the collision accounting IS
    * what the audit exercises; production uses 2¹⁸⁺. */
  val NumBuckets = 64L

  /** Token kernel shared bit-for-bit with the DuckDB oracle (same shape as
    * q55's: first/last char + length — exact BIGINT, < 2¹⁵), spread by a
    * congruential map whose multiplier exceeds the modulus (see
    * [[graft.functions.StableHash.intMix62]] for why that matters). */
  private val A = 2654435761L
  private val P = 2147483647L

  /** q156_feature_hash — per-document hashed-vector footprint: token count,
    * occupied bucket count (the sparse vector's nnz), and the exact
    * squared L2 norm Σc² of the bucket-count vector — all BIGINT, so the
    * oracle replays every cell exactly.
    *
    * Scale: explode is map-side; one shuffle on (doc_id, bucket) with
    * map-side combine, then a doc-keyed rollup that reuses the same
    * hash-partitioning (doc_id is a prefix of the first grouping key, so
    * AQE coalesces rather than reshuffles). */
  def q156FeatureHash(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tokval = ascii(substring(col("tok"), 1, 1)) * lit(131L) +
      ascii(col("tok").substr(length(col("tok")), lit(1))) +
      length(col("tok")) * lit(7L)
    val bucket = pmod(pmod(tokval * lit(A) + lit(11L), lit(P)),
      lit(NumBuckets))
    toks
      .select(col("doc_id"), bucket.as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"),
        count(lit(1)).as("nnz"),
        sum(col("c") * col("c")).as("norm_sq"))
      .orderBy(col("doc_id"))
  }

  val q156Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |b AS (
       |  SELECT doc_id,
       |         ((ascii(substring(tok, 1, 1)) * 131
       |           + ascii(right(tok, 1)) + length(tok) * 7)
       |          * $A + 11) % $P % $NumBuckets AS bucket
       |  FROM toks WHERE tok <> ''),
       |v AS (
       |  SELECT doc_id, bucket, count(*) AS c
       |  FROM b GROUP BY doc_id, bucket)
       |SELECT doc_id,
       |       CAST(sum(c) AS BIGINT) AS n_toks,
       |       count(*) AS nnz,
       |       CAST(sum(c * c) AS BIGINT) AS norm_sq
       |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
