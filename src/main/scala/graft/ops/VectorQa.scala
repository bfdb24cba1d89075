package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-store quality control — the vector-side data-QA stage: a
  * corrupted encoder run shows up first as drifted vector NORMS (zeroed
  * dims, double-scaled batches, un-normalized checkpoints) long before
  * retrieval metrics move. q185 flags per-label norm outliers by median
  * absolute deviation — the robust scale estimator (q115's family) that a
  * few corrupt vectors cannot drag, where stddev-based gates self-mask.
  */
object VectorQa {

  /** q185_vector_qa — per-label embedding-norm profile: count, lower-median
    * norm, MAD, and how many vectors sit more than 3 MADs from their
    * label's median (with the share as one IEEE division).
    *
    * Exactness: the norm is an in-index-order accumulation (the native
    * [[graft.functions.VectorNorm]] loop ≙ DuckDB's per-group unnest
    * scan — the proven q75 float-reduction contract) rounded to 4dp;
    * medians and MADs are PICKS (row_number selections) on rounded
    * values, never float sums; the outlier test compares doubles
    * computed identically in both engines.
    *
    * Scale: norms are map-side per-row work — one codegen'd vector-width
    * loop (`vector_norm`, the q50 promotion route) fused into the scan
    * stage, no shuffle; the median/MAD windows partition by label over
    * label-cardinality-bounded groups. */
  def q185VectorQa(spark: SparkSession, sfDir: String): DataFrame =
    normOutliers(Tables.embeddings(spark, sfDir))

  /** Core of q185 over any (vec_id, embedding, label) frame. */
  def normOutliers(emb: DataFrame): DataFrame = {
    val norms = emb
      .select(col("vec_id"), col("label"),
        round(graft.functions.VectorFunctions.vector_norm(col("embedding")),
          4).as("norm"))
      .localCheckpoint() // feeds median pick, MAD pick, and outlier scan
    val byLabel = Window.partitionBy(col("label"))
    val medPick = Window.partitionBy(col("label"))
      .orderBy(col("norm"), col("vec_id"))
    val med = norms
      .withColumn("rn", row_number().over(medPick))
      .withColumn("n", count(lit(1)).over(byLabel))
      .filter(col("rn") === expr("(n + 1) div 2")) // lower median
      .select(col("label"), col("norm").as("med_norm"), col("n"))
    val dev = norms.join(broadcast(med), "label")
      .withColumn("adev", abs(col("norm") - col("med_norm")))
    val madPick = Window.partitionBy(col("label"))
      .orderBy(col("adev"), col("vec_id"))
    val mad = dev
      .withColumn("rn", row_number().over(madPick))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("label"), col("adev").as("mad"))
    dev.join(broadcast(mad), "label")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        max(col("med_norm")).as("med_norm"),
        max(col("mad")).as("mad"),
        sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("label"), col("n_vecs"), col("med_norm"), col("mad"),
        col("n_outliers"),
        (col("n_outliers").cast("double") / col("n_vecs").cast("double"))
          .as("outlier_share"))
      .orderBy(col("label"))
  }

  val q185Sql: String =
    """WITH norms AS (
      |  SELECT vec_id, label,
      |         round(sqrt(sum(x * x)), 4) AS norm
      |  FROM (SELECT vec_id, label, unnest(embedding)::DOUBLE AS x
      |        FROM embeddings)
      |  GROUP BY vec_id, label),
      |med AS (
      |  SELECT label, norm AS med_norm, n FROM (
      |    SELECT label, norm, vec_id,
      |           row_number() OVER (PARTITION BY label
      |             ORDER BY norm, vec_id) AS rn,
      |           count(*) OVER (PARTITION BY label) AS n
      |    FROM norms)
      |  WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT nr.label, nr.vec_id, nr.norm, m.med_norm, m.n,
      |         abs(nr.norm - m.med_norm) AS adev
      |  FROM norms nr JOIN med m USING (label)),
      |mad AS (
      |  SELECT label, adev AS mad FROM (
      |    SELECT label, adev, vec_id, n,
      |           row_number() OVER (PARTITION BY label
      |             ORDER BY adev, vec_id) AS rn
      |    FROM dev)
      |  WHERE rn = (n + 1) // 2)
      |SELECT d.label, CAST(count(*) AS BIGINT) AS n_vecs,
      |       max(d.med_norm) AS med_norm, max(md.mad) AS mad,
      |       CAST(sum(CASE WHEN d.adev > 3.0 * md.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_outliers,
      |       CAST(sum(CASE WHEN d.adev > 3.0 * md.mad THEN 1 ELSE 0 END)
      |            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS outlier_share
      |FROM dev d JOIN mad md USING (label)
      |GROUP BY d.label ORDER BY d.label""".stripMargin
}
