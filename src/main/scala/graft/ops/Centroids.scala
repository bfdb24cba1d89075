package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Per-class embedding centroids + L2 normalization — the prototype-vector
  * computation behind class-balanced sampling, centroid-based ANN (q76's IVF
  * seeds), and embedding-drift monitoring in a training-data pipeline.
  *
  * Layout: vectors explode to (label, pos, v) rows, so the centroid is a
  * plain hash aggregate keyed on (label, pos) — map-side partial combine,
  * shuffle cardinality |labels|·dim regardless of corpus size, and no
  * whole-vector array ever crosses a shuffle. Components quantize to
  * ⌊v·2^20⌋ BEFORE summing (float→decimal casts round differently across
  * engines — DuckDB disagreed with Spark at the 9th digit — but floor of a
  * double is exact everywhere), so sums are BIGINT-exact and centroids are
  * bit-identical across any partitioning — the property that lets a drift
  * monitor diff centroids across pipeline runs without a tolerance band.
  * Bounds: |v|≤1 → |Σ⌊v·2^20⌋| ≤ n·2^20 < 2^53 up to n = 8·10^9 per label.
  *
  * The squared-norm re-aggregation reuses the tiny centroid frame via
  * `localCheckpoint` (|labels|·dim rows): computed once, no cache leak
  * (ContextCleaner reclaims it), instead of re-running the explode+agg
  * subtree for the second consumer.
  */
object Centroids {

  /** q79_centroid — per-label centroid components and their L2-normalized
    * form, one row per (label, dimension). */
  def q79Centroid(spark: SparkSession, sfDir: String): DataFrame = {
    val comp = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
    val q = floor(col("v").cast("double") * lit(1048576.0))
    val cent = comp
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(q).cast("double") / (count(lit(1)) * lit(1048576.0)))
          .as("cval"))
      .localCheckpoint()
    val norm = cent.groupBy(col("label"))
      .agg(sum((col("cval") * col("cval")).cast(DecimalType(38, 20)))
        .cast("double").as("sq"))
    cent.join(norm, "label")
      .select(col("label"), col("pos"), col("n_vecs"), col("cval"),
        (col("cval") / sqrt(col("sq"))).as("cval_unit"))
      .orderBy(col("label"), col("pos"))
  }

  val q79Sql: String =
    """WITH pe AS (
      |  SELECT label, unnest(embedding) AS v,
      |         unnest(generate_series(0, len(embedding) - 1)) AS pos
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, pos, CAST(count(*) AS BIGINT) AS n_vecs,
      |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT))
      |              AS DOUBLE) / (count(*) * 1048576.0) AS cval
      |  FROM pe GROUP BY label, pos),
      |norm AS (
      |  SELECT label,
      |         CAST(sum(CAST(cval * cval AS DECIMAL(38,20))) AS DOUBLE) AS sq
      |  FROM cent GROUP BY label)
      |SELECT c.label, c.pos, c.n_vecs, c.cval, c.cval / sqrt(n.sq) AS cval_unit
      |FROM cent c JOIN norm n ON c.label = n.label
      |ORDER BY c.label, c.pos""".stripMargin
}
