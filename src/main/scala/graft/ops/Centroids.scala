package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * subtree for the second consumer. Trade-off: local checkpoint blocks are
  * executor-local and unreplicated, so losing an executor mid-job fails the
  * job rather than recomputing — acceptable for this frame (re-running the
  * job is cheap at |labels|·dim); a long-lived cluster pipeline would use
  * `checkpoint()` to reliable storage instead.
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
    // same exact-integer trick as the component sums: a double→decimal cast
    // of cval² would re-open the cross-engine rounding gap the quantization
    // just closed. cval² ≤ 1 → Σ⌊cval²·2^40⌋ ≤ dim·2^40, exact in BIGINT.
    val norm = cent.groupBy(col("label"))
      .agg((sum(floor(col("cval") * col("cval") * lit(1099511627776.0)))
        .cast("double") / lit(1099511627776.0)).as("sq"))
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
      |         CAST(sum(CAST(floor(cval * cval * 1099511627776.0) AS BIGINT))
      |              AS DOUBLE) / 1099511627776.0 AS sq
      |  FROM cent GROUP BY label)
      |SELECT c.label, c.pos, c.n_vecs, c.cval, c.cval / sqrt(n.sq) AS cval_unit
      |FROM cent c JOIN norm n ON c.label = n.label
      |ORDER BY c.label, c.pos""".stripMargin
}
