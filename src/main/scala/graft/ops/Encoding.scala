package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Leave-one-out target encoding — the feature-engineering staple for
  * high-cardinality categoricals: replace category c on row i by the mean
  * of the target over ALL OTHER rows of c, (S_c − y_i)/(n_c − 1). The
  * leave-one-out form is what production pipelines use to avoid target
  * leakage; the naive mean leaks each row's own label into its feature.
  *
  * Scale shape: one map-side-combinable aggregate at category cardinality,
  * broadcast back over the fact table — the encode side is a pure
  * projection, so the encoded column costs one small-dim broadcast join no
  * matter how many fact rows flow through. Category stats are exact
  * integers (target in cents), so the encoding is one IEEE division per
  * row and hash-matches the oracle bit-for-bit.
  */
object Encoding {

  /** q160_target_encoding — encode supplier by mean line revenue (cents),
    * leave-one-out, emitted for the l_quantity = 50 slice (the slice
    * keeps the checked result compact; the stats deliberately come from
    * the FULL table — encoding a subset against subset-only stats would
    * be a different, weaker feature). Suppliers with a single row encode
    * as NULL (no other row to borrow a mean from). */
  def q160TargetEncoding(spark: SparkSession, sfDir: String): DataFrame = {
    val y = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val li = Tables.lineitem(spark, sfDir)
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("line_id"),
        col("l_suppkey").as("suppkey"), col("l_quantity"), y.as("y"))
    val stats = li.groupBy(col("suppkey"))
      .agg(sum(col("y")).as("s_y"), count(lit(1)).as("n"))
    // stats is supplier-cardinality (SF-linear) — no hint; AQE
    // broadcasts it while it fits and shuffles the join at 100 TB
    li.filter(col("l_quantity") === 50.0)
      .join(stats, Seq("suppkey"))
      .select(col("line_id"), col("suppkey"), col("y"),
        when(col("n") > 1,
          (col("s_y") - col("y")).cast("double") /
            (col("n") - 1).cast("double"))
          .as("loo_mean_cents"))
      // the synthetic lineitem holds duplicate (orderkey, linenumber)
      // pairs, so line_id alone is not a total order — break ties on
      // (suppkey, y) to keep the compare row-aligned across engines
      .orderBy(col("line_id"), col("suppkey"), col("y"))
  }

  val q160Sql: String =
    """WITH li AS (
      |  SELECT l_orderkey * 100 + l_linenumber AS line_id,
      |         l_suppkey AS suppkey, l_quantity,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |              AS BIGINT) AS y
      |  FROM lineitem),
      |stats AS (
      |  SELECT suppkey, CAST(sum(y) AS BIGINT) AS s_y, count(*) AS n
      |  FROM li GROUP BY suppkey)
      |SELECT li.line_id, li.suppkey, li.y,
      |       CASE WHEN stats.n > 1
      |            THEN CAST(stats.s_y - li.y AS DOUBLE)
      |                 / CAST(stats.n - 1 AS DOUBLE)
      |       END AS loo_mean_cents
      |FROM li JOIN stats ON li.suppkey = stats.suppkey
      |WHERE li.l_quantity = 50.0
      |ORDER BY li.line_id, li.suppkey, li.y""".stripMargin
}
