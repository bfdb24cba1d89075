package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Wide↔long reshaping and distribution summaries — the warehouse-analytics
  * complement to q28's PIVOT: UNPIVOT (melt) of the measure columns into
  * long form, and a fixed-width histogram (the SQL form of `width_bucket`).
  *
  * Scale: unpivot is an Expand-style per-row expansion (map-side, ×k rows
  * for k measures) followed by a cardinality-bounded hash aggregate — the
  * shuffle carries one row per (measure, group), never the fact table.
  * The histogram's min/max pass is a 1-row global aggregate broadcast back
  * into the bucket expression, then one hash aggregate on ≤ n_buckets keys;
  * both stages partial-aggregate map-side.
  */
object Reshape {

  /** The lineitem measure columns melted by q06 (the fixture's stand-in for
    * the reference's five FLOAT fee measures, `setup.py:89-93`). */
  val measures: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** q06_unpivot — melt the measure columns to (measure, amount) long form,
    * then summarize per measure. Decimal partial sums keep the re-aggregated
    * doubles exact (the q48 pattern). */
  def q06Unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = measures.map(col).toArray,
        variableColumnName = "measure",
        valueColumnName = "amount")
      .groupBy(col("measure"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("amount").cast("decimal(18,4)")).cast("double")
          .as("sum_amount"),
        min(col("amount")).as("min_amount"),
        max(col("amount")).as("max_amount"))
      .orderBy(col("measure"))
  }

  val q06Sql: String = {
    // UNION ALL melt — the dialect-portable spelling of UNPIVOT.
    val arms = measures.map { m =>
      s"SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS amount FROM lineitem"
    }.mkString("\n  UNION ALL ")
    s"""WITH long_form AS (
       |  $arms)
       |SELECT measure, count(*) AS n_rows,
       |       CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_amount,
       |       min(amount) AS min_amount, max(amount) AS max_amount
       |FROM long_form GROUP BY measure ORDER BY measure""".stripMargin
  }

  /** Number of histogram buckets for q07. */
  val nBuckets = 20

  /** q07_histogram — fixed-width histogram of l_extendedprice: a two-pass
    * plan (1-row min/max aggregate, broadcast back via cross join, then a
    * ≤ nBuckets-key hash aggregate). The bucket expression is pure IEEE
    * double arithmetic, bit-identical across engines; the max value is
    * clamped into the last bucket. */
  def q07Histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_extendedprice"))
    val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi"))
    val w = (col("hi") - col("lo")) / lit(nBuckets.toDouble)
    li.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(floor((col("l_extendedprice") - col("lo")) / w),
            lit(nBuckets - 1L))))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(min(col("lo")) + col("bucket") * (min(col("hi")) - min(col("lo")))
          / lit(nBuckets.toDouble), 4).as("bucket_lo"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
      .select(col("bucket"), col("bucket_lo"), col("n_rows"), col("sum_price"))
      .orderBy(col("bucket"))
  }

  val q07Sql: String =
    s"""WITH bounds AS (
       |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
       |  FROM lineitem),
       |bucketed AS (
       |  SELECT CASE WHEN hi = lo THEN 0
       |              ELSE least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / $nBuckets.0)) AS BIGINT), ${nBuckets - 1}) END AS bucket,
       |         l_extendedprice, lo, hi
       |  FROM lineitem, bounds)
       |SELECT bucket,
       |       round(min(lo) + bucket * (min(hi) - min(lo)) / $nBuckets.0, 4) AS bucket_lo,
       |       count(*) AS n_rows,
       |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
       |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin
}
