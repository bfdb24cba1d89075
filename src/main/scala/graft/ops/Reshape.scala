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

  /** q112_winsorize — robust-statistics clipping: per group, find the p5 /
    * p95 thresholds and clip the measure into [p5, p95], reporting raw vs
    * clipped sums and how many rows each tail clipped. The feature-
    * engineering staple that tames heavy-tailed measures before training.
    *
    * Determinism: thresholds are DISCRETE order statistics (the value at
    * rank ⌈p·n⌉, picked by row_number), NOT interpolated percentiles —
    * engines associate the interpolation arithmetic differently, and a
    * last-ulp threshold difference could flip a clip decision. Ranks use
    * integer ceiling ((n·p + 99) div 100), so both engines select the
    * identical data value; everything after is exact decimal sums.
    *
    * Scale: one window pass per group for ranks (same shuffle as the
    * aggregate), a groups-sized threshold frame broadcast back, map-side
    * clipping. No full sort of the fact table. */
  def q112Winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"))
    val ranked = li.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("l_returnflag"))))
    val thresholds = ranked
      .filter(col("rn") === expr("(n * 5 + 99) div 100") ||
        col("rn") === expr("(n * 95 + 99) div 100"))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("rn") === expr("(n * 5 + 99) div 100"),
          col("l_extendedprice"))).as("p05"),
        min(when(col("rn") === expr("(n * 95 + 99) div 100"),
          col("l_extendedprice"))).as("p95"))
    li.join(broadcast(thresholds), "l_returnflag")
      .withColumn("clipped",
        least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("p05")).as("p05"), min(col("p95")).as("p95"),
        count(when(col("l_extendedprice") < col("p05"), 1))
          .as("n_clipped_low"),
        count(when(col("l_extendedprice") > col("p95"), 1))
          .as("n_clipped_high"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_raw"),
        sum(col("clipped").cast("decimal(18,4)")).cast("double")
          .as("sum_clipped"))
      .orderBy(col("l_returnflag"))
  }

  val q112Sql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_extendedprice,
      |         row_number() OVER (PARTITION BY l_returnflag
      |                            ORDER BY l_extendedprice) AS rn,
      |         count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |thresholds AS (
      |  SELECT l_returnflag,
      |         min(CASE WHEN rn = (n * 5 + 99) // 100
      |                  THEN l_extendedprice END) AS p05,
      |         min(CASE WHEN rn = (n * 95 + 99) // 100
      |                  THEN l_extendedprice END) AS p95
      |  FROM ranked
      |  WHERE rn = (n * 5 + 99) // 100 OR rn = (n * 95 + 99) // 100
      |  GROUP BY l_returnflag)
      |SELECT li.l_returnflag, count(*) AS n_rows,
      |       min(t.p05) AS p05, min(t.p95) AS p95,
      |       count(CASE WHEN li.l_extendedprice < t.p05 THEN 1 END)
      |         AS n_clipped_low,
      |       count(CASE WHEN li.l_extendedprice > t.p95 THEN 1 END)
      |         AS n_clipped_high,
      |       CAST(sum(CAST(li.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |         AS sum_raw,
      |       CAST(sum(CAST(least(greatest(li.l_extendedprice, t.p05), t.p95)
      |                     AS DECIMAL(18,4))) AS DOUBLE) AS sum_clipped
      |FROM lineitem li JOIN thresholds t ON li.l_returnflag = t.l_returnflag
      |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin

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
