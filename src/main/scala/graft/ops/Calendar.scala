package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Date-dimension generation — the warehouse table every BI layer joins
  * against, built FROM the data (spanning exactly the fact table's date
  * range) instead of hand-maintained. Weekday math is engine-neutral by
  * construction: day-of-week derives from the epoch-day count
  * ((epoch_day + 3) mod 7, Monday = 0 — 1970-01-01 was a Thursday)
  * rather than from `dayofweek`-style builtins whose numbering differs
  * between engines.
  */
object Calendar {

  /** q199_date_dim — one row per calendar day spanning the orders fact:
    * calendar attributes (year/month/day/quarter, ISO-style weekday,
    * weekend flag, month boundaries) plus that day's order count — the
    * LEFT join proving the dimension is gap-free (rows exist for days
    * with no orders). All-integer output.
    *
    * Scale: the spine is `sequence(min, max)` exploded from a one-row
    * broadcast aggregate — generation is O(days), independent of fact
    * size; the fact side collapses to a date-cardinality count before
    * the join. */
  def q199DateDim(spark: SparkSession, sfDir: String): DataFrame = {
    val span = Tables.orders(spark, sfDir)
      .agg(to_date(min(col("o_orderdate"))).as("d0"),
        to_date(max(col("o_orderdate"))).as("d1"))
    val spine = span
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val perDay = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"))
    spine.join(perDay, Seq("d"), "left")
      .select(col("d").as("date"),
        year(col("d")).as("year"),
        month(col("d")).as("month"),
        dayofmonth(col("d")).as("dom"),
        quarter(col("d")).as("quarter"),
        expr("(datediff(d, DATE '1970-01-01') + 3) % 7").as("dow_mon0"),
        (expr("(datediff(d, DATE '1970-01-01') + 3) % 7") >= 5)
          .as("is_weekend"),
        (dayofmonth(col("d")) === 1).as("is_month_start"),
        (col("d") === last_day(col("d"))).as("is_month_end"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("date"))
  }

  val q199Sql: String =
    """WITH span AS (
      |  SELECT CAST(date_trunc('day', min(o_orderdate)) AS DATE) AS d0,
      |         CAST(date_trunc('day', max(o_orderdate)) AS DATE) AS d1
      |  FROM orders),
      |spine AS (
      |  SELECT CAST(unnest(range(d0, d1 + INTERVAL 1 DAY,
      |                           INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM span),
      |per_day AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT s.d AS date,
      |       CAST(year(s.d) AS INT) AS year,
      |       CAST(month(s.d) AS INT) AS month,
      |       CAST(day(s.d) AS INT) AS dom,
      |       CAST(quarter(s.d) AS INT) AS quarter,
      |       CAST((datediff('day', DATE '1970-01-01', s.d) + 3) % 7
      |            AS INT) AS dow_mon0,
      |       (datediff('day', DATE '1970-01-01', s.d) + 3) % 7 >= 5
      |         AS is_weekend,
      |       day(s.d) = 1 AS is_month_start,
      |       s.d = last_day(s.d) AS is_month_end,
      |       coalesce(p.n_orders, 0) AS n_orders
      |FROM spine s LEFT JOIN per_day p ON p.d = s.d
      |ORDER BY s.d""".stripMargin
}
