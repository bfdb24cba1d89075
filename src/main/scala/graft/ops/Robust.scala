package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Robust statistics for data curation: median/MAD outlier flagging and
  * equal-frequency discretization. Both are rank-based, so the
  * cross-engine contract uses DISCRETE order statistics — an order
  * statistic SELECTS an existing double rather than interpolating one, and
  * selection plus IEEE subtract/abs/compare is bit-identical in any engine
  * (the q112 winsorization rule, extended to two-level medians here).
  *
  * Scale: the per-group medians shuffle once on the group key and pick the
  * (n+1)/2-th element with a window — group cardinality is the fixture's
  * five event types, but the same plan holds for millions of groups since
  * every window partitions by the group key (no global window anywhere).
  * The discretizer ranks with [[Scale.globalRank]] — range-partitioned
  * distributed sort + per-partition windows — not a one-partition global
  * `row_number`, so it survives a 100× scale-up where the naive NTILE
  * plan serializes.
  */
object Robust {

  /** Lower-median (discrete) of `valueCol` per `key`, tie-broken into a
    * total order by `tiebreak`: the element at 1-based position
    * (n+1) div 2. Returns (key, med). */
  private def discreteMedian(df: DataFrame, key: String, valueCol: String,
      tiebreak: String, out: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(valueCol), col(tiebreak))
    df.select(col(key), col(valueCol), col(tiebreak))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(key))))
      // integer div — `/` would be double division under ANSI
      .filter(col("_rn") === expr("(_n + 1) div 2"))
      .select(col(key), col(valueCol).as(out))
  }

  /** q115_mad — per-event-type robust outlier report: discrete median,
    * median absolute deviation (again discrete), and the count of values
    * beyond 3·MAD. Every arithmetic step after selection (subtract, abs,
    * 3·x multiply, compare) is a single IEEE op on identical operands in
    * both engines. */
  def q115Mad(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val med = discreteMedian(ev, "event_type", "value", "event_id", "med")
    val dev = ev.join(med, "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = discreteMedian(
      dev.select(col("event_type"), col("dev"), col("event_id")),
      "event_type", "dev", "event_id", "mad")
    dev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  val q115Sql: String =
    """WITH ranked AS (
      |  SELECT event_type, event_id, value,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY value, event_id) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |med AS (
      |  SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT e.event_type, e.event_id, abs(e.value - m.med) AS dev, m.med
      |  FROM events e JOIN med m ON e.event_type = m.event_type),
      |dranked AS (
      |  SELECT event_type, dev,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY dev, event_id) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type, dev AS mad FROM dranked WHERE rn = (n + 1) // 2)
      |SELECT d.event_type, count(*) AS n_rows, max(d.med) AS med,
      |       max(m.mad) AS mad,
      |       CAST(sum(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m ON d.event_type = m.event_type
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin

  /** Bucket count shared with the oracle. */
  val Buckets = 8

  /** q116_discretize — equal-frequency bucketing of order totals: global
    * 0-based rank over the total order (o_totalprice, o_orderkey) via the
    * distributed [[Scale.globalRank]], bucket = (rank·k) div n + 1 (the
    * even-spread integer scheme; NTILE's front-loaded variant differs only
    * in which buckets carry the remainder), then per-bucket boundaries and
    * decimal-exact sums — the feature-discretization staple. */
  def q116Discretize(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    // One metadata-cheap count job up front: the bucket formula needs the
    // exact row count as a literal (same value the oracle's count(*) OVER ()
    // sees). Integer (rank·k) div n matches the oracle bit-for-bit.
    val n = o.count()
    Scale.globalRank(o, Seq(col("o_totalprice"), col("o_orderkey")))
      .withColumn("bucket", expr(s"(rank_idx * $Buckets) div ${n}L") + 1L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        decSum(col("o_totalprice"), 2).as("sum_price"))
      .orderBy(col("bucket"))
  }

  val q116Sql: String =
    s"""WITH ranked AS (
       |  SELECT o_totalprice,
       |         row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1
       |           AS idx,
       |         count(*) OVER () AS n
       |  FROM orders),
       |bucketed AS (
       |  SELECT o_totalprice, (idx * $Buckets) // n + 1 AS bucket
       |  FROM ranked)
       |SELECT bucket, count(*) AS n_rows,
       |       min(o_totalprice) AS lo, max(o_totalprice) AS hi,
       |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |         AS sum_price
       |FROM bucketed
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------- weighted median

  /** q168_weighted_median — exact quantity-weighted median price per
    * supplier: order each supplier's line items by price and take the first
    * row where the cumulative quantity reaches half the total (the lower
    * weighted median — an exact order statistic, not an interpolation, so
    * it cross-engine hash-matches on raw doubles). The robust "typical
    * price actually paid" statistic — a high-volume cheap line pulls the
    * weighted median down where the unweighted median ignores volume.
    *
    * Scale: the cumulative weight is a window partitioned by supplier
    * (10k+ independent partitions, each bounded by lines-per-supplier);
    * the median pick is `min_by` over the flagged suffix — algebraic, map-
    * side combinable. A mega-group would swap the window for the q25
    * binned-percentile shape; at catalog-shaped cardinalities the
    * per-group sort IS the scalable plan. The tie-break (price, orderkey,
    * linenumber) is total, so cumw is deterministic. */
  def q168WeightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
    val byKey = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
    val cum = li
      .withColumn("cumw", sum(col("qty")).over(
        byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("qty")).over(
        Window.partitionBy(col("l_suppkey"))))
    cum.filter(col("cumw") * 2 >= col("tot"))
      .groupBy(col("l_suppkey"))
      .agg(max(col("tot")).as("tot_qty"),
        count(lit(1)).as("n_upper"),
        min_by(col("price"), col("cumw")).as("wmedian_price"))
      .orderBy(col("l_suppkey"))
  }

  val q168Sql: String =
    """WITH li AS (
      |  SELECT l_suppkey, l_extendedprice AS price,
      |         CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (
      |  SELECT l_suppkey, price,
      |         CAST(sum(qty) OVER (PARTITION BY l_suppkey
      |           ORDER BY price, l_orderkey, l_linenumber
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS cumw,
      |         CAST(sum(qty) OVER (PARTITION BY l_suppkey) AS BIGINT) AS tot
      |  FROM li)
      |SELECT l_suppkey, max(tot) AS tot_qty, count(*) AS n_upper,
      |       arg_min(price, cumw) AS wmedian_price
      |FROM c WHERE cumw * 2 >= tot
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
}
