package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval-overlap join — two sets of time intervals joined on
  * `a.start ≤ b.end AND b.start ≤ a.end` (closed intervals). The naive form
  * is a pure theta join (nested loop, corpus²); the scalable form BINS the
  * timeline: each interval explodes to the fixed-width bins it touches, the
  * join runs as an equi-join on the bin index with the overlap predicate as
  * residual, and pair duplicates (one pair meeting in several bins) drop in
  * a distinct BEFORE any per-pair work. The genomics/occupancy staple.
  *
  * Bin width trades replication (long intervals touch many bins) against
  * join selectivity (wide bins put non-overlapping pairs in one bucket);
  * set it near the typical interval length. Explosion is map-side
  * (`sequence` + `explode`, both codegen'd); the only shuffle is the
  * bin-keyed join itself.
  */
object Intervals {

  /** Bin width for q123: 7 days, matching the B-side interval length. */
  val BinDays = 7L

  /** Overlapping (a, b) interval pairs via the binned equi-join. Inputs
    * carry (id, start, end); output one row per overlapping pair. */
  def overlapJoin(a: DataFrame, b: DataFrame): DataFrame = {
    // bins from epoch-day arithmetic: day granularity is enough for
    // day-aligned intervals, and datediff works on the fixtures'
    // TIMESTAMP_NTZ columns where unix_micros would not
    def binned(df: DataFrame, p: String): DataFrame = df.select(
      col("id").as(s"${p}_id"), col("start").as(s"${p}_start"),
      col("end").as(s"${p}_end"),
      explode(sequence(
        expr(s"datediff(start, DATE'1970-01-01') div $BinDays"),
        expr(s"datediff(end, DATE'1970-01-01') div $BinDays"))).as("bin"))
    binned(a, "a").join(binned(b, "b"), Seq("bin"))
      .filter(col("a_start") <= col("b_end") &&
        col("b_start") <= col("a_end") &&
        // home-bin dedup: an overlapping pair co-occurs in every shared
        // bin, but the bin holding max(a_start, b_start) is shared exactly
        // once (the overlap's first instant lies inside both intervals) —
        // keeping only that match replaces a distinct() over the full pair
        // set with a codegen'd filter, which matters when overlap is dense
        // (the sf0.1 fixture yields ~8M pairs)
        col("bin") === expr(
          s"datediff(greatest(a_start, b_start), DATE'1970-01-01')" +
            s" div $BinDays"))
      .select(col("a_id"), col("a_start"), col("a_end"),
        col("b_id"), col("b_start"), col("b_end"))
  }

  /** q123_interval_overlap — shipment-activity intervals (filtered
    * lineitem rows, synthetic 1–14-day spans) overlapping urgent-order
    * fulfillment windows (order date + 7 days), rolled up per shipment
    * month. The oracle brute-forces the same theta join, so equality
    * proves the binned plan loses and invents nothing. */
  def q123IntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") === 50.0)
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("id"),
        col("l_shipdate").as("start"),
        expr("l_shipdate + (l_linenumber % 14 + 1) * INTERVAL '1' DAY")
          .as("end"))
    val b = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("id"),
        col("o_orderdate").as("start"),
        expr("o_orderdate + INTERVAL '7' DAY").as("end"))
    overlapJoin(a, b)
      .groupBy(date_trunc("month", col("a_start")).as("ship_month"))
      .agg(countDistinct(col("a_id")).as("n_intervals"),
        count(lit(1)).as("n_overlaps"))
      .orderBy(col("ship_month"))
  }

  val q123Sql: String =
    """WITH a AS (
      |  SELECT l_orderkey * 100 + l_linenumber AS id,
      |         l_shipdate AS s,
      |         l_shipdate + (l_linenumber % 14 + 1) * INTERVAL 1 DAY AS e
      |  FROM lineitem WHERE l_quantity = 50.0),
      |b AS (
      |  SELECT o_orderkey AS id, o_orderdate AS s,
      |         o_orderdate + INTERVAL 7 DAY AS e
      |  FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT date_trunc('month', a.s) AS ship_month,
      |       count(DISTINCT a.id) AS n_intervals,
      |       count(*) AS n_overlaps
      |FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
      |GROUP BY 1 ORDER BY ship_month""".stripMargin

  /** q158_concurrency — peak concurrent shipments per supplier by
    * sweep-line: each closed interval [s, e] contributes (+1 at s,
    * −1 at e + 1 day), and the peak is the max running delta-sum in
    * event-time order. O(n log n) with NO join and NO timeline explode —
    * the scalable alternative to q123's binning when the question is
    * "how many at once" rather than "which pairs overlap". The occupancy /
    * connection-pool / fleet-utilization staple.
    *
    * Determinism without a total order: simultaneous events are window
    * PEERS — both engines' default RANGE frame sums ALL deltas at an
    * instant into every peer row, so the running value at time t is the
    * set-function starts(≤t) − ends(<t), independent of any within-tie
    * ordering. (The −1 sits at e + 1 day precisely so that `<` falls out
    * of `≤` at day granularity.)
    *
    * Scale: the sweep partitions by supplier — thousands of independent
    * small sweeps, one shuffle, no single-timeline bottleneck. A global
    * sweep would need the two-pass prefix-sum (per-partition totals
    * broadcast as offsets); keyed sweeps are the common case and stay
    * embarrassingly parallel. */
  def q158Concurrency(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("suppkey"),
        col("l_shipdate").as("s"),
        expr("l_shipdate + (l_linenumber % 14 + 1) * INTERVAL '1' DAY")
          .as("e"))
    val deltas = li.select(col("suppkey"), col("s").as("t"),
        lit(1L).as("delta"))
      .unionAll(li.select(col("suppkey"),
        expr("e + INTERVAL '1' DAY").as("t"), lit(-1L).as("delta")))
    val running = sum(col("delta"))
      .over(Window.partitionBy(col("suppkey")).orderBy(col("t")))
    deltas
      .select(col("suppkey"), running.as("running"))
      .groupBy(col("suppkey"))
      .agg(max(col("running")).as("peak"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .orderBy(col("peak").desc, col("suppkey"))
  }

  val q158Sql: String =
    """WITH li AS (
      |  SELECT l_suppkey AS suppkey, l_shipdate AS s,
      |         l_shipdate + (l_linenumber % 14 + 1) * INTERVAL 1 DAY AS e
      |  FROM lineitem),
      |deltas AS (
      |  SELECT suppkey, s AS t, 1 AS delta FROM li
      |  UNION ALL
      |  SELECT suppkey, e + INTERVAL 1 DAY AS t, -1 AS delta FROM li),
      |run AS (
      |  SELECT suppkey,
      |         sum(delta) OVER (PARTITION BY suppkey ORDER BY t) AS running
      |  FROM deltas)
      |SELECT suppkey, CAST(max(running) AS BIGINT) AS peak,
      |       CAST(count(*) / 2 AS BIGINT) AS n_intervals
      |FROM run GROUP BY suppkey
      |ORDER BY peak DESC, suppkey""".stripMargin
}
