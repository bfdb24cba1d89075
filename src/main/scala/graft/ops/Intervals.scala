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

  /** Binned overlap COUNT join — same binning as [[overlapJoin]], but for
    * aggregate consumers that never look at B's payload: B is first
    * compressed to its distinct (start, end) intervals with a multiplicity
    * count, the binned equi-join runs against that compressed side, and
    * each surviving (a, b-interval) match carries `b_cnt`. Output: one row
    * per (a row × distinct overlapping B interval) with the multiplicity.
    *
    * Why it matters at scale: the pair cardinality of a dense overlap join
    * grows as |A|·|B| over a FIXED time span — both sides grow linearly
    * with data volume, so pairs grow quadratically (measured on the
    * fixtures: 18k pairs at sf0.01 → 1.87M at sf0.1). Day-aligned windows
    * collapse to ≤ one distinct interval per (start-day, length), so the
    * compressed join's output is bounded by |A| × distinct-B-intervals-
    * per-A-window — time-span-bounded, NOT |B|-bounded. Σ b_cnt and
    * match-existence reproduce count(*) and countDistinct over the full
    * pair set exactly. */
  def overlapCountJoin(a: DataFrame, b: DataFrame): DataFrame = {
    val bAgg = b.groupBy(col("start"), col("end"))
      .agg(count(lit(1)).as("b_cnt"))
    def binned(df: DataFrame, p: String, extra: Seq[String]): DataFrame =
      df.select((extra.map(col) ++ Seq(
        col("start").as(s"${p}_start"), col("end").as(s"${p}_end"),
        explode(sequence(
          expr(s"datediff(start, DATE'1970-01-01') div $BinDays"),
          expr(s"datediff(end, DATE'1970-01-01') div $BinDays"))).as("bin"))): _*)
    binned(a, "a", Seq("id")).join(binned(bAgg, "b", Seq("b_cnt")), Seq("bin"))
      .filter(col("a_start") <= col("b_end") &&
        col("b_start") <= col("a_end") &&
        col("bin") === expr(
          s"datediff(greatest(a_start, b_start), DATE'1970-01-01')" +
            s" div $BinDays"))
      .select(col("id").as("a_id"), col("a_start"), col("a_end"),
        col("b_start"), col("b_end"), col("b_cnt"))
  }

  /** q123_interval_overlap — shipment-activity intervals (filtered
    * lineitem rows, synthetic 1–14-day spans) overlapping urgent-order
    * fulfillment windows (order date + 7 days), rolled up per shipment
    * month. Uses [[overlapCountJoin]]: the urgent-order windows are
    * day-aligned 7-day spans, so the B side compresses from |orders| rows
    * to ≤ one row per order DATE (~34× at sf0.1) before the join, and the
    * rollup weighs each match by the multiplicity instead of materializing
    * the quadratically-growing pair set. The oracle brute-forces the full
    * theta join, so equality proves the compression loses and invents
    * nothing. */
  def q123IntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") === 50.0)
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("id"),
        col("l_shipdate").as("start"),
        expr("l_shipdate + (l_linenumber % 14 + 1) * INTERVAL '1' DAY")
          .as("end"))
    val b = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderdate").as("start"),
        expr("o_orderdate + INTERVAL '7' DAY").as("end"))
    overlapCountJoin(a, b)
      .groupBy(date_trunc("month", col("a_start")).as("ship_month"))
      .agg(countDistinct(col("a_id")).as("n_intervals"),
        sum(col("b_cnt")).as("n_overlaps"))
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

  // ------------------------------------------------- pro-rata allocation

  /** Recognition horizon for q164: each order's value is recognized
    * linearly over 90 days of service starting at the order date. */
  val ProrateDays = 90L

  /** q164_prorate — pro-rata revenue recognition: allocate each order's
    * total (in exact cents) across the calendar months its 90-day service
    * window touches, proportional to overlap days. The allocation uses the
    * TELESCOPING form — month m's share is
    * `floor(cents·cumdays_end/90) − floor(cents·cumdays_start/90)` — so the
    * per-order shares sum to exactly `cents` with no separate
    * remainder-assignment pass (the floor residue rides forward into the
    * next month automatically). The deferred-revenue / subscription-
    * amortization staple, exact to the cent.
    *
    * Scale: month expansion is a map-side `sequence`+`explode` (≤ 4 rows
    * per order at a 90-day horizon), then ONE month-cardinality hash
    * aggregate with map-side combine. No window, no join; the expensive
    * `count(DISTINCT o_orderkey)` audit column is bounded by the same
    * month-cardinality shuffle. All arithmetic is BIGINT on non-negative
    * operands (`div` = `//` there). */
  def q164Prorate(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      col("o_orderdate").cast("date").as("d0"),
      // dollars → exact cents; floor(x+0.5) is the cross-engine-safe
      // rounding (README determinism notes)
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("dend", date_add(col("d0"), (ProrateDays - 1).toInt))
    val m = o.select(col("o_orderkey"), col("d0"), col("dend"), col("cents"),
      explode(sequence(trunc(col("d0"), "MM"), trunc(col("dend"), "MM"),
        expr("interval 1 month"))).as("month"))
    val sliced = m.select(col("o_orderkey"), col("cents"), col("month"),
      (datediff(least(last_day(col("month")), col("dend")), col("d0")) + 1)
        .cast("long").as("cum_end"),
      datediff(greatest(col("month"), col("d0")), col("d0"))
        .cast("long").as("cum_start"))
    sliced
      .select(col("o_orderkey"), col("month"),
        (expr(s"(cents * cum_end) div $ProrateDays") -
          expr(s"(cents * cum_start) div $ProrateDays")).as("share_cents"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_slices"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("share_cents")).as("recognized_cents"))
      .orderBy(col("month"))
  }

  val q164Sql: String =
    s"""WITH o AS (
       |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
       |         CAST(o_orderdate AS DATE) + ${ProrateDays - 1} AS dend,
       |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |  FROM orders),
       |m AS (
       |  SELECT o_orderkey, d0, dend, cents,
       |         CAST(unnest(generate_series(date_trunc('month', d0),
       |              date_trunc('month', dend), INTERVAL 1 MONTH)) AS DATE)
       |           AS month
       |  FROM o),
       |s AS (
       |  SELECT o_orderkey, month,
       |         (cents * (date_diff('day', d0,
       |              least(last_day(month), dend)) + 1)) // $ProrateDays
       |       - (cents * date_diff('day', d0, greatest(month, d0)))
       |           // $ProrateDays AS share_cents
       |  FROM m)
       |SELECT month, count(*) AS n_slices,
       |       count(DISTINCT o_orderkey) AS n_orders,
       |       CAST(sum(share_cents) AS BIGINT) AS recognized_cents
       |FROM s GROUP BY month ORDER BY month""".stripMargin
}
