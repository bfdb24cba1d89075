package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Window functions — SURVEY.md §2.5 (implied-warehouse tier).
  *
  * Scale design notes: every window here partitions by a key (priority /
  * custkey), so execution is one shuffle on the partition key followed by a
  * per-partition sort — no global sort, no driver involvement. Frame
  * aggregates over doubles go through DECIMAL so running sums are exact and
  * independent of how the engine internally associates frame additions
  * (Spark streams the frame; other engines may use segment trees — decimal
  * makes both bit-identical).
  */
object Windows {

  /** q30_win_rank — ranking functions: top-3 orders by price within each
    * priority class. row_number uses a total order (price desc, key) so it is
    * deterministic; rank is computed over the price alone (value-determined,
    * hence also deterministic under ties). */
  def q30WinRank(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val byPriceOnly = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(byPrice))
      .withColumn("price_rank", rank().over(byPriceOnly))
      .withColumn("price_dense", dense_rank().over(byPriceOnly))
      .withColumn("quartile", ntile(4).over(byPrice))
      .withColumn("pct_rank", percent_rank().over(byPriceOnly))
      .withColumn("cume", cume_dist().over(byPriceOnly))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("price_rank"),
        col("price_dense"), col("quartile"), col("pct_rank"), col("cume"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  // rank/dense_rank/percent_rank/cume_dist order by the value alone (their
  // results are value-determined, hence tie-safe); row_number and ntile need
  // the total (value, key) order to be deterministic. percent_rank and
  // cume_dist are exact ratios of ints — identical doubles in both engines.
  val q30Sql: String =
    """SELECT o_orderpriority, rn, price_rank, price_dense, quartile,
      |       pct_rank, cume, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |         rank() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice DESC) AS price_rank,
      |         dense_rank() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice DESC) AS price_dense,
      |         ntile(4) OVER (PARTITION BY o_orderpriority
      |                        ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
      |         percent_rank() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice DESC) AS pct_rank,
      |         cume_dist() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice DESC) AS cume
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** q31_win_lag — analytic lag: days since the customer's previous order
    * (NULL for the first). */
  def q31WinLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        datediff(col("o_orderdate"), col("prev_date")).as("gap_days"),
        datediff(col("next_date"), col("o_orderdate")).as("days_to_next"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q31Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       datediff('day',
      |                lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                    ORDER BY o_orderdate, o_orderkey),
      |                o_orderdate) AS gap_days,
      |       datediff('day', o_orderdate,
      |                lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                    ORDER BY o_orderdate, o_orderkey)) AS days_to_next
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** q32_win_frame — frame-spec aggregates: running total (unbounded
    * preceding) and 3-row moving average per customer. Decimal sums keep the
    * running totals exact → order-of-addition independent. */
  def q32WinFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3   = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(running)
          .cast("double").as("running_spend"),
        (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(last3)
          .cast("double") / count(lit(1)).over(last3)).as("moving_avg3"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q32Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_spend,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  / count(*) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** q95_range_frame — time-RANGE frames, the form q32's ROWS frames can't
    * express: each event's frame is every event of the same user in the
    * trailing hour BY TIMESTAMP, regardless of how many rows that is.
    * Ordering is epoch MICROSECONDS (exact integers in both engines), so
    * the frame bound is the integer 3600000000-1 and tied timestamps are
    * peers in both engines by the same RANGE rule. Per-user partitions,
    * single pass — the batch twin of the q61 sliding stream window (which
    * aggregates per bucket; this scores per EVENT). */
  def q95RangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        unix_micros(col("ts")).as("ep"))
    val hour = Window.partitionBy(col("user_id")).orderBy(col("ep"))
      .rangeBetween(-3599999999L, 0L)
    ev.select(
        col("user_id"), col("event_id"), col("ts"),
        count(lit(1)).over(hour).as("n_hour"),
        sum(col("value").cast(DecimalType(18, 2))).over(hour)
          .cast("double").as("sum_hour"))
      .orderBy(col("user_id"), col("ep"), col("event_id"))
  }

  val q95Sql: String =
    """SELECT user_id, event_id, ts,
      |  count(*) OVER w AS n_hour,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, epoch_us(ts), event_id""".stripMargin

  /** q107_mom_growth — period-over-period analytics: monthly revenue per
    * return flag with month-over-month absolute and relative growth. The
    * warehouse reporting staple built from a calendar truncation, one
    * cardinality-bounded aggregate (months × flags), and a lag window over
    * the tiny aggregated frame. Relative growth divides two decimal-derived
    * doubles — exact operands, single IEEE division, no rounding needed. */
  def q107MomGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("month"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .as("rev_dec"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("month"))
    monthly
      .withColumn("rev", col("rev_dec").cast("double"))
      .withColumn("prev_rev", lag(col("rev_dec"), 1).over(w).cast("double"))
      .select(col("l_returnflag"), col("month"), col("rev"),
        col("prev_rev"),
        (col("rev") - col("prev_rev")).as("abs_growth"),
        ((col("rev") - col("prev_rev")) / col("prev_rev")).as("rel_growth"))
      .orderBy(col("l_returnflag"), col("month"))
  }

  val q107Sql: String =
    """WITH monthly AS (
      |  SELECT l_returnflag, date_trunc('month', l_shipdate) AS month,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
      |  FROM lineitem GROUP BY l_returnflag, date_trunc('month', l_shipdate))
      |SELECT l_returnflag, month,
      |       CAST(rev_dec AS DOUBLE) AS rev,
      |       CAST(lag(rev_dec, 1) OVER w AS DOUBLE) AS prev_rev,
      |       CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec, 1) OVER w AS DOUBLE)
      |         AS abs_growth,
      |       (CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec, 1) OVER w AS DOUBLE))
      |         / CAST(lag(rev_dec, 1) OVER w AS DOUBLE) AS rel_growth
      |FROM monthly
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY month)
      |ORDER BY l_returnflag, month""".stripMargin

  /** q105_rolling_zscore — rolling anomaly detection: each event's value is
    * scored against the mean/stddev of its user's trailing 8 events (itself
    * included), flagging |z| > 2 as outliers. The moments come from exact
    * DECIMAL rolling sums (Σv, Σv²) over a ROWS frame — the q46 technique
    * applied per-window — so both engines feed identical operands into the
    * final double arithmetic; +,-,*,/ and sqrt are all correctly-rounded
    * IEEE ops, making the z-scores bit-identical without rounding tricks.
    *
    * Scale: one window pass partitioned by user (millions of small
    * partitions), frame state is two running decimals — no second scan, no
    * self-join, and the 8-row frame caps per-row work. */
  def q105RollingZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, Window.currentRow)
    val sumD = sum(col("value").cast(DecimalType(18, 2))).over(w)
      .cast("double")
    val sumSq = sum((col("value") * col("value")).cast(DecimalType(18, 4)))
      .over(w).cast("double")
    val n = count(lit(1)).over(w)
    val mean = sumD / n
    val variance = (sumSq - sumD * sumD / n) / (n - lit(1))
    val z = (col("value") - mean) / sqrt(variance)
    ev.select(col("user_id"), col("event_id"), col("ts"), col("value"),
        n.as("n_window"), mean.as("mean_w"),
        when(n > 1 && variance > 0, z).as("zscore"))
      .withColumn("is_outlier",
        when(col("zscore").isNotNull, abs(col("zscore")) > 2.0))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val q105Sql: String =
    """SELECT user_id, event_id, ts, value,
      |  count(*) OVER w AS n_window,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / count(*) OVER w AS mean_w,
      |  CASE WHEN count(*) OVER w > 1 AND
      |            (CAST(sum(CAST(value * value AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |             - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |               * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |               / count(*) OVER w)
      |            / (count(*) OVER w - 1) > 0
      |       THEN (value - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |                     / count(*) OVER w)
      |            / sqrt((CAST(sum(CAST(value * value AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |                    - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |                      * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |                      / count(*) OVER w)
      |                   / (count(*) OVER w - 1))
      |  END AS zscore,
      |  CASE WHEN count(*) OVER w > 1 AND
      |            (CAST(sum(CAST(value * value AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |             - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |               * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |               / count(*) OVER w)
      |            / (count(*) OVER w - 1) > 0
      |       THEN abs((value - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |                         / count(*) OVER w)
      |                / sqrt((CAST(sum(CAST(value * value AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |                        - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |                          * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |                          / count(*) OVER w)
      |                       / (count(*) OVER w - 1))) > 2.0
      |  END AS is_outlier
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** q98_pareto — ABC/Pareto classification: parts ranked by revenue, each
    * carrying its cumulative share of the total, bucketed A (first 70% of
    * revenue) / B (to 90%) / C (tail). The contribution-analysis staple
    * behind "which 20% of parts make 80% of revenue".
    *
    * Determinism: the cumulative sum runs over DECIMAL partials in a total
    * order (revenue desc, partkey), and the share divides two decimal-
    * derived doubles — both engines see identical operands. The running
    * sum is [[Scale.globalCumSum]] — range-partitioned local sums plus
    * broadcast per-partition offsets — because the frame is the
    * AGGREGATED part table: |part| rows, which SCALES WITH SF, so the
    * single-partition `Window.orderBy` form this replaced serializes at
    * 100× (decimal addition is associative, so the regrouped sum is
    * bit-identical). The grand total is a 1-row aggregate broadcast by
    * cross join, and the aggregate is cut once so the cum pass and the
    * total read the same materialization. */
  def q98Pareto(spark: SparkSession, sfDir: String): DataFrame = {
    import Checkpoints.CutOps
    val byPart = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .as("revenue_dec"))
      .cutLineage()
    val tot = byPart.agg(sum(col("revenue_dec")).as("total_dec"))
    Scale.globalCumSum(byPart,
        Seq(col("revenue_dec").desc, col("l_partkey")),
        Seq("revenue_dec" -> "cum_dec"))
      .crossJoin(broadcast(tot))
      .select(col("l_partkey"),
        col("revenue_dec").cast("double").as("revenue"),
        (col("cum_dec").cast("double") / col("total_dec").cast("double"))
          .as("cum_share"))
      .withColumn("abc_class",
        when(col("cum_share") <= 0.7, "A")
          .when(col("cum_share") <= 0.9, "B").otherwise("C"))
      .orderBy(col("revenue").desc, col("l_partkey"))
  }

  val q98Sql: String =
    """WITH by_part AS (
      |  SELECT l_partkey,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue_dec
      |  FROM lineitem GROUP BY l_partkey),
      |cum AS (
      |  SELECT l_partkey, revenue_dec,
      |         sum(revenue_dec) OVER (ORDER BY revenue_dec DESC, l_partkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cum_dec,
      |         sum(revenue_dec) OVER () AS total_dec
      |  FROM by_part)
      |SELECT l_partkey, CAST(revenue_dec AS DOUBLE) AS revenue,
      |       CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
      |         AS cum_share,
      |       CASE WHEN CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
      |                  <= 0.7 THEN 'A'
      |            WHEN CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
      |                  <= 0.9 THEN 'B'
      |            ELSE 'C' END AS abc_class
      |FROM cum ORDER BY revenue DESC, l_partkey""".stripMargin
  /** q124_twap — time-weighted average value per user over irregular event
    * samples: each observation holds until the next one, so its weight is
    * the inter-event duration. Exactness: value (2 fixed decimals) is cast
    * to DECIMAL BEFORE the multiply, duration is integer seconds, so every
    * product and the sums are exact decimal/integer arithmetic — the final
    * TWAP is one int-ish/int-ish IEEE division, identical in both engines
    * (no double is ever summed).
    *
    * Scale: one shuffle on user_id for the lead window, then a hash
    * aggregate at user cardinality with map-side partials. */
  def q124Twap(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("dur_s",
        expr("(lead(unix_micros(ts), 1) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id) " +
          "- unix_micros(ts)) div 1000000"))
      .filter(col("dur_s").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dur_s")).as("total_dur_s"),
        sum(col("value").cast(DecimalType(9, 2)) * col("dur_s"))
          .cast("double").as("weighted_sum"))
      .withColumn("twap",
        col("weighted_sum") / col("total_dur_s").cast("double"))
      .orderBy(col("user_id"))
  }

  val q124Sql: String =
    """WITH seg AS (
      |  SELECT user_id, value,
      |         (lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |            ORDER BY ts, event_id) - epoch_us(ts)) // 1000000 AS dur_s
      |  FROM events)
      |SELECT user_id, count(*) AS n_segments,
      |       CAST(sum(dur_s) AS BIGINT) AS total_dur_s,
      |       CAST(sum(CAST(value AS DECIMAL(9,2)) * dur_s) AS DOUBLE)
      |         AS weighted_sum,
      |       CAST(sum(CAST(value AS DECIMAL(9,2)) * dur_s) AS DOUBLE)
      |         / CAST(sum(dur_s) AS DOUBLE) AS twap
      |FROM seg WHERE dur_s IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q171_gini — revenue-concentration Gini coefficient per nation, exact:
    * with per-customer revenue in integer cents sorted ascending and ranked
    * i = 1..n, G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) — integer numerator and
    * denominator, ONE IEEE division. Customers with no orders count as
    * zeros (concentration among the population, not among buyers). Ties in
    * revenue don't perturb the sum (equal xᵢ commute), so the custkey
    * tie-break only pins the oracle's row order, not the value. The
    * inequality-audit statistic completing q98's Pareto cut.
    *
    * Scale: revenue is a custkey aggregate; the rank window partitions by
    * nation (independent partitions, each bounded by nation membership —
    * the natural shard). Numerator bound: Σ i·xᵢ < n²·x_max, BIGINT-safe
    * to ~10⁵ customers per nation at 10⁶-cent revenues; past that the
    * rank-sum splits into per-bucket offsets (q25's binning) before it
    * overflows. */
  def q171Gini(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .as("cents"))
    val cust = Tables.customer(spark, sfDir)
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    val byNation = Window.partitionBy(col("n_name"))
      .orderBy(col("cents"), col("c_custkey"))
    cust
      .withColumn("i", row_number().over(byNation).cast("long"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("total_cents"),
        sum(col("i") * col("cents")).as("rank_sum"))
      .select(col("n_name"), col("n_customers"), col("total_cents"),
        when(col("total_cents") === 0L, lit(0.0))
          .otherwise(
            (lit(2L) * col("rank_sum")
              - (col("n_customers") + 1L) * col("total_cents"))
              .cast("double")
              / (col("n_customers") * col("total_cents")))
          .as("gini"))
      .orderBy(col("n_name"))
  }

  val q171Sql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |cust AS (
      |  SELECT n.n_name, c.c_custkey, coalesce(r.cents, 0) AS cents
      |  FROM customer c
      |  LEFT JOIN rev r ON r.o_custkey = c.c_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey),
      |ranked AS (
      |  SELECT n_name, cents,
      |         CAST(row_number() OVER (PARTITION BY n_name
      |           ORDER BY cents, c_custkey) AS BIGINT) AS i
      |  FROM cust)
      |SELECT n_name, count(*) AS n_customers,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CASE WHEN sum(cents) = 0 THEN 0.0
      |            ELSE CAST(2 * CAST(sum(i * cents) AS BIGINT)
      |                      - (count(*) + 1) * CAST(sum(cents) AS BIGINT)
      |                   AS DOUBLE)
      |                 / (count(*) * CAST(sum(cents) AS BIGINT)) END
      |         AS gini
      |FROM ranked GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q173_seasonality — month-of-year seasonal index per brand: shipped
    * quantity by (brand, month-of-year) against the brand's total, index =
    * 12·month_qty / total (1.0 = flat, >1 = seasonal peak). The demand-
    * planning statistic behind every inventory forecast. Quantities are
    * exact integers; the index is one IEEE division of exact operands.
    *
    * Scale: broadcast part-dim join (the q10 shape), one (brand × 12)-
    * cardinality aggregate with map-side combine, and a brand-partitioned
    * window over 12 rows for the total — shuffle bounded by brand
    * cardinality regardless of fact size. */
  def q173Seasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        month(col("l_shipdate")).as("moy"))
    // the part→brand projection is SF-linear (the q247 class) — no
    // hint; AQE broadcasts it while it fits, shuffles it at 100 TB
    val monthly = li
      .join(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("moy"))
      .agg(sum(col("qty")).as("month_qty"))
    monthly
      .withColumn("brand_qty", sum(col("month_qty")).over(
        Window.partitionBy(col("p_brand"))))
      .select(col("p_brand"), col("moy"), col("month_qty"), col("brand_qty"),
        ((col("month_qty") * 12L).cast("double") /
          col("brand_qty").cast("double")).as("seasonal_idx"))
      .orderBy(col("p_brand"), col("moy"))
  }

  val q173Sql: String =
    """WITH monthly AS (
      |  SELECT p.p_brand, month(l.l_shipdate) AS moy,
      |         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
      |           AS month_qty
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT p_brand, moy, month_qty,
      |         CAST(sum(month_qty) OVER (PARTITION BY p_brand) AS BIGINT)
      |           AS brand_qty
      |  FROM monthly)
      |SELECT p_brand, moy, month_qty, brand_qty,
      |       CAST(month_qty * 12 AS DOUBLE) / CAST(brand_qty AS DOUBLE)
      |         AS seasonal_idx
      |FROM tot ORDER BY p_brand, moy""".stripMargin
}
