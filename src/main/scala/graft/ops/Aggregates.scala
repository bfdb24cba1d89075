package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Aggregations — SURVEY.md §2.4 (implied-warehouse tier; the reference ships
  * no aggregation of its own, its Redshift table exists so users can run
  * these ad hoc, `/root/reference/README.md:77`).
  *
  * Scale design notes:
  *  - All grouped aggregates are partial+final `HashAggregateExec` — map-side
  *    combine shrinks shuffle traffic to |groups| per partition, so cardinality
  *    of the group key (not fact rows) drives the shuffle at 100 TB.
  *  - COUNT(DISTINCT) expands to a two-phase aggregate; where an exact answer
  *    isn't needed at scale, q23's HyperLogLog sketch is the O(1)-memory path.
  *  - Double sums that the oracle must hash-match go through DECIMAL(18,x):
  *    exact, associative, order-independent — same bits regardless of
  *    partitioning. Integer-valued doubles (l_quantity) sum exactly in double
  *    (≪ 2^53) and skip the cast.
  */
object Aggregates {

  /** q20_agg_group — TPC-H Q1-shaped grouped aggregate over the fact table
    * (the revenue-measure columns mirror the reference's five FLOAT fee
    * columns, `setup.py:89-93`). */
  def q20AggGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice"), 2).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (decSum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q20Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q21_agg_global — no-group aggregate; single reduce to one row. */
  def q21AggGlobal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice"), 2).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))

  val q21Sql: String =
    """SELECT count(*) AS n_rows,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       min(l_shipdate) AS min_ship,
      |       max(l_shipdate) AS max_ship
      |FROM lineitem""".stripMargin

  /** q22_agg_distinct — exact COUNT(DISTINCT) per group (expand + two-phase
    * aggregate under the hood). */
  def q22AggDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q22Sql: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q23_agg_hll — approximate distinct via HyperLogLog++ sketch: constant
    * memory per group at any scale, mergeable across partitions. HLL sketch
    * values differ across engines (SURVEY §7.4), so the oracle checks what
    * IS engine-independent: the exact distinct counts, and that each
    * approximation lands within 3× the requested 2% rsd of the exact count
    * (emitted as booleans the oracle pins to TRUE — an out-of-bounds sketch
    * flips the bit and fails the hash compare). */
  def q23AggHll(spark: SparkSession, sfDir: String): DataFrame = {
    def withinRsd(approx: Column, exact: Column): Column =
      abs(approx.cast("double") - exact.cast("double")) <=
        exact.cast("double") * lit(0.06)
    // Exact and approx run as SEPARATE grouped aggregates joined on the
    // tiny group key: mixing multi-column DISTINCT with the imperative HLL
    // buffer in one agg forces a sort-based aggregate over the Expand'd
    // (3×) input — measured ~6× slower than these two codegen'd hash
    // aggregates plus a 3-row broadcast join.
    val li = Tables.lineitem(spark, sfDir)
    // Each exact count is its own distinct-then-count pipeline: TWO
    // countDistinct on different columns in one agg would go through
    // Expand (2× the input) + a non-codegen distinct aggregate. The
    // explicit form is two codegen'd hash aggregates each — partial
    // distinct map-side, so the shuffle carries unique (flag, key) pairs,
    // not rows — and a 3-row join to recombine (measured ~2× faster).
    def exactDistinct(key: String, as: String) =
      li.select(col("l_returnflag"), col(key)).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    val exact = exactDistinct("l_partkey", "exact_parts")
      .join(exactDistinct("l_orderkey", "exact_orders"), Seq("l_returnflag"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        withinRsd(col("approx_parts"), col("exact_parts")).as("parts_in_bounds"),
        withinRsd(col("approx_orders"), col("exact_orders")).as("orders_in_bounds"))
      .orderBy(col("l_returnflag"))
  }

  val q23Sql: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS exact_parts,
      |       count(DISTINCT l_orderkey) AS exact_orders,
      |       TRUE AS parts_in_bounds,
      |       TRUE AS orders_in_bounds
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q155_rfm — RFM (recency / frequency / monetary) customer
    * segmentation, the warehouse-marketing workhorse built on the trip/
    * order fact table: per customer, days since last order, order count,
    * and decimal-exact spend, each bucketed 1-3 by fixed thresholds, then
    * rolled up to segment sizes. Buckets use integer day arithmetic and
    * DECIMAL sums — no percentile machinery, so the oracle replays every
    * row exactly.
    *
    * Scale: one customer-cardinality aggregate (map-side combinable) +
    * one ≤27-key rollup. */
  def q155Rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val anchor = lit("2001-09-01").cast("date")
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      .select(col("o_custkey"),
        datediff(anchor, col("last_order")).as("recency_days"),
        col("n_orders"), col("spend"))
      .withColumn("r_score",
        when(col("recency_days") <= 365, 3)
          .when(col("recency_days") <= 1095, 2).otherwise(1))
      .withColumn("f_score",
        when(col("n_orders") >= 13, 3)
          .when(col("n_orders") >= 9, 2).otherwise(1))
      .withColumn("m_score",
        when(col("spend") >= 3000000, 3)
          .when(col("spend") >= 2000000, 2).otherwise(1))
    perCust.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        sum(col("spend")).cast("double").as("segment_spend"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q155Sql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey,
      |         date_diff('day', CAST(max(o_orderdate) AS DATE),
      |                   DATE '2001-09-01') AS recency_days,
      |         count(*) AS n_orders,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY o_custkey),
      |scored AS (
      |  SELECT CASE WHEN recency_days <= 365 THEN 3
      |              WHEN recency_days <= 1095 THEN 2 ELSE 1 END AS r_score,
      |         CASE WHEN n_orders >= 13 THEN 3
      |              WHEN n_orders >= 9 THEN 2 ELSE 1 END AS f_score,
      |         CASE WHEN spend >= 3000000 THEN 3
      |              WHEN spend >= 2000000 THEN 2 ELSE 1 END AS m_score,
      |         n_orders, spend
      |  FROM per_cust)
      |SELECT r_score, f_score, m_score,
      |       count(*) AS n_customers,
      |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
      |       CAST(sum(spend) AS DOUBLE) AS segment_spend
      |FROM scored GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin

  /** q142_kmv — K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002):
    * keep the k smallest hash values per group; the k-th smallest, as a
    * fraction u of the hash range, estimates distinct ≈ (k−1)/u. The THIRD
    * classic mergeable sketch next to HLL (q23) and CMS (q92) — and unlike
    * HLL, fully oracle-replayable: [[graft.functions.StableHash]] is
    * engine-identical, the k-th order statistic is exact, and the estimate
    * is two IEEE divisions on deterministic inputs.
    *
    * Scale: the k-minimum heap is the bounded GroupedTopK operator, not a
    * whole-group window sort — each map task reduces its slice to ≤ k
    * hashes per group before the exchange, exactly how a production sketch
    * merges partials. Groups smaller than k report their exact size.
    */
  def q142Kmv(spark: SparkSession, sfDir: String, k: Int = 64): DataFrame = {
    val keys = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
    val hashed = keys.select(col("l_returnflag"), col("l_partkey"),
      graft.functions.StableHash.intMix62(col("l_partkey")).as("h"))
    val kmin = graft.plans.GroupedTopK.topKPerKey(hashed,
        Seq("l_returnflag"), Seq("h" -> false, "l_partkey" -> false), k)
      .groupBy(col("l_returnflag"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_kept"))
    val exact = keys.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_distinct"))
    // u = h_k / 2⁶² — cast and divide-by-power-of-two are bit-exact in
    // both engines; keep the (k−1)/u association order identical too
    exact.join(kmin, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_distinct"), col("n_kept"),
        col("h_k"),
        when(col("n_kept") < k, col("exact_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("h_k").cast("double") / lit(4.611686018427387904e18)))
          .as("kmv_estimate"))
      .orderBy(col("l_returnflag"))
  }

  val q142Sql: String = {
    val h = graft.functions.StableHash.intMix62Sql("l_partkey")
    s"""WITH keys AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
       |hashed AS (SELECT l_returnflag, $h AS h FROM keys),
       |ranked AS (SELECT l_returnflag, h,
       |                  row_number() OVER (PARTITION BY l_returnflag
       |                                     ORDER BY h) AS rn
       |           FROM hashed),
       |kmin AS (SELECT l_returnflag, max(h) AS h_k, count(*) AS n_kept
       |         FROM ranked WHERE rn <= 64 GROUP BY l_returnflag),
       |exact AS (SELECT l_returnflag, count(*) AS exact_distinct
       |          FROM keys GROUP BY l_returnflag)
       |SELECT e.l_returnflag, e.exact_distinct, m.n_kept, m.h_k,
       |       CASE WHEN m.n_kept < 64 THEN CAST(e.exact_distinct AS DOUBLE)
       |            ELSE 63.0 / (CAST(m.h_k AS DOUBLE)
       |                         / 4.611686018427387904e18) END
       |         AS kmv_estimate
       |FROM exact e JOIN kmin m USING (l_returnflag)
       |ORDER BY e.l_returnflag""".stripMargin
  }

  /** Sketch size for q169: 64 minimum hashes per source. */
  private val KmvPairK = 64

  /** q169_kmv_overlap — MERGED KMV sketches estimating pairwise source
    * overlap: sketch each source's 2-gram shingle set (k minimum hashes),
    * merge sketch PAIRS (k smallest of the union — the KMV union rule), and
    * estimate |A∪B| and Jaccard by inclusion–exclusion. Mergeability is THE
    * sketch property that matters at scale — per-shard sketches combine
    * into corpus answers without touching raw data again — and this query
    * exercises it end-to-end, with the exact intersection/union computed
    * alongside as the audit (estimates and exacts land in one row, both
    * deterministic, so the oracle hash-checks the sketch math itself).
    *
    * Scale: sketches are the bounded [[graft.plans.GroupedTopK]] heap
    * (map-side k-truncation, no whole-group sort); the pair stage touches
    * only sketch rows (sources² · k, independent of corpus size). The
    * exact-audit join IS corpus-sized — production drops it, it exists
    * here because an audited estimator is the point of the query. */
  def q169KmvOverlap(spark: SparkSession, sfDir: String): DataFrame =
    kmvOverlap(Tables.documents(spark, sfDir), KmvPairK)

  /** The sketch-merge core over any (source, text) frame — see
    * [[q169KmvOverlap]]. */
  def kmvOverlap(docs: DataFrame, k: Int): DataFrame = {
    val t = split(col("text"), " ")
    val m = greatest(size(t) - 1, lit(0))
    val grams = docs
      .select(col("source"), explode(arrays_zip(
        slice(t, lit(1), m).as("w1"), slice(t, lit(2), m).as("w2"))).as("z"))
      .select(col("source"),
        concat_ws(" ", col("z.w1"), col("z.w2")).as("gram"))
      .distinct()
      .localCheckpoint() // consumed by sketch, per-source counts, AND audit
    val hashed = grams.select(col("source"),
      // charMix62, not charPoly62: order statistics need the mixed tail
      // (raw char-poly low tail is clumpy on structured bigrams); native
      // codegen'd form, bit-identical to the HOF Column API
      graft.functions.StableHashExpression.charMix62(col("gram")).as("h"))
    val sk = graft.plans.GroupedTopK.topKPerKey(hashed,
        Seq("source"), Seq("h" -> false), k)
      .select(col("source"), col("h"))
      .localCheckpoint() // tiny (sources·k); feeds stats + both pair sides
    // The recompute audit flags dist/stats diamonds here (pairs 3x,
    // stats 2x — both SOURCES-cardinality over the gram aggregate).
    // Cutting them was A/B'd in r12 and REJECTED on measurement
    // (nosort min-of-two-rounds: sf0.1 1.13 vs 0.93 uncut, sf1 3.17 vs
    // 3.30, sf2 5.33 vs 4.78 — wash to regression): grams/sk are
    // ALREADY checkpointed, so each "recompute" is one narrow
    // re-aggregation of a materialized RDD that ReuseExchange partly
    // shares, cheaper than two more eager localCheckpoint actions on
    // the critical path. The r12 diamond rule cuts results whose
    // REBUILD crosses corpus-sized shuffles; these don't.
    val dist = grams.groupBy(col("source")).agg(count(lit(1)).as("d"))
    val stats = sk.groupBy(col("source"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_kept"))
      .join(dist, Seq("source"))
    def est(nKept: Column, hK: Column, d: Column): Column =
      when(nKept < k, d.cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (hK.cast("double") / lit(4.611686018427387904e18)))
    val pairs = dist.select(col("source").as("src_a"))
      .crossJoin(dist.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val pairH = pairs
      .join(sk.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"))
      .unionAll(pairs
        .join(sk.withColumnRenamed("source", "src_b"), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("h")))
      .distinct() // a shared gram appears in both sketches with one h
    val byPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_a"), col("src_b"))
      .orderBy(col("h")) // ≤ 2k rows per pair by construction — bounded
    val unionStats = pairH
      .withColumn("rn", row_number().over(byPair)).filter(col("rn") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("h")).as("h_ku"), count(lit(1)).as("n_ku"))
    val inter = grams.select(col("source").as("src_a"), col("gram"))
      .join(grams.select(col("source").as("src_b"), col("gram")), Seq("gram"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val sa = stats.select(col("source").as("src_a"), col("n_kept").as("na"),
      col("h_k").as("ha"), col("d").as("da"))
    val sb = stats.select(col("source").as("src_b"), col("n_kept").as("nb"),
      col("h_k").as("hb"), col("d").as("db"))
    val eu = est(col("n_ku"), col("h_ku"), col("n_ku"))
    val ea = est(col("na"), col("ha"), col("da"))
    val eb = est(col("nb"), col("hb"), col("db"))
    pairs.join(sa, Seq("src_a")).join(sb, Seq("src_b"))
      .join(unionStats, Seq("src_a", "src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("src_a"), col("src_b"), col("exact_inter"),
        (col("da") + col("db") - col("exact_inter")).as("exact_union"),
        (col("exact_inter").cast("double") /
          (col("da") + col("db") - col("exact_inter"))).as("jaccard_exact"),
        eu.as("union_est"),
        ((ea + eb - eu) / eu).as("jaccard_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q169Sql: String = {
    val k = KmvPairK
    val h62 = graft.functions.StableHash.charMix62Sql("gram")
    val estU = s"CASE WHEN u.n_ku < $k THEN CAST(u.n_ku AS DOUBLE) ELSE " +
      s"${k - 1}.0 / (CAST(u.h_ku AS DOUBLE) / 4.611686018427387904e18) END"
    def estS(n: String, h: String, d: String): String =
      s"CASE WHEN $n < $k THEN CAST($d AS DOUBLE) ELSE " +
        s"${k - 1}.0 / (CAST($h AS DOUBLE) / 4.611686018427387904e18) END"
    s"""WITH toks AS (SELECT source, string_split(text, ' ') AS t
       |              FROM documents),
       |g AS (SELECT DISTINCT source, gram FROM (
       |  SELECT source,
       |         unnest(list_transform(range(1, greatest(len(t), 2)),
       |                i -> t[i] || ' ' || t[i+1])) AS gram
       |  FROM toks WHERE len(t) >= 2)),
       |hs AS (SELECT source, $h62 AS h FROM g),
       |sk AS (SELECT source, h FROM (
       |  SELECT source, h, row_number() OVER (PARTITION BY source
       |    ORDER BY h) AS rn FROM hs) WHERE rn <= $k),
       |dist AS (SELECT source, count(*) AS d FROM g GROUP BY 1),
       |stats AS (SELECT s.source, max(s.h) AS h_k, count(*) AS n_kept,
       |                 any_value(di.d) AS d
       |          FROM sk s JOIN dist di ON di.source = s.source
       |          GROUP BY s.source),
       |pairs AS (SELECT a.source AS src_a, b.source AS src_b
       |          FROM dist a JOIN dist b ON a.source < b.source),
       |pu AS (SELECT DISTINCT p.src_a, p.src_b, s.h
       |       FROM pairs p JOIN sk s
       |         ON s.source = p.src_a OR s.source = p.src_b),
       |pk AS (SELECT src_a, src_b, h FROM (
       |  SELECT src_a, src_b, h, row_number() OVER (
       |    PARTITION BY src_a, src_b ORDER BY h) AS rn FROM pu)
       |  WHERE rn <= $k),
       |us AS (SELECT src_a, src_b, max(h) AS h_ku, count(*) AS n_ku
       |       FROM pk GROUP BY 1, 2),
       |inter AS (SELECT a.source AS src_a, b.source AS src_b,
       |                 count(*) AS exact_inter
       |          FROM g a JOIN g b
       |            ON a.gram = b.gram AND a.source < b.source
       |          GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b,
       |       coalesce(i.exact_inter, 0) AS exact_inter,
       |       sa.d + sb.d - coalesce(i.exact_inter, 0) AS exact_union,
       |       CAST(coalesce(i.exact_inter, 0) AS DOUBLE)
       |         / (sa.d + sb.d - coalesce(i.exact_inter, 0))
       |         AS jaccard_exact,
       |       $estU AS union_est,
       |       ((${estS("sa.n_kept", "sa.h_k", "sa.d")}
       |         + ${estS("sb.n_kept", "sb.h_k", "sb.d")} - $estU)
       |         / $estU) AS jaccard_est
       |FROM pairs p
       |JOIN stats sa ON sa.source = p.src_a
       |JOIN stats sb ON sb.source = p.src_b
       |JOIN us u ON u.src_a = p.src_a AND u.src_b = p.src_b
       |LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin
  }

  /** q92_cms — count-min sketch frequency estimation over event types: the
    * OTHER classic mergeable sketch next to q23's HLL (frequencies, not
    * cardinalities). The sketch is built distributed (one codegen'd
    * aggregate pass, counters merge associatively across partitions — at
    * 100 TB the shuffle carries one eps⁻¹×depth counter grid per partition,
    * not rows); estimates are then read on the consumer side, which is how
    * a sketch is used in production (ship the summary, query it cheaply).
    * The ≤6 estimate lookups against the group keys are driver-side by
    * design — the sketch IS the reduced data.
    *
    * Oracle form: exact counts hash-check; the sketch's guarantees pin as
    * booleans — CMS never underestimates (hard guarantee), and with
    * eps=0.01 overestimates by at most eps·N with prob ≥ confidence
    * (deterministic here: fixed seed, associative counters). */
  def q92Cms(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    // NULL keys are excluded on BOTH sides: the sketch aggregate skips NULL
    // inputs, so a NULL group would break the ≥-exact guarantee (and
    // estimateCount(null) throws)
    val ev = Tables.events(spark, sfDir).filter(col("event_type").isNotNull)
    // one grouped aggregate, collected once (≤ |event types| rows) — the
    // estimates and the output frame both derive from it
    val exactRows = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_count"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val skBytes = ev.agg(
        count_min_sketch(col("event_type"), lit(0.01), lit(0.99), lit(42))
          .as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(skBytes))
    val total = cms.totalCount() // N: items inserted — the eps·N bound's N
    val spark2 = spark
    import spark2.implicits._
    exactRows.toSeq
      .map { case (t, exact) =>
        val est = cms.estimateCount(t)
        (t, exact, est >= exact,
          est <= exact + math.ceil(0.01 * total).toLong)
      }
      .toDF("event_type", "exact_count", "never_underestimates",
        "within_eps_bound")
      .orderBy(col("event_type"))
  }

  val q92Sql: String =
    """SELECT event_type, count(*) AS exact_count,
      |       TRUE AS never_underestimates,
      |       TRUE AS within_eps_bound
      |FROM events WHERE event_type IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q24_agg_rollup — ROLLUP grouping-set hierarchy with NULL group keys
    * folded to a sentinel so ordering is total and engine-independent. */
  def q24AggRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n_rows"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  val q24Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |       COALESCE(l_linestatus, 'ALL') AS ls,
      |       count(*) AS n_rows, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** q27_agg_cube — CUBE over (returnflag, linestatus): all four grouping
    * sets (both, each alone, grand total), NULL keys folded to a sentinel as
    * in q24. grouping_id() disambiguates a real value from the sentinel. */
  def q27AggCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid"), col("n_rows"), col("sum_qty"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  val q27Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |       COALESCE(l_linestatus, 'ALL') AS ls,
      |       GROUPING(l_returnflag, l_linestatus) AS gid,
      |       count(*) AS n_rows, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, rf, ls""".stripMargin

  /** q29_agg_gsets — explicit GROUPING SETS (the third grouping-set form
    * SURVEY §2.4 names, alongside ROLLUP q24 and CUBE q27): a hand-picked
    * lattice {(rf, ls), (ls), ()} that neither rollup nor cube produces.
    * Same single-pass Expand + partial/final hash-aggregate execution —
    * shuffle volume is Σ|grouping-set cardinalities|, not fact rows. */
  def q29AggGsets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid"), col("n_rows"), col("sum_qty"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  val q29Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |       COALESCE(l_linestatus, 'ALL') AS ls,
      |       GROUPING(l_returnflag, l_linestatus) AS gid,
      |       count(*) AS n_rows, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_linestatus), ())
      |ORDER BY gid, rf, ls""".stripMargin

  /** q28_pivot — PIVOT: one column per l_linestatus value, counts + decimal
    * revenue sums per returnflag. The pivot values are listed explicitly so
    * the output schema is static (at scale, an unlisted pivot would need a
    * collect to discover values — never do that on a fact column). */
  def q28Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("cnt"),
        decSum(col("l_extendedprice"), 2).as("rev"))
      // pivot leaves NULL in empty count cells where SQL's FILTER counts 0
      .select(col("l_returnflag"),
        coalesce(col("F_cnt"), lit(0L)).as("F_cnt"), col("F_rev"),
        coalesce(col("O_cnt"), lit(0L)).as("O_cnt"), col("O_rev"))
      .orderBy(col("l_returnflag"))

  val q28Sql: String =
    """SELECT l_returnflag,
      |  count(*) FILTER (WHERE l_linestatus = 'F') AS "F_cnt",
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F_rev",
      |  count(*) FILTER (WHERE l_linestatus = 'O') AS "O_cnt",
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |       FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O_rev"
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q25_agg_percentile — exact interpolated percentiles. Computed over the
    * integer-valued l_quantity so the interpolation arithmetic (quarter
    * fractions of integers — exact binary fractions) is bit-identical across
    * engines regardless of formula association. */
  def q25AggPercentile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.75)").as("p75_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))

  val q25Sql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.25) AS p25_qty,
      |       quantile_cont(l_quantity, 0.5)  AS median_qty,
      |       quantile_cont(l_quantity, 0.75) AS p75_qty,
      |       min(l_quantity) AS min_qty,
      |       max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q93_approx_percentile — the sketch-percentile companion to q25's
    * exact form, completing the approx-aggregate family (HLL q23, CMS q92):
    * `approx_percentile` keeps a bounded Greenwald-Khanna summary per
    * partition and merges them — at 100 TB the shuffle carries fixed-size
    * summaries, where exact `percentile` must materialize every value per
    * group. Oracle form mirrors q23: exact percentiles hash-check, the
    * approx values pin as within-tolerance booleans (accuracy 10⁴ on an
    * integer-valued measure ⇒ ≤1 quantity unit of slack). Fractions stay
    * on q25's dyadic set (0.5, 0.75): a non-dyadic fraction like 0.9 makes
    * the interpolation weight inexact in binary, and Spark's
    * (1−d)·a + d·b vs DuckDB's a + d·(b−a) can then differ in the last
    * ulp whenever the rank straddles two distinct values. */
  def q93ApproxPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    def within(approx: Column, exact: Column): Column =
      abs(approx.cast("double") - exact) <= lit(1.0)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("percentile(l_quantity, 0.75)").as("exact_p75"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_quantity, 0.75, 10000)").as("a75"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p75"),
        within(col("a50"), col("exact_p50")).as("p50_within_1"),
        within(col("a75"), col("exact_p75")).as("p75_within_1"))
      .orderBy(col("l_returnflag"))
  }

  val q93Sql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS exact_p50,
      |       quantile_cont(l_quantity, 0.75) AS exact_p75,
      |       TRUE AS p50_within_1,
      |       TRUE AS p75_within_1
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Typed custom aggregator: sum of squares. Demonstrates the
    * `Aggregator[IN, BUF, OUT]` API (mergeable buffer → scales as a normal
    * partial/final aggregate). Inputs are integer-valued doubles, so the sum
    * is exact in double and order-independent. */
  object SumSq extends Aggregator[Double, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, a: Double): Double = b + a * a
    override def merge(b1: Double, b2: Double): Double = b1 + b2
    override def finish(r: Double): Double = r
    override def bufferEncoder = Encoders.scalaDouble
    override def outputEncoder = Encoders.scalaDouble
  }

  /** q26_agg_custom — the typed UDAF in a grouped aggregate, oracle-checked
    * against its algebraic SQL equivalent. */
  def q26AggCustom(spark: SparkSession, sfDir: String): DataFrame = {
    val sumsq = udaf(SumSq, Encoders.scalaDouble)
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sumsq(col("l_quantity")).as("sum_sq_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val q26Sql: String =
    """SELECT l_returnflag, sum(l_quantity * l_quantity) AS sum_sq_qty,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q46_stats — the second-moment statistics family (variance, stddev,
    * covariance, correlation) computed from DECIMAL-exact raw moments.
    *
    * Spark's built-in `var_samp`/`corr` merge partial co-moments in partition
    * order, so their low bits differ run-to-run on a cluster; here the five
    * sums Σx, Σy, Σx², Σy², Σxy accumulate as decimals (exact, associative,
    * order-independent) and the moments derive in double afterwards — the
    * SAME bits on 1 partition, 32, or 1000 executors, which is also what
    * makes the DuckDB hash-match possible. One hash-aggregate shuffle at
    * group-key cardinality; the built-in `corr`/`stddev_samp` ride along and
    * are pinned within 1e-6 relative as oracle booleans.
    *
    * Decimal precision: y ≤ ~105k with 2dp → y² needs 4dp and ≲ 1.2e10;
    * DECIMAL(30,4) holds Σy² beyond 1e15 rows per group. */
  def q46Stats(spark: SparkSession, sfDir: String): DataFrame = {
    def dsum(c: Column, scale: Int): Column = decSum(c, scale, precision = 30)
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val base = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        dsum(x, 1).as("sx"), dsum(y, 2).as("sy"),
        dsum(x * x, 2).as("sxx"), dsum(y * y, 4).as("syy"),
        dsum(x * y, 3).as("sxy"),
        corr(x, y).as("corr_builtin"),
        stddev_samp(x).as("std_builtin"))
    val vx = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
    val vy = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)
    val cov = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)
    base
      .withColumn("mean_x", col("sx") / col("n"))
      .withColumn("mean_y", col("sy") / col("n"))
      .withColumn("var_x", vx)
      .withColumn("std_x", sqrt(vx))
      .withColumn("cov_xy", cov)
      .withColumn("corr_xy", cov / sqrt(vx * vy))
      .withColumn("builtin_corr_ok",
        abs(col("corr_builtin") - col("corr_xy")) <=
          abs(col("corr_xy")) * 1e-6 + 1e-9)
      .withColumn("builtin_std_ok",
        abs(col("std_builtin") - col("std_x")) <=
          abs(col("std_x")) * 1e-6 + 1e-9)
      .select(col("l_returnflag"), col("n"), col("mean_x"), col("mean_y"),
        col("var_x"), col("std_x"), col("cov_xy"), col("corr_xy"),
        col("builtin_corr_ok"), col("builtin_std_ok"))
      .orderBy(col("l_returnflag"))
  }

  val q46Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(30,1))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sxx,
      |         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS syy,
      |         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,3))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n,
      |         sx / n AS mean_x, sy / n AS mean_y,
      |         (sxx - sx * sx / n) / (n - 1) AS var_x,
      |         (syy - sy * sy / n) / (n - 1) AS var_y,
      |         (sxy - sx * sy / n) / (n - 1) AS cov_xy
      |  FROM m)
      |SELECT l_returnflag, n, mean_x, mean_y, var_x,
      |       sqrt(var_x) AS std_x, cov_xy,
      |       cov_xy / sqrt(var_x * var_y) AS corr_xy,
      |       TRUE AS builtin_corr_ok, TRUE AS builtin_std_ok
      |FROM d ORDER BY l_returnflag""".stripMargin
  /** q118_argmax — MAX_BY/MIN_BY (arg-extremum) aggregates: which event
    * carried each type's extreme value. Determinism contract: the `by` key
    * must be UNIQUE per group or both engines are free to pick different
    * ties, so the ordering key packs (value, event_id) into one BIGINT —
    * value has two fixed decimals, so `floor(value·100 + 0.5)` recovers the
    * exact cent count (never lands on the float-repr .5 boundary; README
    * determinism notes), and event_id disambiguates duplicates. DuckDB's
    * `arg_max/arg_min` take the same scalar key.
    *
    * Scale: arg-extremum is algebraic — partial (key, arg) pairs merge
    * map-side like any min/max, one hash aggregate on the group key, no
    * window and no second pass over the fact table. */
  def q118Argmax(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("ord",
        // Packing is only injective while event_id < 10^7; a fixture
        // outgrowing that would alias into the value component — fail
        // loudly instead of silently mis-tie-breaking.
        when(col("event_id").between(0L, 9999999L),
          floor(col("value") * 100 + 0.5).cast("long") * 10000000L
            + col("event_id"))
          .otherwise(raise_error(
            lit("q118 packed-key bound: event_id outside [0, 1e7)"))
            .cast("long")))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        max_by(col("event_id"), col("ord")).as("hi_event_id"),
        max(col("value")).as("hi_value"),
        min_by(col("event_id"), col("ord")).as("lo_event_id"),
        min(col("value")).as("lo_value"))
      .orderBy(col("event_type"))
  }

  val q118Sql: String =
    """WITH keyed AS (
      |  SELECT event_type, event_id, value,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000000
      |           + event_id AS ord
      |  FROM events)
      |SELECT event_type, count(*) AS n_rows,
      |       arg_max(event_id, ord) AS hi_event_id,
      |       max(value) AS hi_value,
      |       arg_min(event_id, ord) AS lo_event_id,
      |       min(value) AS lo_value
      |FROM keyed
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  /** q122_listagg — ordered string aggregation (LISTAGG / string_agg): the
    * classic report-formatting aggregate. `collect_list` order is whatever
    * the partitioning delivered, so determinism comes from sorting INSIDE
    * the aggregate value (`array_sort` before `array_join`) — never from
    * the input's accidental order; the oracle pins the same order with
    * `string_agg(... ORDER BY ...)`. Per-group payload is bounded by group
    * cardinality — at scale, cap or bucket any group whose concatenation
    * would not fit a row (the fixture's max is 10 suppliers per nation). */
  def q122Listagg(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), ",")
          .as("suppliers"))
      .orderBy(col("n_name"))
  }

  val q122Sql: String =
    """SELECT n_name, count(*) AS n_suppliers,
      |       string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin
  /** q129_share — ratio-to-report: each nation's share of total order
    * revenue. The per-group sums stay DECIMAL through BOTH levels (the
    * grand total re-aggregates the per-nation decimals — never a double
    * sum), and the share is one IEEE division of two exact values. The
    * total arrives by broadcast cross-join of a 1-row frame — NOT a
    * global window, which would serialize the table through one
    * partition.
    *
    * Scale: fact scan → one hash aggregate at nation cardinality; the
    * 1-row total is a second pass over the 25-row aggregate, free. */
  def q129Share(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    // customer is SF-PROPORTIONAL (scales with the fact table) — its
    // join is unhinted, AQE sizes it at runtime; nation is a true
    // 25-row dimension and keeps the static broadcast hint
    val per = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("dec_rev"))
    val total = per.agg(sum(col("dec_rev")).as("dec_total"))
    per.crossJoin(broadcast(total))
      .select(col("n_name"), col("n_orders"),
        col("dec_rev").cast("double").as("revenue"),
        (col("dec_rev").cast("double") / col("dec_total").cast("double"))
          .as("share"))
      .orderBy(col("n_name"))
  }

  val q129Sql: String =
    """WITH per AS (
      |  SELECT n_name, count(*) AS n_orders,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS dec_rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name),
      |total AS (SELECT sum(dec_rev) AS dec_total FROM per)
      |SELECT n_name, n_orders, CAST(dec_rev AS DOUBLE) AS revenue,
      |       CAST(dec_rev AS DOUBLE) / CAST(dec_total AS DOUBLE) AS share
      |FROM per CROSS JOIN total
      |ORDER BY n_name""".stripMargin
  /** q135_bitmask — bitwise aggregate rollup: each event type maps to one
    * bit, `bit_or` per (user, day) folds a presence BITMASK (which types
    * the user fired that day — the poor man's per-key bloom filter, exact
    * at ≤64 categories), then user-days are counted per distinct mask (31
    * distinct behavior profiles on the fixture). Bitwise OR is
    * algebraic: map-side partials merge like any sum, one hash aggregate
    * per level. The flag-rollup idiom for feature presence at 100 TB —
    * 64 behaviors per key in 8 bytes.
    */
  def q135Bitmask(spark: SparkSession, sfDir: String): DataFrame = {
    val bit = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "error", 2L)
      .when(col("event_type") === "purchase", 4L)
      .when(col("event_type") === "signup", 8L)
      .otherwise(16L) // view
    val masks = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        bit.as("b"))
      .groupBy(col("user_id"), col("day"))
      .agg(bit_or(col("b")).as("mask"))
    masks.groupBy(col("mask"))
      .agg(count(lit(1)).as("n_user_days"),
        bit_count(col("mask")).as("n_types"))
      .orderBy(col("mask"))
  }

  val q135Sql: String =
    """WITH masks AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |         bit_or(CASE event_type WHEN 'click' THEN 1
      |                                WHEN 'error' THEN 2
      |                                WHEN 'purchase' THEN 4
      |                                WHEN 'signup' THEN 8
      |                                ELSE 16 END) AS mask
      |  FROM events GROUP BY user_id, day)
      |SELECT mask, count(*) AS n_user_days,
      |       bit_count(mask) AS n_types
      |FROM masks GROUP BY mask ORDER BY mask""".stripMargin

  /** q258_hhi — Herfindahl–Hirschman supplier-concentration index per
    * nation: HHI = Σ_s (revenue_s / total)² over each nation's suppliers,
    * plus the effective supplier count 1/HHI (the "numbers-equivalent" —
    * 4 equal suppliers → HHI 0.25 → effective 4). The procurement-risk
    * rollup q129's demand-side share report doesn't cover: q129 says who
    * SPENDS, this says how concentrated the SUPPLY side is.
    *
    * Determinism: per-supplier revenue is an exact BIGINT cents sum
    * (decimal line values × 100 per row, the q160 idiom); the squared
    * mass Σ cents² accumulates in DECIMAL(38,0) (the q107 co-moment
    * idiom — exact, order-independent); HHI is then ONE per-row IEEE
    * chain cast·mul·div on the exact aggregates, and the effective count
    * one further division on the same value — both engines replay the
    * chain bit-identically.
    *
    * Scale: one fact scan; nation is a broadcast dimension, supplier is
    * SF-proportional and joins unhinted (AQE sizes it at runtime);
    * both aggregates are map-side combinable keyed by (nation, supplier)
    * then nation — supplier cardinality bounds every shuffle. */
  def q258Hhi(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    // supplier is SF-PROPORTIONAL — unhinted (AQE decides); nation is
    // the bounded 25-row dimension and keeps the broadcast hint
    val per = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), cents.as("cents"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(col("cents")).as("cents"))
    per.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("total_cents"),
        sum(d38(col("cents")) * d38(col("cents"))).as("sq"))
      .select(col("n_name"), col("n_suppliers"), col("total_cents"),
        (col("sq").cast("double") /
          (col("total_cents").cast("double") *
            col("total_cents").cast("double"))).as("hhi"))
      .withColumn("effective_suppliers", lit(1.0) / col("hhi"))
      .orderBy(col("n_name"))
  }

  val q258Sql: String =
    """WITH per AS (
      |  SELECT n_name, s_suppkey,
      |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |                       AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name, s_suppkey),
      |agg AS (
      |  SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |         CAST(sum(cents) AS BIGINT) AS total_cents,
      |         CAST(sum(CAST(cents AS DECIMAL(38,0)) *
      |                  CAST(cents AS DECIMAL(38,0))) AS DOUBLE) /
      |           (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
      |           AS hhi
      |  FROM per GROUP BY n_name)
      |SELECT n_name, n_suppliers, total_cents, hhi,
      |       1.0 / hhi AS effective_suppliers
      |FROM agg
      |ORDER BY n_name""".stripMargin
}
