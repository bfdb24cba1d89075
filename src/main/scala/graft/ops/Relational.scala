package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Filters, joins, set ops, top-k — SURVEY.md §2.2/§2.3/§2.6.
  *
  * The reference performs no DataFrame joins (its only join-shaped logic is
  * the file-existence anti-join modeled by [[Ingest.q02Incremental]]); this is
  * the implied-warehouse surface its Redshift table exists to serve
  * (`/root/reference/README.md:77`, FK columns `setup.py:87-88`).
  *
  * Scale design notes (100 TB):
  *  - Dimension joins (part, nation, region, supplier) are broadcast —
  *    dimensions stay small even when the fact table grows 1000×; `broadcast()`
  *    hints make that explicit rather than relying on the 10 MB autodetect.
  *  - Fact-fact joins (orders ⋈ lineitem) shuffle on the join key once; AQE
  *    handles skew at runtime.
  *  - The range join (q15) uses BAND EXPANSION: the small side explodes into
  *    one row per integer band value, turning an O(|L|·|P|) nested-loop theta
  *    join into a broadcast equi-join that scales linearly in |L|. The
  *    equi+residual theta join (q17) keeps the non-equi predicate as a cheap
  *    post-join filter on an equi-shuffled join.
  *  - Aggregated doubles are summed as DECIMAL(18,x) then cast back to double:
  *    decimal addition is exact and order-independent, so the result is
  *    bit-identical no matter how partitions merge — both at local[32] and on
  *    1000 executors (and in the DuckDB oracle).
  */
object Relational {

  /** q03_filter — date-range + predicate filter on the fact table (implied
    * warehouse row filters, SURVEY §2.2). Predicates reach the parquet scan
    * as PushedFilters.
    */
  def q03Filter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1999-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 &&
        col("l_returnflag") === "R")
      .orderBy(Tables.lineitemKey.map(col): _*)

  val q03Sql: String =
    """SELECT * FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate <  TIMESTAMP '1999-01-01'
      |  AND l_discount > 0.05 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin

  /** q10_join_broadcast — fact ⋈ small dim with an explicit broadcast hint;
    * revenue per brand. */
  def q10JoinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p  = Tables.part(spark, sfDir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("p_brand"))
  }

  val q10Sql: String =
    """SELECT p_brand,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS line_count
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q11_join_sortmerge — fact ⋈ fact equi-join (shuffles both sides on the
    * key; Spark picks SMJ/shuffled-hash). */
  def q11JoinSortmerge(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    o.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_count"),
        count(lit(1)).as("line_count"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  val q11Sql: String =
    """SELECT o_orderpriority,
      |       count(DISTINCT o_orderkey) AS order_count,
      |       count(*) AS line_count,
      |       sum(l_quantity) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q12_join_star — multi-way star join: fact → orders → customer →
    * nation → region; the three dimension hops broadcast. */
  def q12JoinStar(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    val c  = Tables.customer(spark, sfDir)
    val n  = Tables.nation(spark, sfDir)
    val r  = Tables.region(spark, sfDir)
    // customer is SF-proportional — no hint; AQE broadcasts it at runtime
    // when the post-scan size clears the threshold (it does at test SFs)
    // and falls back to a shuffled join at the 100 TB point. nation and
    // region are genuinely bounded dimensions (25 / 5 rows) — hint them.
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q12Sql: String =
    """SELECT r_name, n_name,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** q13_join_outer — left outer join: every customer, with their 1995 order
    * activity (zero-filled where absent). */
  def q13JoinOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1995)
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("orders_1995"),
        coalesce(decSum(col("o_totalprice"), 2), lit(0.0)).as("spend_1995"))
      .orderBy(col("c_custkey"))
  }

  val q13Sql: String =
    """SELECT c_custkey, c_mktsegment,
      |       count(o_orderkey) AS orders_1995,
      |       COALESCE(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend_1995
      |FROM customer
      |LEFT JOIN (SELECT * FROM orders WHERE year(o_orderdate) = 1995) o
      |  ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin

  /** q14_join_semi — left semi join (EXISTS): orders containing at least one
    * near-max-quantity line. */
  def q14JoinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val o  = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir).filter(col("l_quantity") >= 49.0)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val q14Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
      |ORDER BY o_orderkey""".stripMargin

  /** q15_join_range — banded range join, scalable form. Two rewrites stack:
    * (1) BAND EXPANSION — the dimension side explodes into one row per
    * integer in its band [p_size-2, p_size], turning the theta join into an
    * equi-join (no nested loop); (2) PRE-AGGREGATION — because the band key
    * (integer quantity) has tiny cardinality (~50), the fact side collapses
    * to per-key partial aggregates BEFORE the join, so the join touches ~50
    * fact rows instead of fanning every fact row out to every matching part
    * (measured 19.5 s → sub-second at sf0.1; at 100 TB the fan-out would be
    * ~10^12 intermediate rows, the pre-aggregate stays at key-cardinality).
    * Semantics: CAST(l_quantity AS INT) BETWEEN p_size-2 AND p_size.
    */
  def q15JoinRange(spark: SparkSession, sfDir: String): DataFrame = {
    val liByQty = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_quantity").cast("int").as("qty_int"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val bands = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        explode(sequence(col("p_size") - 2, col("p_size"))).as("qty_int"))
    bands.join(broadcast(liByQty), Seq("qty_int"))
      .groupBy(col("p_partkey"))
      .agg(sum(col("n")).as("line_count"), sum(col("q")).as("sum_qty"))
      .orderBy(col("p_partkey"))
  }

  val q15Sql: String =
    """SELECT p_partkey, count(*) AS line_count, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN part
      |  ON CAST(l_quantity AS INTEGER) BETWEEN p_size - 2 AND p_size
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin

  /** q17_join_theta — equi-join with a non-equi residual predicate: lines
    * shipped more than 60 days after their order date. The equi key keeps the
    * join shuffled/merge-able; the theta predicate is a post-join filter, not
    * a nested loop.
    */
  def q17JoinTheta(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    li.join(o,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_lines"),
        countDistinct(col("o_orderkey")).as("late_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q17Sql: String =
    """SELECT o_orderpriority, count(*) AS late_lines,
      |       count(DISTINCT o_orderkey) AS late_orders
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q33_topk — global top-k → TakeOrderedAndProjectExec (no full sort: each
    * partition keeps k rows, driver merges k·p). Tie-broken to a total order.
    */
  def q33Topk(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"))
      .orderBy(desc("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
      .limit(10)

  val q33Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey
      |LIMIT 10""".stripMargin

  /** q34_union — union-all of two tagged subsets (the reference's
    * backfill-all-months loop, `populate_s3.py:70-82`, is semantically a
    * union-all of monthly files). */
  def q34Union(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val keyCols = Tables.lineitemKey.map(col)
    val a = li.filter(col("l_returnflag") === "R")
      .select(keyCols :+ lit("returned").as("tag"): _*)
    val b = li.filter(col("l_tax") > 0.06)
      .select(keyCols :+ lit("high_tax").as("tag"): _*)
    a.unionByName(b)
      .orderBy(col("tag") +: keyCols: _*)
  }

  val q34Sql: String =
    """SELECT * FROM (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
      |         'returned' AS tag FROM lineitem WHERE l_returnflag = 'R'
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
      |         'high_tax' AS tag FROM lineitem WHERE l_tax > 0.06)
      |ORDER BY tag, l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin

  /** q35_setops — INTERSECT and EXCEPT over customer-year activity sets,
    * tagged and unioned into one deterministic result. */
  def q35Setops(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    def active(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
    val y95 = active(1995)
    val y96 = active(1996)
    val both   = y95.intersect(y96).withColumn("tag", lit("both_years"))
    val only95 = y95.except(y96).withColumn("tag", lit("only_1995"))
    both.unionByName(only95).orderBy(col("tag"), col("o_custkey"))
  }

  val q35Sql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, 'both_years' AS tag FROM
      |    (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate)=1995
      |     INTERSECT
      |     SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate)=1996)
      |  UNION ALL
      |  SELECT o_custkey, 'only_1995' AS tag FROM
      |    (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate)=1995
      |     EXCEPT
      |     SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate)=1996))
      |ORDER BY tag, o_custkey""".stripMargin
  /** q134_nullsafe_join — the `<=>` (IS NOT DISTINCT FROM) join: ordinary
    * equality drops every NULL-keyed row (NULL = NULL is NULL), the
    * null-safe form matches NULL to NULL — the difference between losing
    * and keeping the "unknown" bucket when joining on a nullable key.
    * Both sides null out keys ≡0 mod 10, and the output audits both
    * semantics side by side so the oracle pins the gap exactly.
    *
    * Scale: Spark plans `<=>` as a plain hash join key (coalesce-style
    * normalization), NOT a nested loop — null-keyed rows co-locate in one
    * hash bucket; a skew-heavy NULL population is the usual caveat (salt
    * or pre-split the NULL bucket when unknowns dominate).
    */
  def q134NullsafeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(when(col("o_orderkey") % 10 === 0, lit(null))
        .otherwise(col("o_custkey")).as("k"),
        col("o_totalprice"))
    val c = Tables.customer(spark, sfDir)
      .select(when(col("c_custkey") % 10 === 0, lit(null))
        .otherwise(col("c_custkey")).as("ck"),
        col("c_nationkey"))
      // one row per key: the null bucket would cross-join its orders side
      .groupBy(col("ck")).agg(count(lit(1)).as("n_cust"))
    val strict = o.join(c, col("k") === col("ck"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice"), 2).as("s"))
      .select(lit("equality").as("semantics"), col("n"), col("s"))
    val nullsafe = o.join(c, col("k") <=> col("ck"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice"), 2).as("s"))
      .select(lit("null_safe").as("semantics"), col("n"), col("s"))
    strict.unionByName(nullsafe).orderBy(col("semantics"))
  }

  val q134Sql: String =
    """WITH o AS (
      |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL
      |              ELSE o_custkey END AS k,
      |         o_totalprice
      |  FROM orders),
      |c AS (
      |  SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
      |              ELSE c_custkey END AS ck,
      |         count(*) AS n_cust
      |  FROM customer GROUP BY 1),
      |strict AS (
      |  SELECT 'equality' AS semantics, count(*) AS n,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
      |  FROM o JOIN c ON o.k = c.ck),
      |ns AS (
      |  SELECT 'null_safe' AS semantics, count(*) AS n,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
      |  FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.ck)
      |SELECT * FROM strict UNION ALL SELECT * FROM ns
      |ORDER BY semantics""".stripMargin
}
