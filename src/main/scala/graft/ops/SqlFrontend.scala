package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL-text front end — the surface the reference's warehouse users actually
  * type (`/root/reference/README.md:77` — "connect to the Redshift cluster
  * and run queries"). Registers the fixture tables as temp views and runs
  * ANSI SQL through `spark.sql`, exercising the parser → analyzer path the
  * DataFrame queries bypass. The SQL dialect here is the common
  * Spark/DuckDB subset, so the oracle runs the identical statement.
  */
object SqlFrontend {

  private def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** The statement is shared verbatim by the Spark query and the DuckDB
    * oracle (common-dialect SQL): a shipping-priority style query — join,
    * filter, grouped decimal revenue, top-10. */
  val q90Sql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate > o_orderdate
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** q90_sql — the statement above through spark.sql over temp views. */
  def q90SqlQuery(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(q90Sql)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): a
    * bill-of-materials-style ancestor walk — every part climbs its derived
    * parent chain k → k div 2 down to the root, emitting chain depth and
    * the exact integer sum of ancestor keys. Spark plans this as its
    * UnionLoop operator: each recursion level is one distributed step over
    * the previous level's rows, state bounded by the frontier — the
    * engine-native form of what [[Components.connectedComponents]] hand
    * drives with checkpointed iteration (the driver loop remains the right
    * tool when a step needs joins against other tables or convergence
    * tests the CTE form can't express).
    *
    * The recursion is depth-bounded (log₂ of the key space, ~15 levels) and
    * the frontier shrinks monotonically — the shape that scales; an
    * unbounded-frontier recursive query would not. */
  private def q87Statement(div: String): String =
    s"""WITH RECURSIVE walk(k, a, s) AS (
       |  SELECT p_partkey, p_partkey, p_partkey FROM part
       |  UNION ALL
       |  SELECT k, a $div 2, s + (a $div 2) FROM walk WHERE a > 1)
       |SELECT k AS p_partkey, count(*) AS depth,
       |       max(s) AS chain_sum
       |FROM walk GROUP BY k ORDER BY k""".stripMargin

  /** q87_recursive — the walk above through spark.sql. Statement is shared
    * with the oracle up to the integer-division spelling (`div` vs `//`). */
  def q87Recursive(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(q87Statement("div"))
  }

  val q87Sql: String = q87Statement("//")

  /** Correlated scalar subquery — customers spending over 1.5× their
    * nation's average. Catalyst decorrelates the inner aggregate into a
    * grouped join (no per-row re-execution — the rewrite that makes
    * correlated SQL scale); DuckDB runs the identical statement. Averages
    * derive from decimal-exact sums divided by exact counts, so the engines
    * compare bit-identical doubles on both sides of the predicate. */
  val q88Sql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           AS total
      |  FROM orders GROUP BY o_custkey)
      |SELECT c.c_custkey, s.total
      |FROM customer c JOIN spend s ON s.o_custkey = c.c_custkey
      |WHERE s.total > (
      |  SELECT 1.5 * (CAST(sum(CAST(s2.total AS DECIMAL(18,2))) AS DOUBLE)
      |                / count(*))
      |  FROM spend s2 JOIN customer c2 ON c2.c_custkey = s2.o_custkey
      |  WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c.c_custkey""".stripMargin

  /** q88_subquery — the statement above through spark.sql. */
  def q88Subquery(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(q88Sql)
  }
}
