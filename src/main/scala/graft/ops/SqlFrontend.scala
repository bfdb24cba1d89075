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
}
