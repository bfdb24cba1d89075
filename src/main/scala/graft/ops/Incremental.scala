package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Incremental aggregate maintenance — the materialized-view pattern: keep
  * per-group ALGEBRAIC partial states (sum/count/min/max), fold each new
  * batch into them by re-aggregating states, and never rescan history.
  * This is how a 100 TB warehouse keeps daily rollups: the nightly job
  * aggregates ONLY the new partition and merges ~|groups| state rows.
  *
  * Correctness hinges on the merge being exact: decimal sums make the
  * partial-then-merge path bit-identical to a full recompute, which is
  * precisely what the oracle checks (q106's oracle SQL is the FULL
  * recompute — the incremental plan must match it to the hash).
  */
object Incremental {

  /** One batch's partial state per group. */
  def partialState(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("s_price"),
        count(lit(1)).as("n_rows"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))

  /** Merge any number of partial-state frames into the current view. All
    * four aggregates are algebraic, so merging = re-aggregating states. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("s_price")).as("s_price"),
        sum(col("n_rows")).as("n_rows"),
        min(col("first_ship")).as("first_ship"),
        max(col("last_ship")).as("last_ship"))

  /** q106_incremental_agg — split the fact table into a "history" batch and
    * a "new arrivals" batch at a date cutoff, maintain the view
    * incrementally, and emit the merged state (avg derived at read time).
    * The oracle recomputes from scratch — hash equality proves the
    * incremental path is exact. */
  def q106IncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val cutoff = "1997-01-01"
    val keys = Seq("l_returnflag", "l_linestatus")
    val base = partialState(li.filter(col("l_shipdate") < lit(cutoff)), keys)
    val delta = partialState(li.filter(col("l_shipdate") >= lit(cutoff)), keys)
    mergeStates(Seq(base, delta), keys)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("s_price").cast("double").as("sum_price"),
        col("n_rows"),
        (col("s_price").cast("double") / col("n_rows")).as("avg_price"),
        col("first_ship"), col("last_ship"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q106Sql: String =
    // the FULL recompute — the incremental merge must match it exactly
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         AS sum_price,
      |       count(*) AS n_rows,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / count(*) AS avg_price,
      |       min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
