package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, SparkSuite.sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    val salted = Scale.saltedAggregate(li, Seq("l_returnflag"), 16,
      Seq(sum(col("l_quantity")).as("sq"), count(lit(1)).as("c")),
      Seq(sum(col("sq")).as("sum_qty"), sum(col("c")).as("n")))
      .orderBy(col("l_returnflag"))
    // l_quantity is integer-valued, so double sums are exact in any order
    assert(direct.collect().toSeq === salted.collect().toSeq)
  }

  test("bucketed tables join without an exchange") {
    val sp = spark
    Scale.bucketFor(Tables.lineitem(sp, SparkSuite.sf)
      .select("l_orderkey", "l_quantity"), "li_bucketed", "l_orderkey", 8)
    Scale.bucketFor(Tables.orders(sp, SparkSuite.sf)
      .select("o_orderkey", "o_orderpriority"), "o_bucketed", "o_orderkey", 8)
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = sp.table("li_bucketed").join(sp.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      // and it still computes the right thing
      val expected = Tables.lineitem(sp, SparkSuite.sf)
        .join(Tables.orders(sp, SparkSuite.sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      sp.conf.set("spark.sql.adaptive.enabled", "true")
      sp.sql("DROP TABLE IF EXISTS li_bucketed")
      sp.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
