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

  // The bucketed co-located join moved to sources.Bucketing: plan shape
  // (exchange-free vs a shuffling control) is asserted in PlanSpec, and
  // result correctness is the q18_join_bucketed oracle row.

  test("salted join equals the plain join on rows and labels") {
    val li = Tables.lineitem(spark, SparkSuite.sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("label", concat(lit("f_"), col("l_returnflag")))
    val plain = li.join(dim, Seq("l_returnflag"))
    val salted = Scale.saltedJoin(li, dim, Seq("l_returnflag"), 8)
      .select(plain.columns.map(col).toSeq: _*)
    // multiset equality — (l_orderkey, l_linenumber) is not unique in the
    // synthetic fixture, so no column sort is total here
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
