package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupedTopK

/** The custom LogicalPlan/Strategy/SparkPlan operator: semantics on planted
  * groups, equivalence with the window form it replaces, and the physical
  * shape (partial heap below the exchange, no sort). */
class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("keeps exactly k rows per group; short groups emit whole") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
      ("b", 5L, 5.0),
      ("c", 6L, 7.0), ("c", 7L, 7.0), ("c", 8L, 7.0)) // all-tie group
      .toDF("g", "id", "v")
    val out = GroupedTopK.topKPerKey(df, Seq("g"),
      Seq("v" -> true, "id" -> false), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: top-2 by v desc = ids 4, 2; b: whole group; c: tie broken by id asc
    assert(out === Set("a" -> 4L, "a" -> 2L, "b" -> 5L, "c" -> 6L, "c" -> 7L))
  }

  test("agrees with the window row_number form on orders") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, SparkSuite.sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val win = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val expected = o.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("o_orderpriority", "o_orderkey")
    val got = GroupedTopK.topKPerKey(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 5)
      .orderBy("o_orderpriority", "o_orderkey")
    assert(got.collect().toSeq === expected.collect().toSeq)
  }

  test("plans a partial heap below the exchange and no sort") {
    val o = Tables.orders(spark, SparkSuite.sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val df = GroupedTopK.topKPerKey(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString()
    // nodeName strips the Exec suffix; partial prints trailing `true`
    assert("GroupedTopK \\[".r.findAllIn(p).length === 2,
      s"expected partial+final GroupedTopK nodes:\n$p")
    assert(p.contains(", 3, true") && p.contains(", 3, false"),
      s"expected one partial and one final heap:\n$p")
    assert(p.contains("hashpartitioning(o_orderpriority"),
      s"expected a hash exchange on the group key:\n$p")
    assert(!p.contains("Sort "), s"the heap operator must not sort:\n$p")
  }
  test("optimizer rule rewrites the verbatim window form to the heap plan") {
    val df = GroupedTopK.q126RankFilter(spark, SparkSuite.sf)
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collect {
      case p: GroupedTopK.GroupedTopKPlan => p
    }.nonEmpty, s"rule did not fire:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GroupedTopK")) // exec node renders sans Exec
    assert(!physical.contains("Window"), s"window survived:\n$physical")
    // identical rows to the explicit-API form (q94)
    val viaRule = df.collect().map(_.toSeq).toSeq
    val viaApi = GroupedTopK.q94GroupedTopk(spark, SparkSuite.sf)
      .collect().map(_.toSeq).toSeq
    assert(viaRule === viaApi)
  }

  test("optimizer rule leaves the rn = 1 argmax idiom to the window path " +
    "(r15 measured rejection: InferWindowGroupLimit's codegen pre-filter " +
    "beats the k=1 heap)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val o = Tables.orders(spark, SparkSuite.sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val top1 = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(top1.queryExecution.optimizedPlan.collect {
      case p: GroupedTopK.GroupedTopKPlan => p
    }.isEmpty, "rn = 1 must stay a window (see the rule's rejection note)")
  }

  test("optimizer rule leaves rank-keeping and non-literal filters alone") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val o = Tables.orders(spark, SparkSuite.sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    // rn kept in the output -> must stay a window (row numbers are needed)
    val keeps = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(keeps.queryExecution.optimizedPlan.collect {
      case p: GroupedTopK.GroupedTopKPlan => p
    }.isEmpty)
    // non-literal bound -> no rewrite
    val dynamic = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("o_orderkey"))
      .drop("rn")
    assert(dynamic.queryExecution.optimizedPlan.collect {
      case p: GroupedTopK.GroupedTopKPlan => p
    }.isEmpty)
  }
}
