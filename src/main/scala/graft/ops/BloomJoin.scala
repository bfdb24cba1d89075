package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bloom-filter semi-join reduction — the standard shuffle-volume cut for
  * fact ⋈ selective-dim joins at warehouse scale (SURVEY §2.3's join family;
  * the implied-warehouse tier the reference's Redshift FK schema serves,
  * `/root/reference/setup.py:87-88`).
  *
  * Spark injects this rewrite itself only under a narrow cost window
  * (`spark.sql.optimizer.runtime.bloomFilter.*`); exposing it as a library
  * operator lets a pipeline author force the reduction when they KNOW the
  * build side is selective — e.g. "urgent orders only" against a 100 TB
  * lineitem, where pruning before the shuffle cuts exchanged bytes by the
  * join's selectivity (~20% here) at the cost of one fixed-size sketch.
  *
  * Scale design:
  *  - The build is a distributed `treeAggregate` (`stat.bloomFilter`); only
  *    the finished sketch (~1.2 MB at 1M items / 1% fpp) crosses the driver —
  *    the same lifecycle as a broadcast-join build side, NOT a row collect.
  *  - The probe is Spark's own codegen'd [[BloomFilterMightContain]] (the
  *    expression its runtime row-level filtering uses), fed the serialized
  *    sketch as a foldable binary literal: evaluated once per task, streamed
  *    against rows inside whole-stage codegen.
  *  - False positives are eliminated by the real join that follows; false
  *    negatives are impossible, so the composed result is EXACTLY the plain
  *    join (which is what the oracle checks).
  */
object BloomJoin {

  /** Filter `fact` to rows whose long-typed `factKey` might appear in
    * `dim`'s `dimKey` column. No false negatives. */
  def bloomPrune(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val sketch = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      sketch.writeTo(bos)
      bos.toByteArray
    }
    val mightContain: Column = GraftColumnBridge.column(
      BloomFilterMightContain(
        Literal(bytes),
        GraftColumnBridge.expression(col(factKey).cast("long"))))
    fact.where(mightContain)
  }

  /** q19_join_bloom — lineitem ⋈ urgent-orders with a bloom-filter cut on
    * the fact side ahead of the shuffle. The merge hint forces the shuffled
    * join (the 100 TB case where neither side broadcasts); revenue per
    * order month. Oracle is the PLAIN join — bloom must not change results.
    */
  def q19JoinBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, sfDir)
    val pruned = bloomPrune(li, "l_orderkey", urgent, "o_orderkey")
    pruned
      .join(urgent.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("order_month"))
  }

  val q19Sql: String =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
