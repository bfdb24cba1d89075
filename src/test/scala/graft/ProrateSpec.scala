package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Intervals

/** q164 pro-rata allocation — the telescoping-floor form must conserve
  * every cent and slice the calendar correctly. */
class ProrateSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q164: allocation conserves cents exactly across all months") {
    import org.apache.spark.sql.functions._
    val out = Intervals.q164Prorate(spark, SparkSuite.sf)
    val allocated = out.agg(sum(col("recognized_cents"))).collect()(0).getLong(0)
    val expected = Tables.orders(spark, SparkSuite.sf)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .collect()(0).getLong(0)
    assert(allocated === expected,
      "telescoped floor shares must sum to the exact order total")
  }

  test("q164: every order slices into 3 or 4 calendar months") {
    import org.apache.spark.sql.functions._
    val nOrders = Tables.orders(spark, SparkSuite.sf).count()
    val nSlices = Intervals.q164Prorate(spark, SparkSuite.sf)
      .agg(sum(col("n_slices"))).collect()(0).getLong(0)
    // a 90-day window starting any day touches 3 or 4 calendar months
    assert(nSlices >= 3 * nOrders && nSlices <= 4 * nOrders)
  }

  test("q164: monthly shares are non-negative and bounded by a month of days") {
    val rows = Intervals.q164Prorate(spark, SparkSuite.sf).collect()
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"negative recognition in ${r.get(0)}")
    }
  }
}
