package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Aggregates, DataQuality}

/** Round-6 additions: Benford first-digit audit and RFM segmentation.
  * Both reconcile against independent recomputations on sf0.001. */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  private val sf = SparkSuite.sf

  test("q154 Benford: shares sum to 1, expectations are log10(1+1/d)") {
    val rows = DataQuality.q154Benford(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    // expectations must be the exact compiled constants, and sum to 1
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(r.getAs[Double]("expected_share") ===
        math.log10(1.0 + 1.0 / d))
    }
    assert(math.abs(
      DataQuality.benfordExpected.map(_._2).sum - 1.0) < 1e-12)
    // n_total equals the sum of per-digit counts on every row
    val nSum = rows.map(_.getAs[Long]("n")).sum
    assert(rows.forall(_.getAs[Long]("n_total") === nSum))
  }

  test("q155 RFM: segments partition the customer base exactly") {
    val rows = Aggregates.q155Rfm(spark, sf).collect()
    rows.foreach { r =>
      assert((1 to 3).contains(r.getAs[Int]("r_score")))
      assert((1 to 3).contains(r.getAs[Int]("f_score")))
      assert((1 to 3).contains(r.getAs[Int]("m_score")))
    }
    val nCustWithOrders = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCustWithOrders)
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === nOrders)
  }
}
