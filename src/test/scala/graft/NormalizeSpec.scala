package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Normalize, Similarity}

/** q187/q188/q189 — quantile normalization, Simpson audit, MRR. */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q187: endpoints map to endpoints and ranks stay monotone") {
    val rows = Normalize.q187QuantileNorm(spark, SparkSuite.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = rows.length.toLong
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val byRank = ds.sortBy(_._4)
      // source-min maps to global index 1, source-max to N (multi-doc src)
      if (ds.length > 1) {
        assert(byRank.head._6 === 1L, s"$src lower endpoint")
        assert(byRank.last._6 === n, s"$src upper endpoint")
      }
      // mapping is monotone in rank, and norm values are monotone too
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 <= b._6, s"$src index monotone")
          assert(a._7 <= b._7, s"$src value monotone")
        case _ => ()
      }
    }
    // normalized values are drawn from the actual n_chars population
    val pop = rows.map(_._3).toSet
    assert(rows.forall(r => pop.contains(r._7)))
  }

  test("q188: directions are the exact sign of the rate difference") {
    val rows = Normalize.q188Simpson(spark, SparkSuite.sf).collect()
    assert(rows.nonEmpty)
    // pooled cells tie out to the sum of the local cells
    val (hf, hn, lf, ln) = rows.map(r => (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).reduce((a, b) =>
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    val pooledDir = math.signum(hf * ln - lf * hn).toInt
    rows.foreach { r =>
      assert(r.getInt(8) === pooledDir, "pooled direction consistent")
      val local = math.signum(r.getLong(1) * r.getLong(4) -
        r.getLong(3) * r.getLong(2)).toInt
      assert(r.getInt(7) === local)
      assert(r.getBoolean(9) === (local * pooledDir == -1))
    }
  }

  test("q189: MRR accounting matches recall's hit structure") {
    val rows = Similarity.q189Mrr(spark, SparkSuite.sf).collect()
    assert(rows.length === 5)
    val mrr = rows.head.getDouble(3)
    rows.foreach { r =>
      assert(r.getDouble(3) === mrr, "corpus MRR repeated per row")
      if (r.isNullAt(1)) assert(r.getDouble(2) === 0.0)
      else {
        val fh = r.getAs[Number](1).longValue
        assert(fh >= 1 && fh <= 5)
        val expect = BigDecimal(1.0 / fh)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(2) === expect)
      }
    }
    val meanExpect = rows.map(r => BigDecimal(r.getDouble(2))).sum / 5
    assert(math.abs(mrr - meanExpect.toDouble) < 1e-12)
  }
}
