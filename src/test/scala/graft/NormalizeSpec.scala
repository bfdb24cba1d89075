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

  test("q190: zone maps prune the date probe exactly, price not at all") {
    val rows = graft.sources.ZOrder.q190Zonemap(spark, SparkSuite.sf)
      .collect()
    assert(rows.nonEmpty)
    val n = Tables.lineitem(spark, SparkSuite.sf).count()
    assert(rows.map(_.getLong(1)).sum === n, "zones partition the fact")
    val q1_1997 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val q2_1997 = java.sql.Timestamp.valueOf("1997-04-01 00:00:00")
    rows.foreach { r =>
      val z = r.getTimestamp(0)
      assert(r.getBoolean(6) === (z.before(q1_1997) || !z.before(q2_1997)),
        s"zone $z date skip")
      assert(r.getLong(2) <= r.getLong(3), "footer min <= max")
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
    // the date predicate keeps exactly three monthly zones
    assert(rows.count(!_.getBoolean(6)) === 3)
    // price is uncorrelated with ingest time: no zone prunes the probe
    assert(rows.forall(!_.getBoolean(7)), "price probe prunes nothing")
  }

  test("q191: card numbers tie out against direct recomputation") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.Corpus.q191DatasetCard(spark, SparkSuite.sf)
      .collect()(0)
    val d = Tables.documents(spark, SparkSuite.sf)
      .select(col("text"), col("lang"), col("source"), col("n_chars"))
      .collect()
    assert(r.getLong(0) === d.length.toLong)
    assert(r.getLong(1) === d.map(_.getString(2)).distinct.length.toLong)
    assert(r.getLong(2) === d.map(_.getString(1)).distinct.length.toLong)
    assert(r.getLong(4) === d.map(_.getLong(3)).sum)
    assert(r.getLong(5) ===
      d.length.toLong - d.map(_.getString(0)).distinct.length)
    val top = d.groupBy(_.getString(1)).view.mapValues(_.size).toSeq
      .sortBy { case (l, n) => (-n, l) }.head
    assert(r.getString(7) === top._1)
    assert(r.getDouble(8) === top._2.toDouble / d.length)
  }
}
