package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Text, Tfidf, VectorQa}

/** q184/q185/q186 — sparse kNN, vector QA, langid confusion. */
class SparseKnnSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q184: neighbor lists are symmetric-consistent and well-ranked") {
    val rows = Tfidf.q184SparseKnn(spark, SparkSuite.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(rows.nonEmpty, "bigram features must produce candidates")
    // per-doc ranks are 1..k with non-increasing scores
    rows.groupBy(_._1).foreach { case (d, ns) =>
      val byRank = ns.sortBy(_._5)
      assert(byRank.map(_._5).toSeq === (1 to byRank.length))
      byRank.sliding(2).foreach {
        case Array(x, y) =>
          assert(x._4 > y._4 || (x._4 == y._4 && x._2 < y._2), s"doc $d")
        case _ => ()
      }
    }
    // symmetry of the underlying score: if (a,b) and (b,a) both surfaced,
    // their cosines agree (same pair row fed both directions)
    val m = rows.map(r => (r._1, r._2) -> r._4).toMap
    rows.foreach { r =>
      m.get((r._2, r._1)).foreach(c => assert(c === r._4))
    }
    // no self-neighbors, no out-of-range scores
    rows.foreach { r =>
      assert(r._1 !== r._2)
      assert(r._4 >= -1e-9 && r._4 <= 1.0 + 1e-9)
    }
  }

  test("q185: MAD flags exactly the planted norm outliers") {
    import spark.implicits._
    // 15 unit-norm vectors and one 40×-scaled rogue per label
    val planted = (0 until 32).map { i =>
      val s = if (i >= 30) 40.0f else 1.0f
      (i.toLong, Array.fill(4)(s * 0.5f), i % 2)
    }
    val out = VectorQa.normOutliers(
        planted.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(1) === 16L)
      assert(r.getDouble(2) === 1.0, "median norm is the unit cluster")
      assert(r.getDouble(3) === 0.0, "MAD zero: cluster is identical")
      assert(r.getLong(4) === 1L, "exactly the rogue is flagged")
      assert(r.getDouble(5) === 1.0 / 16.0)
    }
    // and on the real fixture the accounting identity holds
    val real = VectorQa.q185VectorQa(spark, SparkSuite.sf).collect()
    real.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1))
      assert(r.getDouble(5) === r.getLong(4).toDouble / r.getLong(1))
    }
  }

  test("q186: confusion matrix ties out to the q52 prediction frame") {
    import org.apache.spark.sql.functions._
    val out = Text.q186LangidConfusion(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    val pred = Text.q52Langid(spark, SparkSuite.sf)
      .select(col("actual_lang"), col("pred_lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.values.map(_._1).sum === pred.length.toLong)
    pred.groupBy(identity).foreach { case (cell, xs) =>
      val (n, nActual, correct) = out(cell)
      assert(n === xs.length.toLong, s"$cell count")
      assert(nActual === pred.count(_._1 == cell._1).toLong)
      assert(correct === (cell._1 == cell._2))
    }
  }
}
