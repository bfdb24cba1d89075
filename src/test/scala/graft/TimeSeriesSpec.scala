package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Events, Tfidf}

/** q175/q176/q177 — autocorrelation, RRF fusion, CUSUM changepoint:
  * semantics proven against direct recomputation of the definitions. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q175: r_k matches a driver-side recomputation and stays in [-1,1]") {
    import org.apache.spark.sql.functions._
    val out = Events.q175Autocorr(spark, SparkSuite.sf).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getDouble(2)))
    val daily = Tables.events(spark, SparkSuite.sf)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length.toLong
    val s = daily.sum
    val c = daily.map(x => BigInt(n * x - s))
    val den = c.map(v => v * v).sum
    out.foreach { case (k, pairs, r) =>
      assert(pairs === n - k, s"lag $k pair count")
      val num = c.dropRight(k.toInt).zip(c.drop(k.toInt))
        .map { case (a, b) => a * b }.sum
      assert(r === num.toDouble / den.toDouble, s"lag $k value")
      assert(r >= -1.0 && r <= 1.0, s"lag $k bounds")
    }
    assert(out.map(_._1).toSeq === (1L to 14L))
  }

  test("q176: fusion scores are the decimal sum of the per-list terms") {
    val rows = Tfidf.q176Rrf(spark, SparkSuite.sf).collect()
    assert(rows.length === 20)
    def term(rank: Any): BigDecimal = rank match {
      case null   => BigDecimal(0)
      case i: Int => BigDecimal(1.0 / (60 + i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    rows.foreach { r =>
      val expect = (term(r.get(1)) + term(r.get(2))).toDouble
      assert(r.getDouble(3) === expect, s"doc ${r.getLong(0)}")
      assert(r.get(1) != null || r.get(2) != null,
        "every fused doc came from at least one list")
    }
    // total order: non-increasing score, doc_id tie-break
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) > b.getDouble(3) ||
        (a.getDouble(3) == b.getDouble(3) && a.getLong(0) < b.getLong(0)))
    }
    // docs present in BOTH lists must outrank single-list docs of equal rank
    val both = rows.filter(r => r.get(1) != null && r.get(2) != null)
    assert(both.nonEmpty, "fixture has lexical+vector overlap")
  }

  test("q177: the reported extreme IS the series' max |cusum|") {
    import org.apache.spark.sql.functions._
    val out = Events.q177Cusum(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2),
        r.getLong(3), r.getDouble(4)))
    val daily = Tables.events(spark, SparkSuite.sf)
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.sortBy(_._2.toString).map(_._3)
      val n = xs.length.toLong
      val s = xs.sum
      var cum = 0L
      val scans = xs.map { x => cum += n * x - s; cum }
      val best = scans.map(math.abs).max
      val (_, nDays, _, cusum, stat) = out.find(_._1 === et).get
      assert(nDays === n, s"$et day count")
      assert(math.abs(cusum) === best, s"$et extreme magnitude")
      assert(stat === best.toDouble / n.toDouble, s"$et stat")
      assert(scans.last === 0L, s"$et cusum telescopes to zero")
    }
  }
}
