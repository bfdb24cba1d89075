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

  test("q178: bars tie out against a direct first/last/extreme scan") {
    import org.apache.spark.sql.functions._
    val out = Events.q178Ohlc(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    val raw = Tables.events(spark, SparkSuite.sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val grouped = raw.groupBy(r => (r._1, r._2))
    assert(out.keySet === grouped.keySet)
    grouped.foreach { case (key, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._4))
      val (open, high, low, close, n) = out(key)
      assert(open === ordered.head._5, s"$key open")
      assert(close === ordered.last._5, s"$key close")
      assert(high === rows.map(_._5).max, s"$key high")
      assert(low === rows.map(_._5).min, s"$key low")
      assert(n === rows.length.toLong, s"$key count")
    }
  }

  test("q179: deciles are equal-depth and accounting telescopes") {
    import graft.ops.Evaluation
    val rows = Evaluation.q179Gains(spark, SparkSuite.sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq === (1 to 10))
    val nAll = rows.map(_._2).sum
    // equal-depth contract: bin sizes differ by at most one
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    assert(nAll === Tables.orders(spark, SparkSuite.sf).count())
    // cumulative positives telescope and capture ends at exactly 1
    rows.foldLeft(0L) { case (cum, (_, _, np, cp, capture, _)) =>
      assert(cp === cum + np); cum + np
    }
    assert(rows.last._5 === 1.0)
    // lift is the decile rate over the base rate
    val posAll = rows.map(_._3).sum
    rows.foreach { case (d, nr, np, _, _, lift) =>
      val expect = (np.toDouble / nr.toDouble) /
        (posAll.toDouble / nAll.toDouble)
      assert(lift === expect, s"decile $d lift")
    }
  }

  test("q180: pair weights reconcile against a scala recomputation") {
    import org.apache.spark.sql.functions._
    import graft.ops.Text
    val out = Text.q180BpePairs(spark, SparkSuite.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val words = Tables.documents(spark, SparkSuite.sf)
      .select(explode(split(col("text"), " ")).as("w")).collect()
      .map(_.getString(0)).filter(_.length >= 2)
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong)
    val weight = collection.mutable.Map.empty[String, Long]
    val support = collection.mutable.Map.empty[String, Set[String]]
    freq.foreach { case (w, f) =>
      w.sliding(2).foreach { p =>
        weight(p) = weight.getOrElse(p, 0L) + f
        support(p) = support.getOrElse(p, Set.empty) + w
      }
    }
    val expect = weight.toSeq.map { case (p, wt) => (p, wt, support(p).size) }
      .sortBy { case (p, wt, _) => (-wt, p) }.take(30)
    assert(out.toSeq === expect.map(t => (t._1, t._2, t._3.toLong)))
  }

  test("q192: coverage accounting ties to the q184 neighbor lists") {
    import graft.ops.Tfidf
    val out = Tfidf.q192RecCoverage(spark, SparkSuite.sf).collect()
    val recs = Tfidf.q184SparseKnn(spark, SparkSuite.sf)
      .select("nbr").collect().map(_.getLong(0))
    val docs = Tables.documents(spark, SparkSuite.sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = docs.groupBy(_._2)
    val exposure = recs.groupBy(identity).view.mapValues(_.length)
    assert(out.map(_.getLong(4)).sum === recs.length.toLong,
      "total exposure = all neighbor slots")
    out.foreach { r =>
      val src = r.getString(0)
      val ids = bySrc(src).map(_._1)
      assert(r.getLong(1) === ids.length.toLong)
      assert(r.getLong(2) === ids.count(exposure.contains).toLong)
      assert(r.getLong(3) ===
        ids.map(i => exposure.getOrElse(i, 0)).max.toLong)
    }
  }

  test("q193: lateness agrees with a sequential high-water-mark replay") {
    import org.apache.spark.sql.functions._
    val out = Events.q193Lateness(spark, SparkSuite.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val raw = Tables.events(spark, SparkSuite.sf)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (et, rows) =>
      var hwm = Long.MinValue; var nLate = 0L; var worst = 0L
      rows.sortBy(_._2).foreach { case (_, _, us) =>
        if (us < hwm) { nLate += 1; worst = math.max(worst, hwm - us) }
        hwm = math.max(hwm, us)
      }
      val (n, late, maxSecs) = out(et)
      assert(n === rows.length.toLong, s"$et count")
      assert(late === nLate, s"$et late count")
      assert(maxSecs === worst.toDouble / 1e6, s"$et worst lateness")
    }
  }

  test("q200: attribution matches a sequential last-touch replay") {
    import org.apache.spark.sql.functions._
    val out = Events.q200Attribution(spark, SparkSuite.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val raw = Tables.events(spark, SparkSuite.sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")), floor(col("value") * 100 + 0.5)
          .cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val credit = collection.mutable.Map.empty[String, (Long, Long)]
    raw.groupBy(_._1).foreach { case (_, evs) =>
      var lastTouch: Option[(String, Long)] = None
      evs.sortBy(e => (e._4, e._2)).foreach { case (_, _, et, us, cents) =>
        if (et == "purchase") {
          val ch = lastTouch match {
            case Some((c, tus)) if us - tus <= Events.AttributionWindowUs => c
            case _ => "direct"
          }
          val (n0, c0) = credit.getOrElse(ch, (0L, 0L))
          credit(ch) = (n0 + 1, c0 + cents)
        } else lastTouch = Some((et, us))
      }
    }
    assert(out.keySet === credit.keySet.toSet)
    credit.foreach { case (ch, (n, cents)) =>
      assert(out(ch)._1 === n, s"$ch purchase count")
      assert(out(ch)._2 === cents.toDouble / 100.0, s"$ch revenue")
    }
    assert(out.values.map(_._1).sum ===
      raw.count(_._3 == "purchase").toLong, "every purchase attributed")
  }

  test("q246 SAX: windows tile the series; symbols match a direct z-scan") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Events.q246SaxMotifs(spark, SparkSuite.sf).collect()
    val daily = Tables.orders(spark, SparkSuite.sf)
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("cents"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val n = daily.length
    assert(out.map(_.getAs[Long]("n_windows")).sum === (n - 2).toLong,
      "3-day windows must tile the whole series")
    // recompute symbols with BigInt-exact moments and the same z chain
    val sx = daily.map(d => BigInt(d._2)).sum
    val sxx = daily.map(d => BigInt(d._2) * BigInt(d._2)).sum
    val mu = sx.toDouble / n
    val sdNum = math.sqrt((BigInt(n) * sxx - sx * sx).toDouble)
    val syms = daily.map { case (_, c) =>
      val z = (c.toDouble - mu) * n / sdNum
      if (z < -0.6745) 'a' else if (z < 0.0) 'b'
      else if (z < 0.6745) 'c' else 'd'
    }
    val expect = syms.sliding(3).map(_.mkString).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(expect.getOrElse(r.getString(0), 0L) ===
        r.getAs[Long]("n_windows"), s"motif ${r.getString(0)}")
    }
    // alphabet is roughly balanced on a z-normalized series (quartile
    // breakpoints): every letter appears somewhere
    assert("abcd".forall(ch => syms.contains(ch)))
  }
}
