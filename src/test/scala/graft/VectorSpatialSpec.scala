package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Intervals, Regression, Spatial, Vectorize}

/** Round-6 batch 2: feature hashing, per-group OLS, sweep-line
  * concurrency, grid-blocked nearest neighbor. Each reconciled against an
  * independent recomputation on sf0.001. */
class VectorSpatialSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  private val sf = SparkSuite.sf

  test("q156 feature hash: footprint inequalities + real collisions") {
    val rows = Vectorize.q156FeatureHash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nnz, norm) = (r.getAs[Long]("n_toks"), r.getAs[Long]("nnz"),
        r.getAs[Long]("norm_sq"))
      assert(nnz <= Vectorize.NumBuckets && nnz <= n)
      // Cauchy–Schwarz: Σc² ≥ (Σc)²/nnz, with equality iff uniform load
      assert(norm * nnz >= n * n)
      assert(norm <= n * n)
    }
    // the 64-bucket space MUST collide on this vocabulary: some doc has
    // fewer occupied buckets than distinct tokens
    val distinctToks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id").agg(countDistinct("tok").as("n_distinct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.exists(r =>
      r.getAs[Long]("nnz") < distinctToks(r.getAs[Long]("doc_id"))))
  }

  test("q157 OLS: slope/intercept/r2 match a driver-side recomputation") {
    val rows = Regression.q157Ols(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("A", "N", "R"))
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val pts = xs(r.getString(0)).map(p =>
        (p.getDouble(1), math.rint(p.getDouble(2) * 100)))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getAs[Long]("n") === pts.length.toLong)
      assert(math.abs(r.getAs[Double]("slope") - slope)
        / math.abs(slope) < 1e-9)
      val intercept = (sy - slope * sx) / n
      assert(math.abs(r.getAs[Double]("intercept") - intercept)
        / math.max(math.abs(intercept), 1.0) < 1e-6)
      val r2 = r.getAs[Double]("r2")
      assert(r2 > 0.0 && r2 <= 1.0)
    }
  }

  test("q234 corr matrix: symmetric-free triangle matches direct Pearson") {
    val rows = Regression.q234CorrMatrix(spark, sf).collect()
    assert(rows.length === 6)
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")).collect()
      .map(r => Map(
        "quantity" -> math.rint(r.getDouble(0) * 100),
        "extendedprice" -> math.rint(r.getDouble(1) * 100),
        "discount" -> math.rint(r.getDouble(2) * 100),
        "tax" -> math.rint(r.getDouble(3) * 100)))
    def pearson(a: String, b: String): Double = {
      val n = raw.length.toDouble
      val sa = raw.map(_(a)).sum; val sb = raw.map(_(b)).sum
      val sab = raw.map(m => m(a) * m(b)).sum
      val saa = raw.map(m => m(a) * m(a)).sum
      val sbb = raw.map(m => m(b) * m(b)).sum
      (n * sab - sa * sb) /
        (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b || Regression.CorrMeasures.indexOf(a) <
        Regression.CorrMeasures.indexOf(b))
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0, s"$a-$b corr $c")
      assert(math.abs(c - pearson(a, b)) < 1e-9, s"$a-$b")
    }
    // no strong-correlation expectation: globally, extendedprice is
    // dominated by per-part unit price variance, so even the price-
    // quantity pair sits near zero on this fixture (q157 sees the
    // within-flag slope instead). The matrix's job is exactness, checked
    // above for all six pairs.
  }

  test("q158 concurrency: peak matches a per-day brute force") {
    val out = Intervals.q158Concurrency(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("peak") >= 1 &&
      r.getAs[Long]("peak") <= r.getAs[Long]("n_intervals")))
    // brute-force the busiest supplier: peak = max over days of the
    // number of intervals covering that day
    val probe = out.head.getAs[Long]("suppkey")
    val ivs = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey") === probe)
      .select(datediff(col("l_shipdate"), lit("1970-01-01").cast("date"))
          .as("s"),
        (datediff(col("l_shipdate"), lit("1970-01-01").cast("date")) +
          pmod(col("l_linenumber"), lit(14)) + 1).as("e"))
      .collect().map(r => (r.getAs[Int]("s"), r.getAs[Int]("e")))
    val brute = ivs.flatMap { case (s, e) => s to e }
      .groupBy(identity).values.map(_.size).max
    assert(out.head.getAs[Long]("peak") === brute.toLong)
  }

  test("q159 grid kNN: agrees with unblocked brute force when NN is near") {
    val out = Spatial.q159GridKnn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.nonEmpty)
    def coord(k: Long, salt: Long): Double =
      ((k * 2654435761L + salt) % 2147483647L * 2147483648L +
        (k * 3141592653L + salt) % 2147483629L) % 1000L / 10.0
    val supp = Tables.supplier(spark, sf).select("s_suppkey").collect()
      .map(_.getLong(0)).map(k => (k, coord(k, 103), coord(k, 104)))
    val custs = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    var checked = 0
    custs.take(200).foreach { c =>
      val (cx, cy) = (coord(c, 101), coord(c, 102))
      val (bk, bx, by, bd) = supp.map { case (k, x, y) =>
        (k, x, y, (cx - x) * (cx - x) + (cy - y) * (cy - y)) }
        .minBy(t => (t._4, t._1))
      val sameCell = math.abs(math.floor(bx / 10) - math.floor(cx / 10)) <= 1 &&
        math.abs(math.floor(by / 10) - math.floor(cy / 10)) <= 1
      if (sameCell) { // global NN inside the 3×3 window ⇒ must be found
        assert(out(c) === ((bk, bd)))
        checked += 1
      }
    }
    // sf0.001 has only 10 suppliers, so the plane is sparse: the global
    // NN falls inside the probe's 3×3 window for ~40% of customers
    assert(checked > 50)
  }

  test("q267 adaptive kNN: exact global NN for EVERY customer") {
    // The expanding-ring contract: unlike q159's radius-bounded window,
    // every customer resolves, and each answer is the brute-force global
    // (min d², then min suppkey) — the ring bound may only save work,
    // never change a result. sf0.001's 10 suppliers force a coarse
    // adaptive grid (cells-per-side ≈ √(10/2) ≈ 2) with empty cells, so
    // the loop's multi-ring and full-coverage paths both execute.
    val out = Spatial.q267AdaptiveKnn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def coord(k: Long, salt: Long): Double =
      ((k * 2654435761L + salt) % 2147483647L * 2147483648L +
        (k * 3141592653L + salt) % 2147483629L) % 1000L / 10.0
    val supp = Tables.supplier(spark, sf).select("s_suppkey").collect()
      .map(_.getLong(0)).map(k => (k, coord(k, 103), coord(k, 104)))
    val custs = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    assert(out.size === custs.length,
      "every customer must resolve to an exact NN")
    custs.foreach { c =>
      val (cx, cy) = (coord(c, 101), coord(c, 102))
      val (bk, _, _, bd) = supp.map { case (k, x, y) =>
        (k, x, y, (cx - x) * (cx - x) + (cy - y) * (cy - y)) }
        .minBy(t => (t._4, t._1))
      assert(out(c) === ((bk, bd)), s"customer $c")
    }
  }

  test("q267 brute-force remainder path ≡ the ring path, with visible " +
    "accounting") {
    // maxOffsetsPerRound = 1: ring 0 (1 offset) fits, ring 1 (8 offsets)
    // does not — every probe not settled by its home cell takes the
    // exact brute-force remainder. Results must be identical to the
    // production schedule's, AND the fallthrough must be observable:
    // the accounting reports exactly how many probes the rings failed
    // to resolve and the exact-pair cost paid for them.
    val ringed = Spatial.q267AdaptiveKnn(spark, sf).collect().toSeq
    val acct = new Spatial.RemainderAccounting
    val bruted = Spatial.adaptiveKnnImpl(spark, sf, 1, Some(acct))
      .collect().toSeq
    assert(bruted === ringed)
    val nCust = Tables.customer(spark, sf).count()
    val nSupp = Tables.supplier(spark, sf).count()
    assert(acct.rowsSolvedByRemainder > 0L,
      "the 1-offset schedule must strand probes into the remainder")
    assert(acct.rowsSolvedByRemainder <= nCust)
    assert(acct.bruteForcePairs === acct.rowsSolvedByRemainder * nSupp,
      "pair accounting must be |pending| x n_supp exactly")
    assert(acct.ringRoundsBeforeFallthrough === 1,
      "ring 0 fits the 1-offset budget, ring 1 does not — exactly one " +
        "ring round precedes the fallthrough")
    // the production schedule never engages the remainder on this data —
    // its accounting must stay zero (the observability default)
    val prodAcct = new Spatial.RemainderAccounting
    Spatial.adaptiveKnnImpl(spark, sf, 1000, Some(prodAcct))
      .write.format("noop").mode("overwrite").save()
    assert(prodAcct.rowsSolvedByRemainder === 0L &&
      prodAcct.bruteForcePairs === 0L)
  }
}
