package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Information, Privacy}

/** q181/q182/q183 — l-diversity, mutual information, PSI: identities and
  * direct recomputation on the fixture. */
class InformationSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q181: class sizes tie to customers; l and top counts reconcile") {
    import org.apache.spark.sql.functions._
    val out = Privacy.q181Ldiversity(spark, SparkSuite.sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6))).toMap
    val raw = Tables.customer(spark, SparkSuite.sf)
      .select(col("c_nationkey"),
        when(col("c_acctbal") >= 0, lit("pos")).otherwise(lit("neg")),
        col("c_mktsegment"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1),
        r.getString(2)))
    assert(out.values.map(_._1).sum === raw.length.toLong)
    raw.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
      val bySeg = rows.groupBy(_._3).view.mapValues(_.size)
      val (n, l, top, rel) = out(k)
      assert(n === rows.size.toLong, s"$k size")
      assert(l === bySeg.size.toLong, s"$k l-distinct")
      assert(top === bySeg.values.max.toLong, s"$k top count")
      assert(rel === (bySeg.size >= 3), s"$k flag")
    }
  }

  test("q230: EMD matches a scala recomputation; identical dist gives 0") {
    import org.apache.spark.sql.functions._
    val out = Privacy.q230Tcloseness(spark, SparkSuite.sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    val raw = Tables.customer(spark, SparkSuite.sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map { r =>
        val bal = r.getDouble(2)
        val b = if (bal < 0) 0 else if (bal < 3000) 1
          else if (bal < 6000) 2 else 3
        (r.getAs[Number](0).longValue, r.getString(1), b)
      }
    val pop = raw.length.toLong
    val pCum = (0 until 2 + 1).map(i => raw.count(_._3 <= i).toLong)
    raw.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
      val n = rows.size.toLong
      val num = (0 until 3).map { i =>
        math.abs(pop * rows.count(_._3 <= i) - n * pCum(i))
      }.sum
      val emd = num.toDouble / (n * pop * 3).toDouble
      val (nOut, emdOut, rel) = out(k)
      assert(nOut === n, s"$k size")
      assert(math.abs(emdOut - emd) < 1e-12, s"$k emd $emdOut vs $emd")
      assert(rel === (emd <= Privacy.TClose), s"$k flag")
      assert(emdOut >= 0.0 && emdOut <= 1.0, s"$k emd bounds")
    }
    // a class whose distribution IS the population distribution scores 0:
    // verified structurally — EMD numerator is cross-multiplied cumulative
    // counts, which cancel exactly when shares are equal (n*P_i == pop*G_i)
  }

  test("q182: MI is symmetric-bounded: 0 <= MI <= min(H) (+rounding)") {
    val r = Information.q182MutualInfo(spark, SparkSuite.sf).collect()(0)
    val (mi, hx, hy, nmi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // per-term 6dp rounding admits ~1e-5 slack around the exact identities
    assert(mi >= -1e-4, "MI nonnegative up to rounding")
    assert(mi <= math.min(hx, hy) + 1e-4, "MI bounded by marginal entropy")
    assert(hx > 0 && hy > 0, "fixture has >1 source and >1 lang")
    assert(math.abs(nmi - mi / math.min(hx, hy)) < 1e-12)
  }

  test("q182: MI bit-matches a scala recomputation with the same rounding") {
    import org.apache.spark.sql.functions._
    val r = Information.q182MutualInfo(spark, SparkSuite.sf).collect()(0)
    val joint = Tables.documents(spark, SparkSuite.sf)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2)))
    val n = joint.map(_._2).sum
    val mx = joint.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val my = joint.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    def log2(d: Double) = math.log(d) / math.log(2.0)
    def dec6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val mi = joint.map { case ((s, l), nxy) =>
      dec6((nxy.toDouble / n.toDouble) *
        (log2((nxy * n).toDouble) - log2((mx(s) * my(l)).toDouble)))
    }.sum
    assert(r.getDouble(0) === mi.toDouble)
  }

  test("q183: PSI terms reconcile and total matches the sum") {
    val rows = Information.q183Psi(spark, SparkSuite.sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq === (0 to 9))
    // smoothed counts are raw+1, so every bin is >= 1
    assert(rows.forall(r => r._2 >= 1 && r._3 >= 1))
    // delta_p sums to ~0 (both are probability vectors)
    assert(math.abs(rows.map(_._4).sum) < 1e-4)
    // the broadcast total equals the decimal-exact sum of the terms
    val total = rows.head._6
    assert(rows.forall(r => r._6 === total))
    assert(math.abs(total - rows.map(_._5).sum) < 1e-9)
    // PSI terms are nonnegative by construction: (p−q) and log2(p/q)
    // always share a sign; only 6dp rounding can dip one below zero
    rows.foreach { r => assert(r._5 >= -1e-6, s"bin ${r._1} term sign") }
  }

  test("q258 HHI: bounds, effective-count inverse, direct recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Aggregates.q258Hhi(spark, SparkSuite.sf).collect()
    assert(rows.nonEmpty)
    // per-(nation, supplier) cents recomputed independently
    val cents = Tables.lineitem(spark, SparkSuite.sf)
      .join(Tables.supplier(spark, SparkSuite.sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, SparkSuite.sf),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("c"))
      .collect()
      .groupBy(_.getAs[String]("n_name"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("c")) }
    rows.foreach { r =>
      val nat = r.getAs[String]("n_name")
      val cs = cents(nat)
      val n = r.getAs[Long]("n_suppliers")
      assert(n === cs.length.toLong)
      assert(r.getAs[Long]("total_cents") === cs.sum)
      val hhi = r.getAs[Double]("hhi")
      // 1/n ≤ HHI ≤ 1, with equality iff uniform / monopoly
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0)
      val t = cs.sum.toDouble
      val want = cs.map(c => BigDecimal(c) * BigDecimal(c)).sum.toDouble /
        (t * t)
      assert(math.abs(hhi - want) < 1e-12, s"$nat: $hhi vs $want")
      assert(r.getAs[Double]("effective_suppliers") === 1.0 / hhi)
    }
  }
}
