package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Aggregates, Events, Robust}

/** q168/q169/q170 — weighted median, KMV sketch merge, conversion latency:
  * semantics proven against direct recomputation and planted inputs. */
class WeightedStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  test("q168: weighted median matches a direct per-supplier recomputation") {
    import org.apache.spark.sql.functions.col
    val out = Robust.q168WeightedMedian(spark, SparkSuite.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val raw = Tables.lineitem(spark, SparkSuite.sf)
      .select(col("l_suppkey"), col("l_extendedprice"),
        col("l_quantity").cast("long"), col("l_orderkey"),
        col("l_linenumber"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    raw.groupBy(_._1).foreach { case (supp, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4, r._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
      assert(out(supp)._1 === tot, s"supplier $supp total weight")
      assert(out(supp)._2 === med, s"supplier $supp weighted median")
    }
  }

  test("q169: identical sources give jaccard 1; disjoint give 0") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val docs = Seq(("a", text), ("b", text), ("c", other))
      .toDF("source", "text")
    val rows = Aggregates.kmvOverlap(docs, 16).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(6))).toMap
    val ab = rows(("a", "b"))
    assert(ab._3 === 1.0 && ab._1 === ab._2, "identical sets: exact J=1")
    assert(math.abs(ab._4 - 1.0) < 1e-9,
      "identical sketches must estimate J=1 exactly (same k-mins)")
    val ac = rows(("a", "c"))
    assert(ac._1 === 0L && ac._3 === 0.0, "disjoint sets: exact J=0")
  }

  test("q169: fixture estimates stay inside KMV error bounds") {
    val rows = Aggregates.q169KmvOverlap(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length === 190, "20 sources -> 190 unordered pairs")
    rows.foreach { r =>
      val (exactU, estU) = (r.getLong(3), r.getDouble(5))
      // k=64 -> rsd ~ 1/sqrt(62) ~ 12.7%; measured max 12.5% on the
      // fixture with the mixed hash - 0.35 leaves ~3x headroom
      assert(math.abs(estU - exactU) / exactU < 0.35,
        s"${r.getString(0)}x${r.getString(1)}: est $estU vs exact $exactU")
      assert(math.abs(r.getDouble(6) - r.getDouble(4)) < 0.35,
        "jaccard estimate within coarse bound of exact")
    }
  }

  test("q171: gini matches a direct recomputation and stays in [0, 1)") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Windows.q171Gini(spark, SparkSuite.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val rev = Tables.orders(spark, SparkSuite.sf)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("c"))
    val cust = Tables.customer(spark, SparkSuite.sf)
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .join(Tables.nation(spark, SparkSuite.sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), coalesce(col("c"), lit(0L)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    cust.groupBy(_._1).foreach { case (nation, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length.toLong
      val tot = xs.sum
      val rankSum = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val gini =
        if (tot == 0) 0.0
        else (2L * rankSum - (n + 1) * tot).toDouble / (n * tot)
      assert(out(nation)._1 === n)
      assert(out(nation)._2 === tot)
      assert(out(nation)._3 === gini, s"gini mismatch for $nation")
      assert(gini >= 0.0 && gini < 1.0)
    }
  }

  test("q172: confusion matrix is internally consistent") {
    val r = graft.ops.Dedup.q172LshAudit(spark, SparkSuite.sf).collect()(0)
    val (n, tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(tp + fp + fn + tn === n, "cells partition the corpus")
    val prec = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val rec = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    assert(r.getDouble(5) === prec && r.getDouble(6) === rec)
    assert(tp > 0, "the fixture's planted dups must produce true positives")
  }

  test("q173: seasonal indices average to exactly 1 over each brand") {
    val rows = graft.ops.Windows.q173Seasonality(spark, SparkSuite.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (brand, ms) =>
      val tot = ms.head._3
      assert(ms.map(_._2).sum === tot, s"$brand: month sums tie to total")
      // mean of 12*m/tot over observed months ~ 12/n_months when complete
      ms.foreach { case (_, m, t, idx) =>
        assert(idx === (m * 12L).toDouble / t.toDouble)
      }
    }
  }

  test("q174: assignment is deterministic and cells partition the users") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.Events.q174AbTest(spark, SparkSuite.sf).collect()(0)
    val users = Tables.events(spark, SparkSuite.sf)
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(r.getLong(0) + r.getLong(2) === users,
      "variants partition the user base")
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    assert(r.getDouble(7) >= 0.0, "chi-square is non-negative")
    // deterministic: a second run bit-matches the first
    val r2 = graft.ops.Events.q174AbTest(spark, SparkSuite.sf).collect()(0)
    assert(r === r2)
  }

  test("q170: conversion accounting ties out against raw events") {
    import org.apache.spark.sql.functions._
    val rows = Events.q170TimeToConvert(spark, SparkSuite.sf).collect()
    val totalUsers = rows.map(_.getLong(1)).sum
    val signups = Tables.events(spark, SparkSuite.sf)
      .filter(col("event_type") === "signup")
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(totalUsers === signups, "every signing-up user lands in a cohort")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(
        r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-15)
      if (r.getLong(2) > 0) assert(r.getLong(4) >= 0L,
        "median latency is non-negative (purchase at/after signup)")
    }
  }

  test("q235: bootstrap CI brackets the estimate; weights are Poisson-ish") {
    import org.apache.spark.sql.functions._
    val r = Robust.q235PoissonBootstrap(spark, SparkSuite.sf).collect().head
    val (est, lo, hi) = (r.getAs[Double]("est_mean"),
      r.getAs[Double]("lo95"), r.getAs[Double]("hi95"))
    assert(lo < hi, s"lo $lo !< hi $hi")
    assert(lo <= est && est <= hi,
      s"estimate $est outside its own CI [$lo, $hi]")
    assert(r.getAs[Double]("min_rep") <= lo && hi <= r.getAs[Double]("max_rep"))
    assert(r.getAs[Long]("n_replicates") === Robust.BootB.toLong)
    // CI width sanity: a mean over n≈6000 with sd≈sqrt half the mean scale
    // must be a small fraction of the estimate, not a multiple of it
    assert((hi - lo) / est < 0.2, s"CI implausibly wide: [$lo,$hi] vs $est")
    // thresholds really are the Poisson(1) CDF on the 2^20 grid
    val cdf = Robust.bootThresholds.map(_.toDouble / (1L << 20))
    val expect = Seq(0.3679, 0.7358, 0.9197, 0.9810, 0.9963)
    cdf.zip(expect).foreach { case (c, e) =>
      assert(math.abs(c - e) < 5e-4, s"cdf $c vs $e") }
    // the truncated mean weight stays within 1% of 1 — resamples are
    // the right size on average
    val meanW = Robust.bootThresholds.indices
      .map(k => k.toDouble * (math.exp(-1.0) / (1 to k).product)).sum +
      Robust.BootWMax.toDouble *
        (1.0 - math.exp(-1.0) * (0 to Robust.BootWMax - 1)
          .map(k => 1.0 / (1 to k).product).sum)
    assert(math.abs(meanW - 1.0) < 0.01, s"truncated mean weight $meanW")
  }
}
