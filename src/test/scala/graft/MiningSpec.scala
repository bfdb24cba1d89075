package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Aggregates, Collocations, Events, Intervals}

/** Round-4 batch 2: basket mining, rolling distinct, listagg, interval
  * overlap. Same discipline as RobustGraphSpec — each operator checked
  * against an independent formulation on sf0.001. */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  private val sf = SparkSuite.sf

  test("q120 lift matches a directly recomputed pair") {
    val out = Collocations.q120BasketPairs(spark, sf)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("n_pair") >= 3))
    assert(rows.forall(r => r.getAs[Long]("p1") < r.getAs[Long]("p2")))
    val r = rows.head
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nBaskets = items.select("l_orderkey").distinct().count()
    val n1 = items.filter(col("l_partkey") === r.getAs[Long]("p1")).count()
    val n2 = items.filter(col("l_partkey") === r.getAs[Long]("p2")).count()
    val nPair = items.as("a").join(items.as("b"),
      col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") === r.getAs[Long]("p1") &&
        col("b.l_partkey") === r.getAs[Long]("p2")).count()
    assert(r.getAs[Long]("n_pair") === nPair)
    assert(r.getAs[Double]("lift") ===
      (nPair * nBaskets).toDouble / (n1 * n2).toDouble)
  }

  test("q241 funnel depths: histogram covers all views; brute-force agrees") {
    val out = graft.ops.Events.q241WindowFunnel(spark, sf).collect()
    val nViews = Tables.events(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(out.map(_.getAs[Long]("n_anchors")).sum === nViews)
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    // brute-force recompute per anchor on the collected event log
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val t = graft.ops.Events.FunnelWindowUs
    val depths = evs.filter(_._3 == "view").map { case (u, vep, _) =>
      val clicks = evs.filter(e => e._1 == u && e._3 == "click" &&
        e._2 > vep && e._2 <= vep + t).map(_._2)
      if (clicks.isEmpty) 1
      else {
        val fc = clicks.min
        val buys = evs.filter(e => e._1 == u && e._3 == "purchase" &&
          e._2 > fc && e._2 <= vep + t)
        if (buys.isEmpty) 2 else 3
      }
    }
    val expHist = depths.groupBy(identity).view.mapValues(_.size.toLong)
    out.foreach { r =>
      assert(r.getAs[Long]("n_anchors") ===
        expHist.getOrElse(r.getAs[Int]("depth"), 0L),
        s"depth ${r.getAs[Int]("depth")}")
    }
  }

  test("q232 candidate-pruned triples equal the brute triple count") {
    val out = Collocations.q232BasketTriples(spark, sf).collect()
    assert(out.nonEmpty, "fixture should contain support-2 triples")
    val s = Collocations.TripleSupport.toLong
    out.foreach { r =>
      assert(r.getAs[Long]("n_triple") >= s)
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
      assert(r.getAs[Long]("p2") < r.getAs[Long]("p3"))
    }
    // brute force WITHOUT L1 pruning / candidate generation — downward
    // closure says the level-wise machinery must not change the answer
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    def side(n: Int) =
      items.select(col("l_orderkey"), col("l_partkey").as(s"p$n"))
    val brute = side(1)
      .join(side(2), Seq("l_orderkey")).filter(col("p1") < col("p2"))
      .join(side(3), Seq("l_orderkey")).filter(col("p2") < col("p3"))
      .groupBy("p1", "p2", "p3").count()
      .filter(col("count") >= s)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val got = out.map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
      r.getAs[Long]("p3")) -> r.getAs[Long]("n_triple")).toMap
    assert(got === brute, "level-wise result diverges from brute count")
  }

  test("q121 trailing-7d distinct equals a direct range count") {
    val out = Events.q121RollingDistinct(spark, sf).collect()
    assert(out.nonEmpty)
    val probe = out(out.length / 2)
    val winDay = probe.getTimestamp(0)
    val direct = Tables.events(spark, sf)
      .filter(date_trunc("day", col("ts")) <= lit(winDay) &&
        date_trunc("day", col("ts")) >=
          timestamp_add("DAY", lit(-6), lit(winDay)))
      .select("user_id").distinct().count()
    assert(probe.getAs[Long]("n_users_7d") === direct)
  }

  test("q122 concatenation is sorted and consistent with the count") {
    Aggregates.q122Listagg(spark, sf).collect().foreach { r =>
      val parts = r.getAs[String]("suppliers").split(",").toSeq
      assert(parts.length === r.getAs[Long]("n_suppliers"))
      assert(parts === parts.sorted)
    }
  }

  test("q123 binned overlap join equals the brute-force theta join") {
    val a = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") === 50.0)
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("id"),
        col("l_shipdate").as("start"),
        expr("l_shipdate + (l_linenumber % 14 + 1) * INTERVAL '1' DAY")
          .as("end"))
    val b = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("id"), col("o_orderdate").as("start"),
        expr("o_orderdate + INTERVAL '7' DAY").as("end"))
    val binned = Intervals.overlapJoin(a, b)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = a.select(col("id").as("a_id"), col("start").as("a_s"),
        col("end").as("a_e"))
      .crossJoin(b.select(col("id").as("b_id"), col("start").as("b_s"),
        col("end").as("b_e")))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === brute)
    assert(binned.nonEmpty)
  }

  test("q123 compressed count join equals brute pairs; density stays bounded") {
    val a = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") === 50.0)
      .select((col("l_orderkey") * 100 + col("l_linenumber")).as("id"),
        col("l_shipdate").as("start"),
        expr("l_shipdate + (l_linenumber % 14 + 1) * INTERVAL '1' DAY")
          .as("end"))
    val b = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderdate").as("start"),
        expr("o_orderdate + INTERVAL '7' DAY").as("end"))
    val weighted = Intervals.overlapCountJoin(a, b)
    val compressedRows = weighted.count()
    val pairTotal = weighted.agg(sum("b_cnt")).collect()(0).getLong(0)
    val bruteTotal = a.select(col("start").as("a_s"), col("end").as("a_e"))
      .crossJoin(b.select(col("start").as("b_s"), col("end").as("b_e")))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .count()
    assert(pairTotal === bruteTotal)
    assert(pairTotal > 0)
    // the whole point of the compression: the join materializes at most one
    // row per (a row, distinct B interval), never the full pair set
    assert(compressedRows <= bruteTotal)
    // fixture-drift pin: pairs grow as |A|·|B| over a fixed span, so avg
    // overlapping windows per A interval ≈ b-density/day × max combined
    // window (14 + 7 + 1 days). If regenerated fixtures blow past 2× this
    // model, the join cost profile changed — fail loudly instead of letting
    // the bench quietly absorb it (the r3→r4 q123 regression).
    val aCnt = a.count()
    val bCnt = b.count()
    val span = b.agg(datediff(max("start"), min("start"))).collect()(0)
      .getInt(0).toDouble.max(1.0)
    val modelDensity = bCnt / span * 22.0
    assert(pairTotal <= (aCnt * modelDensity * 2.0).toLong + 100,
      s"pair density drifted: $pairTotal pairs for $aCnt×$bCnt over $span days")
  }

  test("q124 TWAP is bounded by each user's value range") {
    val ev = Tables.events(spark, sf)
    val perUser = ev.groupBy(col("user_id"))
      .agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val out = ops.Windows.q124Twap(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi, n) = perUser(r.getLong(0))
      val twap = r.getAs[Double]("twap")
      assert(twap >= lo && twap <= hi)
      assert(r.getAs[Long]("n_segments") === n - 1)
    }
  }

  test("q125 streamed dedup equals the batch distinct key set") {
    val streamed = graft.streaming.Streams.q125StreamDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .toSet
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
  test("q127 every format leg carries identical aggregates") {
    val out = ops.Federated.q127Federated(spark, sf)
    val variants = out.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("n_rows"), col("sum_price")).as("v"),
        count(lit(1)).as("legs"))
      .collect()
    assert(variants.nonEmpty)
    variants.foreach { r =>
      assert(r.getAs[Long]("legs") === 4)
      assert(r.getAs[Long]("v") === 1,
        s"format legs disagree for ${r.get(0)}")
    }
  }

  test("q128 diversity invariants hold per document") {
    val rows = ops.Text.q128Lexical(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nd, nh, top) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("n_hapax"),
        r.getAs[Long]("top_cnt"))
      assert(nd <= nt && nh <= nd && top <= nt)
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0.0 && ttr <= 1.0)
    }
  }

  test("q129 shares sum to one") {
    val rows = ops.Aggregates.q129Share(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-9)
  }
  test("q130 every lineitem resolves exactly one dimension version") {
    val total = ops.Merge.q130PitJoin(spark, sf)
      .agg(sum(col("n_lines"))).head().getLong(0)
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("q131 path counts partition the user population") {
    val total = ops.Events.q131Paths(spark, sf)
      .agg(sum(col("n_users"))).head().getLong(0)
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(total === users)
  }

  test("q132 planted change classes carry the planted counts") {
    val base = Tables.orders(spark, sf).select(col("o_orderkey").as("k"))
    val counts = ops.Merge.q132Diff(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    assert(counts("added") === base.filter(col("k") % 100 === 9).count())
    assert(counts("removed") === base.filter(col("k") % 13 === 5).count())
    assert(counts("changed") ===
      base.filter(col("k") % 7 === 2 && col("k") % 13 =!= 5).count())
    assert(counts.values.sum ===
      base.count() + counts("added"))
  }
  test("q133 group split is leakage-free: each user in exactly one fold") {
    val folds = ops.Sampling
      .assignSplit(Tables.events(spark, sf), "user_id")
      .groupBy(col("user_id"))
      .agg(countDistinct(col("split")).as("n_folds"))
      .collect()
    assert(folds.nonEmpty)
    folds.foreach(r => assert(r.getAs[Long]("n_folds") === 1))
    val out = ops.Sampling.q133GroupSplit(spark, sf)
      .agg(sum(col("n_users"))).head().getLong(0)
    assert(out === folds.length)
  }
  test("q134 null-safe join keeps exactly the null-bucket rows equality drops") {
    val rows = ops.Relational.q134NullsafeJoin(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val o = Tables.orders(spark, sf)
    val nullOrders = o.filter(col("o_orderkey") % 10 === 0).count()
    // customer side collapses to one row per key, so each null-keyed order
    // matches exactly the single NULL customer row under <=>
    assert(rows("null_safe") - rows("equality") === nullOrders)
  }

  test("q135 masks partition the user-day grid and bits match the mask") {
    val out = ops.Aggregates.q135Bitmask(spark, sf).collect()
    assert(out.length > 1)
    out.foreach { r =>
      val mask = r.getAs[Long]("mask")
      assert(java.lang.Long.bitCount(mask) === r.getAs[Int]("n_types"))
    }
    val total = out.map(_.getAs[Long]("n_user_days")).sum
    val grid = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    assert(total === grid)
  }
  test("q136 streamed windowed aggregate equals the q60 batch twin") {
    val streamed = graft.streaming.Streams.q136StreamWindow(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val batch = ops.Events.q60WindowTumbling(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
  test("q137 posting lists: tf matches positions and positions hit the term") {
    val rows = ops.Text.q137InvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("tf") ===
        r.getAs[String]("positions").split(",").length.toLong)
    }
    val probe = rows(rows.length / 2)
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === probe.getAs[Long]("doc_id"))
      .select("text").head().getString(0).split(" ")
    probe.getAs[String]("positions").split(",").map(_.toInt).foreach { p =>
      assert(text(p) === probe.getAs[String]("term"))
    }
  }

  test("q138 co-occurrence counts are symmetric in the pair") {
    val m = ops.Text.q138Cooccur(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getString(0)) -> r.getAs[Long]("n_pair"))
      .toMap
    assert(m.nonEmpty)
    // (center, context) keys were built swapped above, so hitting the map
    // with the straight key compares n(a,b) to n(b,a)
    m.foreach { case ((a, b), n) =>
      assert(m.get((b, a)).forall(_ === n))
    }
  }

  test("q254 rules: both directions per pair, metric identities hold") {
    val rows = Collocations.q254AssocRules(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.map(r =>
      (r.getAs[Long]("ante"), r.getAs[Long]("cons")) -> r).toMap
    rows.foreach { r =>
      val (a, c) = (r.getAs[Long]("ante"), r.getAs[Long]("cons"))
      // mirror rule exists with the same pair support and the SAME lift
      // (lift is symmetric); confidence ratio flips with the frequencies
      val m = byKey((c, a))
      assert(m.getAs[Long]("n_pair") === r.getAs[Long]("n_pair"))
      assert(m.getAs[Double]("lift") === r.getAs[Double]("lift"))
      // confidence = support/freq(ante), bounded (0, 1]
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0)
      assert(conf ===
        r.getAs[Long]("n_pair").toDouble / r.getAs[Long]("n_a").toDouble)
      // conviction is NULL exactly when confidence = 1
      assert(r.isNullAt(r.fieldIndex("conviction")) === (conf == 1.0))
      // leverage and lift agree in sign about independence
      val lev = r.getAs[Double]("leverage")
      val lift = r.getAs[Double]("lift")
      assert((lev > 0) === (lift > 1.0) || lev == 0.0)
    }
    // spot-check one rule's confidence against direct counts
    val r = rows(rows.length / 2)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nA = items.filter(col("l_partkey") === r.getAs[Long]("ante")).count()
    assert(r.getAs[Long]("n_a") === nA)
  }
}
